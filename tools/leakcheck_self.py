#!/usr/bin/env python3
"""Self-evidencing leak scan (VERDICT r5 #4 / ADVICE r4, carried twice).

The driver's LEAKCHECK.json reports hit counts but nothing that proves a
fresh scan ran for a given round. This twin scan over the same surface
emits the evidence: how many files were scanned, their total bytes, and
a hash of the pattern set, so any round-over-round artifact diff shows
whether the scan itself changed or re-ran.

Scans src/, build.sbt, project/, tools/, *.md for categories equivalent
to the driver's: internal package imports, internal URLs/buckets, chat
shortlinks, API-key shapes, suspicious env vars. Exits nonzero on any
hit. Run: python3 tools/leakcheck_self.py [repo_root]
"""
import hashlib
import json
import re
import sys
from pathlib import Path

PATTERNS = {
    # fully-qualified third-party package imports outside the declared
    # dependency surface (Spark + its bundled jars, scalatest/scalacheck,
    # JTS); relative/local imports (lowercase vals, object members) are
    # not package references and are skipped by construction
    "nonpublic-import": re.compile(
        r"^\s*import\s+(?:(?:com|net|io|ai|dev|co)\.(?!fasterxml\.)[\w.]+|"
        r"org\.(?!apache\.|scalatest\.|scalacheck\.|slf4j\.|locationtech\.)[\w.]+)",
        re.M),
    "internal-url": re.compile(
        r"https?://(?![\w.-]*(?:example\.com|\bex\.com|localhost|127\.0\.0\.1|"
        r"sqlite\.org|apache\.org|epsg\.(?:io|org)|opengeospatial\.org|opengis\.net|"
        r"openxmlformats\.org|w3\.org|purl\.org|ietf\.org|wikipedia\.org|"
        r"arxiv\.org|github\.com|postgis\.net|duckdb\.org|microsoft\.com|"
        r"ecma-international\.org)([/\s\"')]|$))[\w.-]+"),
    "bucket-uri": re.compile(r"\b(?:s3|gs|s3a|s3n|abfss?)://[\w.-]+"),
    "chat-shortlink": re.compile(r"\b(?:go|sl|b)/[a-z][\w-]{2,}\b"),
    "api-key-shape": re.compile(
        r"\b(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|AIza[\w-]{35})\b"),
    "suspicious-env": re.compile(
        r"""sys\.env[.(]+["'](?!SPARK_GRAFT_|COURSIER_|JAVA_|HOME\b|USER\b|"""
        r"""PATH\b|TMPDIR\b)[A-Z_]+["']"""),
}

SCAN_GLOBS = ["src/**/*.scala", "build.sbt", "project/*.scala",
              "project/*.sbt", "tools/*.py", "*.md"]


def main() -> int:
    root = Path(sys.argv[1] if len(sys.argv) > 1 else ".")
    files = sorted({p for g in SCAN_GLOBS for p in root.glob(g) if p.is_file()})
    hits: dict[str, list[str]] = {k: [] for k in PATTERNS}
    total_bytes = 0
    for p in files:
        text = p.read_text(errors="replace")
        total_bytes += len(text)
        for name, rx in PATTERNS.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[name].append(f"{p.relative_to(root)}:{line}: {m.group(0)[:80]}")
    pattern_hash = hashlib.sha256(
        "\n".join(f"{k}={v.pattern}" for k, v in sorted(PATTERNS.items()))
        .encode()).hexdigest()[:16]
    n_hits = sum(len(v) for v in hits.values())
    out = {
        "files_scanned": len(files),
        "bytes_scanned": total_bytes,
        "pattern_set_sha256_16": pattern_hash,
        "n_hits": n_hits,
        "hits": hits,
    }
    (root / "LEAKCHECK_SELF.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"leakcheck_self: {len(files)} files, {total_bytes} bytes, "
          f"patterns {pattern_hash}, {n_hits} hits")
    return 1 if n_hits else 0


if __name__ == "__main__":
    sys.exit(main())
