#!/usr/bin/env python3
"""Local pre-check of oracle parity, mimicking the driver's t2 gate:
runs each oracle_sql.json entry in DuckDB over the sf-dir parquet tables
and compares against the Verify-dumped Spark parquet, column-name-sorted,
row order preserved. Dev tool only — not part of the library."""
import sys, json, glob, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"----  {name}: no oracle (rows-only) rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        s = spark_df[sorted(spark_df.columns)]
        g = duck_df[sorted(duck_df.columns)]
        if list(s.columns) != list(g.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(g.columns)}")
            n_fail += 1; continue
        if len(s) != len(g):
            print(f"FAIL {name}: rows {len(s)} vs {len(g)}"); n_fail += 1; continue
        bad = None
        for c in s.columns:
            a, b = s[c].tolist(), g[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if x is None and y is None:
                    continue
                try:
                    import math
                    if isinstance(x, float) and isinstance(y, float):
                        if math.isnan(x) and math.isnan(y):
                            continue
                        if x != y:
                            bad = (c, i, x, y); break
                    elif str(x) != str(y):
                        bad = (c, i, x, y); break
                except Exception:
                    if str(x) != str(y):
                        bad = (c, i, x, y); break
            if bad:
                break
        # dtype visibility (driver may be schema-strict)
        dt = [(c, str(s[c].dtype), str(g[c].dtype)) for c in s.columns
              if str(s[c].dtype) != str(g[c].dtype)]
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col={c} row={i} spark={x!r} duck={y!r}")
            n_fail += 1
        else:
            extra = f" dtype-diff={dt}" if dt else ""
            print(f"PASS  {name} rows={len(s)}{extra}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
