#!/usr/bin/env python3
"""Generate src/test/resources/fixtures/legacy.xls — a minimal but
spec-valid BIFF8 workbook inside a CFBF compound file, used by the
XlsReader spec. Covers: SST + LABELSST, inline LABEL, NUMBER, RK
(int, /100), MULRK, BOOLERR. Build-time tool; the library has no Python."""
import struct, os

out = os.path.join(os.path.dirname(__file__), "..", "src/test/resources/fixtures/legacy.xls")

# ---------------- BIFF8 records ----------------
def rec(rid, payload):
    return struct.pack("<HH", rid, len(payload)) + payload

def unistr(s):  # XLUnicodeRichExtendedString, compressed (grbit=0)
    return struct.pack("<HB", len(s), 0) + s.encode("latin-1")

def bof(dt):
    # vers=0x0600 (BIFF8), dt, build/year/flags arbitrary-but-valid
    return rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))

def rk_int(v, div100=False):
    return (v << 2) | 0x02 | (0x01 if div100 else 0)

sst_strings = ["city", "pop_m", "coastal", "score", "London", "Paris"]
sst_payload = struct.pack("<II", len(sst_strings), len(sst_strings)) + \
    b"".join(unistr(s) for s in sst_strings)

globals_records = [
    bof(0x0005),                       # workbook globals
    rec(0x00FC, sst_payload),          # SST
    # BOUNDSHEET: BOF offset patched below
    None,
    rec(0x000A, b""),                  # EOF (globals)
]

def labelsst(r, c, idx):
    return rec(0x00FD, struct.pack("<HHHI", r, c, 0, idx))

def number(r, c, v):
    return rec(0x0203, struct.pack("<HHH", r, c, 0) + struct.pack("<d", v))

def rkrec(r, c, rk):
    return rec(0x027E, struct.pack("<HHHI", r, c, 0, rk))

def mulrk(r, cfirst, rks):
    body = struct.pack("<HH", r, cfirst)
    for rk in rks:
        body += struct.pack("<HI", 0, rk)
    body += struct.pack("<H", cfirst + len(rks) - 1)
    return rec(0x00BD, body)

def boolerr(r, c, b):
    return rec(0x0205, struct.pack("<HHHBB", r, c, 0, 1 if b else 0, 0))

def label(r, c, s):
    return rec(0x0204, struct.pack("<HHH", r, c, 0) + unistr(s))

sheet_records = [
    bof(0x0010),                                  # worksheet
    labelsst(0, 0, 0), labelsst(0, 1, 1), labelsst(0, 2, 2), labelsst(0, 3, 3),
    labelsst(1, 0, 4), number(1, 1, 8.9), boolerr(1, 2, False), rkrec(1, 3, rk_int(425, True)),  # 4.25
    label(2, 0, "Paris"), mulrk(2, 1, [rk_int(2), rk_int(1)]), rkrec(2, 3, rk_int(7)),
    rec(0x000A, b""),                             # EOF (sheet)
]

globals_len_without_bs = sum(len(r) for r in globals_records if r is not None)
bs_name = b"\x06\x00\x00Sheet1"  # cch=6? -> ShortXLUnicodeString: cch(1) grbit(1) chars
# BOUNDSHEET: lbPlyPos(4) grbit(2) cch(1) grbit(1) name
def boundsheet(pos):
    return rec(0x0085, struct.pack("<IHBB", pos, 0, 6, 0) + b"Sheet1")

bs = boundsheet(0)  # size now known
bof_sheet_pos = globals_len_without_bs + len(bs)
globals_records[2] = boundsheet(bof_sheet_pos)

stream = b"".join(globals_records[:3]) + globals_records[3] + b"".join(sheet_records)
# pad the stream past the 4096 mini-stream cutoff so it lives in normal
# sectors (zero padding; the reader stops at record id 0)
if len(stream) < 4096:
    stream += b"\x00" * (4608 - len(stream))

# ---------------- CFBF container ----------------
SECT = 512
n_stream_sects = (len(stream) + SECT - 1) // SECT
# layout: sector 0 = FAT, sector 1 = directory, sectors 2.. = stream
fat = [0xFFFFFFFD, 0xFFFFFFFE]  # FATSECT, dir(end)
for i in range(n_stream_sects):
    fat.append(2 + i + 1 if i + 1 < n_stream_sects else 0xFFFFFFFE)
fat += [0xFFFFFFFF] * (SECT // 4 - len(fat))
fat_sector = struct.pack("<%dI" % (SECT // 4), *fat)

def direntry(name, objtype, start, size, child=0xFFFFFFFF):
    n = name.encode("UTF-16LE") + b"\x00\x00"
    e = n + b"\x00" * (64 - len(n))
    e += struct.pack("<H", len(n))
    e += struct.pack("<BB", objtype, 0)          # type, color
    e += struct.pack("<III", 0xFFFFFFFF, 0xFFFFFFFF, child)  # left/right/child
    e += b"\x00" * 16                             # clsid
    e += struct.pack("<I", 0)                     # state bits
    e += b"\x00" * 16                             # timestamps
    e += struct.pack("<Ii", start, size)
    e += b"\x00" * 4
    assert len(e) == 128, len(e)
    return e

directory = (
    direntry("Root Entry", 5, 0xFFFFFFFE, 0, child=1) +
    direntry("Workbook", 2, 2, len(stream)) +
    direntry("", 0, 0xFFFFFFFF, 0) +
    direntry("", 0, 0xFFFFFFFF, 0))
directory += b"\x00" * (SECT - len(directory) % SECT if len(directory) % SECT else 0)

header = struct.pack("<8s16xHHHHHHIIIIIIIIII",
    bytes([0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1]),
    0x003E, 0x0003,  # minor, major (v3)
    0xFFFE,          # little-endian
    9, 6,            # sector 512, mini 64
    0,               # reserved short
    0,               # reserved int
    0,               # number of directory sectors (v4 only)
    1,               # number of FAT sectors
    1,               # first directory sector
    0,               # transaction
    4096,            # mini cutoff
    0xFFFFFFFE,      # first MiniFAT sector (none)
    0,               # n MiniFAT sectors
    0xFFFFFFFE,      # first DIFAT sector (none beyond header)
    0)               # n DIFAT sectors
difat = struct.pack("<I", 0) + b"\xFF\xFF\xFF\xFF" * 108
header = header + difat
assert len(header) == 512, len(header)

body = fat_sector + directory + stream
if len(body) % SECT:
    body += b"\x00" * (SECT - len(body) % SECT)

with open(out, "wb") as f:
    f.write(header + body)
print("wrote", out, os.path.getsize(out), "bytes")

# ---- second fixture: SST spanning a CONTINUE record, split MID-STRING ----
# (the continued fragment restates the grbit byte, per MS-XLS 2.5.293)
out2 = os.path.join(os.path.dirname(__file__), "..", "src/test/resources/fixtures/legacy_bigsst.xls")

n_strings = 120
strs = ["s%03d_" % i + "x" * 94 for i in range(n_strings)]  # 100 chars each
full = b"".join(unistr(s) for s in strs)
split_at = 8000
# find which string the split lands in and where
acc = 0
for i, s in enumerate(strs):
    entry = unistr(s)
    if acc + len(entry) > split_at:
        # split inside string i's character data (past its 3-byte header)
        inner = split_at - acc
        assert inner > 3, "split must land in character data"
        first = full[:split_at]
        # continued fragment restates grbit (0 = compressed)
        second = b"\x00" + full[split_at:]
        break
    acc += len(entry)

sst_head = struct.pack("<II", n_strings, n_strings)
records = [
    bof(0x0005),
    rec(0x00FC, sst_head + first),
    rec(0x003C, second),            # CONTINUE
    None,                           # boundsheet placeholder
    rec(0x000A, b""),
]
glen = sum(len(r) for r in records if r is not None)
bs2 = boundsheet(0)
records[3] = boundsheet(glen + len(bs2))
sheet2 = [bof(0x0010)] + \
    [labelsst(r, 0, r) for r in range(4)] + \
    [rec(0x000A, b"")]
stream2 = b"".join(records[:4]) + records[4] + b"".join(sheet2)
if len(stream2) < 4096:
    stream2 += b"\x00" * (4608 - len(stream2))

n2 = (len(stream2) + SECT - 1) // SECT
fat2 = [0xFFFFFFFD, 0xFFFFFFFE]
for i in range(n2):
    fat2.append(2 + i + 1 if i + 1 < n2 else 0xFFFFFFFE)
fat2 += [0xFFFFFFFF] * (SECT // 4 - len(fat2))
fat_sector2 = struct.pack("<%dI" % (SECT // 4), *fat2)
directory2 = (
    direntry("Root Entry", 5, 0xFFFFFFFE, 0, child=1) +
    direntry("Workbook", 2, 2, len(stream2)) +
    direntry("", 0, 0xFFFFFFFF, 0) +
    direntry("", 0, 0xFFFFFFFF, 0))
body2 = fat_sector2 + directory2 + stream2
if len(body2) % SECT:
    body2 += b"\x00" * (SECT - len(body2) % SECT)
with open(out2, "wb") as f:
    f.write(header + body2)
print("wrote", out2, os.path.getsize(out2), "bytes")
