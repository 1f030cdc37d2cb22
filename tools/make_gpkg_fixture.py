#!/usr/bin/env python3
"""Generate src/test/resources/fixtures/minimal.gpkg — a tiny but spec-valid
GeoPackage (SQLite + gpkg_* catalog + GPB geometry blobs) used by
GeoPackageReaderSpec. Build-time tool; the library itself has no Python."""
import sqlite3, struct, os, sys

out = os.path.join(os.path.dirname(__file__), "..", "src/test/resources/fixtures/minimal.gpkg")
if os.path.exists(out):
    os.remove(out)
con = sqlite3.connect(out)
cur = con.cursor()
cur.execute("PRAGMA application_id = 1196444487")  # 'GPKG'
cur.execute("""CREATE TABLE gpkg_spatial_ref_sys (
  srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
  organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
  definition TEXT NOT NULL, description TEXT)""")
cur.execute("INSERT INTO gpkg_spatial_ref_sys VALUES ('WGS 84', 4326, 'EPSG', 4326, 'GEOGCS[...]', NULL)")
cur.execute("""CREATE TABLE gpkg_contents (
  table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
  identifier TEXT UNIQUE, description TEXT DEFAULT '',
  last_change DATETIME, min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
  srs_id INTEGER)""")
cur.execute("INSERT INTO gpkg_contents VALUES ('places','features','places','', '2024-01-01', -0.2, 51.4, 0.1, 51.6, 4326)")
cur.execute("""CREATE TABLE gpkg_geometry_columns (
  table_name TEXT NOT NULL, column_name TEXT NOT NULL,
  geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
  z TINYINT NOT NULL, m TINYINT NOT NULL,
  CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))""")
cur.execute("INSERT INTO gpkg_geometry_columns VALUES ('places','geom','POINT',4326,0,0)")
cur.execute("""CREATE TABLE places (
  fid INTEGER PRIMARY KEY AUTOINCREMENT, name TEXT, pop DOUBLE, geom BLOB)""")

def gpb_point(x, y, srs=4326):
    # GPB header: magic GP, version 0, flags: little-endian byte order (bit0=1),
    # envelope indicator 1 (xy) -> flags = 0b00000011
    header = b"GP" + bytes([0, 0b00000011]) + struct.pack("<i", srs)
    env = struct.pack("<4d", x, x, y, y)
    wkb = struct.pack("<BIdd", 1, 1, x, y)  # little-endian, type=1 point
    return header + env + wkb

rows = [("London", 8900000.0, -0.1275, 51.5072),
        ("Reading", 175000.0, -0.97, 51.45),
        ("NullIsle", None, 0.0, 0.0)]
for name, pop, x, y in rows:
    cur.execute("INSERT INTO places (name, pop, geom) VALUES (?,?,?)",
                (name, pop, gpb_point(x, y)))
# a long-text row to force payload overflow pages (page 4096, text 8000 chars)
cur.execute("INSERT INTO places (name, pop, geom) VALUES (?,?,?)",
            ("x" * 8000, 1.0, gpb_point(1.5, 2.5)))
con.commit()
con.close()
print("wrote", out, os.path.getsize(out), "bytes")

# regenerate with an extra big table that forces interior B-tree pages
con = sqlite3.connect(out)
cur = con.cursor()
cur.execute("CREATE TABLE many (id INTEGER PRIMARY KEY, label TEXT, x DOUBLE)")
for i in range(3000):
    cur.execute("INSERT INTO many VALUES (?,?,?)", (i, f"row{i}", i * 0.5))
con.commit()
con.close()
print("appended 'many' table:", os.path.getsize(out), "bytes")

# table-level PRIMARY KEY(col) also aliases rowid (stored NULLs), and a
# NUMERIC-affinity column mixing INTEGER and REAL storage classes —
# regression coverage for SqliteReader pk detection + GeoPackageReader
# type widening
con = sqlite3.connect(out)
cur = con.cursor()
cur.execute("CREATE TABLE tablepk (tid INTEGER, val TEXT, num NUMERIC, PRIMARY KEY(tid))")
cur.executemany("INSERT INTO tablepk VALUES (?,?,?)",
                [(1, "a", 1), (2, "b", 2.5), (3, "c", 4)])
con.commit()
con.close()
print("appended 'tablepk' table:", os.path.getsize(out), "bytes")

# second container declaring an UNSUPPORTED CRS (EPSG:25832) — regression
# coverage for IngestPipeline's fail-fast guard against silent NULL-out
out2 = os.path.join(os.path.dirname(__file__), "..", "src/test/resources/fixtures/utm25832.gpkg")
if os.path.exists(out2):
    os.remove(out2)
con = sqlite3.connect(out2)
cur = con.cursor()
cur.execute("PRAGMA application_id = 1196444487")
cur.execute("""CREATE TABLE gpkg_spatial_ref_sys (
  srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
  organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
  definition TEXT NOT NULL, description TEXT)""")
cur.execute("INSERT INTO gpkg_spatial_ref_sys VALUES ('ETRS89 / UTM 32N', 25832, 'EPSG', 25832, 'PROJCS[...]', NULL)")
cur.execute("""CREATE TABLE gpkg_contents (
  table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
  identifier TEXT UNIQUE, description TEXT DEFAULT '',
  last_change DATETIME, min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
  srs_id INTEGER)""")
cur.execute("INSERT INTO gpkg_contents VALUES ('pts','features','pts','', '2024-01-01', 0, 0, 1, 1, 25832)")
cur.execute("""CREATE TABLE gpkg_geometry_columns (
  table_name TEXT NOT NULL, column_name TEXT NOT NULL,
  geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
  z TINYINT NOT NULL, m TINYINT NOT NULL)""")
cur.execute("INSERT INTO gpkg_geometry_columns VALUES ('pts','geom','POINT',25832,0,0)")
cur.execute("CREATE TABLE pts (fid INTEGER PRIMARY KEY, geom BLOB)")
cur.execute("INSERT INTO pts (geom) VALUES (?)", (gpb_point(500000.0, 5400000.0, srs=25832),))
con.commit()
con.close()
print("wrote", out2, os.path.getsize(out2), "bytes")

# third container: gpkg_contents ONLY (no gpkg_geometry_columns) — the
# fallback discovery path must not crash; plus a table exercising quoted
# identifiers / comma-in-default in the CREATE TABLE parser
out3 = os.path.join(os.path.dirname(__file__), "..", "src/test/resources/fixtures/contents_only.gpkg")
if os.path.exists(out3):
    os.remove(out3)
con = sqlite3.connect(out3)
cur = con.cursor()
cur.execute("PRAGMA application_id = 1196444487")
cur.execute("""CREATE TABLE gpkg_contents (
  table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
  identifier TEXT UNIQUE, description TEXT DEFAULT '',
  last_change DATETIME, min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
  srs_id INTEGER)""")
cur.execute("INSERT INTO gpkg_contents VALUES ('feats','features','feats','', '2024-01-01', 0, 0, 1, 1, 4326)")
cur.execute("CREATE TABLE feats (fid INTEGER PRIMARY KEY, geom BLOB, name TEXT)")
cur.execute("INSERT INTO feats (geom, name) VALUES (?,?)", (gpb_point(1.0, 2.0), "a"))
cur.execute("""CREATE TABLE "weird" ("station name" TEXT, num INTEGER DEFAULT 7, txt TEXT DEFAULT 'a,b')""")
cur.execute('INSERT INTO "weird" VALUES (?,?,?)', ("x", 1, "y"))
con.commit()
con.close()
print("wrote", out3, os.path.getsize(out3), "bytes")
