package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Round-trips through the fixture writers and the REAL readers — the
  * write-side twin of the binary parsers. The oracle queries exercise the
  * happy path over nation rows; this spec stresses encoding edges the
  * corpus doesn't hit (negative/wide integers, long strings, many rows,
  * quoting).
  */
class FormatWritersSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("graft-writers")
    d.toFile.deleteOnExit()
    d.resolve(name).toString
  }

  test("geopackage writer round-trips through SqliteReader/GeoPackageReader") {
    val rows = Seq[(Long, String, Double, Double)](
      (-3L, "negative key", -0.5, 51.25),            // int8-negative serial
      (200L, "two hundred", 1.0, 2.0),               // needs int16 serial
      (70000L, "seventy thousand", 3.0, 4.0),        // needs int32 serial
      (5_000_000_000L, "five billion", 5.0, 6.0),    // needs int64 serial
      (7L, "x" * 500, 7.0, 8.0))                     // long text, still 1 page
    val path = tmp("edge.gpkg")
    FormatWriters.writeGeoPackage(path, "edge_tbl", "k", "label", 4326, rows)

    assert(FileTypeDetector.detect(path) == Right(FileType.Geopackage))
    assert(GeoPackageReader.srsId(path).contains("4326"))
    val df = GeoPackageReader.read(spark, path)
    assert(df.columns.toSeq == Seq("k", "label", "geom"))
    val got = df.orderBy("k").collect()
    val expected = rows.sortBy(_._1)
    got.zip(expected).foreach { case (r, (k, n, x, y)) =>
      assert(r.getLong(0) == k)
      assert(r.getString(1) == n)
      val g = graft.functions.GeoFunctions.parseWkb(r.getAs[Array[Byte]]("geom")).get
      assert(g.getCoordinate.x == x && g.getCoordinate.y == y)
    }
  }

  test("geopackage writer spans leaf pages: 200 x 100-char rows round-trip intact") {
    val big = (1 to 200).map(i => (i.toLong, s"r$i-" + "y" * 100, i * 1.0, -i * 1.0))
    val path = tmp("big.gpkg")
    FormatWriters.writeGeoPackage(path, "t", "k", "n", 4326, big)
    val got = GeoPackageReader.read(spark, path).orderBy("k").collect()
    assert(got.length == 200)
    got.zip(big).foreach { case (r, (k, n, x, y)) =>
      assert(r.getLong(0) == k && r.getString(1) == n)
      val g = graft.functions.GeoFunctions.parseWkb(r.getAs[Array[Byte]]("geom")).get
      assert(g.getCoordinate.x == x && g.getCoordinate.y == y)
    }
  }

  test("geopackage writer builds a multi-level interior tree (1 near-full-page row per leaf)") {
    // ~3900-char payloads force one row per leaf -> 300 leaves, which
    // exceeds the interior fan-out and forces TWO interior levels; the
    // real SqliteReader walk is the proof the tree is well-formed
    val rows = (1 to 300).map(i => (i.toLong, f"p$i%03d_" + "z" * 3890, 0.5, 1.5))
    val path = tmp("deep.gpkg")
    FormatWriters.writeGeoPackage(path, "deep", "k", "n", 4326, rows)
    val got = GeoPackageReader.read(spark, path).orderBy("k").collect()
    assert(got.length == 300)
    assert(got.map(_.getLong(0)).toSeq == (1L to 300L))
    assert(got(137).getString(1).startsWith("p138_"))
    assert(got(137).getString(1).length == 3895)
  }

  test("geopackage writer spills oversized records to overflow chains") {
    // 9000- and 20000-char strings exceed the local-payload maximum:
    // 2- and 5-page overflow chains, read back byte-identical
    val rows = Seq(
      (1L, "a" * 9000, 1.0, 2.0),
      (2L, "small", 3.0, 4.0),
      (3L, "b" * 20000, 5.0, 6.0))
    val path = tmp("ovf.gpkg")
    FormatWriters.writeGeoPackage(path, "ovf", "k", "n", 4326, rows)
    val got = GeoPackageReader.read(spark, path).orderBy("k").collect()
    assert(got.map(_.getString(1)) sameElements Array("a" * 9000, "small", "b" * 20000))
    val g = graft.functions.GeoFunctions.parseWkb(got(2).getAs[Array[Byte]]("geom")).get
    assert(g.getCoordinate.x == 5.0 && g.getCoordinate.y == 6.0)
  }

  test("shapefile writer round-trips negative coords and short names") {
    val rows = Seq[(Long, String, Double, Double)](
      (1L, "alpha", -179.5, -89.25), (2L, "beta", 179.5, 89.25))
    val path = tmp("pts.zip")
    FormatWriters.writeShapefileZip(path, "pts", "k", "nm", rows)
    val df = ShapefileReader.read(spark, path)
    val got = df.orderBy("k").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(got.map(_.getString(1)).toSeq == Seq("alpha", "beta"))
    val g0 = graft.functions.GeoFunctions.parseWkb(got(0).getAs[Array[Byte]]("geom")).get
    assert(g0.getCoordinate.x == -179.5 && g0.getCoordinate.y == -89.25)
  }

  test("geojson writer escapes quotes/backslashes; xlsx writer escapes XML") {
    val gj = tmp("esc.geojson")
    FormatWriters.writeGeoJson(gj,
      Seq((1L, "say \"hi\" \\ there", 0.5, 1.5)), "k", "msg")
    val df = GeoJsonReader.read(spark, gj)
    assert(df.collect()(0).getAs[String]("msg") == "say \"hi\" \\ there")

    val xp = tmp("esc.xlsx")
    FormatWriters.writeXlsx(xp, ("k", "txt", "r"),
      Seq((1L, "a<b&c>d", 2L)))
    val xdf = XlsxReader.read(spark, xp)
    assert(xdf.collect()(0).getAs[String]("txt") == "a<b&c>d")
  }

  test("multi-sheet xlsx: name selection resolves through the rels graph") {
    val d = java.nio.file.Files.createTempDirectory("xlsxsheets").toFile
    d.deleteOnExit()
    val p = new java.io.File(d, "multi.xlsx").getPath
    FormatWriters.writeXlsxSheets(p, Seq(
      ("cover", ("a", "b", "c"), Seq((1L, "x", 1L))),
      ("Datos Útiles", ("k", "n", "r"), Seq((10L, "alpha", 2L), (20L, "beta", 3L))),
      ("notes", ("a", "b", "c"), Seq.empty)))
    // default = first sheet in workbook order
    val (h0, r0) = XlsxReader.parse(p)
    assert(h0 == Seq("a", "b", "c") && r0.length == 1)
    // by name (incl. non-ASCII), worksheet parts are ws2.xml not sheet2.xml
    val (h1, r1) = XlsxReader.parse(p, Some("Datos Útiles"))
    assert(h1 == Seq("k", "n", "r"))
    assert(r1.map(_.apply(1).get).toSeq == Seq("alpha", "beta"))
    // empty data sheet still yields its header
    val (h2, r2) = XlsxReader.parse(p, Some("notes"))
    assert(h2 == Seq("a", "b", "c") && r2.isEmpty)
    // unknown name: loud, lists what exists
    val e = intercept[IllegalArgumentException] {
      XlsxReader.parse(p, Some("nope"))
    }
    assert(e.getMessage.contains("cover") && e.getMessage.contains("notes"))
    // explicit name over a rels-less minimal fixture: loud, not silent first-sheet
    val pm = new java.io.File(d, "minimal.xlsx").getPath
    FormatWriters.writeXlsx(pm, ("a", "b", "c"), Seq((1L, "x", 1L)))
    intercept[IllegalArgumentException] {
      XlsxReader.parse(pm, Some("anything"))
    }
  }

}
