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

  test("geopackage writer rejects tables that exceed one page instead of corrupting") {
    val big = (1 to 200).map(i => (i.toLong, "y" * 100, 0.0, 0.0))
    val e = intercept[IllegalArgumentException] {
      FormatWriters.writeGeoPackage(tmp("big.gpkg"), "t", "k", "n", 4326, big)
    }
    assert(e.getMessage.contains("overflow"))
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
}
