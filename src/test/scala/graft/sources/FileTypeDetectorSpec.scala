package graft.sources

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's 8 detection tests (tests/duckdb_tests.rs:10-127)
  * — same crafted byte fixtures — plus property tests for total-function
  * robustness the reference lacks (seeded random, no scalatestplus bridge
  * in the offline cache). */
class FileTypeDetectorSpec extends AnyFunSuite {

  private def tempWith(suffix: String, bytes: Array[Byte]): Path = {
    val p = Files.createTempFile("graft-detect", suffix)
    p.toFile.deleteOnExit()
    Files.write(p, bytes)
    p
  }

  private def detect(p: Path): FileType =
    FileTypeDetector.detect(p.toString).fold(e => fail(e), identity)

  test("geojson detection") { // duckdb_tests.rs:10-25
    val body =
      """{
        |  "type": "FeatureCollection",
        |  "features": [{
        |    "type": "Feature",
        |    "geometry": { "type": "Point", "coordinates": [-0.1, 51.5] },
        |    "properties": { "name": "Test" }
        |  }]
        |}""".stripMargin
    assert(detect(tempWith(".json", body.getBytes("UTF-8"))) == FileType.Geojson)
  }

  test("csv detection by extension") { // duckdb_tests.rs:28-37
    val body = "id,name,value\n1,test,100\n"
    assert(detect(tempWith(".csv", body.getBytes("UTF-8"))) == FileType.Csv)
  }

  test("geopackage detection (sqlite header)") { // duckdb_tests.rs:40-52
    val bytes = "SQLite format 3".getBytes("US-ASCII") ++ Array[Byte](0) ++ Array.fill[Byte](100)(0)
    assert(detect(tempWith(".gpkg", bytes)) == FileType.Geopackage)
  }

  test("excel xlsx detection (pkzip + xl/worksheets)") { // duckdb_tests.rs:55-68
    val bytes = Array[Byte](0x50, 0x4B, 0x03, 0x04) ++
      "xl/worksheets".getBytes("US-ASCII") ++ Array.fill[Byte](100)(0)
    assert(detect(tempWith(".xlsx", bytes)) == FileType.Excel)
  }

  test("excel xls detection (CFBF header)") { // duckdb_tests.rs:71-83
    val bytes = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte) ++
      Array.fill[Byte](100)(0)
    assert(detect(tempWith(".xls", bytes)) == FileType.Excel)
  }

  test("shapefile detection (pkzip + .shp + .dbf)") { // duckdb_tests.rs:86-101
    val bytes = Array[Byte](0x50, 0x4B, 0x03, 0x04) ++
      "test.shp".getBytes("US-ASCII") ++ Array.fill[Byte](50)(0) ++
      "test.dbf".getBytes("US-ASCII") ++ Array.fill[Byte](100)(0)
    assert(detect(tempWith(".zip", bytes)) == FileType.Shapefile)
  }

  test("parquet detection (PAR1)") { // duckdb_tests.rs:104-116
    val bytes = "PAR1".getBytes("US-ASCII") ++ Array.fill[Byte](100)(0)
    assert(detect(tempWith(".parquet", bytes)) == FileType.Parquet)
  }

  test("file type display names") { // duckdb_tests.rs:119-127
    assert(FileType.Geopackage.displayName == "Geopackage")
    assert(FileType.Shapefile.displayName == "Shapefile")
    assert(FileType.Geojson.displayName == "GeoJSON")
    assert(FileType.Excel.displayName == "Excel")
    assert(FileType.Csv.displayName == "CSV")
    assert(FileType.Parquet.displayName == "Parquet")
  }

  test("pkzip matching BOTH excel and shapefile patterns is rejected") {
    // core_processor.rs:357-360 — ambiguous container → None → falls through
    val bytes = Array[Byte](0x50, 0x4B, 0x03, 0x04) ++
      "xl/worksheets and test.shp".getBytes("US-ASCII")
    assert(FileTypeDetector.matchMagicNumbers(bytes).isEmpty)
  }

  test("magic-number match never throws on arbitrary bytes") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val bytes = Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt.toByte)
      FileTypeDetector.matchMagicNumbers(bytes) // must be total
      FileTypeDetector.detectGeoJson(bytes)
    }
  }

  test("cleanTableName strips last extension and trims") {
    assert(FileTypeDetector.cleanTableName("cities.parquet") == "cities")
    assert(FileTypeDetector.cleanTableName("a.b.c") == "a.b")
    assert(FileTypeDetector.cleanTableName("  plain  ") == "plain")
    assert(FileTypeDetector.cleanTableName("noext") == "noext")
  }

  test("cleanTableName is idempotent on extensionless names") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val s = rnd.alphanumeric.take(rnd.nextInt(20)).mkString
      val once = FileTypeDetector.cleanTableName(s)
      assert(FileTypeDetector.cleanTableName(once) == once)
    }
  }

  test("findShapefilePath locates .shp member in a real zip") {
    val p = Files.createTempFile("graft-shape", ".zip")
    p.toFile.deleteOnExit()
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(p))
    for (name <- Seq("layers/test.dbf", "layers/test.shp", "layers/test.prj")) {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(Array.fill[Byte](10)(1)); zos.closeEntry()
    }
    zos.close()
    assert(FileTypeDetector.findShapefilePath(p.toString) == Right("layers/test.shp"))
  }
}
