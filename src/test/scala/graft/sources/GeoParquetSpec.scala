package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** GeoParquet contract beyond the oracle's row check: the footer
  * metadata round-trip, the spec's loud-failure edges, the CRS default,
  * and the architectural claim that the data path stays Spark's own
  * parquet source (pruning + pushdown reach the scan).
  */
class GeoParquetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("geoparquet_spec")
    d.toFile.deleteOnExit()
    d.resolve(name).toString
  }

  private val rows = Seq((1L, "a", 1.5, 2.5), (2L, "b", -3.0, 4.0))

  test("write/read round-trips rows, geometry tag, and CRS") {
    val p = tmp("pts.parquet")
    GeoParquet.write(p, rows, 27700)
    val df = GeoParquet.read(spark, p)
    val f = df.schema("geometry")
    assert(f.metadata.getBoolean(SchemaHeuristics.GeometryTag))
    assert(f.metadata.getString(GeoParquet.CrsTag) == "EPSG:27700")
    val got = df.select(col("nkey"),
        graft.functions.GeoFunctions.stAsTextFromWkb(col("geometry")).as("w"))
      .orderBy("nkey").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "POINT (1.5 2.5)"), (2L, "POINT (-3 4)")))
  }

  test("plain parquet without geo metadata fails loudly") {
    val p = tmp("plain.parquet")
    import spark.implicits._
    Seq((1L, "x")).toDF("nkey", "nname").coalesce(1).write.parquet(p)
    val file = new java.io.File(p).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getPath
    val e = intercept[IllegalArgumentException](GeoParquet.read(spark, file))
    assert(e.getMessage.contains("geo"))
  }

  test("missing crs defaults to EPSG:4326 (spec: OGC:CRS84)") {
    // hand-build a footer whose geometry column omits crs entirely
    val p = tmp("nocrs.parquet")
    val conf = new org.apache.hadoop.conf.Configuration()
    val schema = org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      "message g { required int64 nkey; required binary geometry; }")
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(p))
      .withConf(conf).withType(schema)
      .withExtraMetaData(java.util.Collections.singletonMap("geo",
        """{"version":"1.0.0","primary_column":"geometry",
           |"columns":{"geometry":{"encoding":"WKB"}}}""".stripMargin
          .replace("\n", "")))
      .build()
    val g = new org.apache.parquet.example.data.simple.SimpleGroup(schema)
    g.add("nkey", 1L)
    g.add("geometry", org.apache.parquet.io.api.Binary.fromConstantByteArray(
      Array[Byte](1, 1, 0, 0, 0) ++ new Array[Byte](16)))
    w.write(g); w.close()
    val df = GeoParquet.read(spark, p)
    assert(df.schema("geometry").metadata.getString(GeoParquet.CrsTag) == "EPSG:4326")
  }

  test("non-WKB encoding is rejected") {
    val p = tmp("arrow.parquet")
    val conf = new org.apache.hadoop.conf.Configuration()
    val schema = org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      "message g { required int64 nkey; required binary geometry; }")
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(p))
      .withConf(conf).withType(schema)
      .withExtraMetaData(java.util.Collections.singletonMap("geo",
        """{"version":"1.0.0","primary_column":"geometry",
           |"columns":{"geometry":{"encoding":"point"}}}""".stripMargin
          .replace("\n", "")))
      .build()
    val g = new org.apache.parquet.example.data.simple.SimpleGroup(schema)
    g.add("nkey", 1L)
    g.add("geometry", org.apache.parquet.io.api.Binary.fromConstantByteArray(
      new Array[Byte](21)))
    w.write(g); w.close()
    val e = intercept[IllegalArgumentException](GeoParquet.read(spark, p))
    assert(e.getMessage.contains("encoding"))
  }

  test("data path is Spark's parquet source: pruning and pushdown reach the scan") {
    val p = tmp("pushdown.parquet")
    GeoParquet.write(p, rows, 4326)
    val plan = GeoParquet.read(spark, p)
      .filter(col("nkey") === 2L).select("nname")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("nkey"), plan)
    assert(!plan.contains("geometry"), s"geometry not pruned:\n$plan")
  }
}
