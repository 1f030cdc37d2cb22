package graft.sources

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** FlatGeobuf + Arrow promoted to the ContainerSource DSv2 tier: the
  * same pruning / pushed-filter / per-container-partition / streaming
  * claims GpkgSourceSpec proves for gpkg, over the other two container
  * formats — one connector story for all four. Row parity against the
  * driver-side readers; oracles (scan_fgb_dsv2 / scan_arrow_dsv2) vouch
  * for the values.
  */
class FgbArrowSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val fgbProps = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("name", StringType, nullable = true)))

  private def fgbZone(dirName: String, n: Int): Seq[String] = {
    val dir = Files.createTempDirectory(dirName)
    dir.toFile.deleteOnExit()
    (1 to n).map { i =>
      val p = dir.resolve(s"part$i.fgb").toString
      FlatGeobuf.write(p, "pts", fgbProps,
        (1L to 5L).map(j => (Row(i * 100L + j, s"f$i-$j"),
          (j * 1.0, -j * 1.0))))
      p
    }
  }

  private val arrowSchema = StructType(Seq(
    StructField("vec_id", LongType, nullable = true),
    StructField("emb", ArrayType(FloatType, containsNull = true), nullable = true),
    StructField("ts", TimestampType, nullable = true)))

  private def arrowZone(dirName: String, n: Int): Seq[String] = {
    val dir = Files.createTempDirectory(dirName)
    dir.toFile.deleteOnExit()
    (1 to n).map { i =>
      val p = dir.resolve(s"part$i.arrows").toString
      ArrowIpc.write(p, (1L to 4L).map(j => Row(i * 10L + j,
        Seq(j.toFloat, -j.toFloat),
        java.time.Instant.ofEpochSecond(i * 1000L + j))), arrowSchema)
      p
    }
  }

  test("fgb connector: one partition per container, rows match the driver reader") {
    val paths = fgbZone("graft-fgb-dsv2", 3)
    val dsv2 = spark.read.format("fgb").load(paths: _*)
    assert(dsv2.rdd.getNumPartitions == 3)
    val got = dsv2.orderBy("k").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    })
    val driver = paths.map(FlatGeobuf.read(spark, _)).reduce(_.unionAll(_))
      .orderBy("k").collect().map(_.toSeq.map {
        case b: Array[Byte] => b.toSeq; case x => x
      })
    assert(got.toSeq == driver.toSeq && got.length == 15)
  }

  test("fgb connector: pruning and filters reach the scan") {
    val paths = fgbZone("graft-fgb-push", 2)
    val df = spark.read.format("fgb").load(paths: _*)
      .filter(col("k") > 103L).select("k")
    assert(df.collect().map(_.getLong(0)).toSet ==
      Set(104L, 105L, 201L, 202L, 203L, 204L, 205L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=[k]"), s"no pruning:\n$plan")
    assert(plan.contains("GreaterThan(k,103"), s"filter not pushed:\n$plan")
  }

  test("arrow connector: list<float32> and timestamps cross the InternalRow boundary") {
    val paths = arrowZone("graft-arrow-dsv2", 2)
    val df = spark.read.format("arrow").load(paths: _*)
    assert(df.rdd.getNumPartitions == 2)
    val got = df.orderBy("vec_id").collect()
    assert(got.length == 8)
    assert(got(0).getLong(0) == 11L)
    assert(got(0).getSeq[Float](1) == Seq(1.0f, -1.0f))
    assert(got(0).getTimestamp(2).toInstant ==
      java.time.Instant.ofEpochSecond(1001L))
    // parity with the driver-side reader
    val driver = paths.map(ArrowIpc.read(spark, _)).reduce(_.unionAll(_))
      .orderBy("vec_id").collect()
    assert(got.map(_.toSeq.map {
      case s: Seq[_] => s.toList; case x => x
    }).toSeq == driver.map(_.toSeq.map {
      case s: Seq[_] => s.toList; case x => x
    }).toSeq)
  }

  test("arrow connector: pushed filter evaluates on external values pre-conversion") {
    val paths = arrowZone("graft-arrow-push", 2)
    val df = spark.read.format("arrow").load(paths: _*)
      .filter(col("vec_id") >= 21L).select("vec_id")
    assert(df.collect().map(_.getLong(0)).toSet == Set(21L, 22L, 23L, 24L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(vec_id,21"), s"not pushed:\n$plan")
  }

  test("fgb landing-zone stream drains new containers exactly once across a restart") {
    val zone = Files.createTempDirectory("graft-fgb-zone")
    zone.toFile.deleteOnExit()
    def land(name: String, base: Long): Unit =
      FlatGeobuf.write(zone.resolve(name).toString, "pts", fgbProps,
        (1L to 3L).map(j => (Row(base + j, s"$name-$j"), (j * 1.0, j * 1.0))))
    land("a01.fgb", 100)
    land("a02.fgb", 200)
    val schema = spark.read.format("fgb")
      .load(zone.resolve("a01.fgb").toString).schema
    val out = Files.createTempDirectory("graft-fgb-zone-out").toString
    val ckpt = Files.createTempDirectory("graft-fgb-zone-ckpt").toString
    def drain(): Unit = {
      val q = spark.readStream.format("fgb").schema(schema)
        .load(zone.toString)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000): Unit
    }
    drain()
    assert(spark.read.parquet(out).select("k").collect()
      .map(_.getLong(0)).toSet == Set(101L, 102L, 103L, 201L, 202L, 203L))
    land("b01.fgb", 300)
    drain()
    val all = spark.read.parquet(out).select("k").collect().map(_.getLong(0))
    assert(all.length == 9, s"exactly-once violated: ${all.length} rows")
    assert(all.toSet == Set(101L, 102L, 103L, 201L, 202L, 203L, 301L, 302L, 303L))
  }

  test("fgb bbox option prunes through the connector (indexed + plain)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("fgbbbox").toFile
    dir.deleteOnExit()
    // one indexed, one index-free container in the same zone — the
    // option must serve both (tree walk vs decode-all + filter)
    def df(lo: Long, hi: Long) = (lo until hi).toDF("k")
      .withColumn("wkt", concat(lit("POINT ("), col("k") % 50, lit(" "),
        col("k") % 40, lit(")")))
    df(0, 200).repartition(1).write.format("fgb")
      .option("layer", "a").option("indexNodeSize", "8")
      .mode("append").save(dir.getPath)
    df(200, 300).repartition(1).write.format("fgb")
      .option("layer", "b").mode("append").save(dir.getPath)
    val got = spark.read.format("fgb").option("bbox", "10,10,20,20")
      .load(dir.getPath)
      .select(col("k")).as[Long].collect().sorted
    val want = (0L until 300L)
      .filter(k => k % 50 >= 10 && k % 50 <= 20 && k % 40 >= 10 && k % 40 <= 20)
    assert(got.toSeq == want)
    // malformed bbox is loud
    val e = intercept[Exception] {
      spark.read.format("fgb").option("bbox", "1,2,3").load(dir.getPath).count()
    }
    assert(e.getMessage.contains("bbox"))
  }


  test("xlsx connector: zone of workbooks, sheet option, mixed generations") {
    val dir = java.nio.file.Files.createTempDirectory("xlsxzone").toFile
    dir.deleteOnExit()
    val hdr = ("k", "nm", "r")
    FormatWriters.writeXlsx(new java.io.File(dir, "a.xlsx").getPath, hdr,
      Seq((1L, "one", 10L), (2L, "two", 20L)))
    FormatWriters.writeXlsx(new java.io.File(dir, "b.xlsx").getPath, hdr,
      Seq((3L, "three", 30L)))
    val zone = spark.read.format("xlsx").load(dir.getPath)
    assert(zone.count() === 3)
    assert(zone.columns.toSeq === Seq("k", "nm", "r"))
    assert(zone.orderBy("k").collect().map(_.getString(1)).toSeq ===
      Seq("one", "two", "three"))
    // sheet option through the connector (rels-graph workbook)
    val multi = new java.io.File(dir, "m.xlsx").getPath
    FormatWriters.writeXlsxSheets(multi, Seq(
      ("cover", hdr, Seq((9L, "decoy", 9L))),
      ("data", hdr, Seq((7L, "seven", 70L)))))
    val bySheet = spark.read.format("xlsx").option("sheet", "data").load(multi)
    assert(bySheet.collect().map(_.getString(1)).toSeq === Seq("seven"))
    // pushed limit + pruning still apply (shared scaffold)
    val pruned = spark.read.format("xlsx").load(dir.getPath).select("nm").limit(2)
    assert(pruned.collect().length === 2)
  }

  test("xlsx sheet option drives SCHEMA INFERENCE, not just the scan") {
    // the motivating case: a cover sheet whose header DIFFERS from the
    // data sheet — an options-blind inferSchema would serve the cover's
    // columns and every batch would fail (or silently coerce)
    val dir = java.nio.file.Files.createTempDirectory("xlsxcover").toFile
    dir.deleteOnExit()
    val wb = new java.io.File(dir, "c.xlsx").getPath
    FormatWriters.writeXlsxSheets(wb, Seq(
      ("readme", ("title", "author", "rev"), Seq((0L, "cover page", 1L))),
      ("data", ("k", "nm", "r"), Seq((7L, "seven", 70L), (8L, "eight", 80L)))))
    val df = spark.read.format("xlsx").option("sheet", "data").load(wb)
    assert(df.columns.toSeq === Seq("k", "nm", "r"))
    assert(df.orderBy("k").collect().map(_.getString(1)).toSeq ===
      Seq("seven", "eight"))
  }


  test("schema-drifted zone workbook fails loudly instead of corrupting rows") {
    val dir = java.nio.file.Files.createTempDirectory("xlsxdrift").toFile
    dir.deleteOnExit()
    val hdr = ("k", "nm", "r")
    FormatWriters.writeXlsx(new java.io.File(dir, "a.xlsx").getPath, hdr,
      Seq((1L, "one", 10L)))
    // same header, but k's cells are non-numeric in this workbook ->
    // per-file inference yields string where the zone schema says long
    FormatWriters.writeXlsx(new java.io.File(dir, "b.xlsx").getPath,
      ("k2", "nm", "r"), Seq((2L, "two", 20L)))
    // rename-based drift: craft via a two-sheet trick is overkill; use
    // the real drift shape: a workbook whose k column is text
    val drifted = new java.io.File(dir, "c.xlsx").getPath
    FormatWriters.writeXlsxSheets(drifted, Seq(
      ("s", ("k", "nm", "r"), Seq.empty)))
    // empty data sheet infers string for all columns -> type drift on k/r
    val e = intercept[Exception] {
      spark.read.format("xlsx").load(dir.getPath)
        .select("k", "nm", "r").collect()
    }
    // either the missing-column or the drifted-type error — both loud,
    // both name the offending container
    assert(e.getMessage.contains(".xlsx"))
  }

}
