package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Distributed DSv2 container writes (`df.write.format("fgb"|"arrow")`)
  * — multi-partition round trips through the connector READ tier, the
  * commit protocol's temp/rename discipline, overwrite truncation, and
  * the plan-level guarantee that the write is a V2 job (executor-side),
  * not a driver collect. */
class ContainerWriteSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"cw-$tag").toFile.getAbsolutePath

  test("arrow: multi-partition write round-trips through format(\"arrow\") read") {
    import s.implicits._
    val dir = tmpDir("arrow-rt")
    val df = (0L until 1000L).toDF("id")
      .withColumn("name", concat(lit("n"), col("id")))
      .withColumn("score", col("id").cast("double") / 7.0)
      .withColumn("vec", array(col("id").cast("float"),
        (col("id") + 1).cast("float")))
      .repartition(4)
    df.write.format("arrow").option("batchRows", "64").mode("append").save(dir)

    val files = new java.io.File(dir).listFiles().filter(_.isFile)
    assert(files.count(_.getName.endsWith(".arrows")) === 4,
      "one container per partition")
    assert(!files.exists(_.getName.endsWith(".inprogress")),
      "no temps survive job commit")

    val back = s.read.format("arrow").load(dir)
    // nullability round-trips through the Arrow field metadata exactly
    assert(back.schema === df.schema)
    assert(back.schema.fieldNames.toSeq === Seq("id", "name", "score", "vec"))
    assert(back.count() === 1000)
    val got = back.orderBy("id").collect()
    assert(got(17).getLong(0) === 17L)
    assert(got(17).getString(1) === "n17")
    assert(got(17).getDouble(2) === 17.0 / 7.0)
    assert(got(17).getSeq[Float](3) === Seq(17.0f, 18.0f))
  }

  test("arrow: empty partitions write no container") {
    import s.implicits._
    val dir = tmpDir("arrow-empty")
    (0L until 3L).toDF("id").repartition(8)
      .write.format("arrow").mode("append").save(dir)
    val n = new java.io.File(dir).listFiles().count(_.getName.endsWith(".arrows"))
    assert(n <= 3 && n >= 1, s"only non-empty partitions land, got $n")
    assert(s.read.format("arrow").load(dir).count() === 3)
  }

  test("arrow: overwrite truncates previous containers, append adds") {
    import s.implicits._
    val dir = tmpDir("arrow-modes")
    (0L until 10L).toDF("id").repartition(2)
      .write.format("arrow").mode("overwrite").save(dir)
    (10L until 20L).toDF("id").repartition(2)
      .write.format("arrow").mode("append").save(dir)
    assert(s.read.format("arrow").load(dir).count() === 20)
    (0L until 5L).toDF("id").repartition(1)
      .write.format("arrow").mode("overwrite").save(dir)
    assert(s.read.format("arrow").load(dir).count() === 5)
  }

  test("fgb: multi-partition write round-trips, geometry + props intact") {
    import s.implicits._
    val dir = tmpDir("fgb-rt")
    val df = (0L until 200L).toDF("k")
      .withColumn("nm", concat(lit("f"), col("k")))
      .withColumn("wkt", concat(lit("POINT ("), col("k") % 50, lit(" "),
        col("k") % 40, lit(")")))
      .repartition(3)
    df.write.format("fgb").option("layer", "pts").mode("append").save(dir)

    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".fgb"))
    assert(files.length === 3)

    val back = s.read.format("fgb").load(dir)
    // fgb read surfaces geometry as WKB `geom` + the property columns
    assert(back.columns.toSet === Set("k", "nm", "geom"))
    assert(back.count() === 200)
    val one = back.filter(col("k") === 123L)
      .select(col("nm"),
        graft.functions.GeoFunctions.stAsTextFromWkb(col("geom")).as("w"))
      .collect()
    assert(one.length === 1)
    assert(one(0).getString(0) === "f123")
    assert(one(0).getString(1) === "POINT (23 3)")
  }

  test("fgb: indexed single-container write serves the bbox read path") {
    import s.implicits._
    val dir = tmpDir("fgb-idx")
    (0L until 300L).toDF("k")
      .withColumn("wkt", concat(lit("POINT ("), col("k") % 100, lit(" "),
        col("k") % 90, lit(")")))
      .repartition(1)
      .write.format("fgb")
      .option("layer", "pts").option("indexNodeSize", "16").mode("append").save(dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".fgb")).head
    val got = FlatGeobuf.readBbox(s, file.getPath, 10.0, 10.0, 20.0, 20.0)
      .count()
    val want = (0L until 300L).count(k =>
      k % 100 >= 10 && k % 100 <= 20 && k % 90 >= 10 && k % 90 <= 20)
    assert(got === want.toLong)
  }

  test("fgb: write without a wkt column fails loudly") {
    import s.implicits._
    val dir = tmpDir("fgb-nowkt")
    val e = intercept[Exception] {
      (0L until 4L).toDF("k").write.format("fgb").mode("append").save(dir)
    }
    assert(e.getMessage != null)
  }

  test("invalid write schemas fail at PLAN time, even over empty data") {
    import s.implicits._
    // sinks open on the first ROW; without driver-side validation an
    // empty frame with a broken schema would commit an empty zone
    // silently and the error would only surface on a later real run
    val dir = tmpDir("fgb-empty-invalid")
    val e = intercept[Exception] {
      (0L until 4L).toDF("k").filter($"k" < 0) // empty, and no wkt column
        .write.format("fgb").mode("append").save(dir)
    }
    assert(e.getMessage.contains("wkt"))
    val e2 = intercept[Exception] {
      (0L until 4L).toDF("k").filter($"k" < 0)
        .write.format("arrow").option("dict", "nope").mode("append").save(dir)
    }
    assert(e2.getMessage.contains("absent columns"))
  }

  test("arrow dict: an all-null dictionary column still writes a readable container") {
    import s.implicits._
    val dir = tmpDir("arrow-dict-null")
    // the dict column has NO non-null value before (or after) the first
    // record batch — the spec still requires a dictionary batch on the
    // wire before any batch referencing the id, else the zone is
    // committed but permanently unreadable
    (0L until 100L).toDF("id")
      .withColumn("cat", lit(null).cast(StringType))
      .repartition(1)
      .write.format("arrow").option("dict", "cat").option("batchRows", "32")
      .mode("overwrite").save(dir)
    val back = s.read.format("arrow").load(dir)
    assert(back.count() == 100)
    assert(back.filter(col("cat").isNull).count() == 100)
    // mixed case: nulls for the whole FIRST batch, values later
    val dir2 = tmpDir("arrow-dict-latenull")
    (0L until 100L).toDF("id")
      .withColumn("cat", when($"id" >= 64, concat(lit("c"), $"id" % 3)))
      .repartition(1).sortWithinPartitions("id")
      .write.format("arrow").option("dict", "cat").option("batchRows", "32")
      .mode("overwrite").save(dir2)
    val back2 = s.read.format("arrow").load(dir2)
    assert(back2.filter(col("cat").isNotNull).count() == 36)
  }

  test("gpkg: multi-partition write round-trips through format(\"gpkg\") read") {
    import s.implicits._
    val dir = tmpDir("gpkg-rt")
    (0L until 120L).toDF("k")
      .withColumn("nm", concat(lit("g"), col("k")))
      .withColumn("score", col("k").cast("double") / 3.0)
      .withColumn("wkt", concat(lit("POINT ("), col("k") % 20, lit(" "),
        col("k") % 15, lit(")")))
      .repartition(2)
      .write.format("gpkg").option("table", "pts").mode("append").save(dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".gpkg")) === 2)
    val back = s.read.format("gpkg").load(dir)
    assert(back.count() === 120)
    val one = back.filter(col("k") === 77L).collect()
    assert(one.length === 1)
    val r = one(0)
    assert(r.getAs[String]("nm") === "g77")
    assert(r.getAs[Double]("score") === 77.0 / 3.0)
    val wkb = r.getAs[Array[Byte]](back.columns.indexOf("geom"))
    val g = new org.locationtech.jts.io.WKBReader().read(wkb)
    assert(g.toText === "POINT (17 2)")
  }

  test("gpkg: attributes-only write (no wkt column) lands a plain table") {
    import s.implicits._
    val dir = tmpDir("gpkg-attr")
    (0L until 10L).toDF("k")
      .withColumn("nm", concat(lit("a"), col("k")))
      .repartition(1)
      .write.format("gpkg").option("table", "t").mode("append").save(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".gpkg")).head
    // readable through the raw sqlite walk: no geometry column declared
    val db = new SqliteReader(f.getPath)
    val (cols, rows) = db.readTable("t")
    assert(cols.map(_.toLowerCase) === Seq("k", "nm"))
    assert(rows.length === 10)
  }

  test("streaming write: fgb zone stream -> arrow container sink, exactly-once names") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val root = tmpDir("stream-w")
    val zone = s"$root/zone"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    new java.io.File(zone).mkdirs()
    val props = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("nm", StringType, nullable = true)))
    // 3 containers land in the zone; the stream drains them micro-batch-wise
    (0 until 3).foreach { part =>
      FlatGeobuf.write(s"$zone/part$part.fgb", "t", props,
        (0L until 10L).map(i => (org.apache.spark.sql.Row(part * 10 + i, s"v${part * 10 + i}"),
          (i.toDouble, i.toDouble))))
    }
    val schema = s.read.format("fgb").load(s"$zone/part0.fgb").schema
    val q = s.readStream.format("fgb").schema(schema).load(zone)
      .select(col("k"), col("nm")) // drop geom: exercise pruned streaming write
      .writeStream.format("arrow")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream drain timed out")
    val files = new java.io.File(out).listFiles().filter(_.isFile)
    assert(files.forall(f => !f.getName.endsWith(".inprogress")))
    // epoch padded to full Long width: lexicographic order must match
    // commit order past epoch 99999 (the name-anchored reader's
    // monotonicity contract)
    assert(files.forall(_.getName.matches("part-\\d{19}-\\d{5}\\.arrows")),
      s"epoch-deterministic names, got ${files.map(_.getName).mkString(",")}")
    val back = s.read.format("arrow").load(out)
    assert(back.count() === 30)
    assert(back.orderBy("k").collect().map(_.getLong(0)).toSeq === (0L until 30L))
  }

  test("AvailableNow + maxFilesPerBatch drains in admission-sized epochs") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val root = tmpDir("stream-adm")
    val zone = s"$root/zone"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    new java.io.File(zone).mkdirs()
    val props = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("nm", StringType, nullable = true)))
    (0 until 5).foreach { part =>
      FlatGeobuf.write(s"$zone/part$part.fgb", "t", props,
        (0L until 4L).map(i => (org.apache.spark.sql.Row(part * 4 + i, s"v$i"),
          (i.toDouble, i.toDouble))))
    }
    val schema = s.read.format("fgb").load(s"$zone/part0.fgb").schema
    val q = s.readStream.format("fgb").schema(schema)
      .option("maxFilesPerBatch", "2").load(zone)
      .select(col("k"), col("nm"))
      .writeStream.format("arrow")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "admission-controlled drain timed out")
    // 5 containers at 2 per epoch = 3 epochs; epoch id is the first
    // number in the sink's deterministic part-<epoch>-<partition> names
    val epochs = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".arrows"))
      .map(_.getName.split("-")(1)).distinct
    assert(epochs.length === 3, s"expected 3 epochs, got ${epochs.toSeq}")
    assert(s.read.format("arrow").load(out).count() === 20)
  }

  test("arrow dict option: values ship once, deltas mid-stream, smaller wire") {
    import s.implicits._
    val dirD = tmpDir("arrow-dict")
    val dirP = tmpDir("arrow-plain")
    // low-cardinality category that GROWS over the batch sequence:
    // batchRows=64 over ordered ids means category c9 first appears
    // mid-container -> a delta dictionary batch on the wire
    def df = (0L until 1000L).toDF("id")
      .withColumn("cat", concat(lit("category-name-"), (col("id") / 100).cast("long")))
      .withColumn("payload", col("id") * 7)
      .repartition(1).sortWithinPartitions("id")
    df.write.format("arrow").option("dict", "cat").option("batchRows", "64")
      .mode("overwrite").save(dirD)
    df.write.format("arrow").option("batchRows", "64")
      .mode("overwrite").save(dirP)
    def only(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".arrows")).head
    val (db, pb) = (only(dirD).length(), only(dirP).length())
    assert(db < pb, s"dict container ($db B) not smaller than plain ($pb B)")
    // decodes back identically through the connector (delta replay)
    val back = s.read.format("arrow").load(dirD)
    assert(back.schema.fieldNames.toSeq === Seq("id", "cat", "payload"))
    assert(back.count() === 1000)
    val got = back.orderBy("id").collect()
    assert(got(950).getString(1) === "category-name-9")
    assert(got(0).getString(1) === "category-name-0")
    assert(got(123).getLong(2) === 123L * 7)
    // nulls in a dict column survive
    val dirN = tmpDir("arrow-dictnull")
    (0L until 10L).toDF("id")
      .withColumn("cat", when(col("id") % 3 === 0, lit(null).cast("string"))
        .otherwise(lit("x")))
      .repartition(1)
      .write.format("arrow").option("dict", "cat").mode("overwrite").save(dirN)
    val backN = s.read.format("arrow").load(dirN).orderBy("id").collect()
    assert(backN(0).isNullAt(1) && backN(1).getString(1) === "x")
    // misuse fails loudly
    intercept[Exception] {
      (0L until 4L).toDF("id").write.format("arrow")
        .option("dict", "id").mode("overwrite").save(tmpDir("arrow-dictbad"))
    }
  }

  test("shpzip: point write round-trips through format(\"shpzip\") read") {
    import s.implicits._
    val dir = tmpDir("shp-rt")
    (0L until 60L).toDF("nkey")
      .withColumn("nname", concat(lit("s"), col("nkey")))
      .withColumn("wkt", concat(lit("POINT ("), col("nkey") % 12, lit(" "),
        col("nkey") % 7, lit(")")))
      .repartition(2)
      .write.format("shpzip").option("basename", "pts").mode("append").save(dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".zip")) === 2)
    val back = s.read.format("shpzip").load(dir)
    assert(back.count() === 60)
    val r = back.filter(col("nkey") === 25L).collect()(0)
    assert(r.getAs[String]("nname") === "s25")
    // non-point geometry refuses loudly
    intercept[Exception] {
      (0L until 2L).toDF("k").withColumn("nm", lit("x"))
        .withColumn("wkt", lit("LINESTRING (0 0, 1 1)"))
        .write.format("shpzip").mode("append").save(tmpDir("shp-bad"))
    }
  }

  test("write plan is a V2 batch job, not a driver collect") {
    import s.implicits._
    // the observable contract: the logical plan Spark runs for save() is
    // AppendData/OverwriteByExpression over our ContainerTable — rows
    // flow through DataWriterFactory tasks. Verify by listening for the
    // executed plan's node name.
    val dir = tmpDir("arrow-plan")
    var planSeen: String = null
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        if (qe.executedPlan.toString.contains("ContainerBatchWrite") ||
            qe.optimizedPlan.toString.contains("ContainerTable") ||
            qe.executedPlan.nodeName.contains("AppendData") ||
            qe.executedPlan.nodeName.contains("Overwrite"))
          planSeen = qe.executedPlan.nodeName
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    try {
      (0L until 10L).toDF("id").repartition(2)
        .write.format("arrow").mode("append").save(dir)
      // listener delivery is async — bounded wait
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (planSeen == null && System.nanoTime() < deadline) Thread.sleep(50)
      assert(planSeen != null, "expected a V2 write node in the executed plan")
    } finally s.listenerManager.unregister(listener)
  }
}
