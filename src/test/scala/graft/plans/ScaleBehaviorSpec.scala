package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executable evidence for the 100 TB design claims (SURVEY.md §2/§8):
  * bucketing eliminates the join shuffle, AQE handles skew, and broadcast
  * hints remove the dimension-side exchange. These run tiny but assert on
  * PLAN SHAPE, which is scale-invariant. */
class ScaleBehaviorSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("bucketed co-located join plans with zero Exchange") {
    // stale managed-table locations from prior runs
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    for (d <- Seq("li_bucketed", "o_bucketed")) {
      val f = new java.io.File(s"spark-warehouse/$d")
      if (f.exists()) { def rm(x: java.io.File): Unit = { if (x.isDirectory) x.listFiles.foreach(rm); x.delete(): Unit }; rm(f) }
    }
    val li = graft.Tables(spark, dir, "lineitem")
    val o = graft.Tables(spark, dir, "orders")
    // Pre-bucket both fact tables on the join key: at 100 TB this is the
    // one-off cost that makes every later fact-fact join shuffle-free.
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    // disable auto-broadcast: at 100 TB neither fact side broadcasts, and
    // the point is that bucketing makes the SORT-MERGE join exchange-free
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    try joined.collect()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle: the only Exchange allowed is the
    // one feeding the final single-key aggregation
    assert(plan.contains("SortMergeJoin"), plan)
    val exchanges = "Exchange hashpartitioning\\(([a-z_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(!exchanges.exists(_.contains("orderkey")),
      s"join keys were shuffled: $exchanges\n$plan")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
  }

  test("AQE skew-join config is active and salting fallback computes correctly") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    // Manual salting — the pre-AQE fallback for pathological keys: salt the
    // hot side, replicate the small side across salts, join, unsalt.
    val salts = 4
    val hot = spark.range(1000).select(lit(1L).as("k"), col("id").as("v"))
      .withColumn("salt", (rand(7) * salts).cast("int"))
    val dim = spark.range(2).select(col("id").as("k"), (col("id") * 100).as("w"))
      .crossJoin(spark.range(salts).select(col("id").cast("int").as("salt")))
    val joined = hot.join(dim, Seq("k", "salt")).groupBy("k").agg(count(lit(1)).as("n"))
    val n = joined.collect()
    assert(n.length == 1 && n(0).getAs[Long]("n") == 1000)
  }

  test("broadcast hint eliminates the dimension-side shuffle") {
    val li = graft.Tables(spark, dir, "lineitem")
    val nation = graft.Tables(spark, dir, "nation")
    val joined = li.join(broadcast(nation), col("l_suppkey") % 25 === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("runtime bloom filter prunes the probe side of a selective fact-fact join") {
    // at 100 TB: a selective dimension-side predicate turns into a bloom
    // filter evaluated inside the fact scan, killing most probe rows
    // before the shuffle — Spark's row-level runtime filtering
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val olds = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.Tables(spark, dir, "lineitem")
      val o = graft.Tables(spark, dir, "orders")
        .filter(col("o_totalprice") > 400000)
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloom"), s"no runtime bloom filter in:\n$plan")
    } finally olds.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("hive-partitioned sink output prunes partitions at the file listing") {
    // the sink_partitioned layout claim: a per-source read over the
    // partitioned output must carry the predicate as a PartitionFilter
    // (pruned before any scan task), not a post-scan row filter
    // fresh per-run dir (like the binaryFile census below): a reused
    // fixed path could silently include a previous run's stale files
    val out = java.nio.file.Files.createTempDirectory("graft_scale_sinkpart").toString
    graft.Tables(spark, dir, "documents")
      .write.mode("overwrite").partitionBy("source").parquet(out)
    val df = spark.read.parquet(out).filter(col("source") === "src1")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*src1".r.findFirstIn(plan).isDefined,
      s"source predicate did not become a partition filter:\n$plan")
  }

  test("decontamination joins the corpus against a BROADCAST eval gram set") {
    // the text_decontaminate scale claim: the benchmark side broadcasts
    // (eval suites are constant-size in practice), so the corpus side
    // never shuffles its grams — only matched rows reach the aggregation
    val q = graft.Registry.byName("text_decontaminate")
    val df = q.run(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"corpus grams were shuffle-joined:\n$plan")
  }

  test("filter and projection push into the parquet scan") {
    val df = graft.Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") > 49)
      .select("l_orderkey", "l_quantity")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,49.0)]"), plan)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), plan)
  }

  test("binaryFile metadata census prunes the content column at the scan") {
    // the scan_binaryfile scale claim: a (path, length) census over a
    // 100 TB blob store must never read the bytes — the content column
    // has to be pruned OUT of the scan schema, not dropped afterwards
    // per-process temp dir: a fixed shared path would silently include
    // stale or foreign files from another run in the scan
    val d = java.nio.file.Files.createTempDirectory("graft_scale_bf").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "a.bin"),
      Array.fill[Byte](4096)(7))
    val df = spark.read.format("binaryFile").load(d).select("path", "length")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("content"),
      s"metadata projection still reads blob bytes:\n$plan")
  }
}
