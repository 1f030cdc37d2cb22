package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Row-level change data feed: exact COW images for delete/update/merge,
  * derived inserts for appends, derived delete+insert for overwrite and
  * restore, nothing for compaction; the connector read option mirrors
  * Delta's readChangeFeed shape. */
class ChangeFeedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graftcdf_$name").toString

  private def types(t: String, from: Long, to: Long): Map[String, Long] =
    TxLog.changeFeed(spark, t, from, to)
      .groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("append commits feed their rows as inserts with commit metadata") {
    val t = freshTable("appends")
    TxLog.append((0 until 10).toDF("k").withColumn("tag", lit("a")), t)
    TxLog.append((10 until 15).toDF("k").withColumn("tag", lit("b")), t)
    val feed = TxLog.changeFeed(spark, t, 0, 2)
    assert(feed.columns.toSeq ==
      Seq("k", "tag", "_change_type", "_commit_version", "_commit_timestamp"))
    assert(feed.count() == 15)
    assert(feed.filter($"_change_type" =!= "insert").isEmpty)
    assert(feed.filter($"_commit_version" === 2).select("k").as[Int]
      .collect().toSet == (10 until 15).toSet)
    assert(feed.filter($"_commit_timestamp".isNull).isEmpty)
    // half-open resume: (1, 2] sees only the second commit
    assert(TxLog.changeFeed(spark, t, 1, 2).count() == 5)
  }

  test("DELETE feeds exactly the deleted rows, never the rewritten survivors") {
    val t = freshTable("delete")
    TxLog.append((0 until 100).toDF("k").withColumn("tag", lit("x"))
      .repartitionByRange(4, $"k").sortWithinPartitions("k"), t)
    TxLog.delete(spark, t, $"k" >= 30 && $"k" <= 34)
    val feed = TxLog.changeFeed(spark, t, 1, 2)
    assert(feed.count() == 5, "only the 5 deleted rows feed — the ~20 " +
      "survivors of the rewritten file must NOT appear")
    assert(feed.select("_change_type").distinct().as[String].collect().toSeq ==
      Seq("delete"))
    assert(feed.select("k").as[Int].collect().toSet == (30 to 34).toSet)
  }

  test("UPDATE feeds exact pre/post image pairs") {
    val t = freshTable("update")
    TxLog.append((0 until 100).toDF("k").withColumn("tag", lit("old"))
      .repartitionByRange(4, $"k").sortWithinPartitions("k"), t)
    TxLog.update(spark, t, $"k" === 42, Seq("tag" -> lit("new")))
    val feed = TxLog.changeFeed(spark, t, 1, 2)
    assert(types(t, 1, 2) == Map("update_preimage" -> 1L, "update_postimage" -> 1L))
    val pre = feed.filter($"_change_type" === "update_preimage").head()
    val post = feed.filter($"_change_type" === "update_postimage").head()
    assert(pre.getAs[String]("tag") == "old" && post.getAs[String]("tag") == "new")
    assert(pre.getAs[Int]("k") == 42 && post.getAs[Int]("k") == 42)
  }

  test("MERGE feeds update pairs for matched keys and inserts for new keys") {
    val t = freshTable("merge")
    TxLog.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "tag"), t)
    TxLog.merge(spark, t,
      Seq((2, "B"), (9, "I")).toDF("k", "tag"), "k")
    assert(types(t, 1, 2) ==
      Map("update_preimage" -> 1L, "update_postimage" -> 1L, "insert" -> 1L))
    val feed = TxLog.changeFeed(spark, t, 1, 2)
    assert(feed.filter($"_change_type" === "update_preimage")
      .head().getAs[String]("tag") == "b")
    assert(feed.filter($"_change_type" === "update_postimage")
      .head().getAs[String]("tag") == "B")
    assert(feed.filter($"_change_type" === "insert").head().getAs[Int]("k") == 9)
  }

  test("overwrite and restore derive deletes from removed files; compaction is silent") {
    val t = freshTable("ow")
    TxLog.append((0 until 10).toDF("k").withColumn("tag", lit("a")), t)       // v1
    TxLog.overwrite((100 until 103).toDF("k").withColumn("tag", lit("b")), t) // v2
    assert(types(t, 1, 2) == Map("delete" -> 10L, "insert" -> 3L))
    TxLog.compact(spark, t, numFiles = 1)                                     // v3, layout-only
    assert(TxLog.changeFeed(spark, t, 2, 3).isEmpty,
      "layout-only commits must not feed")
    TxLog.restore(spark, t, 1L)                                                      // back to v1 content
    val head = TxLog.latestVersion(t)
    val m = types(t, head - 1, head)
    assert(m("delete") == 3L && m("insert") == 10L,
      s"restore must feed the net row diff, got $m")
  }

  test("schema evolution null-backfills older commits; range validation is loud") {
    val t = freshTable("evolve")
    TxLog.append((0 until 3).toDF("k").withColumn("tag", lit("a")), t)
    TxLog.appendEvolve((3 until 5).toDF("k").withColumn("tag", lit("b"))
      .withColumn("score", lit(1.5)), t)
    val feed = TxLog.changeFeed(spark, t, 0, 2)
    assert(feed.columns.contains("score"))
    assert(feed.filter($"score".isNull).count() == 3)
    intercept[IllegalArgumentException](TxLog.changeFeed(spark, t, 0, 99))
  }

  test("the connector serves the feed via readChangeFeed options") {
    val t = freshTable("connector")
    TxLog.append((0 until 10).toDF("k").withColumn("tag", lit("x")), t)
    TxLog.delete(spark, t, $"k" < 2)
    TxLog.append((10 until 12).toDF("k").withColumn("tag", lit("y")), t)
    // inclusive-start Delta shape: versions 2..3
    val df = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "2")
      .load(t)
    assert(df.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("delete" -> 2L, "insert" -> 2L))
    // endingVersion bounds the range; time travel options refuse
    assert(spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "1")
      .load(t).count() == 10)
    intercept[Exception](spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .option("versionAsOf", "2").load(t).count())
  }

  test("readStream in CDF mode tails rewrites faithfully — no refusal needed") {
    val t = freshTable("streamcdf")
    val sinkT = freshTable("streamcdf_sink")
    val ckpt = freshTable("streamcdf_ckpt")
    TxLog.append((0 until 10).toDF("k").withColumn("tag", lit("x")), t)
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(t)
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(sinkT)
      q.awaitTermination()
    }
    drain()
    // a COW delete flows as exact delete rows — NOT a refusal, NOT
    // survivor re-delivery
    TxLog.delete(spark, t, $"k" === 4)
    drain()
    val out = spark.read.format("graft").load(sinkT)
    assert(out.columns.contains("_change_type"))
    assert(out.filter($"_change_type" === "insert").count() == 10)
    assert(out.filter($"_change_type" === "delete")
      .select("k").as[Int].collect().toSeq == Seq(4))
  }

  test("UPDATE postimages are the committed bytes — even for per-action expressions") {
    val t = freshTable("singleeval")
    TxLog.append((0 until 10).toDF("k").withColumn("ts",
      lit(null).cast("timestamp")), t)
    // current_timestamp() re-resolves per Spark action; the single-
    // evaluation contract (CDF written first, table rewrite re-reads the
    // committed postimage bytes) makes feed and table IDENTICAL anyway
    TxLog.update(spark, t, $"k" < 3, Seq("ts" -> current_timestamp()))
    val tableRows = TxLog.snapshot(spark, t).filter($"k" < 3)
      .select("k", "ts").collect().map(r => r.getInt(0) -> r.getTimestamp(1)).toMap
    val feedRows = TxLog.changeFeed(spark, t, 1, 2)
      .filter($"_change_type" === "update_postimage")
      .select("k", "ts").collect().map(r => r.getInt(0) -> r.getTimestamp(1)).toMap
    assert(tableRows == feedRows,
      "feed postimages must be byte-identical to the committed table rows")
    // non-deterministic predicates refuse loudly (they classify rows in
    // more than one scan)
    val e = intercept[IllegalArgumentException](
      TxLog.delete(spark, t, rand() < 0.5))
    assert(e.getMessage.contains("deterministic"))
    intercept[IllegalArgumentException](
      TxLog.update(spark, t, rand() < 0.5, Seq("k" -> lit(0))))
    // _commit_timestamp carries exact millisecond precision
    val ts = TxLog.changeFeed(spark, t, 1, 2)
      .select("_commit_timestamp").head().getTimestamp(0)
    assert(ts.getTime == TxLog.history(t)(1).ts,
      "commit timestamp must round-trip exactly (no double truncation)")
  }

  test("vacuum reclaims aged CDF images; a reclaimed range refuses loudly") {
    val t = freshTable("cdfvac")
    TxLog.append((0 until 20).toDF("k").withColumn("tag", lit("x")), t)
    TxLog.delete(spark, t, $"k" < 2)
    assert(TxLog.changeFeed(spark, t, 1, 2).count() == 2)
    val n = TxLog.vacuum(t, olderThanMs = 0L)
    assert(n > 0, "vacuum must reclaim the dead data AND aged cdf files")
    val e = intercept[IllegalStateException](
      TxLog.changeFeed(spark, t, 1, 2).count())
    assert(e.getMessage.contains("vacuumed"))
    // resuming PAST the reclaimed range still works
    TxLog.append((20 until 23).toDF("k").withColumn("tag", lit("y")), t)
    assert(TxLog.changeFeed(spark, t, 2, 3).count() == 3)
  }

  test("startingTimestamp resolves to the earliest version at or after the instant") {
    val t = freshTable("startts")
    TxLog.append((0 until 3).toDF("k").withColumn("tag", lit("a")), t)   // v1
    Thread.sleep(5)
    TxLog.append((3 until 5).toDF("k").withColumn("tag", lit("b")), t)   // v2
    val ts1 = TxLog.history(t).head.ts
    val ts2 = TxLog.history(t).last.ts
    assert(TxLog.versionAtOrAfter(t, 0L) == 1L)
    assert(TxLog.versionAtOrAfter(t, ts1) == 1L, "exact instant includes its commit")
    assert(TxLog.versionAtOrAfter(t, ts1 + 1) == 2L)
    intercept[IllegalArgumentException](TxLog.versionAtOrAfter(t, ts2 + 1))
    // the connector option: everything since v2's instant
    assert(spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingTimestamp", ts2.toString)
      .load(t).count() == 2)
    // mutually exclusive with startingVersion
    intercept[Exception](spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .option("startingTimestamp", "0").load(t).count())
  }

  test("versionAtOrAfter is a true lower bound across same-millisecond commits") {
    // rapid commits routinely share a wall-clock millisecond; returning
    // any but the FIRST would silently skip its siblings from the feed.
    // Synthetic log (controlled ts): v1@100, v2@200, v3@200, v4@300.
    val t = freshTable("samems")
    val log = java.nio.file.Paths.get(t, "_graft_log")
    java.nio.file.Files.createDirectories(log)
    val schema = """{"type":"struct","fields":[]}"""
    Seq((1, 100), (2, 200), (3, 200), (4, 300)).foreach { case (v, ts) =>
      java.nio.file.Files.writeString(log.resolve(f"$v%020d.json"),
        s"""{"version":$v,"op":"append","ts":$ts,"add":[],"remove":[],""" +
          s""""schema":"${schema.replace("\"", "\\\"")}","dataChange":true}""")
    }
    assert(TxLog.versionAtOrAfter(t, 0L) == 1L)
    assert(TxLog.versionAtOrAfter(t, 150L) == 2L)
    assert(TxLog.versionAtOrAfter(t, 200L) == 2L,
      "the boundary millisecond must resolve to its FIRST commit, not its last")
    assert(TxLog.versionAtOrAfter(t, 201L) == 4L)
    assert(TxLog.versionAtOrAfter(t, 300L) == 4L)
    intercept[IllegalArgumentException](TxLog.versionAtOrAfter(t, 301L))
  }

  test("SQL callers read the feed via the table_changes TVF") {
    val t = freshTable("tvf")
    TxLog.append((0 until 8).toDF("k").withColumn("tag", lit("a")), t)
    TxLog.delete(spark, t, $"k" === 5)
    val rows = spark.sql(
      s"SELECT _change_type, COUNT(*) AS n FROM table_changes('$t', 1) " +
        "GROUP BY 1 ORDER BY 1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("insert" -> 8L, "delete" -> 1L))
    // bounded range + composition with ordinary SQL on top
    assert(spark.sql(
      s"SELECT SUM(k) FROM table_changes('$t', 2, 2) WHERE _change_type = 'delete'")
      .head.getLong(0) == 5L)
    intercept[Exception](spark.sql(s"SELECT * FROM table_changes('$t')"))
  }

  test("partition-scoped overwrite feeds exactly the replaced partition's row diff") {
    val t = freshTable("owpartcdf")
    TxLog.append(
      (0 until 12).toDF("k").withColumn("b", concat(lit("p"), $"k" % 3)),
      t, partitionBy = Seq("b"))
    TxLog.overwritePartitions(
      (100 until 102).toDF("k").withColumn("b", lit("p1")), t, dynamic = true)
    val m = types(t, 1, 2)
    assert(m == Map("delete" -> 4L, "insert" -> 2L),
      s"only p1's rows may feed (4 deleted, 2 inserted), got $m")
    val feed = TxLog.changeFeed(spark, t, 1, 2)
    assert(feed.select("b").distinct().as[String].collect().toSeq == Seq("p1"))
  }

  test("DELETE classifies once: feed and table partition the rows exactly, " +
      "even under a per-action time predicate") {
    val t = freshTable("deletetime")
    val base = System.currentTimeMillis()
    // timestamps straddling "now": whichever side of the boundary each
    // row lands on at classification time, the feed's deletes and the
    // surviving table rows must be an exact disjoint partition of the
    // original rows — the invariant the single-evaluation contract
    // guarantees and a twice-evaluated current_timestamp() can break
    val rows = (0 until 40).map(i => (i, base - 2000L + i * 100L))
    TxLog.append(rows.toDF("k", "ms").withColumn("ts",
      timestamp_millis($"ms")).drop("ms"), t)
    TxLog.delete(spark, t, $"ts" < current_timestamp())
    val fed = TxLog.changeFeed(spark, t, 1, 2)
      .filter($"_change_type" === "delete").select("k").as[Int].collect().toSet
    val live = TxLog.snapshot(spark, t).select("k").as[Int].collect().toSet
    assert(fed.intersect(live).isEmpty,
      s"rows both deleted-in-feed and alive: ${fed.intersect(live)}")
    assert(fed.union(live) == (0 until 40).toSet,
      "every original row must be exactly one of fed-deleted or alive")
    // the commit references only pure delete images — the classification
    // temp (delete+carry) is never part of the commit's cdf list
    val c = TxLog.history(t).last
    if (c.cdf.nonEmpty) {
      val imgs = spark.read.parquet(
        c.cdf.map(f => java.nio.file.Paths.get(t, f).toString): _*)
      assert(imgs.select("_change_type").distinct().as[String]
        .collect().toSeq == Seq("delete"))
    }
  }

  test("DELETE materializes the classification ONCE: _change_data holds only " +
      "the delete images, never a full affected-rows temp") {
    val t = freshTable("singlepass")
    TxLog.append((0 until 1000).toDF("k").withColumn("tag", lit("x")), t)
    TxLog.delete(spark, t, $"k" < 3)
    // every byte under _change_data must be image bytes (∝ deleted rows);
    // the pre-fix design parked a full copy of the affected rows there
    val cdfDir = java.nio.file.Paths.get(t, "_change_data")
    val cdfFiles = {
      val s = java.nio.file.Files.walk(cdfDir)
      try s.iterator().asScala.filter(p =>
        java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet")).map(_.toString).toSeq
      finally s.close()
    }
    val cdfRows = spark.read.parquet(cdfFiles: _*).count()
    assert(cdfRows == 3,
      s"_change_data holds $cdfRows rows — only the 3 delete images may live there")
    assert(TxLog.snapshot(spark, t).count() == 997)
    assert(TxLog.changeFeed(spark, t, 1, 2).count() == 3)
  }

  test("a metadata-only ADD COLUMNS at the END of the range null-backfills") {
    val t = freshTable("evolvetail")
    TxLog.append(Seq((1, "a"), (2, "b")).toDF("k", "tag"), t)
    // evolveSchema is the LAST commit in range: no dataChange commit
    // carries the new column, so only the final-schema seed can add it
    TxLog.evolveSchema(t,
      Seq(org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType)))
    val feed = TxLog.changeFeed(spark, t, 0, 2)
    assert(feed.columns.contains("score"))
    assert(feed.count() == 2)
    assert(feed.filter($"score".isNotNull).isEmpty,
      "pre-evolution rows must null-backfill the new column")
  }

  test("startingVersion=0 means from-the-beginning (Delta's contract), not an error") {
    val t = freshTable("startzero")
    TxLog.append(Seq((1, "a")).toDF("k", "tag"), t)
    TxLog.append(Seq((2, "b")).toDF("k", "tag"), t)
    val viaOption = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "0").load(t)
    assert(viaOption.count() == 2)
    val viaTvf = spark.sql(s"SELECT * FROM table_changes('$t', 0)")
    assert(viaTvf.count() == 2)
  }

  test("a file contributing THREE times (append, overwrite, restore) " +
      "splits into occurrence layers with exact per-commit attribution") {
    val t = freshTable("layers")
    TxLog.append((0 until 10).toDF("k").withColumn("tag", lit("a")), t)   // v1: files A
    TxLog.overwrite((50 until 53).toDF("k").withColumn("tag", lit("b")), t) // v2: -A +B
    TxLog.restore(spark, t, 1L)                                           // v3: -B +A
    val feed = TxLog.changeFeed(spark, t, 0, 3)
    val byVt = feed.groupBy("_commit_version", "_change_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byVt == Map(
      (1L, "insert") -> 10L,
      (2L, "delete") -> 10L, (2L, "insert") -> 3L,
      (3L, "delete") -> 3L, (3L, "insert") -> 10L),
      s"the same physical files must attribute to each commit exactly: $byVt")
    assert(feed.count() == 36)
  }

  test("hive-escaped partition values survive the broadcast attribution") {
    val t = freshTable("escape")
    // '%', '=', and ':' exercise hive escaping in the dir name AND the
    // URI decode in the path-normalization join key
    val v = "p%1=x:y"
    TxLog.append(Seq((1, v), (2, "plain")).toDF("k", "b"),
      t, partitionBy = Seq("b"))
    TxLog.delete(spark, t, $"k" === 1)
    val ins = TxLog.changeFeed(spark, t, 0, 1)
    assert(ins.filter($"b" === v).count() == 1,
      "the escaped partition value must round-trip through the feed")
    val del = TxLog.changeFeed(spark, t, 1, 2)
    assert(del.head().getAs[String]("b") == v)
    assert(del.head().getAs[Long]("_commit_version") == 2L)
  }

  test("a 1k-commit range plans a bounded number of scans, not a 1k-branch union") {
    import java.nio.file.{Files, Paths}
    val t = freshTable("bigrange")
    TxLog.append(Seq((0, "x")).toDF("k", "tag"), t) // v1: real file + schema
    val c1 = TxLog.history(t).head
    val file1 = c1.add.head
    // synthesize 999 more append commits, each hard-linking the same
    // bytes under a fresh name — a LOG shape test, not a data test
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    (2 to 1000).foreach { v =>
      val rel = s"data/syn$v/part-0.parquet"
      Files.createDirectories(Paths.get(t, s"data/syn$v"))
      Files.createLink(Paths.get(t, rel), Paths.get(t, file1))
      val rec = mapper.createObjectNode()
      rec.put("version", v.toLong); rec.put("op", "append")
      rec.put("ts", 1000000L + v)
      rec.putArray("add").add(rel); rec.putArray("remove")
      rec.put("schema", c1.schemaJson); rec.put("dataChange", true)
      Files.writeString(Paths.get(t, "_graft_log", f"$v%020d.json"),
        mapper.writeValueAsString(rec)): Unit
    }
    val t0 = System.nanoTime()
    val feed = TxLog.changeFeed(spark, t, 0, 1000)
    val leaves = feed.queryExecution.optimizedPlan.collectLeaves().size
    assert(leaves <= 4,
      s"a single-schema 1k-commit feed must plan O(schema-shapes) scans, got $leaves")
    assert(feed.count() == 1000)
    val planAndRunSec = (System.nanoTime() - t0) / 1e9
    assert(planAndRunSec < 60.0,
      f"1k-commit feed took $planAndRunSec%.1f s — plan growth is back")
    // per-file attribution is exact across the whole range
    assert(feed.filter($"_commit_version" === 777).count() == 1)
    assert(feed.filter($"_change_type" =!= "insert").isEmpty)
  }

  test("CDF rows on a partitioned table carry the partition column") {
    val t = freshTable("part")
    TxLog.append(
      (0 until 30).toDF("k").withColumn("bucket", concat(lit("b"), $"k" % 3)),
      t, partitionBy = Seq("bucket"))
    TxLog.delete(spark, t, $"k" === 7)
    val feed = TxLog.changeFeed(spark, t, 1, 2)
    assert(feed.head().getAs[String]("bucket") == "b1")
    // appends on partitioned tables attach values from paths
    val ins = TxLog.changeFeed(spark, t, 0, 1)
    assert(ins.filter($"bucket" === "b2").count() == 10)
  }
}
