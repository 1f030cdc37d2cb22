package graft.sources

import graft.TestSpark
import graft.plans.TxLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `graft` DataSource: log-backed FileIndex semantics — snapshot
  * visibility, versionAsOf, and zone-map file pruning visible on the
  * actual FileSourceScanExec. */
class GraftLogSourceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graftsrc_$name").toString

  private def scannedFiles(df: DataFrame): Long =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles
    }.getOrElse(sys.error("no FileSourceScanExec in plan"))

  test("format(graft) reads the live snapshot, not the directory") {
    val t = freshTable("live")
    TxLog.append((0 until 10).toDF("k").withColumn("tag", lit("a")).repartition(2), t)
    TxLog.overwrite((100 until 105).toDF("k").withColumn("tag", lit("b")).repartition(2), t)
    // v1's files are still on disk but dead in the log — must be invisible
    val out = spark.read.format("graft").load(t)
    assert(out.select("k").as[Int].collect().toSet == (100 until 105).toSet)
    // versionAsOf time-travels
    val v1 = spark.read.format("graft").option("versionAsOf", "1").load(t)
    assert(v1.select("k").as[Int].collect().toSet == (0 until 10).toSet)
    // time travel past a vacuum fails LOUDLY at plan time — a 0-length
    // FileStatus would otherwise scan as empty and return silent wrongs
    TxLog.vacuum(t, olderThanMs = 0L)
    val e = intercept[IllegalStateException](
      spark.read.format("graft").option("versionAsOf", "1").load(t).count())
    assert(e.getMessage.contains("vacuumed"))
    assert(spark.read.format("graft").load(t).count() == 5)
  }

  test("WHERE predicates prune files via zone maps inside planning") {
    val t = freshTable("prune")
    TxLog.append(
      (0 until 100).toDF("k").withColumn("tag", concat(lit("v"), $"k" % 7))
        .repartitionByRange(4, $"k").sortWithinPartitions("k"), t)
    val all = spark.read.format("graft").load(t)
    assert(scannedFiles(all) == 4)
    val band = all.filter($"k" >= 30 && $"k" <= 45)
    assert(scannedFiles(band) == 1, "a [25,50) band must plan exactly one range file")
    assert(band.select("k").as[Int].collect().toSet == (30 to 45).toSet)
    // a range beyond the data plans zero files and returns zero rows
    val none = all.filter($"k" > 500)
    assert(scannedFiles(none) == 0 && none.isEmpty)
    // unsupported predicate shapes keep everything (conservative)
    val opaque = all.filter(($"k" % 3) === 0)
    assert(scannedFiles(opaque) == 4)
    assert(opaque.count() == 34)
    // string zone maps prune too
    assert(scannedFiles(all.filter($"tag" === "zzz")) == 0)
  }

  test("float-literal predicates prune in Float's own string domain") {
    val t = freshTable("float")
    // boundary value 0.7f: stats record Float.toString ("0.7"); a
    // literal rendered via toDouble ("0.699999988...") would wrongly
    // prune the file holding it
    TxLog.append(
      Seq(0.1f, 0.3f, 0.7f).toDF("f").repartitionByRange(3, $"f"), t)
    val all = spark.read.format("graft").load(t)
    val hit = all.filter($"f" === lit(0.7f))
    assert(scannedFiles(hit) == 1)
    assert(hit.count() == 1, "the boundary file must not be pruned away")
    assert(all.filter($"f" >= lit(0.7f)).count() == 1)
  }

  test("Hilbert-clustered compaction makes BOTH dimensions prunable") {
    val t = freshTable("hilbert")
    // decorrelated dims; hash-partitioned write → every file spans both
    // full ranges, so zone maps prune NOTHING before clustering
    val src = (0 until 4096).toDF("x")
      .withColumn("y", ($"x" * 37L) % 4096)
      .withColumn("payload", concat(lit("p"), $"x"))
    TxLog.append(src.repartition(8), t)
    def planned(f: DataFrame => DataFrame): Long =
      scannedFiles(f(spark.read.format("graft").load(t)))
    val xBand: DataFrame => DataFrame = _.filter($"x" >= 1800 && $"x" <= 2100)
    val yBand: DataFrame => DataFrame = _.filter($"y" >= 1800 && $"y" <= 2100)
    assert(planned(xBand) == 8 && planned(yBand) == 8,
      "hash layout must be unprunable on both dims (the baseline)")
    TxLog.compact(spark, t, 8, clusterBy = Seq("x", "y"))
    val (px, py) = (planned(xBand), planned(yBand))
    assert(px < 8 && py < 8, s"clustered layout must prune both dims: x=$px y=$py")
    // content unchanged by the layout-only rewrite
    assert(spark.read.format("graft").load(t).count() == 4096)
    assert(xBand(spark.read.format("graft").load(t)).select("x").as[Int].collect().toSet ==
      (1800 to 2100).toSet)
    info(s"planned after clustering: x-band $px/8, y-band $py/8")
  }

  test("SQL text reads the log via CREATE TEMPORARY VIEW ... USING graft") {
    val t = freshTable("sql")
    TxLog.append((0 until 50).toDF("k").withColumn("tag", lit("a")), t)
    TxLog.overwrite((0 until 20).toDF("k").withColumn("tag", lit("b")), t)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_sql_head " +
      s"USING graft OPTIONS (path '$t')")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_sql_v1 " +
      s"USING graft OPTIONS (path '$t', versionAsOf '1')")
    val head = spark.sql(
      "SELECT COUNT(*) AS n, SUM(k) AS s FROM graft_sql_head WHERE k < 10").head
    assert(head.getLong(0) == 10 && head.getLong(1) == 45)
    val v1 = spark.sql("SELECT COUNT(*) AS n FROM graft_sql_v1").head
    assert(v1.getLong(0) == 50, "the SQL view time-travels via the option")
  }

  test("schema-evolved tables read through the connector with NULL backfill") {
    val t = freshTable("evolve")
    TxLog.append((0 until 5).toDF("k").withColumn("tag", lit("a")), t)
    TxLog.appendEvolve(
      (5 until 8).toDF("k").withColumn("tag", lit("b")).withColumn("score", lit(1.5)), t)
    val out = spark.read.format("graft").load(t)
    assert(out.schema.fieldNames.toSeq == Seq("k", "tag", "score"))
    assert(out.filter($"score".isNull).count() == 5)
    assert(spark.read.format("graft").option("versionAsOf", "1").load(t)
      .schema.fieldNames.toSeq == Seq("k", "tag"))
  }

  test("hive-partitioned tables: path-borne values, in-planner pruning, COW preserves layout") {
    val t = freshTable("hivepart")
    val src = (0 until 90).toDF("k")
      .withColumn("bucket", concat(lit("b"), $"k" % 3))
      .withColumn("tag", lit("x"))
    TxLog.append(src.repartition(2), t, partitionBy = Seq("bucket"))
    // layout: files sit under bucket=bX/ dirs, the column is NOT in the
    // parquet files, and the log's snapshot knows the partitioning
    val snap = TxLog.snapshotInfo(t)
    assert(snap.partitionCols == Seq("bucket"))
    assert(snap.files.forall(_.matches("data/[0-9a-f]+/bucket=b[0-2]/.*\\.parquet")))
    // API read re-attaches the partition column
    assert(TxLog.snapshot(spark, t).filter($"bucket" === "b1")
      .select("k").as[Int].collect().toSet == (0 until 90).filter(_ % 3 == 1).toSet)
    // connector read: partition filter prunes at the DIRECTORY level
    val all = spark.read.format("graft").load(t)
    assert(all.columns.toSeq == Seq("k", "tag", "bucket"),
      "partition column rides at the end of the connector output")
    val total = scannedFiles(all)
    val one = all.filter($"bucket" === "b1")
    assert(scannedFiles(one) * 3 <= total,
      s"partition pruning failed: ${scannedFiles(one)} of $total files")
    assert(one.select("k").as[Int].collect().toSet ==
      (0 until 90).filter(_ % 3 == 1).toSet)
    // appends inherit the layout; a conflicting request refuses
    TxLog.append((90 until 96).toDF("k")
      .withColumn("bucket", concat(lit("b"), $"k" % 3)).withColumn("tag", lit("y")), t)
    intercept[IllegalArgumentException](
      TxLog.append(src, t, partitionBy = Seq("tag")))
    // COW delete preserves the layout and the snapshot stays correct
    TxLog.delete(spark, t, $"k" >= 90 && $"bucket" === "b0")
    val afterDel = TxLog.snapshotInfo(t)
    assert(afterDel.files.forall(_.contains("bucket=")))
    assert(TxLog.snapshot(spark, t).count() == 94)
    // changes() re-attaches partition values too
    assert(TxLog.changes(spark, t, 1, 2).filter($"bucket" === "b0")
      .select("k").as[Int].collect().toSet == Set(90, 93))
    // metadata min/max serves the partition column from synthesized stats
    assert(TxLog.metadataMinMax(t, "bucket").contains(("b0", "b2")))
    // NULL partition values refuse loudly (ours names the contract;
    // rows where only SOME values are null reach the writer and must
    // die at the __HIVE_DEFAULT_PARTITION__ detection)
    val e = intercept[IllegalArgumentException](TxLog.append(
      (0 until 3).toDF("k")
        .withColumn("bucket", when($"k" === 1, lit(null).cast("string")).otherwise(lit("b")))
        .withColumn("tag", lit("z")),
      freshTable("nullpart"), partitionBy = Seq("bucket")))
    assert(e.getMessage.contains("non-null"))
  }

  test("INSERT INTO and writer appends inherit a partitioned table's layout") {
    val t = freshTable("hivepartins")
    TxLog.append(
      (0 until 30).toDF("k").withColumn("bucket", concat(lit("b"), $"k" % 3)),
      t, partitionBy = Seq("bucket"))
    // writer-API append: no partitionBy stated — the table's layout wins
    (30 until 36).toDF("k").withColumn("bucket", concat(lit("b"), $"k" % 3))
      .write.format("graft").mode("append").save(t)
    // SQL insert through the view — same inheritance
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_part_ins " +
      s"USING graft OPTIONS (path '$t')")
    // by-position against the view output (k, bucket — data columns
    // then partition columns)
    spark.sql("INSERT INTO graft_part_ins SELECT id AS k, CONCAT('b', id % 3) FROM range(36, 42)")
    val snap = TxLog.snapshotInfo(t)
    assert(snap.partitionCols == Seq("bucket"))
    assert(snap.files.forall(_.contains("bucket=")),
      "every commit must keep the hive layout")
    assert(spark.sql("SELECT COUNT(*) FROM graft_part_ins").head.getLong(0) == 42)
    assert(spark.read.format("graft").load(t).filter($"bucket" === "b1").count() == 14)
  }

  test("df.write.format(graft) commits through the log with full mode semantics") {
    val t = freshTable("write")
    def w(r: Range, tag: String) =
      r.toDF("k").withColumn("tag", lit(tag)).repartition(2)
        .write.format("graft")
    // multi-partition append creates the table
    w(0 until 10, "a").mode("append").save(t)
    w(10 until 25, "b").mode("append").save(t)
    assert(TxLog.history(t).map(_.op) == Seq("append", "append"))
    assert(TxLog.history(t).forall(_.add.length == 2), "one file per partition")
    assert(spark.read.format("graft").load(t)
      .select("k").as[Int].collect().toSet == (0 until 25).toSet)
    // overwrite swaps content atomically; time travel still works
    w(100 until 105, "c").mode("overwrite").save(t)
    assert(TxLog.history(t).last.op == "overwrite")
    assert(spark.read.format("graft").load(t)
      .select("k").as[Int].collect().toSet == (100 until 105).toSet)
    assert(spark.read.format("graft").option("versionAsOf", "2").load(t)
      .select("k").as[Int].collect().toSet == (0 until 25).toSet)
    // errorifexists refuses an existing table; ignore is a no-op on one
    intercept[IllegalStateException](w(0 until 3, "x").mode("errorifexists").save(t))
    w(0 until 3, "x").mode("ignore").save(t)
    assert(TxLog.latestVersion(t) == 3L)
    // append schema drift still fails loudly through the writer API
    val bad = (0 until 3).toDF("k").withColumn("tag", lit(7L))
    val e = intercept[Exception](
      bad.write.format("graft").mode("append").save(t))
    assert(e.getMessage.contains("schema mismatch"))
    // mergeSchema evolves instead
    (105 until 107).toDF("k").withColumn("tag", lit("d")).withColumn("score", lit(9.9))
      .write.format("graft").option("mergeSchema", "true").mode("append").save(t)
    val out = spark.read.format("graft").load(t)
    assert(out.schema.fieldNames.toSeq == Seq("k", "tag", "score"))
    assert(out.filter($"score".isNull).count() == 5)
    // a time-travel view is not a write target
    intercept[Exception](
      w(0 until 3, "y").option("versionAsOf", "1").mode("append").save(t))
  }

  test("INSERT INTO / INSERT OVERWRITE on a USING graft view commit through the log") {
    val t = freshTable("insert")
    TxLog.append((0 until 10).toDF("k").withColumn("tag", lit("a")), t)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_ins " +
      s"USING graft OPTIONS (path '$t')")
    spark.sql("INSERT INTO graft_ins SELECT id AS k, 'b' AS tag FROM range(10, 20)")
    assert(TxLog.history(t).map(_.op) == Seq("append", "append"))
    // the SAME view (pinned LogicalRelation) must serve the new commit
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft_ins").head.getLong(0) == 20)
    // by-position insert with analyzer casts: ints coerce to the long k
    spark.sql("INSERT INTO graft_ins VALUES (99, 'c')")
    assert(spark.sql("SELECT COUNT(*) FROM graft_ins WHERE tag = 'c'").head.getLong(0) == 1)
    // INSERT OVERWRITE swaps the table content atomically
    spark.sql("INSERT OVERWRITE TABLE graft_ins SELECT id AS k, 'z' AS tag FROM range(5)")
    assert(TxLog.history(t).last.op == "overwrite")
    assert(spark.sql("SELECT COUNT(*) AS n, MIN(tag) AS t FROM graft_ins").head.getLong(0) == 5)
    // time travel to the pre-overwrite state still works
    assert(spark.read.format("graft").option("versionAsOf", "3").load(t).count() == 21)
    // a versionAsOf view refuses inserts
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_ins_v1 " +
      s"USING graft OPTIONS (path '$t', versionAsOf '1')")
    val e = intercept[Exception](
      spark.sql("INSERT INTO graft_ins_v1 VALUES (1, 'x')"))
    assert(e.getMessage.contains("time-travel"))
  }

  test("partition-scoped INSERT OVERWRITE: dynamic replaces written partitions, static spec clears its subtree") {
    val t = freshTable("owpart")
    TxLog.append(
      (0 until 30).toDF("k").withColumn("bucket", concat(lit("b"), $"k" % 3)),
      t, partitionBy = Seq("bucket"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_ow_part " +
      s"USING graft OPTIONS (path '$t')")
    // dynamic PARTITION (c) spec under dynamic mode: ONLY b0 is replaced
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("INSERT OVERWRITE TABLE graft_ow_part PARTITION (bucket) " +
        "SELECT id + 100 AS k, 'b0' AS bucket FROM range(5)")
      assert(spark.sql("SELECT COUNT(*) FROM graft_ow_part").head.getLong(0) == 25,
        "b0's 10 rows replaced by 5; b1/b2 untouched")
      assert(spark.sql("SELECT COUNT(*) FROM graft_ow_part WHERE bucket = 'b1'")
        .head.getLong(0) == 10)
      // no-spec dynamic overwrite: same written-partition scope
      spark.sql("INSERT OVERWRITE TABLE graft_ow_part " +
        "SELECT id + 200 AS k, 'b1' AS bucket FROM range(3)")
      assert(spark.sql("SELECT COUNT(*) FROM graft_ow_part").head.getLong(0) == 18,
        "b1's 10 rows replaced by 3; b0/b2 untouched")
      // an UNpartitioned table is unaffected by the mode — full replace
      val t2 = freshTable("owflat")
      TxLog.append((0 until 10).toDF("k").withColumn("tag", lit("a")), t2)
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_ow_flat " +
        s"USING graft OPTIONS (path '$t2')")
      spark.sql("INSERT OVERWRITE TABLE graft_ow_flat SELECT id AS k, 'z' AS tag FROM range(3)")
      assert(spark.sql("SELECT COUNT(*) FROM graft_ow_flat").head.getLong(0) == 3)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    // STATIC spec under static mode: the spec's subtree clears, literals
    // inject (the SELECT supplies only the data column)
    spark.sql("INSERT OVERWRITE TABLE graft_ow_part PARTITION (bucket = 'b2') " +
      "SELECT id + 300 AS k FROM range(2)")
    assert(spark.sql("SELECT COUNT(*) FROM graft_ow_part WHERE bucket = 'b2'")
      .head.getLong(0) == 2)
    assert(spark.sql("SELECT COUNT(*) FROM graft_ow_part").head.getLong(0) == 10)
    // static INSERT INTO with a static spec appends with injected values
    spark.sql("INSERT INTO graft_ow_part PARTITION (bucket = 'b0') " +
      "SELECT id + 400 AS k FROM range(4)")
    assert(spark.sql("SELECT COUNT(*) FROM graft_ow_part WHERE bucket = 'b0'")
      .head.getLong(0) == 9)
    // static mode full overwrite (no spec) remains the documented meaning
    spark.sql("INSERT OVERWRITE TABLE graft_ow_part SELECT id AS k, CONCAT('b', id % 2) AS bucket FROM range(8)")
    assert(spark.sql("SELECT COUNT(*) FROM graft_ow_part").head.getLong(0) == 8)
    // writer API honors the dynamic contract via the writer option
    (0 until 6).toDF("k").withColumn("bucket", lit("b1"))
      .write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(t)
    assert(spark.read.format("graft").load(t).filter($"bucket" === "b0").count() == 4,
      "b0 must survive a dynamic writer overwrite that only wrote b1")
    assert(spark.read.format("graft").load(t).filter($"bucket" === "b1").count() == 6)
    // a FULLY-static spec keeps static semantics even under dynamic
    // mode: an empty source must still EMPTY the named partition
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("INSERT OVERWRITE TABLE graft_ow_part PARTITION (bucket = 'b1') " +
        "SELECT id AS k FROM range(0) WHERE false")
      assert(spark.read.format("graft").load(t).filter($"bucket" === "b1").count() == 0,
        "Spark's semantics: a fully-static spec clears its partition even with 0 rows")
      assert(spark.read.format("graft").load(t).filter($"bucket" === "b0").count() == 4)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("static PARTITION spec values canonicalize through the column type") {
    val t = freshTable("owcanon")
    TxLog.append(
      (0 until 12).toDF("v").withColumn("p", ($"v" % 3).cast("long")),
      t, partitionBy = Seq("p"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_ow_canon " +
      s"USING graft OPTIONS (path '$t')")
    // '01' on a LONG partition column must clear p=1, not refuse or no-op
    spark.sql("INSERT OVERWRITE TABLE graft_ow_canon PARTITION (p = '01') " +
      "SELECT id + 100 AS v FROM range(2)")
    val out = spark.read.format("graft").load(t)
    assert(out.filter($"p" === 1L).select("v").as[Long].collect().toSet ==
      Set(100L, 101L))
    assert(out.filter($"p" === 0L).count() == 4 && out.filter($"p" === 2L).count() == 4)
    // an unparsable spec value refuses loudly
    val e = intercept[Exception](spark.sql(
      "INSERT OVERWRITE TABLE graft_ow_canon PARTITION (p = 'notanumber') " +
        "SELECT id AS v FROM range(1)"))
    assert(e.getMessage.contains("does not parse") ||
      e.getMessage.toLowerCase.contains("cast"))
  }

  test("partition values round-trip escaped bytes exactly") {
    val t = freshTable("escpart")
    // ':' forces hive escaping (→ %3A); a literal '%' must survive the
    // unescape untouched (this JVM's POSIX locale cannot write non-BMP
    // paths at all — the surrogate-pair decode is pinned in the unit
    // test below)
    val vals = Seq("a:b", "plain", "b%2")
    val src = (0 until 9).toDF("k")
      .withColumn("part", element_at(typedLit(vals), ($"k" % 3 + 1).cast("int")))
    TxLog.append(src, t, partitionBy = Seq("part"))
    val out = spark.read.format("graft").load(t)
    assert(out.select("part").distinct().as[String].collect().toSet == vals.toSet,
      "every partition value must round-trip byte-exactly through the path")
    assert(out.filter($"part" === vals.head).count() == 3)
    // the API read (snapshot) re-attaches the same values
    assert(TxLog.snapshot(spark, t).filter($"part" === vals.head)
      .select("k").as[Int].collect().toSet == Set(0, 3, 6))
    // zone-map metadata serves the true strings, not mojibake
    val mm = TxLog.metadataMinMax(t, "part")
    assert(mm.contains((vals.min, vals.max)), s"got $mm")
  }

  test("unescapePath survives surrogate pairs and multi-byte %-escape runs") {
    // the regression: per-Char byte-decoding split surrogate pairs, so
    // any non-BMP character next to a %XX escape became '?'
    val emoji = "a:\ud83d\ude00" // 😀, escaped form mixes %3A with raw surrogates
    val vs = TxLog.partitionValuesOf(
      "data/abc/part=a%3A\ud83d\ude00/f.parquet", Seq("part"))
    assert(vs("part") == emoji, s"got ${vs("part")}")
    // an externally-encoded multi-byte escape run (€ = %E2%82%AC)
    // reassembles as ONE codepoint, not three replacement chars
    val euro = TxLog.partitionValuesOf(
      "data/abc/part=x%E2%82%ACy/f.parquet", Seq("part"))
    assert(euro("part") == "x\u20acy", s"got ${euro("part")}")
  }

  test("partition columns restrict to types whose path round-trip is exact") {
    val t = freshTable("tspart")
    val src = (0 until 4).toDF("k")
      .withColumn("ts", to_timestamp(lit("2026-01-01 00:00:00")))
    val e = intercept[IllegalArgumentException](
      TxLog.append(src, t, partitionBy = Seq("ts")))
    assert(e.getMessage.contains("round-trip"))
    // date DOES round-trip (timezone-free cast both ways)
    val t2 = freshTable("datepart")
    TxLog.append(
      (0 until 6).toDF("k").withColumn("d", date_add(lit("2026-01-01"), $"k" % 2)),
      t2, partitionBy = Seq("d"))
    val out = spark.read.format("graft").load(t2)
    assert(out.schema("d").dataType == org.apache.spark.sql.types.DateType)
    assert(out.filter($"d" === "2026-01-02").count() == 3)
  }
}
