package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Table properties, CHECK constraints (validated at ADD, enforced at
  * every new-row write), CONVERT TO GRAFT (in-place parquet adoption),
  * and zero-copy CLONE. */
class TablePropsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graftprops_$name").toString

  test("properties fold through replay and survive a checkpoint boundary") {
    val t = fresh("props")
    TxLog.append(Seq(1).toDF("k"), t)
    TxLog.setProperties(t, Map("owner" -> "ingest", "tier" -> "gold"))
    TxLog.unsetProperties(t, Seq("tier", "never-existed"))
    TxLog.setProperties(t, Map("owner" -> "curation")) // last write wins
    assert(TxLog.properties(t) == Map("owner" -> "curation"))
    // cross a checkpoint (every 10th commit) and fold from it
    (0 until 9).foreach(i => TxLog.append(Seq(i).toDF("k"), t))
    assert(TxLog.latestVersion(t) >= 10)
    assert(TxLog.properties(t) == Map("owner" -> "curation"),
      "props must persist through the checkpoint path")
  }

  test("CHECK constraints: ADD validates existing rows; writes enforce; DROP lifts") {
    val t = fresh("check")
    TxLog.append(Seq((1, 10.0), (2, 20.0)).toDF("k", "price"), t)
    // a constraint the table already breaks must never commit
    val e0 = intercept[IllegalArgumentException](
      TxLog.addConstraint(spark, t, "pricey", "price > 15"))
    assert(e0.getMessage.contains("existing row"))
    TxLog.addConstraint(spark, t, "positive", "price > 0")
    assert(TxLog.properties(t)("constraint.positive") == "price > 0")
    // violating append refuses BEFORE commit; table unchanged
    val head = TxLog.latestVersion(t)
    val e1 = intercept[IllegalArgumentException](
      TxLog.append(Seq((3, -1.0)).toDF("k", "price"), t))
    assert(e1.getMessage.contains("positive"), e1.getMessage)
    assert(TxLog.latestVersion(t) == head && TxLog.snapshot(spark, t).count() == 2)
    // NULL passes (SQL CHECK semantics); valid rows flow
    TxLog.append(Seq((Some(4), Option.empty[Double])).toDF("k", "price"), t)
    TxLog.append(Seq((5, 5.0)).toDF("k", "price"), t)
    assert(TxLog.snapshot(spark, t).count() == 4)
    // UPDATE postimages are gated too
    val e2 = intercept[IllegalArgumentException](
      TxLog.update(spark, t, $"k" === 5, Seq("price" -> lit(-9.0))))
    assert(e2.getMessage.contains("positive"))
    // merge gates its new values
    val e3 = intercept[IllegalArgumentException](
      TxLog.merge(spark, t, Seq((9, -3.0)).toDF("k", "price"), "k"))
    assert(e3.getMessage.contains("positive"))
    // DROP lifts enforcement; unknown names refuse loudly
    TxLog.dropConstraint(t, "positive")
    TxLog.append(Seq((6, -6.0)).toDF("k", "price"), t)
    assert(TxLog.snapshot(spark, t).count() == 5)
    intercept[IllegalArgumentException](TxLog.dropConstraint(t, "positive"))
  }

  test("RESTORE cannot resurrect rows a now-active constraint keeps out") {
    val t = fresh("restoregate")
    TxLog.append(Seq((1, -5.0), (2, 2.0)).toDF("k", "price"), t) // v1: has a violator
    TxLog.delete(spark, t, $"price" < 0)                          // v2: clean
    TxLog.addConstraint(spark, t, "pos", "price > 0")             // v3: head is clean
    val e = intercept[IllegalArgumentException](TxLog.restore(spark, t, 1L))
    assert(e.getMessage.contains("pos"), e.getMessage)
    assert(TxLog.snapshot(spark, t).count() == 1, "the refused restore must not land")
    TxLog.dropConstraint(t, "pos")
    TxLog.restore(spark, t, 1L)
    assert(TxLog.snapshot(spark, t).count() == 2)
  }

  test("raw property writes cannot smuggle a constraint past validation") {
    val t = fresh("smuggle")
    TxLog.append(Seq((1, -5.0)).toDF("k", "price"), t)
    val e = intercept[IllegalArgumentException](
      TxLog.setProperties(t, Map("constraint.pos" -> "price > 0")))
    assert(e.getMessage.contains("ADD CONSTRAINT"), e.getMessage)
    assert(TxLog.properties(t).isEmpty)
  }

  test("constraint SQL: ADD/DROP CONSTRAINT statements + catalog TBLPROPERTIES") {
    val t = fresh("checksql")
    TxLog.append(Seq((1, 10.0)).toDF("k", "price"), t)
    spark.sql(s"ALTER TABLE graft '$t' ADD CONSTRAINT pos CHECK (price > 0)")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_props_v " +
      s"USING graft OPTIONS (path '$t')")
    val e = intercept[Exception](
      spark.sql("INSERT INTO graft_props_v VALUES (2, -1.0)"))
    assert(e.getMessage.contains("pos"), e.getMessage)
    spark.sql(s"ALTER TABLE graft '$t' DROP CONSTRAINT pos")
    spark.sql("INSERT INTO graft_props_v VALUES (2, -1.0)")
    assert(spark.sql("SELECT COUNT(*) FROM graft_props_v").head.getLong(0) == 2)
    // catalog tier: SET/UNSET TBLPROPERTIES commit through the log and
    // surface in SHOW TBLPROPERTIES; raw constraint.* writes refuse
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_props").toString
    spark.conf.set("spark.sql.catalog.gprops", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gprops.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gprops.ns")
    spark.sql("CREATE TABLE gprops.ns.t (k BIGINT) USING graft")
    spark.sql("ALTER TABLE gprops.ns.t SET TBLPROPERTIES ('team'='ops')")
    val shown = spark.sql("SHOW TBLPROPERTIES gprops.ns.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("team").contains("ops"), s"got $shown")
    spark.sql("ALTER TABLE gprops.ns.t UNSET TBLPROPERTIES ('team')")
    assert(!spark.sql("SHOW TBLPROPERTIES gprops.ns.t").collect()
      .exists(_.getString(0) == "team"))
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE gprops.ns.t SET TBLPROPERTIES ('constraint.x'='k > 0')"))
    assert(e2.getMessage.contains("ADD CONSTRAINT"), e2.getMessage)
  }

  test("CONVERT TO GRAFT adopts a hive-partitioned parquet dir in place") {
    val dir = fresh("convert")
    (0 until 30).toDF("k").withColumn("b", concat(lit("b"), $"k" % 3))
      .write.mode("overwrite").partitionBy("b").parquet(dir)
    val res = spark.sql(s"CONVERT TO GRAFT '$dir' PARTITIONED BY (b)").head()
    assert(res.getLong(0) == 1L && res.getInt(1) >= 3)
    val snap = TxLog.snapshotInfo(dir)
    assert(snap.partitionCols == Seq("b"))
    val df = spark.read.format("graft").load(dir)
    assert(df.count() == 30)
    assert(df.filter($"b" === "b1").count() == 10)
    // the log now owns the files: ordinary writes flow through it
    TxLog.append(Seq((100, "b1")).toDF("k", "b"), dir)
    assert(spark.read.format("graft").load(dir).count() == 31)
    // partition-value zone maps synthesized at convert time prune files
    val pruned = TxLog.pruneFiles(TxLog.snapshotInfo(dir), "b", "b1", "b1")
    assert(pruned.length < TxLog.snapshotInfo(dir).files.length)
    // converting twice refuses
    intercept[IllegalArgumentException](TxLog.convert(spark, dir))
  }

  test("OPTIMIZE ... WHERE compacts only the named partition subtree") {
    val t = fresh("optwhere")
    TxLog.append(
      (0 until 40).toDF("k").withColumn("b", concat(lit("b"), $"k" % 2))
        .repartition(4),
      t, partitionBy = Seq("b"))
    val before = TxLog.snapshotInfo(t)
    val b1Before = before.files.filter(_.contains("b=b1"))
    val b0Before = before.files.filter(_.contains("b=b0")).toSet
    assert(b1Before.length > 1, "fixture needs a multi-file partition")
    val res = spark.sql(s"OPTIMIZE graft '$t' FILES 1 WHERE b = 'b1'").head()
    assert(res.getInt(2) < res.getInt(1), s"file count must shrink: $res")
    val after = TxLog.snapshotInfo(t)
    assert(after.files.filter(_.contains("b=b0")).toSet == b0Before,
      "the un-named partition's files must carry over untouched")
    assert(after.files.count(_.contains("b=b1")) == 1,
      "the named partition must compact to one file")
    assert(spark.read.format("graft").load(t).count() == 40)
    // the scoped commit removed ONLY b1 files
    val c = TxLog.history(t).last
    assert(c.op == "compact" && c.remove.forall(_.contains("b=b1")))
    // a spec naming a non-partition column refuses
    val e = intercept[Exception](
      spark.sql(s"OPTIMIZE graft '$t' WHERE k = '3'"))
    assert(e.getMessage.contains("not a partition column"), e.getMessage)
  }

  test("VACUUM DRY RUN lists the exact reclaim set without deleting") {
    val t = fresh("vacdry")
    TxLog.append((0 until 20).toDF("k"), t)
    TxLog.overwrite(Seq(1).toDF("k"), t) // orphans v1's files
    val listed = spark.sql(s"VACUUM graft '$t' RETAIN 0 HOURS DRY RUN")
      .collect().map(_.getString(0)).toSet
    assert(listed.nonEmpty, "the dead v1 files must list")
    assert(listed.forall(p =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(t, p))),
      "DRY RUN must not delete anything")
    // the real vacuum reclaims exactly the listed set
    val n = spark.sql(s"VACUUM graft '$t' RETAIN 0 HOURS").head.getLong(0)
    assert(n == listed.size, s"vacuum removed $n, dry run listed ${listed.size}")
    assert(listed.forall(p =>
      !java.nio.file.Files.exists(java.nio.file.Paths.get(t, p))))
    assert(spark.read.format("graft").load(t).count() == 1)
  }

  test("CLEAN LOG bounds the log directory; the floor refuses loudly below it") {
    val t = fresh("cleanlog")
    (0 until 25).foreach(i => TxLog.append(Seq(i).toDF("k"), t)) // cps at 10, 20
    val res = spark.sql(s"CLEAN LOG graft '$t' RETAIN 0 HOURS").head()
    assert(res.getInt(0) == 20,
      s"19 commit entries (1..19) + checkpoint 10 must clean, got ${res.getInt(0)}")
    assert(res.getLong(1) == 20L, "the floor is the newest checkpoint")
    // head reads untouched; history shows the retained suffix
    assert(TxLog.snapshot(spark, t).count() == 25)
    assert(TxLog.history(t).head.version == 20L)
    // time travel below the floor refuses LOUDLY (vacuum's contract,
    // applied to the log); at/above the floor stays fully replayable
    val e = intercept[IllegalStateException](
      TxLog.snapshot(spark, t, Some(5L)).count())
    assert(e.getMessage.contains("log retention"), e.getMessage)
    assert(TxLog.snapshot(spark, t, Some(20L)).count() == 20)
    assert(TxLog.snapshot(spark, t, Some(22L)).count() == 22)
    intercept[IllegalStateException](TxLog.changeFeed(spark, t, 4, 25).count())
    assert(TxLog.changeFeed(spark, t, 20, 25).count() == 5)
    // the table keeps working: appends, then a second clean is a no-op
    // until the next checkpoint advances the floor
    TxLog.append(Seq(99).toDF("k"), t)
    assert(TxLog.latestVersion(t) == 26)
    assert(spark.sql(s"CLEAN LOG graft '$t' RETAIN 0 HOURS").head().getInt(0) == 0)
  }

  test("CLONE is zero-copy (hard links), independent, and carries metadata") {
    val srcT = fresh("clonesrc")
    TxLog.append((0 until 20).toDF("k").withColumn("tag", lit("x")), srcT)
    TxLog.setProperties(srcT, Map("owner" -> "prod"))
    TxLog.append(Seq((99, "y")).toDF("k", "tag"), srcT) // v3 (post-props)
    val dstT = fresh("clonedst") + "/clone"
    val res = spark.sql(s"CLONE graft '$srcT' TO '$dstT' VERSION 3").head()
    assert(res.getLong(0) == 1L)
    val clone = spark.read.format("graft").load(dstT)
    assert(clone.count() == 21)
    assert(TxLog.properties(dstT)("owner") == "prod")
    assert(TxLog.properties(dstT).contains("graft.clonedFrom"))
    // zero-copy: the shared file is the SAME inode, not a byte copy
    val sharedRel = TxLog.snapshotInfo(dstT).files.head
    def ino(p: java.nio.file.Path): Any =
      java.nio.file.Files.getAttribute(p, "unix:ino")
    assert(ino(java.nio.file.Paths.get(srcT, sharedRel)) ==
      ino(java.nio.file.Paths.get(dstT, sharedRel)))
    // independence: divergent writes never cross
    TxLog.delete(spark, dstT, $"k" < 10)
    TxLog.append(Seq((500, "z")).toDF("k", "tag"), srcT)
    assert(spark.read.format("graft").load(dstT).count() == 11)
    assert(spark.read.format("graft").load(srcT).count() == 22)
    // source vacuum cannot break the clone: links keep bytes alive
    TxLog.overwrite(Seq((1, "w")).toDF("k", "tag"), srcT)
    TxLog.vacuum(srcT, olderThanMs = 0)
    assert(spark.read.format("graft").load(dstT).count() == 11,
      "a source vacuum must never reclaim a clone's bytes")
  }
}
