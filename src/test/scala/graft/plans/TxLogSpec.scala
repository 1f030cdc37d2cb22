package graft.plans

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the transaction log: atomic visibility, optimistic-concurrency
  * races, conflict detection, checkpoint-assisted replay, schema
  * enforcement, vacuum semantics. Everything here runs against real
  * multi-file parquet commits on local disk — the same code path the
  * registry queries take. */
class TxLogSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"txlog_$name").toString
    // createTempDirectory makes the dir; TxLog owns the layout beneath it
    p
  }

  private def df(range: Range, tag: String): DataFrame =
    range.toDF("k").withColumn("tag", lit(tag)).repartition(2)

  private def keys(d: DataFrame): Set[Int] =
    d.select("k").as[Int].collect().toSet

  test("append is atomic and snapshot reads see whole commits") {
    val t = freshTable("atomic")
    val v1 = TxLog.append(df(0 until 10, "a"), t)
    val v2 = TxLog.append(df(10 until 25, "b"), t)
    assert(v1 == 1 && v2 == 2)
    assert(keys(TxLog.snapshot(spark, t)) == (0 until 25).toSet)
    assert(keys(TxLog.snapshot(spark, t, Some(1))) == (0 until 10).toSet)
  }

  test("overwrite swaps content atomically; time travel still sees the past") {
    val t = freshTable("overwrite")
    TxLog.append(df(0 until 10, "a"), t)
    TxLog.overwrite(df(100 until 105, "c"), t)
    assert(keys(TxLog.snapshot(spark, t)) == (100 until 105).toSet)
    assert(keys(TxLog.snapshot(spark, t, Some(1))) == (0 until 10).toSet)
    // the overwrite's remove set names every v1 file
    val h = TxLog.history(t)
    assert(h.last.op == "overwrite" && h.last.remove.toSet == h.head.add.toSet)
  }

  test("append schema mismatch fails loudly naming the drift") {
    val t = freshTable("schema")
    TxLog.append(df(0 until 5, "a"), t)
    val bad = (0 until 5).toDF("k").withColumn("tag", lit(7L)) // tag: long, not string
    val e = intercept[IllegalArgumentException](TxLog.append(bad, t))
    assert(e.getMessage.contains("schema mismatch") && e.getMessage.contains("tag"))
    // overwrite may evolve
    TxLog.overwrite(bad, t)
    assert(TxLog.snapshot(spark, t).schema("tag").dataType.typeName == "long")
  }

  test("concurrent appends all land with distinct versions and no lost rows") {
    val t = freshTable("race")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = (0 until 8).map { i =>
      scala.concurrent.Future(TxLog.append(df(i * 10 until i * 10 + 10, s"w$i"), t))
    }
    val versions = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    assert(versions.toSet == (1L to 8L).toSet, s"versions: $versions")
    assert(keys(TxLog.snapshot(spark, t)) == (0 until 80).toSet)
  }

  test("stale compaction aborts instead of resurrecting removed files") {
    val t = freshTable("conflict")
    TxLog.append(df(0 until 20, "a"), t)
    // plan a compaction against v1's files, then lose them to an overwrite
    val planned = TxLog.history(t).head.add
    TxLog.overwrite(df(50 until 55, "b"), t)
    // replaying compact() now must observe the inputs are gone; simulate
    // the race by asking compact to run — its inputs come from HEAD, so
    // to hit the conflict path we interleave: snapshot under compact is
    // HEAD (v2), and a concurrent overwrite between its read and commit
    // removes those files.
    val racer = new Thread(() => {
      // give compact a moment to read its snapshot, then swap the table
      Thread.sleep(400)
      TxLog.overwrite(df(200 until 210, "c"), t): Unit
    })
    racer.start()
    val outcome =
      try { TxLog.compact(spark, t, 1); "committed" }
      catch { case _: java.util.ConcurrentModificationException => "aborted" }
    racer.join()
    // either the compact published before the racer (fine: racer's
    // overwrite then removed its output) or it detected the conflict —
    // in BOTH cases HEAD must be exactly the final overwrite's rows.
    assert(Set("committed", "aborted").contains(outcome))
    assert(keys(TxLog.snapshot(spark, t)) == (200 until 210).toSet)
    assert(planned.nonEmpty)
  }

  test("checkpoints bound replay and agree with the full log") {
    val t = freshTable("checkpoint")
    (0 until 12).foreach(i => TxLog.append(df(i * 5 until i * 5 + 5, s"b$i"), t))
    val cp = java.nio.file.Paths.get(t, "_graft_log", f"${10L}%020d.checkpoint.json")
    assert(java.nio.file.Files.exists(cp), "10th commit must write a checkpoint")
    // a snapshot that starts from the checkpoint equals the full union
    assert(keys(TxLog.snapshot(spark, t)) == (0 until 60).toSet)
    assert(keys(TxLog.snapshot(spark, t, Some(11))) == (0 until 55).toSet)
  }

  test("changes() delivers each batch once and skips compactions") {
    val t = freshTable("changes")
    TxLog.append(df(0 until 10, "a"), t)
    TxLog.append(df(10 until 30, "b"), t)
    val v3 = TxLog.compact(spark, t, 1)
    TxLog.append(df(30 until 40, "d"), t)
    assert(keys(TxLog.changes(spark, t, 0, 1)) == (0 until 10).toSet)
    assert(keys(TxLog.changes(spark, t, 1, 2)) == (10 until 30).toSet)
    assert(TxLog.changes(spark, t, 2, v3).isEmpty)
    assert(keys(TxLog.changes(spark, t, v3, v3 + 1)) == (30 until 40).toSet)
    // compaction shrank the layout but not the data
    assert(TxLog.liveFileCount(t, Some(v3)) <= 2)
    assert(keys(TxLog.snapshot(spark, t)) == (0 until 40).toSet)
  }

  test("vacuum frees dead files, preserves HEAD, and poisons pre-vacuum travel loudly") {
    val t = freshTable("vacuum")
    TxLog.append(df(0 until 10, "a"), t)
    TxLog.overwrite(df(10 until 15, "b"), t)
    // default retention: the just-dead files are inside the grace
    // window that protects a concurrent writer's staged files
    assert(TxLog.vacuum(t) == 0, "retention must keep fresh orphans")
    val freed = TxLog.vacuum(t, olderThanMs = 0L)
    assert(freed >= 1, s"freed $freed")
    assert(keys(TxLog.snapshot(spark, t)) == (10 until 15).toSet)
    val e = intercept[IllegalStateException](TxLog.snapshot(spark, t, Some(1)).count())
    assert(e.getMessage.contains("vacuumed"))
    // vacuum again: nothing left to free
    assert(TxLog.vacuum(t, olderThanMs = 0L) == 0)
  }

  test("zone maps prune files and never change results") {
    val t = freshTable("stats")
    // range-disjoint files: k in [0,25) / [25,50) / [50,75) / [75,100)
    val src = (0 until 100).toDF("k").withColumn("tag", concat(lit("v"), $"k" % 7))
    TxLog.append(src.repartitionByRange(4, $"k").sortWithinPartitions("k"), t)
    val (df, planned, total) = TxLog.snapshotRange(spark, t, "k", "30", "45")
    assert(total == 4 && planned == 1, s"planned $planned of $total")
    assert(keys(df) == (30 to 45).toSet)
    // string column pruning
    val (df2, p2, _) = TxLog.snapshotRange(spark, t, "tag", "v2", "v3")
    assert(keys(df2) == (0 until 100).filter(k => k % 7 == 2 || k % 7 == 3).toSet)
    assert(p2 == 4, "v2/v3 tags appear in every range file — nothing prunable")
    // a range beyond the data planes zero files
    val (df3, p3, _) = TxLog.snapshotRange(spark, t, "k", "500", "900")
    assert(p3 == 0 && df3.isEmpty)
  }

  test("merge rewrites only the files containing matched keys") {
    val t = freshTable("merge")
    val src = (0 until 100).toDF("k").withColumn("tag", lit("old"))
    TxLog.append(src.repartitionByRange(4, $"k").sortWithinPartitions("k"), t)
    // updates: 3 existing keys in one range file + 1 brand-new key
    val upd = Seq(30, 31, 44, 900).toDF("k").withColumn("tag", lit("new"))
    TxLog.merge(spark, t, upd, "k")
    val last = TxLog.history(t).last
    assert(last.op == "merge" && last.remove.length == 1,
      s"merge should rewrite exactly the [25,50) file, removed ${last.remove.length}")
    val out = TxLog.snapshot(spark, t)
    assert(out.count() == 101)
    assert(keys(out.filter($"tag" === "new")) == Set(30, 31, 44, 900))
    // merge with no matching and no overlapping range = pure append
    TxLog.merge(spark, t, Seq(1000).toDF("k").withColumn("tag", lit("ins")), "k")
    assert(TxLog.history(t).last.op == "append")
    assert(TxLog.snapshot(spark, t).count() == 102)
    // duplicate keys in updates make upsert ambiguous — refused loudly
    val dup = Seq(7, 7).toDF("k").withColumn("tag", lit("d"))
    val e = intercept[IllegalArgumentException](TxLog.merge(spark, t, dup, "k"))
    assert(e.getMessage.contains("duplicate"))
  }

  test("idempotent appends skip replayed batches, even racing ones") {
    val t = freshTable("txn")
    assert(TxLog.appendIdempotent(df(0 until 10, "a"), t, "job1", 0L).contains(1L))
    assert(TxLog.appendIdempotent(df(10 until 20, "b"), t, "job1", 1L).contains(2L))
    // replayed epoch: same app, old batch -> skipped, table unchanged
    assert(TxLog.appendIdempotent(df(99 until 120, "dup"), t, "job1", 1L).isEmpty)
    assert(keys(TxLog.snapshot(spark, t)) == (0 until 20).toSet)
    // a different app's batch numbering is independent
    assert(TxLog.appendIdempotent(df(20 until 25, "c"), t, "job2", 0L).contains(3L))
    assert(keys(TxLog.snapshot(spark, t)) == (0 until 25).toSet)
    // the duplicate was skipped on the FAST path — before any data was
    // written — so there is nothing for vacuum to reclaim (orphans only
    // arise when two replays race past the pre-check simultaneously)
    assert(TxLog.vacuum(t) == 0)
    assert(keys(TxLog.snapshot(spark, t)) == (0 until 25).toSet)
  }

  test("txn ledger survives checkpointed replay") {
    val t = freshTable("txncp")
    (0L until 11L).foreach(i =>
      assert(TxLog.appendIdempotent(df(i.toInt * 3 until i.toInt * 3 + 3, "x"), t, "app", i).nonEmpty))
    // checkpoint exists at v10; the ledger must still refuse batch 10
    assert(TxLog.appendIdempotent(df(0 until 2, "dup"), t, "app", 10L).isEmpty)
    assert(TxLog.snapshot(spark, t).count() == 33)
  }

  test("appendEvolve widens the schema; old files read NULL; type changes refuse") {
    val t = freshTable("evolve")
    TxLog.append(df(0 until 5, "a"), t) // (k, tag)
    TxLog.appendEvolve(
      (5 until 8).toDF("k").withColumn("tag", lit("b")).withColumn("score", lit(2.5)), t)
    val head = TxLog.snapshot(spark, t)
    assert(head.schema.fieldNames.toSeq == Seq("k", "tag", "score"))
    assert(head.filter($"score".isNull).count() == 5) // v1 rows
    assert(head.filter($"score" === 2.5).count() == 3)
    // time travel serves the v1 schema
    assert(TxLog.snapshot(spark, t, Some(1)).schema.fieldNames.toSeq == Seq("k", "tag"))
    // evolving an EXISTING column's type is refused loudly
    val bad = (8 until 9).toDF("k").withColumn("tag", lit(1L))
    val e = intercept[IllegalArgumentException](TxLog.appendEvolve(bad, t))
    assert(e.getMessage.contains("cannot change column types") && e.getMessage.contains("tag"))
    // a strict append with the ORIGINAL narrow schema now fails (the
    // table wants the evolved width); appendEvolve accepts it and the
    // missing column reads NULL for those rows
    intercept[IllegalArgumentException](TxLog.append(df(9 until 10, "c"), t))
    TxLog.appendEvolve(df(9 until 10, "c"), t)
    assert(TxLog.snapshot(spark, t).filter($"k" === 9 && $"score".isNull).count() == 1)
  }

  test("delete rewrites only matching files; NULL keeps; all-match files just drop") {
    val t = freshTable("delete")
    val src = (0 until 100).toDF("k")
      .withColumn("tag", when($"k" % 10 === 0, lit(null: String)).otherwise(lit("x")))
    TxLog.append(src.repartitionByRange(4, $"k").sortWithinPartitions("k"), t)
    // band delete: only the [25,50) file contains matches
    TxLog.delete(spark, t, $"k" >= 30 && $"k" <= 45)
    val h1 = TxLog.history(t).last
    assert(h1.op == "delete" && h1.remove.length == 1)
    assert(keys(TxLog.snapshot(spark, t)) == (0 until 100).toSet -- (30 to 45))
    // NULL condition keeps rows (SQL DELETE semantics)
    TxLog.delete(spark, t, when($"tag" === "never", lit(true)))
    assert(TxLog.snapshot(spark, t).count() == 84)
    // deleting an entire file's rows drops the file without a rewrite
    TxLog.delete(spark, t, $"k" < 25)
    val h3 = TxLog.history(t).last
    assert(h3.op == "delete" && h3.add.isEmpty && h3.remove.length == 1)
    assert(keys(TxLog.snapshot(spark, t)) == ((25 until 30) ++ (46 until 100)).toSet)
    // time travel still sees the pre-delete state
    assert(keys(TxLog.snapshot(spark, t, Some(1))) == (0 until 100).toSet)
  }

  test("metadata aggregates are exact and refuse what they can't prove") {
    val t = freshTable("meta")
    TxLog.append(df(0 until 40, "a"), t)
    TxLog.append(df(100 until 110, "b"), t)
    assert(TxLog.metadataCount(t).contains(50L))
    assert(TxLog.metadataMinMax(t, "k").contains(("0", "109")))
    // mutation-aware: delete shrinks the count through the rewrite
    TxLog.delete(spark, t, $"k" >= 100)
    assert(TxLog.metadataCount(t).contains(40L))
    assert(TxLog.metadataMinMax(t, "k").contains(("0", "39")))
    // time travel reads the old metadata
    assert(TxLog.metadataCount(t, Some(2)).contains(50L))
    // short string columns serve exactly (stats flagged exact); the
    // delete above dropped every "b" row, so head min/max is ("a","a")
    // while time travel still sees ("a","b")
    assert(TxLog.metadataMinMax(t, "tag").contains(("a", "a")))
    assert(TxLog.metadataMinMax(t, "tag", Some(2)).contains(("a", "b")))
    // unknown columns refuse
    assert(TxLog.metadataMinMax(t, "nope").isEmpty)
  }

  test("restore rolls back metadata-only, keeps history, refuses vacuumed targets") {
    val t = freshTable("restore")
    TxLog.append(df(0 until 10, "a"), t)
    TxLog.overwrite(df(50 until 55, "b"), t)
    TxLog.restore(spark, t, 1L)
    assert(keys(TxLog.snapshot(spark, t)) == (0 until 10).toSet)
    // history is append-only: the bad version is still readable
    assert(keys(TxLog.snapshot(spark, t, Some(2))) == (50 until 55).toSet)
    assert(TxLog.history(t).map(_.op) == Seq("append", "overwrite", "restore"))
    // restoring to the head state is a valid no-op-shaped commit
    TxLog.restore(spark, t, 3L)
    assert(keys(TxLog.snapshot(spark, t)) == (0 until 10).toSet)
    // vacuum kills dead versions; restore to them must refuse loudly
    TxLog.vacuum(t, olderThanMs = 0L)
    val e = intercept[IllegalStateException](TxLog.restore(spark, t, 2L))
    assert(e.getMessage.contains("vacuumed"))
  }

  test("the ingest feed skips delete/restore rewrites and survives vacuumed history") {
    val t = freshTable("feedops")
    TxLog.append(df(0 until 20, "a"), t)
    TxLog.overwrite(df(100 until 110, "b"), t)
    TxLog.vacuum(t, olderThanMs = 0L) // v1's files are gone BEFORE any feed exists
    def feedFiles(): Set[String] = {
      val d = new java.io.File(TxLog.feedDir(t))
      Option(d.listFiles()).getOrElse(Array.empty).map(_.getName).toSet
    }
    // heal must not crash on the vacuumed v1 adds; v2's files link
    val after = feedFiles()
    assert(after.nonEmpty && after.forall(_.startsWith(f"v${2L}%010d")))
    // delete rewrites survivors — the feed must NOT re-deliver them
    TxLog.delete(spark, t, $"k" === 100)
    assert(feedFiles() == after, "delete rewrites must not feed")
    // restore re-points old files — also not new data
    TxLog.restore(spark, t, 2L)
    assert(feedFiles() == after, "restore must not feed")
    // a fresh append still feeds
    TxLog.append(df(200 until 205, "c"), t)
    assert(feedFiles().size > after.size)
  }

  test("schema evolution refuses case-variant column names") {
    val t = freshTable("case")
    TxLog.append(df(0 until 3, "a"), t) // (k, tag)
    val bad = (3 until 5).toDF("K").withColumn("tag", lit("b"))
    val e = intercept[IllegalArgumentException](TxLog.appendEvolve(bad, t))
    assert(e.getMessage.contains("case-insensitive clash"))
  }

  test("a corrupt commit file fails the read loudly, never silently skips") {
    val t = freshTable("corrupt")
    TxLog.append(df(0 until 5, "a"), t)
    TxLog.append(df(5 until 10, "b"), t)
    val v2 = java.nio.file.Paths.get(t, "_graft_log", f"${2L}%020d.json")
    java.nio.file.Files.writeString(v2,
      java.nio.file.Files.readString(v2).take(20)) // truncate mid-JSON
    // every path that must replay commit 2 now fails with a parse error
    // rather than serving a partial table
    intercept[Exception](TxLog.snapshot(spark, t).count())
    intercept[Exception](TxLog.history(t))
    assert(TxLog.latestVersion(t) == 2) // name listing alone never parses
  }

  test("reads of non-tables and out-of-range versions fail loudly") {
    val t = freshTable("errors")
    val e1 = intercept[IllegalArgumentException](TxLog.snapshot(spark, t))
    assert(e1.getMessage.contains("not a graft table"))
    TxLog.append(df(0 until 3, "a"), t)
    val e2 = intercept[IllegalArgumentException](TxLog.snapshot(spark, t, Some(9)))
    assert(e2.getMessage.contains("out of range"))
  }

  test("long string stats record truncated BOUNDS: prune soundly, refuse metadata min/max") {
    val t = freshTable("strbound")
    // two range-disjoint files keyed by a LONG string (> 32 code
    // points) whose discriminating digits sit INSIDE the recorded
    // prefix: file A holds 000…-499…, file B holds 500…-999…
    val pad = "x" * 40
    val src = (0 until 1000).toDF("i")
      .withColumn("s", concat(format_string("%03d", $"i"), lit(pad)))
      .withColumn("k", $"i")
    TxLog.append(src.repartitionByRange(2, $"s").sortWithinPartitions("s"), t)
    val snap = TxLog.snapshotInfo(t)
    val stats = snap.files.flatMap(f => snap.stats(f).get("s"))
    assert(stats.length == 2)
    assert(stats.forall(!_.exact), "3+40-char values must record bounded stats")
    assert(stats.forall(c => c.min.length <= 33 && c.max.length <= 33),
      s"bounds must stay prefix-sized, got ${stats.map(s => (s.min.length, s.max.length))}")
    // bounds are VALID: a band inside file B's range plans only file B,
    // and the row filter on top returns exactly the band
    val (dfB, planned, total) =
      TxLog.snapshotRange(spark, t, "s", "700", "721")
    assert(total == 2 && planned == 1, s"planned $planned of $total")
    assert(dfB.count() == 21)
    // metadata-only MIN/MAX refuses inexact string stats
    assert(TxLog.metadataMinMax(t, "s").isEmpty,
      "bounded string stats must not serve as attained extrema")
  }

  test("string stat comparisons run in UTF-8 byte order, not UTF-16 code units") {
    // U+E000 (one UTF-16 code unit 0xE000) vs U+1F600 emoji (surrogate
    // pair starting 0xD83D): Java String order puts the emoji FIRST,
    // UTF-8 byte order (= code-point order) puts it LAST. Files split on
    // that boundary must prune by the UTF-8 order parquet stats use.
    val t = freshTable("utf8ord")
    val pua = ""
    val emoji = new String(Character.toChars(0x1F600))
    assert(emoji < pua, "precondition: UTF-16 order ranks the emoji below U+E000")
    val src = Seq("a", "b", pua, emoji).toDF("s")
    TxLog.append(src.repartition(1), t)
    // parquet's UTF-8 max is the EMOJI; UTF-16 comparison would claim
    // max(=emoji) < lo(=U+E000) and prune the band's only file away
    val (dfE, planned, total) =
      TxLog.snapshotRange(spark, t, "s", pua, emoji)
    assert(total == 1 && planned == 1,
      s"UTF-16 ordering wrongly pruned the live file: planned $planned of $total")
    assert(dfE.count() == 2)
  }

  test("timestampAsOf resolves the newest version at or before the instant") {
    val t = freshTable("tsasof")
    TxLog.append(df(0 until 10, "a"), t)
    Thread.sleep(15)
    TxLog.append(df(10 until 20, "b"), t)
    Thread.sleep(15)
    TxLog.overwrite(df(100 until 105, "c"), t)
    val h = TxLog.history(t)
    assert(h.map(_.ts).sliding(2).forall { case Seq(a, b) => a <= b },
      "commit timestamps must be monotone with version")
    // an instant between v2 and v3 resolves to v2
    val mid = h(1).ts
    assert(TxLog.versionAt(t, mid) == 2L)
    assert(keys(TxLog.snapshotAt(spark, t, mid)) == (0 until 20).toSet)
    // an instant after head resolves to head; exact first-commit ts is v1
    assert(TxLog.versionAt(t, System.currentTimeMillis() + 1000) == 3L)
    assert(TxLog.versionAt(t, h(0).ts) >= 1L)
    // predating the table refuses loudly
    val e = intercept[IllegalArgumentException](TxLog.versionAt(t, h(0).ts - 10000))
    assert(e.getMessage.contains("predates"))
    // the connector option pins the same snapshot and refuses combination
    assert(spark.read.format("graft").option("timestampAsOf", mid.toString).load(t)
      .count() == 20)
    val e2 = intercept[Exception](spark.read.format("graft")
      .option("timestampAsOf", mid.toString).option("versionAsOf", "1").load(t))
    assert(e2.getMessage.contains("mutually exclusive"))
  }

  test("merge aborts when a concurrent append intersects its key range") {
    val t = freshTable("mergerace")
    val src = (0 until 100).toDF("k").withColumn("tag", lit("old"))
    TxLog.append(src.repartitionByRange(4, $"k").sortWithinPartitions("k"), t)
    val upd = Seq(30, 31).toDF("k").withColumn("tag", lit("new"))
    // racer lands an overlapping key AFTER merge reads its snapshot
    val racer = new Thread(() => {
      Thread.sleep(700)
      TxLog.append(Seq(31).toDF("k").withColumn("tag", lit("race")), t): Unit
    })
    racer.start()
    val outcome =
      try { TxLog.merge(spark, t, upd, "k"); "committed" }
      catch { case _: java.util.ConcurrentModificationException => "aborted" }
    racer.join()
    // either the merge published first (the racer's append then landed a
    // duplicate AFTER it — allowed, appends commute) or the merge saw the
    // intersecting add and aborted; what must NEVER happen is a merge
    // that published AFTER the racer while claiming uniqueness
    if (outcome == "aborted") {
      val out = TxLog.snapshot(spark, t)
      assert(out.filter($"tag" === "new").count() == 0, "aborted merge must leave no rows")
    }
    // a merge against quiesced state with a DISJOINT concurrent append
    // commits fine: appends outside the key range commute
    val racer2 = new Thread(() => {
      Thread.sleep(700)
      TxLog.append(Seq(5000).toDF("k").withColumn("tag", lit("far")), t): Unit
    })
    racer2.start()
    TxLog.merge(spark, t, Seq(60, 61).toDF("k").withColumn("tag", lit("new2")), "k")
    racer2.join()
    val out2 = TxLog.snapshot(spark, t)
    assert(out2.filter($"tag" === "new2").count() == 2)
    assert(out2.filter($"k" === 5000).count() == 1)
  }
}
