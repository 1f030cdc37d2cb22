package graft.sources

import graft.TestSpark
import graft.plans.TxLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Native Structured Streaming on the transaction log: readStream tails
  * versions as offsets, writeStream commits micro-batches through the
  * idempotence ledger — end-to-end exactly-once across restarts, with
  * the append-only refusal contract on rewrite commits. */
class GraftStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graftstream_$name").toString

  private def drain(src: String, dst: String, ckpt: String,
      options: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format("graft")
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(src).writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start(dst)
    q.awaitTermination()
  }

  test("readStream tails the log, writeStream commits exactly-once across restarts") {
    val a = fresh("src"); val b = fresh("dst"); val ckpt = fresh("ckpt")
    TxLog.append((0 until 10).toDF("k").withColumn("tag", lit("a")), a)
    drain(a, b, ckpt)
    assert(spark.read.format("graft").load(b)
      .select("k").as[Int].collect().toSet == (0 until 10).toSet)
    // tail: only the NEW commit flows on the next drain
    TxLog.append((10 until 14).toDF("k").withColumn("tag", lit("b")), a)
    drain(a, b, ckpt)
    val out = spark.read.format("graft").load(b)
    assert(out.count() == 14)
    assert(out.filter($"tag" === "b").count() == 4)
    // restart with NOTHING new: no duplicate delivery, no empty commit spam
    val versions = TxLog.latestVersion(b)
    drain(a, b, ckpt)
    assert(spark.read.format("graft").load(b).count() == 14,
      "a drained stream must not re-deliver")
    assert(TxLog.latestVersion(b) <= versions + 1,
      "at most one (empty) commit may land on an idle drain")
    // the sink's commits carry the txn ledger (exactly-once machinery)
    assert(TxLog.snapshotInfo(b).txns.keys.exists(_.startsWith("graft-sink-")))
  }

  test("rewrite commits refuse by default; ignoreChanges accepts re-delivery") {
    val a = fresh("cow"); val b = fresh("cowdst"); val ckpt = fresh("cowckpt")
    TxLog.append((0 until 20).toDF("k").withColumn("tag", lit("x"))
      .repartitionByRange(2, $"k").sortWithinPartitions("k"), a)
    drain(a, b, ckpt)
    TxLog.delete(spark, a, $"k" === 3) // COW rewrite: removes + re-adds
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drain(a, b, ckpt))
    assert(e.getCause.getMessage.contains("ignoreChanges"),
      s"got: ${e.getCause.getMessage}")
    // acknowledged re-delivery: the rewritten survivors flow
    drain(a, b, ckpt, Map("ignoreChanges" -> "true"))
    val out = spark.read.format("graft").load(b)
    assert(out.count() > 20, "survivor rows re-deliver under ignoreChanges")
    assert(out.filter($"k" === 3).count() == 1, "the deleted row must not re-deliver")
  }

  test("startingVersion=latest tails only post-start commits; numeric version replays") {
    val a = fresh("startv")
    TxLog.append((0 until 5).toDF("k").withColumn("tag", lit("a")), a)  // v1
    TxLog.append((5 until 8).toDF("k").withColumn("tag", lit("b")), a)  // v2
    val b1 = fresh("dst1")
    drain(a, b1, fresh("ck1"), Map("startingVersion" -> "2"))
    assert(spark.read.format("graft").load(b1)
      .select("k").as[Int].collect().toSet == (5 until 8).toSet)
    val b2 = fresh("dst2"); val ck2 = fresh("ck2")
    drain(a, b2, ck2, Map("startingVersion" -> "latest"))
    assert(TxLog.latestVersion(b2) == 0, "latest: nothing before stream start")
    TxLog.append((8 until 9).toDF("k").withColumn("tag", lit("c")), a)  // v3
    drain(a, b2, ck2, Map("startingVersion" -> "latest"))
    assert(spark.read.format("graft").load(b2)
      .select("k").as[Int].collect().toSet == Set(8))
  }

  test("a 5-commit backlog drains in bounded epochs under maxVersionsPerBatch") {
    val a = fresh("adm"); val b = fresh("admdst"); val ckpt = fresh("admckpt")
    (0 until 5).foreach(i =>
      TxLog.append(Seq(i).toDF("k").withColumn("tag", lit("t")), a))
    drain(a, b, ckpt, Map("maxVersionsPerBatch" -> "2"))
    val out = spark.read.format("graft").load(b)
    assert(out.select("k").as[Int].collect().toSet == (0 until 5).toSet,
      "the capped drain must still deliver every row exactly once")
    // each epoch is one sink append: ceil(5 versions / cap 2) = 3 epochs
    val epochs = TxLog.history(b).count(c => c.op == "append" && c.dataChange)
    assert(epochs == 3,
      s"5-version backlog under maxVersionsPerBatch=2 must drain in 3 epochs, got $epochs")
    // idle restart under the same cap: nothing re-delivers
    drain(a, b, ckpt, Map("maxVersionsPerBatch" -> "2"))
    assert(spark.read.format("graft").load(b).count() == 5)
  }

  test("maxFilesPerTrigger bounds epochs by added files, admitting >=1 commit") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val a = fresh("admfiles")
    TxLog.append((0 until 9).toDF("k").repartition(3), a)  // v1: 3 files
    TxLog.append(Seq(9).toDF("k").repartition(1), a)        // v2: 1 file
    TxLog.append(Seq(10).toDF("k").repartition(1), a)       // v3: 1 file
    val src = new GraftStreamSource(spark, a, startingVersion = 1,
      ignoreChanges = false, maxFilesPerTrigger = Some(2L))
    // v1 alone exceeds the cap but is admitted anyway (never stall);
    // v2+v3 fit together in the second epoch
    val first = src.latestOffset(null, ReadLimit.allAvailable())
    assert(first == LongOffset(1), s"first epoch must stop after v1, got $first")
    val second = src.latestOffset(LongOffset(1), ReadLimit.allAvailable())
    assert(second == LongOffset(3), s"second epoch must admit v2+v3, got $second")
    assert(src.latestOffset(LongOffset(3), ReadLimit.allAvailable()) == null,
      "a drained source must report no data")
    // end-to-end: the engine honors the cap through a real drain
    val b = fresh("admfilesdst")
    drain(a, b, fresh("admfilesck"), Map("maxFilesPerTrigger" -> "2"))
    assert(spark.read.format("graft").load(b).count() == 11)
    assert(TxLog.history(b).count(c => c.op == "append" && c.dataChange) == 2)
  }

  test("startingVersion=0 with a cap neither crashes nor under-admits") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val a = fresh("startzero")
    TxLog.append(Seq(1).toDF("k"), a)
    TxLog.append(Seq(2).toDF("k"), a)
    // the exclusive lower bound of startingVersion=0 is -1 and must clamp
    // (admissionBoundary would otherwise read nonexistent commit 0)
    val src = new GraftStreamSource(spark, a, startingVersion = 0,
      ignoreChanges = false, maxFilesPerTrigger = Some(1L))
    assert(src.latestOffset(null, ReadLimit.allAvailable()) == LongOffset(1))
    val b = fresh("startzerodst")
    drain(a, b, fresh("startzerock"),
      Map("startingVersion" -> "0", "maxVersionsPerBatch" -> "1"))
    assert(spark.read.format("graft").load(b)
      .select("k").as[Int].collect().toSet == Set(1, 2))
    assert(TxLog.history(b).count(c => c.op == "append" && c.dataChange) == 2,
      "two versions under cap 1 must drain in 2 epochs")
  }

  test("maxBytesPerTrigger bounds epochs by added bytes, admitting >=1 commit") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val a = fresh("admbytes")
    TxLog.append((0 until 200).toDF("k").repartition(1), a) // v1: one larger file
    TxLog.append(Seq(1).toDF("k").repartition(1), a)        // v2: tiny
    TxLog.append(Seq(2).toDF("k").repartition(1), a)        // v3: tiny
    val v1Bytes = TxLog.snapshotInfo(a, Some(1L)).files.map(f =>
      java.nio.file.Files.size(java.nio.file.Paths.get(a, f))).sum
    // cap below v1's size: v1 still admits (never stall), alone;
    // the two tiny commits then fit in one epoch under the same cap
    val src = new GraftStreamSource(spark, a, startingVersion = 1,
      ignoreChanges = false, maxBytesPerTrigger = Some(v1Bytes - 1))
    assert(src.latestOffset(null, ReadLimit.allAvailable()) == LongOffset(1))
    assert(src.latestOffset(LongOffset(1), ReadLimit.allAvailable()) == LongOffset(3))
    assert(src.latestOffset(LongOffset(3), ReadLimit.allAvailable()) == null)
    // end-to-end drain under the byte cap delivers everything once
    val b = fresh("admbytesdst")
    drain(a, b, fresh("admbytesck"), Map("maxBytesPerTrigger" -> (v1Bytes - 1).toString))
    assert(spark.read.format("graft").load(b).count() == 202)
    assert(TxLog.history(b).count(c => c.op == "append" && c.dataChange) == 2)
  }

  test("AvailableNow pins its goal at stream start; later commits wait") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val a = fresh("goal")
    (0 until 3).foreach(i => TxLog.append(Seq(i).toDF("k"), a))
    val src = new GraftStreamSource(spark, a, startingVersion = 1,
      ignoreChanges = false, maxVersionsPerBatch = Some(2L))
    src.prepareForTriggerAvailableNow()
    TxLog.append(Seq(99).toDF("k"), a) // v4 lands after stream start
    val first = src.latestOffset(null, ReadLimit.allAvailable())
    assert(first == LongOffset(2), s"cap 2 from the start, got $first")
    val second = src.latestOffset(LongOffset(2), ReadLimit.allAvailable())
    assert(second == LongOffset(3),
      s"the drain must stop at the pinned goal (v3), got $second")
    assert(src.latestOffset(LongOffset(3), ReadLimit.allAvailable()) == null,
      "v4 is outside the pinned goal — it belongs to the NEXT run")
  }

  test("Complete mode overwrites per batch; partitionBy lays out a new table") {
    val a = fresh("agg"); val b = fresh("aggdst")
    TxLog.append((0 until 12).toDF("k").withColumn("bucket", concat(lit("b"), $"k" % 3)), a)
    val q = spark.readStream.format("graft").load(a)
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .writeStream.format("graft").outputMode("complete")
      .option("checkpointLocation", fresh("aggck"))
      .trigger(Trigger.AvailableNow()).start(b)
    q.awaitTermination()
    assert(TxLog.history(b).last.op == "overwrite")
    assert(spark.read.format("graft").load(b)
      .as[(String, Long)].collect().toMap == Map("b0" -> 4L, "b1" -> 4L, "b2" -> 4L))
    // partitioned append sink
    val c = fresh("partdst")
    val q2 = spark.readStream.format("graft").load(a)
      .writeStream.format("graft").partitionBy("bucket")
      .option("checkpointLocation", fresh("partck"))
      .trigger(Trigger.AvailableNow()).start(c)
    q2.awaitTermination()
    val snap = TxLog.snapshotInfo(c)
    assert(snap.partitionCols == Seq("bucket"))
    assert(snap.files.forall(_.contains("bucket=")))
    assert(spark.read.format("graft").load(c).filter($"bucket" === "b1").count() == 4)
  }
}
