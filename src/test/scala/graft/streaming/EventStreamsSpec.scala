package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch equivalence: each streaming transform, run to
  * completion with AvailableNow, must agree with its batch twin on the
  * same data (the property that lets the DuckDB oracle vouch for the
  * batch side only). */
class EventStreamsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      outputMode: String): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"graft-ckpt-$name").toString)
      .start()
    q.awaitTermination(120000)
    ()
  }

  test("streaming dedup drains exactly-once into a parquet FILE sink") {
    // the production sink path (memory sinks elsewhere are verification
    // surfaces): dedupedEvents over a doubled stream lands in a
    // checkpointed parquet file sink, and the read-back equals the
    // original corpus exactly — no duplicates from the doubled input, no
    // loss, no partial files visible to readers
    val out = java.nio.file.Files.createTempDirectory("graft-filesink").toString
    val events = EventStreams.readEvents(spark, dir)
    val q = EventStreams.dedupedEvents(events.union(events)).writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-filesink-ckpt").toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val back = spark.read.parquet(out)
    val batch = graft.Tables(spark, dir, "events")
    assert(back.count() == batch.count())
    assert(back.select("event_id").exceptAll(batch.select("event_id")).isEmpty)
    assert(batch.select("event_id").exceptAll(back.select("event_id")).isEmpty)
  }

  test("streaming tumbling counts match batch when stream is drained") {
    val events = EventStreams.readEvents(spark, dir)
    runToMemory(EventStreams.tumblingCounts(events), "tumble", "complete")
    val streamed = spark.table("tumble")
      .orderBy("ws", "event_type").collect()
    val batch = graft.Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 4)))
          .cast("double"), 4).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("ws", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("foreachBatch windowTopK over the streamed aggregate matches batch") {
    // the leaderboard pattern: rank-over-aggregate is not incrementally
    // updatable, so windowTopK runs INSIDE foreachBatch over the
    // complete-mode tumbling counts — this drains that exact shape and
    // checks the last emitted ranking equals the batch composition
    val events = EventStreams.readEvents(spark, dir)
    val got = new java.util.concurrent.atomic.AtomicReference[Seq[org.apache.spark.sql.Row]](Seq.empty)
    val q = EventStreams.tumblingCounts(events).writeStream
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ckpt-wtopk").toString)
      .foreachBatch { (batchDf: org.apache.spark.sql.DataFrame, _: Long) =>
        got.set(EventStreams.windowTopK(batchDf).orderBy("ws", "rk").collect().toSeq)
      }
      .start()
    q.awaitTermination(120000)
    val batch = EventStreams
      .windowTopK(EventStreams.tumblingCounts(graft.Tables(spark, dir, "events")))
      .orderBy("ws", "rk").collect().toSeq
    assert(got.get.nonEmpty)
    assert(got.get == batch)
  }

  test("streaming hopping counts match batch when stream is drained") {
    val events = EventStreams.readEvents(spark, dir)
    runToMemory(EventStreams.hoppingCounts(events), "hopping", "complete")
    val streamed = spark.table("hopping")
      .orderBy("ws", "event_type").collect()
    val batch = graft.Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming session windows match batch session_window") {
    val events = EventStreams.readEvents(spark, dir)
    runToMemory(EventStreams.sessionCounts(events), "sess", "complete")
    val streamed = spark.table("sess").orderBy("user_id", "session_start").collect()
    val batch = graft.Tables(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"), col("user_id"), col("n"))
      .orderBy("user_id", "session_start").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("dynamic-gap session windows match batch when streamed") {
    val events = EventStreams.readEvents(spark, dir)
    runToMemory(EventStreams.dynamicSessionCounts(events), "dynsess", "complete")
    val streamed = spark.table("dynsess").orderBy("user_id", "session_start").collect()
    val batch = EventStreams.dynamicSessionCounts(
      graft.Tables(spark, dir, "events")).orderBy("user_id", "session_start").collect()
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
    // the dynamic gap must actually change the segmentation vs fixed 30m
    val fixed = graft.Tables(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n")).count()
    assert(streamed.length != fixed,
      "dynamic gap produced the same session count as fixed 30m — expression inert")
  }

  test("mapGroupsWithState running user stats match batch aggregation") {
    val events = EventStreams.readEvents(spark, dir)
    runToMemory(EventStreams.statefulUserStats(spark, events), "ustats", "update")
    val streamed = spark.table("ustats").orderBy("user_id").collect()
    val batch = graft.Tables(spark, dir, "events")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
        sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0))
          .as("total_purchase_value"))
      .orderBy("user_id").collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0) && s.getLong(1) == b.getLong(1) &&
        s.getLong(2) == b.getLong(2) &&
        math.abs(s.getDouble(3) - b.getDouble(3)) < 1e-9)
    }
  }

  test("mapGroupsWithState funnel matches the batch stream_funnel twin") {
    val events = EventStreams.readEvents(spark, dir)
    runToMemory(EventStreams.funnelProgress(spark, events), "funnel", "update")
    val streamed = spark.table("funnel").orderBy("user_id").collect()
    val batch = EventStreams
      .funnelProgress(spark, graft.Tables(spark, dir, "events"))
      .orderBy("user_id").collect()
    assert(streamed.toSeq == batch.toSeq)
    // and the funnel finds real conversions on this corpus
    assert(streamed.exists(_.getLong(1) > 0))
  }

  test("flatMapGroupsWithState sessionizer emits sessions that match batch session_window") {
    val events = EventStreams.readEvents(spark, dir)
    runToMemory(EventStreams.sessionizedEvents(spark, events), "fsess", "append")
    val streamed = spark.table("fsess")
      .select(col("user_id"), col("start_us"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = graft.Tables(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("start_us"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt)).toSet
    // Closed sessions (all but possibly each user's last) must appear in the
    // batch session set with identical (user, start, count); open tails may
    // be withheld by the final watermark, so subset — but non-trivially so.
    assert(streamed.nonEmpty, "sessionizer emitted nothing")
    val missing = streamed -- batch
    assert(missing.isEmpty, s"streamed sessions not in batch set: ${missing.take(5)}")
    // and it must have closed the overwhelming majority of batch sessions
    assert(streamed.size >= batch.size / 2, s"${streamed.size} of ${batch.size} closed")
  }

  test("sessionizer merges state across micro-batches incl. late in-watermark arrivals") {
    import java.sql.Timestamp
    val dirPath = java.nio.file.Files.createTempDirectory("graft-sess-batches")
    def writeBatch(name: String, modTime: Long, rows: Seq[(Long, String)]): Unit = {
      import spark.implicits._
      val df = rows.toDF("user_id", "tss")
        .select(col("user_id"), col("tss").cast("timestamp").as("ts"))
      val f = dirPath.resolve(name)
      df.coalesce(1).write.mode("overwrite").parquet(f.toString)
      f.toFile.listFiles().foreach(_.setLastModified(modTime))
      f.toFile.setLastModified(modTime): Unit
    }
    // batch 1: open session 10:00-10:05; batch 2: a LATE 10:02 (within the
    // 1h watermark) must merge INTO it, and 11:30 must seal it; batch 3:
    // 12:30 seals the 11:30 singleton. The 12:30 tail stays open (withheld).
    writeBatch("b1", 1000000L, Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:05:00")))
    writeBatch("b2", 2000000L, Seq((1L, "2024-01-01 10:02:00"), (1L, "2024-01-01 11:30:00")))
    writeBatch("b3", 3000000L, Seq((1L, "2024-01-01 12:30:00")))
    val schema = spark.read.parquet(dirPath.resolve("b1").toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirPath.toString + "/*")
    runToMemory(EventStreams.sessionizedEvents(spark, stream), "msess", "append")
    val out = spark.table("msess")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    def us(s: String) = Timestamp.valueOf(s).getTime * 1000
    assert(out == Set(
      (1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:05:00"), 3),
      (1L, us("2024-01-01 11:30:00"), us("2024-01-01 11:30:00"), 1)))
  }

  test("funnel carries state across micro-batches at an event-time boundary") {
    // pins the documented delivery contract: with per-key EVENT-TIME-
    // ORDERED arrival across triggers, a funnel split mid-progression
    // over two micro-batches must converge to the same state as a
    // single-batch replay (user 1 completes twice across the boundary;
    // user 2's view sits in batch 1 and its click+purchase in batch 2)
    val dirPath = java.nio.file.Files.createTempDirectory("graft-funnel-batches")
    def writeBatch(name: String, modTime: Long,
        rows: Seq[(Long, String, Long, String)]): Unit = {
      import spark.implicits._
      val df = rows.toDF("user_id", "tss", "event_id", "event_type")
        .select(col("user_id"), col("tss").cast("timestamp").as("ts"),
          col("event_id"), col("event_type"))
      val f = dirPath.resolve(name)
      df.coalesce(1).write.mode("overwrite").parquet(f.toString)
      f.toFile.listFiles().foreach(_.setLastModified(modTime))
      f.toFile.setLastModified(modTime): Unit
    }
    val b1 = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 10:05:00", 2L, "click"),
      (2L, "2024-01-01 10:00:00", 3L, "view"))
    val b2 = Seq(
      (2L, "2024-01-01 10:06:00", 5L, "click"),
      (1L, "2024-01-01 10:10:00", 4L, "purchase"),
      (2L, "2024-01-01 10:12:00", 6L, "purchase"),
      (1L, "2024-01-01 10:20:00", 7L, "purchase"))
    writeBatch("b1", 1000000L, b1)
    writeBatch("b2", 2000000L, b2)
    val schema = spark.read.parquet(dirPath.resolve("b1").toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirPath.toString + "/*")
    runToMemory(EventStreams.funnelProgress(spark, stream), "mfunnel", "update")
    // update mode re-emits a user's row each trigger; completions only
    // grow, so the max-completion row per user is the final state
    val finalByUser = spark.table("mfunnel").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    def us(s: String) = java.sql.Timestamp.valueOf(s).getTime * 1000
    assert(finalByUser(1L) == ((1L, 2L, Some(us("2024-01-01 10:10:00")))))
    assert(finalByUser(2L) == ((2L, 1L, Some(us("2024-01-01 10:12:00")))))
    // and the two-batch split agrees with the single-batch replay
    import spark.implicits._
    val batchDf = (b1 ++ b2).toDF("user_id", "tss", "event_id", "event_type")
      .select(col("user_id"), col("tss").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val batch = EventStreams.funnelProgress(spark, batchDf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(finalByUser.values.toSet == batch)
  }

  test("stream-stream interval join matches the batch join") {
    val events = EventStreams.readEvents(spark, dir)
    runToMemory(EventStreams.errorPurchaseJoins(events), "ssjoin", "append")
    val streamed = spark.table("ssjoin")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = graft.Tables(spark, dir, "events")
    val batch = e.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"), col("event_id").as("error_id"))
      .join(e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("purchase_id")),
        col("e_user") === col("p_user") &&
          col("p_ts") > col("e_ts") &&
          col("p_ts") <= col("e_ts") + expr("INTERVAL 1 HOUR"))
      .select("error_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "batch twin found no pairs — fixture too small")
    assert(streamed == batch)
  }

  test("left-outer stream-stream join emits null rows once the watermark passes") {
    // Outer emission needs the watermark to move PAST each error's join
    // horizon — on a finite corpus the tail errors' state would otherwise
    // sit unexpired when the stream ends and their null rows would never
    // emit. A sentinel event pair far beyond the corpus pushes the final
    // watermark over every real row's deadline; sentinels are keyed to an
    // impossible user and filtered from the comparison.
    val e = graft.Tables(spark, dir, "events")
    val maxTs = e.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val far = new java.sql.Timestamp(maxTs.getTime + 7L * 24 * 3600 * 1000)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ssleft").toString
    e.write.mode("overwrite").parquet(tmp)
    import spark.implicits._
    Seq((-1L, far, -99L, "error", 0.0, "{}"),
        (-2L, far, -99L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(tmp)
    val stream = spark.readStream.schema(e.schema).parquet(tmp)
    runToMemory(EventStreams.errorPurchaseJoinsLeft(stream), "ssleftjoin", "append")
    val streamed = spark.table("ssleftjoin")
      .filter(col("error_id") >= 0)
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    val batch = EventStreams.errorPurchaseJoinsLeft(e)
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(batch.exists(_._2.isEmpty), "batch twin has no unmatched errors — fixture too small")
    assert(batch.exists(_._2.nonEmpty), "batch twin has no matched errors — fixture too small")
    assert(streamed == batch)
  }

  test("full-outer stream-stream join emits BOTH sides' null rows once watermarks pass") {
    // Same sentinel discipline as the left-outer test; here the
    // comparison keeps rows where EITHER side is a real event, because
    // both sides' unmatched rows must surface — the property left-outer
    // cannot witness.
    val e = graft.Tables(spark, dir, "events")
    val maxTs = e.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val far = new java.sql.Timestamp(maxTs.getTime + 7L * 24 * 3600 * 1000)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ssfull").toString
    e.write.mode("overwrite").parquet(tmp)
    import spark.implicits._
    Seq((-1L, far, -99L, "error", 0.0, "{}"),
        (-2L, far, -99L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(tmp)
    val stream = spark.readStream.schema(e.schema).parquet(tmp)
    runToMemory(EventStreams.errorPurchaseJoinsFull(stream), "ssfulljoin", "append")
    def rowSet(df: org.apache.spark.sql.DataFrame) = df.collect().map(r => (
      if (r.isNullAt(0)) None else Some(r.getLong(0)),
      if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    val streamed = rowSet(spark.table("ssfulljoin")
      .filter(coalesce(col("error_id"), lit(0L)) >= 0 &&
        coalesce(col("purchase_id"), lit(0L)) >= 0))
    val batch = rowSet(EventStreams.errorPurchaseJoinsFull(e))
    assert(batch.exists(p => p._1.nonEmpty && p._2.isEmpty), "no unmatched errors — fixture too small")
    assert(batch.exists(p => p._1.isEmpty && p._2.nonEmpty), "no unmatched purchases — fixture too small")
    assert(streamed == batch)
  }

  test("two chained stateful operators (agg -> stream-stream join) drain to the batch result") {
    // Downstream of a join only APPEND mode exists, so the last hour of
    // windows needs the watermark pushed past their seal point — same
    // sentinel pattern as the left-outer test, one event per leg.
    val e = graft.Tables(spark, dir, "events")
    val maxTs = e.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val far = new java.sql.Timestamp(maxTs.getTime + 7L * 24 * 3600 * 1000)
    val tmp = java.nio.file.Files.createTempDirectory("graft-sswinjoin").toString
    e.write.mode("overwrite").parquet(tmp)
    import spark.implicits._
    Seq((-1L, far, -99L, "click", 0.0, "{}"),
        (-2L, far, -99L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(tmp)
    val stream = spark.readStream.schema(e.schema).parquet(tmp)
    runToMemory(EventStreams.windowedClickPurchaseJoin(stream), "sswinjoin", "append")
    val streamed = spark.table("sswinjoin")
      .filter(col("user_id") >= 0)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = EventStreams.windowedClickPurchaseJoin(e)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch.nonEmpty, "batch twin found no joined windows — fixture too small")
    assert(streamed == batch)
  }

  test("dropDuplicatesWithinWatermark keeps one row per event_id") {
    val events = EventStreams.readEvents(spark, dir)
    runToMemory(EventStreams.dedupedEvents(events), "dedup", "append")
    val n = spark.table("dedup").count()
    val distinctIds = graft.Tables(spark, dir, "events")
      .select("event_id").distinct().count()
    assert(n == distinctIds)
  }

  test("stream-static enrichment join matches its batch twin when drained") {
    val events = EventStreams.readEvents(spark, dir)
    val dim = EventStreams.eventTypeWeights(spark, dir)
    runToMemory(EventStreams.enrichedTumblingValue(events, dim), "enrich", "complete")
    val streamed = spark.table("enrich").orderBy("ws", "event_type")
      .collect().map(_.toSeq).toSeq
    val batch = EventStreams.enrichedTumblingValue(
      graft.Tables(spark, dir, "events"), dim)
      .orderBy("ws", "event_type").collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("transformWithState totals match the mapGroupsWithState twin") {
    // the two stateful-API generations must be interchangeable: the
    // transformWithState effect (RocksDB store, ValueState) reduced to
    // converged totals equals the legacy mapGroupsWithState fold run in
    // batch over the same events
    val tws = EventStreams.userStatsTwsEffect(spark, dir)
      .collect().map(_.toSeq).toSet
    val legacy = EventStreams.statefulUserStats(spark, graft.Tables(spark, dir, "events"))
      .select(col("user_id"), col("n_events"), col("n_purchases"),
        round(col("total_purchase_value"), 2).as("total_purchase_value"))
      .collect().map(_.toSeq).toSet
    assert(legacy.nonEmpty)
    assert(tws == legacy)
  }

  test("streamed lateness audit matches the batch stream_late_audit twin") {
    // the one remaining batch-only audit claim gets streaming execution
    // evidence (VERDICT r4 #7): per-user running-max state under real
    // readStream machinery must reproduce the batch window's numbers
    val streamed = EventStreams.lateAuditEffect(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = graft.Registry.byName("stream_late_audit")
      .run(spark, dir).collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty, "batch twin returned no rows — fixture too small")
    assert(streamed == batch)
  }

  test("mid-run stop + restart from checkpoint recovers dedup state and stays exactly-once") {
    // The checkpoint-recovery claim EXECUTED: a stateful dedup query into
    // a parquet file sink is stopped mid-run (as soon as its first
    // micro-batch commit lands), then restarted from the same checkpoint
    // with two MORE input files — one of them a byte-identical duplicate
    // of the first file. The restarted query must (a) not re-emit what
    // the killed run committed (file-source offsets + sink transaction
    // log recovered), (b) drop every row of the duplicate file (dedup
    // STATE recovered — without it the dups sail through), and (c) end
    // up byte-equal to an uninterrupted twin run over the same four files.
    import java.nio.file.Files
    val src = Files.createTempDirectory("graft-recov-src")
    def writeBatch(name: String, modTime: Long, ids: Range): Unit = {
      import spark.implicits._
      val df = ids.map(_.toLong).toDF("event_id").select(
        col("event_id"),
        expr("timestampadd(SECOND, event_id, TIMESTAMP'2024-01-01 10:00:00')").as("ts"),
        (col("event_id") * 2).as("v"))
      val f = src.resolve(name)
      df.coalesce(1).write.mode("overwrite").parquet(f.toString)
      f.toFile.listFiles().foreach(_.setLastModified(modTime))
      f.toFile.setLastModified(modTime): Unit
    }
    // timestamps span < 10 min, watermark delay is 1 h, so dedup state is
    // never evicted — the duplicate file is caught IFF state survived
    writeBatch("b1", 1000000L, 1 to 100)
    writeBatch("b2", 2000000L, 101 to 200)
    val schema = spark.read.parquet(src.resolve("b1").toString).schema
    def startQuery(out: String, ckpt: String) = EventStreams.dedupedEvents(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src.toString + "/*"))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    val out = Files.createTempDirectory("graft-recov-out").toString
    val ckpt = Files.createTempDirectory("graft-recov-ckpt").toString
    // ---- run 1: stop as soon as the first micro-batch commit exists
    val q1 = startQuery(out, ckpt)
    val batch0 = new java.io.File(s"$out/_spark_metadata/0")
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!batch0.exists() && q1.isActive && System.nanoTime() < deadline)
      Thread.sleep(1)
    q1.stop(); q1.awaitTermination(120000)
    assert(batch0.exists(), "run 1 never committed a micro-batch")
    val committedEarly = spark.read.parquet(out).count()
    // ---- the duplicate file + fresh data arrive while the query is down
    writeBatch("b3", 3000000L, 1 to 100) // byte-identical ids to b1
    writeBatch("b4", 4000000L, 201 to 300)
    // ---- run 2: same checkpoint, drain everything
    val q2 = startQuery(out, ckpt)
    q2.awaitTermination(120000)
    val back = spark.read.parquet(out)
    assert(back.count() == 300,
      s"expected exactly-once 300 rows, got ${back.count()} " +
        s"(run 1 had committed $committedEarly before the stop)")
    assert(back.select("event_id").distinct().count() == 300,
      "duplicate event_ids leaked through the restart — dedup state was lost")
    // ---- uninterrupted twin over the same four files
    val out2 = Files.createTempDirectory("graft-recov-out2").toString
    val ckpt2 = Files.createTempDirectory("graft-recov-ckpt2").toString
    val q3 = startQuery(out2, ckpt2)
    q3.awaitTermination(120000)
    val twin = spark.read.parquet(out2)
    assert(back.exceptAll(twin).isEmpty && twin.exceptAll(back).isEmpty,
      "restarted run diverged from the uninterrupted twin")
  }
}
