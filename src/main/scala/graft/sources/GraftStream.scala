package graft.sources

import graft.plans.TxLog
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graft.GraftStreamShims
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{DataType, StructType}

/** The graft transaction log as a NATIVE Structured Streaming source:
  * `spark.readStream.format("graft").load(table)` tails the log itself —
  * no side feed directory, no hard links. The offset IS the table
  * version, so each micro-batch is "the rows added in (v₁, v₂]" resolved
  * from commit metadata (file names — nothing row-shaped touches the
  * driver), read through one pushdown-capable parquet scan per batch.
  * Exactly-once falls out of the engine's offset log: a replayed batch
  * re-reads the same closed version interval and gets byte-identical
  * rows, because committed versions are immutable.
  *
  * Options: `startingVersion` (inclusive; default 0 = full history then
  * tail; `latest` = only commits after stream start), `ignoreChanges`
  * (accept rewrite commits, re-delivering survivors — see
  * [[TxLog.streamBatch]]), `maxVersionsPerBatch` / `maxFilesPerTrigger`
  * / `maxBytesPerTrigger` (admission control — see below). Partition
  * columns surface as
  * ordinary output columns (values re-attached from the hive paths).
  *
  * ADMISSION CONTROL (the [[SupportsAdmissionControl]] half): without a
  * cap, the next offset is always the log head — a stream started with
  * `startingVersion=0` on a 10k-commit table would plan its ENTIRE
  * history as one micro-batch. `maxVersionsPerBatch=n` advances the
  * offset at most n versions per epoch; `maxFilesPerTrigger=n` (the
  * container tier's and Delta's knob) advances to the last version
  * whose cumulative added-file count stays ≤ n, and `maxBytesPerTrigger`
  * does the same over added-file SIZES (one driver stat per candidate
  * file) — all always admitting at least one commit so a single
  * oversized commit cannot stall the stream. The caps compose (the
  * tightest bound wins). The engine hands
  * `latestOffset` the previous end offset, so restarts resume exactly —
  * no source-side position state exists to go stale.
  *
  * [[SupportsTriggerAvailableNow]]: `prepareForTriggerAvailableNow`
  * pins the goal at the stream-start head, so `Trigger.AvailableNow`
  * drains the backlog in bounded epochs (cap-sized, not one giant
  * batch) and stops there even while writers keep committing.
  *
  * At 100 TB: offset resolution is one directory-suffix listing (the
  * same O(checkpoint + suffix) replay every reader does) plus, under a
  * file cap, one commit-JSON read per admitted version; getBatch plans
  * only the files the interval's commits added, and the scan keeps
  * vectorized parquet + codegen — a feed consumer never rescans the
  * corpus. */
final class GraftStreamSource(
    spark: SparkSession, table: String,
    startingVersion: Long, ignoreChanges: Boolean,
    readChangeFeed: Boolean = false,
    maxVersionsPerBatch: Option[Long] = None,
    maxFilesPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow
    with Logging {

  require(maxVersionsPerBatch.forall(_ > 0),
    s"graft: maxVersionsPerBatch must be positive, got ${maxVersionsPerBatch.get}")
  require(maxFilesPerTrigger.forall(_ > 0),
    s"graft: maxFilesPerTrigger must be positive, got ${maxFilesPerTrigger.get}")
  require(maxBytesPerTrigger.forall(_ > 0),
    s"graft: maxBytesPerTrigger must be positive, got ${maxBytesPerTrigger.get}")

  override val schema: StructType = GraftStreamSource.schemaOf(table, readChangeFeed)

  private def versionOf(o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o match {
      case l: LongOffset => l.offset
      case s: SerializedOffset => LongOffset(s).offset
      case other => throw new IllegalStateException(s"unexpected offset $other")
    }

  /** Goal pinned by Trigger.AvailableNow at stream start; None = tail. */
  @volatile private var availableNowGoal: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    val goal = TxLog.latestVersion(table)
    logInfo(s"graft stream on $table: Trigger.AvailableNow drains to version $goal")
    availableNowGoal = Some(goal)
  }

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  /** The engine's offset-advance call (it supplies the previous end, so
    * caps survive restarts for free). Returns null when nothing is
    * admittable — the engine's "no data" signal. */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    // clamp: startingVersion=0 (full history) would otherwise make the
    // exclusive lower bound -1 and admissionBoundary read commit 0
    val from = math.max(0L,
      Option(start).map(versionOf).getOrElse(startingVersion - 1))
    val head0 = TxLog.latestVersion(table)
    val head = availableNowGoal.fold(head0)(math.min(head0, _))
    if (head < startingVersion || head <= from) return null
    val byVersions = maxVersionsPerBatch.fold(head)(m => math.min(head, from + m))
    val end =
      if (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty) byVersions
      else TxLog.admissionBoundary(table, from, byVersions,
        maxFiles = maxFilesPerTrigger.getOrElse(Long.MaxValue),
        maxBytes = maxBytesPerTrigger.getOrElse(Long.MaxValue))
    if (end <= from) null else LongOffset(end)
  }

  /** Plain getOffset survives for the v1 interface; the engine prefers
    * latestOffset (SupportsAdmissionControl) on every trigger path. */
  override def getOffset: Option[Offset] = {
    val head = TxLog.latestVersion(table)
    if (head < startingVersion) None else Some(LongOffset(head))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = math.max(0L, start.map(versionOf).getOrElse(startingVersion - 1))
    val to = versionOf(end)
    logInfo(s"graft stream batch on $table: versions ($from, $to]" +
      (if (readChangeFeed) " (change feed)" else ""))
    // CDF mode represents rewrites FAITHFULLY (delete / update pre+post
    // rows), so it never needs the append-only refusal — it is the
    // principled alternative to ignoreChanges for downstream consumers
    // that can fold retractions
    val batch =
      if (readChangeFeed) TxLog.changeFeed(spark, table, from, to)
      else TxLog.streamBatch(spark, table, from, to, ignoreChanges)
    GraftStreamShims.streamingDataFrame(
      spark, batch.queryExecution.toRdd, batch.schema)
  }

  override def stop(): Unit = ()
}

object GraftStreamSource {
  /** The source schema: the table's own columns, plus the CDF metadata
    * columns when tailing the change feed. */
  private[sources] def schemaOf(table: String, readChangeFeed: Boolean): StructType = {
    val base = DataType.fromJson(TxLog.snapshotInfo(table).schemaJson)
      .asInstanceOf[StructType]
    if (!readChangeFeed) base
    else StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField(TxLog.ChangeTypeCol,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(TxLog.CommitVersionCol,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(TxLog.CommitTimestampCol,
        org.apache.spark.sql.types.TimestampType)))
  }
}

/** The write half: `df.writeStream.format("graft")` commits each
  * micro-batch through the log. Append mode rides
  * [[TxLog.appendIdempotent]] keyed (queryId, batchId) — the engine's
  * replayed epochs are SKIPPED by the txn ledger, so end-to-end delivery
  * is exactly-once even across lost-executor retries and checkpoint
  * restarts. Complete mode maps to an atomic overwrite per batch (the
  * natural semantics for a streamed aggregate). `partitionBy(...)` on
  * the writer lays a NEW table out hive-style; an existing table's
  * layout wins, conflicts refuse. */
final class GraftStreamSink(
    table: String, partitionCols: Seq[String], mode: OutputMode)
    extends Sink with Logging {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    // re-materialize over the already-planned incremental rows — a sink
    // must never re-analyze the engine's incremental plan
    val batch = GraftStreamShims.batchDataFrame(
      spark, data.queryExecution.toRdd, data.schema)
    val queryId = Option(
      spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .getOrElse(throw new IllegalStateException(
        "graft sink: no sql.streaming.queryId local property — not inside " +
          "a streaming micro-batch?"))
    if (mode == OutputMode.Complete())
      TxLog.overwrite(batch, table, partitionCols): Unit
    else
      TxLog.appendIdempotent(batch, table, s"graft-sink-$queryId", batchId,
        partitionBy = partitionCols): Unit
  }

  override def toString: String = s"GraftStreamSink[$table]"
}
