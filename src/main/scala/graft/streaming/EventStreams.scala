package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Structured Streaming surface over the `events` table (SURVEY.md §2.11).
  *
  * The batch twins of these transforms are oracle-checked in
  * `operators.StreamingQueries` (DuckDB can't oracle a stream); here the
  * SAME logical transforms run through readStream/writeStream with event-
  * time watermarks — the production shape for an unbounded source. Each
  * builder returns a streaming DataFrame; callers pick trigger + sink
  * (tests use Trigger.AvailableNow + memory sink).
  *
  * Scale: all aggregations are keyed by (window, low-cardinality key), so
  * state size is bounded by windows retained under the watermark, not by
  * input volume; dropDuplicatesWithinWatermark keeps only `event_id` keys
  * inside the 1-hour horizon.
  */
object EventStreams {

  /** Streaming read of the events parquet dir with the same ns→µs
    * truncation as the batch `Tables` loader. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema = graft.Tables.schemaOf(spark, dir, "events")
    // The corpus stores events as a single file; the streaming file source
    // wants a directory, so stream the parent with a glob filter.
    val raw = spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    graft.Tables.normalizeEventTs(raw)
  }

  /** Tumbling 10-minute counts + exact decimal value sums per event type,
    * 1-hour watermark: late rows beyond the horizon are dropped instead
    * of growing state forever. The DECIMAL(38,4) sum is associative, so
    * incremental state merges produce the same result as one batch pass
    * (the same policy the batch oracle queries rely on). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 4)))
          .cast("double"), 4).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** Top-k event types per tumbling window by count (deterministic
    * count DESC, event_type ASC tie-break). Rank-over-aggregate is not
    * incrementally updatable, so in streaming this runs per emitted
    * batch in `foreachBatch` over [[tumblingCounts]]' update stream —
    * the standard leaderboard pattern; in batch it composes directly.
    * The window is a row_number partitioned on ws (never a global
    * single-partition window), so the ranking shuffles one compact
    * counts row per (window, type) — bounded by windows × types, not by
    * events, at any corpus scale. */
  def windowTopK(counts: DataFrame, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ws").orderBy(col("n").desc, col("event_type"))
    counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("ws"), col("rk"), col("event_type"), col("n"))
  }

  /** Hopping 10-minute windows sliding every 5 (each event in two
    * overlapping windows), 1-hour watermark — streaming twin of the
    * `stream_hopping` batch oracle query. */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  /** 30-minute-gap session windows per user (same gap as the batch twin). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"), col("user_id"), col("n"))

  /** Session windows with a PER-EVENT gap expression — the dynamic-gap
    * surface of `session_window`: interaction-dependent timeouts (a
    * 'click' keeps a session alive 10 minutes, anything heavier 30),
    * the shape engagement analytics actually uses. Merging is
    * order-independent interval union, so the batch twin reproduces it
    * with the standard running-max interval-merge window (see the
    * `stream_session_dynamic` oracle). Same watermark/state profile as
    * the fixed-gap [[sessionCounts]]. */
  def dynamicSessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"),
        when(col("event_type") === "click", "10 minutes")
          .otherwise("30 minutes")), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"), col("user_id"), col("n"))

  /** Stateful dedup on event_id bounded by the watermark horizon. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** The dedup EFFECT made oracle-visible (`stream_dedup_effect`):
    * double the stream by self-union, dedup on event_id within the
    * watermark, drain with AvailableNow into a memory sink, and aggregate
    * the survivors per event type. Because corpus event_ids are unique and
    * the two union branches carry identical rows, the post-dedup relation
    * equals the original corpus whichever copy survives — so plain batch
    * SQL over `events` oracles the executed streaming operator (counts +
    * exact decimal value sums), not just a fixture assertion.
    *
    * The memory sink is the verification surface only — production runs
    * [[dedupedEvents]] into a real sink; state is one event_id per key
    * inside the 1-hour horizon either way. */
  def dedupEffect(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val events = readEvents(spark, dir)
    val deduped = dedupedEvents(events.union(events))
    // unique sink name per execution: memory-sink tables accumulate per
    // query name, and callers (smoke spec) run the same spec repeatedly
    val sink = s"graft_dedup_effect_${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"
    val q = deduped.writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ckpt-dedup-effect").toString)
      .start()
    require(q.awaitTermination(120000),
      "streaming drain timed out - partial sink contents would masquerade as results")
    spark.table(sink)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 4)))
          .cast("double"), 4).as("sum_value"))
      .orderBy("event_type")
  }

  /** Streaming CDC upsert (`stream_cdc_upsert`): the foreachBatch MERGE
    * pattern — the idempotent-sink shape a change-data stream lands with
    * when the target store has no native MERGE. The change stream is the
    * events source unioned with a deterministic "second generation" of
    * itself (ts + 1 h, value + 1000 — every user's latest row is a
    * gen-2 row by construction); each micro-batch folds into a parquet
    * state table as latest-wins per user under the TOTAL (ts, event_id)
    * order, so the merge is commutative and idempotent — batch
    * boundaries and replays cannot change the converged state, which is
    * why the plain-SQL argmax oracle can hash it. State is one row per
    * user; each batch shuffles pre-combined per-key rows (max_by partial
    * aggregation), never the raw change volume — the merge_upsert scale
    * argument, now under streaming machinery. */
  def cdcUpsert(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val cols = Seq(col("user_id"), col("ts"), col("event_id"), col("value"))
    val base = readEvents(spark, dir).select(cols: _*)
    val updates = readEvents(spark, dir).select(
      col("user_id"), expr("ts + INTERVAL 1 HOUR").as("ts"),
      col("event_id"), (col("value") + 1000.0).as("value"))
    val changes = base.unionByName(updates)
    val stateDir = java.nio.file.Files.createTempDirectory("graft-cdc-state").toString
    val statePath = s"$stateDir/state.parquet"
    def latest(df: DataFrame): DataFrame =
      df.groupBy("user_id")
        .agg(max_by(struct(col("ts"), col("event_id"), col("value")),
          struct(col("ts"), col("event_id"))).as("m"))
        .select(col("user_id"), col("m.ts").as("ts"),
          col("m.event_id").as("event_id"), col("m.value").as("value"))
    // the state file's schema is latest()'s own output schema — pass it
    // on read-back so no per-batch inference job runs
    val stateSchema = latest(changes).schema
    val q = changes.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val merged =
          if (new java.io.File(statePath).exists())
            latest(graft.Tables.readBack(spark, stateSchema, statePath)
              .unionByName(latest(batch)))
          else latest(batch)
        // materialize BEFORE overwriting the path the plan reads from
        merged.localCheckpoint().write.mode("overwrite").parquet(statePath)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$stateDir/ckpt")
      .start()
    require(q.awaitTermination(120000),
      "streaming drain timed out - partial state would masquerade as results")
    graft.Tables.readBack(spark, stateSchema, statePath).orderBy("user_id")
  }

  /** Per-user running aggregate via mapGroupsWithState — the custom-state
    * primitive (KeyValueGroupedDataset) for logic the built-in windows
    * can't express. State per key is one [[UserStats]] (constant bytes per
    * user regardless of event volume); the state store shards by key hash,
    * so a 1000-executor cluster splits the keyspace evenly. */
  def statefulUserStats(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events
      .selectExpr("user_id", "event_type", "value")
      .as[(Long, String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[(Long, String, Double)],
         state: org.apache.spark.sql.streaming.GroupState[UserStats]) => {
          val prev = state.getOption.getOrElse(UserStats(0L, 0L, 0.0))
          var n = prev.nEvents; var p = prev.nPurchases; var v = prev.totalValue
          rows.foreach { case (_, typ, value) =>
            n += 1
            if (typ == "purchase") { p += 1; v += value }
          }
          val next = UserStats(n, p, v)
          state.update(next)
          (userId, next.nEvents, next.nPurchases, next.totalValue)
        })
      .toDF("user_id", "n_events", "n_purchases", "total_purchase_value")
  }

  /** [[statefulUserStats]]'s twin on the MODERN arbitrary-state API —
    * `transformWithState` with a [[StatefulProcessor]] holding a typed
    * `ValueState[UserStats]` (Spark 4's successor to mapGroupsWithState:
    * named state variables, TTL support, timers, and the RocksDB state
    * store backing changelog checkpoints). Same per-key constant-size
    * state and the same fold; the two APIs are asserted equal in
    * EventStreamsSpec, and the executed stream is hash-oracled by
    * `stream_running_stats_tws`. */
  def statefulUserStatsTws(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .selectExpr("user_id", "event_type", "value")
      .as[(Long, String, Double)]
      .groupByKey(_._1)
      .transformWithState(new UserStatsProcessor, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events", "n_purchases", "total_purchase_value")
  }

  /** [[statefulUserStatsTws]] EXECUTED as a stream (readStream →
    * transformWithState on the RocksDB provider → AvailableNow drain) and
    * reduced to converged per-user totals — the oracle-visible effect of
    * the new-API stateful operator, mirroring `stream_running_stats`'s
    * numbers. Update-mode re-emissions across micro-batches collapse via
    * max_by on the monotone event count. */
  def userStatsTwsEffect(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    // transformWithState requires the RocksDB provider; scope it to this
    // run so the HDFS-backed default keeps serving the other fixtures
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = statefulUserStatsTws(spark, readEvents(spark, dir))
      val sink = s"graft_tws_stats_${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"
      val q = out.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-ckpt-tws").toString)
        .start()
      require(q.awaitTermination(120000),
        "streaming drain timed out - partial sink contents would masquerade as results")
      spark.table(sink)
        .groupBy("user_id")
        .agg(max_by(
          struct(col("n_events"), col("n_purchases"), col("total_purchase_value")),
          col("n_events")).as("m"))
        .select(col("user_id"), col("m.n_events").as("n_events"),
          col("m.n_purchases").as("n_purchases"),
          round(col("m.total_purchase_value"), 2).as("total_purchase_value"))
        .orderBy("user_id")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Stream-static enrichment join — the third join shape next to the
    * stream-stream interval join and the batch joins: an unbounded stream
    * equi-joined to a bounded dimension (here per-type weights derived
    * once from the batch corpus via the md5 hash bridge). The static side
    * broadcasts, so the stream is enriched with NO shuffle and NO join
    * state — each micro-batch probes the same broadcast hash relation,
    * exactly how a 1000-executor stream joins a slowly-changing dim
    * table. Downstream the enriched rows feed a watermarked tumbling
    * aggregate (weighted decimal sums), proving enrichment composes with
    * stateful windowing. */
  def enrichedTumblingValue(events: DataFrame, typeWeights: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .join(org.apache.spark.sql.functions.broadcast(typeWeights), "event_type")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum((col("value") * col("weight"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 4))).cast("double"), 4)
          .as("weighted_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        col("weighted_value"))

  /** The static dim for [[enrichedTumblingValue]]: one weight per event
    * type, derived deterministically (md5 bridge) so the oracle rebuilds
    * it bit-for-bit. Bounded by the type cardinality — broadcastable
    * forever. */
  def eventTypeWeights(spark: SparkSession, dir: String): DataFrame =
    // through the Tables loader (not a raw parquet read): the loader is
    // the ONE place corpus drift gets absorbed, and this dim must not be
    // the odd consumer out when the next encoding change lands
    graft.Tables(spark, dir, "events")
      .select(col("event_type")).distinct()
      .withColumn("weight", graft.functions.HashBridge.h32(col("event_type")) % 10)

  /** Stream-stream interval join: each error event joined to the same
    * user's purchases in the following hour. Both sides carry watermarks
    * and the join condition bounds event-time distance, so each side's
    * buffered state is evictable once the other side's watermark passes
    * the interval horizon — state is O(events per horizon), not O(stream).
    * The batch twin is `join_range`'s shape (oracle-checked there). */
  def errorPurchaseJoins(events: DataFrame): DataFrame =
    errorPurchaseJoinsTyped(events, "inner")

  /** Left-outer stream-stream interval join — the semantics the inner
    * join cannot express: every error row emits EXACTLY once, matched
    * rows as both sides arrive, unmatched rows as NULL-extended results
    * when the watermark passes the join horizon (the state-eviction
    * deadline is what makes outer emission decidable on an unbounded
    * stream — a batch engine just scans both sides; a stream has to
    * PROVE no match can still arrive). Same sides, keys and interval as
    * [[errorPurchaseJoins]]. */
  def errorPurchaseJoinsLeft(events: DataFrame): DataFrame =
    errorPurchaseJoinsTyped(events, "leftOuter")

  /** Full-outer stream-stream interval join — BOTH sides' unmatched rows
    * must emit NULL-extended exactly once, each side's emission gated by
    * the OTHER side's watermark passing its join horizon. The complete
    * reconciliation view ("every error and every purchase, correlated
    * where possible") — the last of the stream-stream join shapes. */
  def errorPurchaseJoinsFull(events: DataFrame): DataFrame =
    errorPurchaseJoinsTyped(events, "fullOuter")

  /** TWO stateful operators chained in ONE streaming query — Spark 4's
    * multiple-stateful-operator support: two independent watermarked
    * tumbling aggregations whose APPEND outputs join stream-stream on
    * (window, user_id). The join key includes the event-time window
    * column, so the downstream join state is evictable by the same
    * watermark that seals the upstream aggregates — the per-window
    * click-to-purchase conversion view, end to end in one plan. */
  def windowedClickPurchaseJoin(events: DataFrame): DataFrame = {
    def leg(tpe: String, out: String): DataFrame =
      events.filter(col("event_type") === tpe)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as(out))
    leg("click", "n_clicks")
      .join(leg("purchase", "n_purchases"), Seq("window", "user_id"))
      .select(col("window.start").as("ws"), col("user_id"),
        col("n_clicks"), col("n_purchases"))
  }

  private def errorPurchaseJoinsTyped(events: DataFrame, joinType: String): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("error_id"))
      .withWatermark("e_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "2 hours")
    errors.join(purchases,
      col("e_user") === col("p_user") &&
        col("p_ts") > col("e_ts") &&
        col("p_ts") <= col("e_ts") + expr("INTERVAL 1 HOUR"),
      joinType)
      .select("error_id", "purchase_id")
  }

  /** Per-user sessionizer via flatMapGroupsWithState — the multi-row-
    * output custom-state primitive: CLOSED sessions are emitted as soon
    * as a 30-minute gap (or event-time timeout) seals them, while the
    * open session rides in state. Emits zero-or-more rows per group per
    * trigger, which mapGroupsWithState cannot express. State per user is
    * one [[OpenSession]] regardless of event volume; the in-group sort
    * is bounded by one user's events per micro-batch, not the corpus.
    *
    * Emission contract (append mode cannot retract): a session is sealed
    * by GAP EVIDENCE — a later event of the same user ≥ gap after it —
    * not by the watermark. Within a micro-batch arrival order is
    * irrelevant (events are interval-merged), and a late-but-in-watermark
    * event arriving before its session is sealed merges correctly across
    * batches; but an event arriving AFTER its session was already sealed
    * and emitted starts a fresh session instead of retroactively merging.
    * This matches session_window exactly whenever each user's events
    * arrive in event-time order across batches (the per-key-ordered
    * delivery Kafka-style sources provide); Spark's own append-mode
    * session_window avoids the edge by withholding ALL output until the
    * watermark passes — a latency trade this operator deliberately makes
    * the other way. */
  def sessionizedEvents(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = 30L * 60 * 1000 * 1000
    events
      .withWatermark("ts", "1 hour")
      // the watermarked `ts` column must reach the stateful operator, so it
      // rides along unused next to the micros value the kernel works in
      .select(col("user_id"), unix_micros(col("ts")).as("tsUs"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)], state: GroupState[OpenSession]) => {
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed the open session's horizon: seal and emit it
            val s = state.get; state.remove()
            Iterator((userId, s.startUs, s.endUs, s.n))
          } else {
            // interval merge of (open session ++ this batch's events): any
            // arrival order within the batch — and late arrivals into the
            // still-open session — land correctly (see emission contract
            // above for the post-seal edge). Strict < on the gap: a
            // separation of EXACTLY the window starts a new session
            // (session_window is half-open — see StreamingQueries' note).
            val candidates =
              (state.getOption.toVector ++ rows.map(r => OpenSession(r._2, r._2, 1)))
                .sortBy(s => (s.startUs, s.endUs))
            val merged = candidates.foldLeft(Vector.empty[OpenSession]) { (acc, s) =>
              acc.lastOption match {
                case Some(p) if s.startUs - p.endUs < gapUs =>
                  acc.init :+ OpenSession(p.startUs, math.max(p.endUs, s.endUs), p.n + s.n)
                case _ => acc :+ s
              }
            }
            // merged sessions are ≥ gap apart, so every one but the last is
            // sealed by a later in-state event; the last rides in state
            state.update(merged.last)
            state.setTimeoutTimestamp(merged.last.endUs / 1000 + gapUs / 1000)
            merged.init.iterator.map(s => (userId, s.startUs, s.endUs, s.n))
          }
        })
      .toDF("user_id", "start_us", "end_us", "n")
  }

  /** Per-user funnel progression (view → click → purchase, strict
    * event-time order) via mapGroupsWithState — the streaming twin of
    * the `win_funnel` batch query. State per user is one fixed-size
    * [[FunnelState]] (earliest view, earliest qualifying click,
    * completion count, first completion) regardless of event volume.
    * Within a micro-batch events are sorted by (ts, event_id) before
    * folding, so arrival order inside a batch is irrelevant; across
    * batches the kernel assumes per-key event-time-ordered delivery
    * (the sessionizer's documented contract). Strictness matches the
    * batch twin exactly: a click qualifies only against a view with a
    * strictly smaller timestamp, a purchase only against a qualifying
    * click with a strictly smaller timestamp. */
  def funnelProgress(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events
      .select(col("user_id"), unix_micros(col("ts")).as("tsUs"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[(Long, Long, Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[FunnelState]) => {
          val M = Long.MaxValue
          var st = state.getOption.getOrElse(FunnelState(M, M, 0L, M))
          rows.toVector.sortBy(r => (r._2, r._3)).foreach { case (_, ts, _, typ) =>
            typ match {
              case "view" =>
                if (ts < st.viewUs) st = st.copy(viewUs = ts)
              case "click" =>
                if (st.viewUs < ts && ts < st.clickUs) st = st.copy(clickUs = ts)
              case "purchase" =>
                if (st.clickUs < ts)
                  st = st.copy(nCompletions = st.nCompletions + 1,
                    firstUs = math.min(st.firstUs, ts))
              case _ => ()
            }
          }
          state.update(st)
          (userId, st.nCompletions,
            if (st.firstUs == M) None else Some(st.firstUs))
        })
      .toDF("user_id", "n_completions", "first_completion_us")
  }
  /** Per-event lateness under streaming execution — the streaming twin of
    * the `stream_late_audit` batch query. flatMapGroupsWithState keyed on
    * user_id; state is ONE long (the max event-time seen on the key), so
    * state size is O(users), not O(events). Each event emits its lateness
    * vs that running max: exactly the per-key out-of-orderness
    * `withWatermark` would adjudicate, observed instead of configured.
    * Within a micro-batch events fold in event_id (arrival) order,
    * matching the batch twin's `ORDER BY event_id` running max; across
    * batches the state carries the max forward, so batch boundaries never
    * reset the audit. */
  def latenessPerEvent(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tsUs"))
      .as[(Long, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[(Long, Long, String, Long)],
         state: org.apache.spark.sql.streaming.GroupState[LateMax]) => {
          var maxUs = state.getOption.map(_.maxUs).getOrElse(Long.MinValue)
          val out = rows.toVector.sortBy(_._2).map { case (_, eventId, typ, tsUs) =>
            maxUs = math.max(maxUs, tsUs)
            (eventId, typ, maxUs - tsUs)
          }
          state.update(LateMax(maxUs))
          out.iterator
        })
      .toDF("event_id", "event_type", "lag_us")
  }

  /** [[latenessPerEvent]] EXECUTED as a stream and folded to the audit
    * shape (per type: event count, would-be watermark drops, max/p95
    * lateness) — the `stream_late_audit` batch query's numbers produced
    * by real streaming machinery (readStream → stateful operator →
    * AvailableNow drain), asserted equal in EventStreamsSpec. */
  def lateAuditEffect(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val perEvent = latenessPerEvent(spark, readEvents(spark, dir))
    val sink = s"graft_late_audit_${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"
    val q = perEvent.writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ckpt-late-audit").toString)
      .start()
    require(q.awaitTermination(120000),
      "streaming drain timed out - partial sink contents would masquerade as results")
    spark.table(sink)
      .select(col("event_type"), (col("lag_us") / lit(1e6)).as("lag_s"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("lag_s") > 600d, 1L).otherwise(0L)).as("n_dropped_10m"),
        round(max(col("lag_s")), 6).as("max_lag_s"),
        round(expr("percentile(lag_s, 0.95)"), 6).as("p95_lag_s"))
      .orderBy("event_type")
  }
}

/** mapGroupsWithState state record: fixed-size per user. */
final case class UserStats(nEvents: Long, nPurchases: Long, totalValue: Double)

/** transformWithState processor: the running per-user purchase totals as
  * a named typed ValueState. Constant bytes per key; the fold matches
  * [[EventStreams.statefulUserStats]] exactly so the two API generations
  * are interchangeable (and asserted so). */
class UserStatsProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, String, Double), (Long, Long, Long, Double)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var st: ValueState[UserStats] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[UserStats](
      "stats", org.apache.spark.sql.Encoders.product[UserStats], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, String, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Double)] = {
    val prev = if (st.exists()) st.get() else UserStats(0L, 0L, 0.0)
    var n = prev.nEvents; var p = prev.nPurchases; var v = prev.totalValue
    rows.foreach { case (_, typ, value) =>
      n += 1
      if (typ == "purchase") { p += 1; v += value }
    }
    st.update(UserStats(n, p, v))
    Iterator.single((key, n, p, v))
  }
}

/** Funnel-progress state record: fixed-size per user (sentinel
  * Long.MaxValue = stage not yet reached). */
final case class FunnelState(
    viewUs: Long, clickUs: Long, nCompletions: Long, firstUs: Long)

/** flatMapGroupsWithState state record: the one in-flight session. */
final case class OpenSession(startUs: Long, endUs: Long, n: Int)

/** Lateness-audit state record: the max event-time micros seen per user. */
final case class LateMax(maxUs: Long)
