package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** Event-time windowing over `events` (SURVEY.md §2.11).
  *
  * These run the window semantics in BATCH mode so the DuckDB oracle can
  * check them (DuckDB has no streams); `graft.streaming.EventStreams` runs
  * the same transforms through readStream/writeStream with watermarks and
  * is exercised by ScalaTest.
  *
  * events.ts is nanosecond parquet; Spark reads it truncated to micros, so
  * every oracle goes through CAST(ts AS TIMESTAMP) (same truncation).
  */
object StreamingQueries {


  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  def specs: Seq[QuerySpec] = Seq(

    // Tumbling 10-minute windows: count + exact decimal sum per window.
    // Runs the SAME tumblingCounts function the streaming fixture
    // exercises (the watermark node is eliminated in batch).
    QuerySpec(
      "stream_tumble",
      (s, dir) =>
        graft.streaming.EventStreams.tumblingCounts(events(s, dir))
          .orderBy("ws", "event_type"),
      Some("""SELECT make_timestamp((epoch_ns(ts) // 1000) // 600000000 * 600000000) AS ws,
                     event_type, COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE), 4) AS sum_value
              FROM events GROUP BY 1, 2 ORDER BY ws, event_type""")),

    // Hopping (sliding) 10-minute windows every 5 minutes: each event
    // lands in exactly two windows (10/5 = 2), both aligned to the epoch
    // like Spark's window(). The oracle replays the same assignment by
    // enumerating k ∈ {0, 1} window starts per event. Runs the SAME
    // hoppingCounts function the streaming fixture exercises (the
    // watermark node is eliminated by the optimizer in batch).
    QuerySpec(
      "stream_hopping",
      (s, dir) =>
        graft.streaming.EventStreams.hoppingCounts(events(s, dir))
          .orderBy("ws", "event_type"),
      Some("""WITH e AS (SELECT event_type, epoch_ns(ts) // 1000 AS us FROM events),
              w AS (SELECT event_type, us, UNNEST(GENERATE_SERIES(0, 1)) AS k FROM e)
              SELECT make_timestamp((us // 300000000 - k) * 300000000) AS ws,
                     event_type, COUNT(*) AS n
              FROM w GROUP BY 1, 2 ORDER BY ws, event_type""")),

    // Session windows (30-minute gap) per user. Spark session_window is
    // half-open [start, end): a gap of exactly 30m starts a new session —
    // the oracle breaks on `>= INTERVAL 30 MINUTE` to match. Runs the
    // SAME sessionCounts function the streaming fixture exercises.
    QuerySpec(
      "stream_session",
      (s, dir) =>
        graft.streaming.EventStreams.sessionCounts(events(s, dir))
          .orderBy("user_id", "session_start"),
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
              g AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN LAG(ts) OVER w IS NULL
                              OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              sess AS (
                -- the cumulative window repeats the FULL (ts, event_id)
                -- total order of w: ordering by ts alone would let tied
                -- timestamps enumerate differently than brk was computed
                SELECT user_id, ts,
                       SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM g)
              SELECT MIN(ts) AS session_start, user_id, COUNT(*) AS n
              FROM sess GROUP BY user_id, sid
              ORDER BY user_id, session_start""")),

    // Dynamic-gap session windows — the per-event gap-EXPRESSION surface
    // of session_window: a 'click' extends its session 10 minutes, any
    // heavier interaction 30. Session merging is order-independent
    // interval union, so the oracle is the classic running-max
    // interval-merge: a session breaks exactly when an event's start
    // reaches the running MAX of all prior (ts + gap) ends — the MAX
    // (not LAG) is what makes variable gaps correct, since a long-gap
    // event can outlive several short-gap successors. State profile at
    // scale is identical to the fixed-gap session: watermark-bounded,
    // one open session per (user, gap-island).
    QuerySpec(
      "stream_session_dynamic",
      (s, dir) =>
        graft.streaming.EventStreams.dynamicSessionCounts(events(s, dir))
          .orderBy("user_id", "session_start"),
      Some("""WITH e AS (
                SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                       CASE WHEN event_type = 'click' THEN INTERVAL 10 MINUTE
                            ELSE INTERVAL 30 MINUTE END AS gap
                FROM events),
              g AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN MAX(ts + gap) OVER wprev IS NULL
                              OR ts >= MAX(ts + gap) OVER wprev
                            THEN 1 ELSE 0 END AS brk
                FROM e
                WINDOW wprev AS (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
              sess AS (
                SELECT user_id, ts,
                       SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM g)
              SELECT MIN(ts) AS session_start, user_id, COUNT(*) AS n
              FROM sess GROUP BY user_id, sid
              ORDER BY user_id, session_start""")),

    // Stream-static enrichment join feeding a watermarked tumbling
    // aggregate: the unbounded stream equi-joins a broadcast per-type
    // weight dim (no shuffle, no join state — the slowly-changing-dim
    // pattern), then windows with weighted decimal sums. Runs the SAME
    // enrichedTumblingValue function the streaming fixture executes.
    QuerySpec(
      "stream_enrich",
      (s, dir) =>
        graft.streaming.EventStreams.enrichedTumblingValue(
          events(s, dir),
          graft.streaming.EventStreams.eventTypeWeights(s, dir))
          .orderBy("ws", "event_type"),
      Some("""WITH w AS (
                SELECT DISTINCT event_type,
                       ('0x'||SUBSTR(MD5(event_type),1,8))::BIGINT % 10 AS weight
                FROM events)
              SELECT make_timestamp((epoch_ns(ts) // 1000) // 600000000 * 600000000) AS ws,
                     e.event_type, COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(e.value * w.weight AS DECIMAL(38,4))) AS DOUBLE), 4)
                       AS weighted_value
              FROM events e JOIN w USING (event_type)
              GROUP BY 1, 2 ORDER BY ws, event_type""")),

    // Stateful-dedup batch shape: first event id per (user, type) group —
    // streaming twin is dropDuplicatesWithinWatermark in EventStreams.
    QuerySpec(
      "stream_dedup",
      (s, dir) =>
        events(s, dir)
          .groupBy("user_id", "event_type")
          .agg(min(col("event_id")).as("first_event_id"))
          .orderBy("user_id", "event_type"),
      Some("""SELECT user_id, event_type, MIN(event_id) AS first_event_id
              FROM events GROUP BY user_id, event_type
              ORDER BY user_id, event_type""")),

    // dropDuplicatesWithinWatermark EXECUTED as a stream and oracled:
    // the stream is doubled by self-union, deduped on event_id inside the
    // 1-hour horizon, drained (AvailableNow → memory sink), and the
    // survivors aggregated. event_ids are corpus-unique and both union
    // branches carry identical rows, so the post-dedup relation equals
    // the original corpus — DuckDB checks counts AND exact decimal value
    // sums against plain `events`, giving the streaming dedup operator a
    // hash oracle instead of a fixture-only claim.
    QuerySpec(
      "stream_dedup_effect",
      (s, dir) => graft.streaming.EventStreams.dedupEffect(s, dir),
      Some("""SELECT event_type, COUNT(*) AS n_events,
                     ROUND(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE), 4) AS sum_value
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // Streaming MinHash-LSH NEAR-dup dedup executed as a stream and
    // oracled — the continuous-ingest twin of dedup_minhash: stateless
    // per-row signatures (same generated permutation family), one
    // stateful operator holding ONE long (min doc_id) per occupied band
    // bucket, first-wins flagging. The AvailableNow drain processes the
    // corpus as a single batch, where streaming first-wins coincides with
    // the exact batch rule "flagged ⇔ ∃ smaller doc_id sharing a band" —
    // which DuckDB recomputes from the shared band CTEs. At 100 TB the
    // only shuffle carries (bucket, doc_id) pairs and state is 8 bytes
    // per distinct bucket — the smallest possible memory for continuous
    // near-dup (no signatures or texts retained).
    QuerySpec(
      "stream_neardup_minhash",
      (s, dir) => graft.streaming.DocStreams.neardupEffect(s, dir),
      Some(s"""WITH ${DedupQueries.MinHashBandCtes},
              |flagged AS (SELECT DISTINCT b.doc_id FROM bands a
              |            JOIN bands b ON a.b = b.b AND a.key = b.key
              |                        AND a.doc_id < b.doc_id)
              |SELECT d.doc_id, f.doc_id IS NULL AS kept
              |FROM documents d LEFT JOIN flagged f ON f.doc_id = d.doc_id
              |ORDER BY d.doc_id""".stripMargin)),

    // Streaming PASSAGE-level dedup — the winnowing twin of the MinHash
    // stream above, and the continuous form of dedup_winnow's detector:
    // a document arriving on the stream is flagged iff it repeats ANY
    // winnow-selected passage fingerprint an earlier document carried
    // (the streaming boilerplate filter). Stateless per-row fingerprints
    // via the native WinnowFingerprint kernel; the one stateful operator
    // holds 8 bytes (min doc_id) per distinct passage; the only shuffle
    // carries (fingerprint, doc_id) pairs at the winnowed ~0.4 gram
    // density. Single-batch drain ⇒ exact batch rule, recomputed by
    // DuckDB from the shared WinnowCtes chain.
    QuerySpec(
      "stream_passage_dedup",
      (s, dir) => graft.streaming.DocStreams.passageDedupEffect(s, dir),
      Some(s"""WITH ${DedupQueries.WinnowCtes},
              |fdoc AS (SELECT DISTINCT doc_id, h FROM winnow),
              |flagged AS (SELECT DISTINCT b.doc_id FROM fdoc a
              |            JOIN fdoc b ON a.h = b.h AND a.doc_id < b.doc_id)
              |SELECT d.doc_id, f.doc_id IS NULL AS kept
              |FROM documents d LEFT JOIN flagged f ON f.doc_id = d.doc_id
              |ORDER BY d.doc_id""".stripMargin)),

    // foreachBatch CDC MERGE executed as a stream and oracled: the
    // change stream (events ∪ a deterministic gen-2 copy at ts+1h,
    // value+1000) folds micro-batch by micro-batch into a parquet state
    // table as latest-wins per user under the total (ts, event_id)
    // order — commutative + idempotent, so batch boundaries and
    // replays cannot move the converged state, and DuckDB's window
    // argmax over the same union hash-checks it exactly. This is the
    // idempotent-upsert-sink pattern for targets without native MERGE;
    // per batch only pre-combined one-row-per-user aggregates cross the
    // shuffle (max_by partial aggregation — the merge_upsert scale
    // shape under streaming machinery).
    QuerySpec(
      "stream_cdc_upsert",
      (s, dir) => graft.streaming.EventStreams.cdcUpsert(s, dir),
      Some("""WITH all_ev AS (
                SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
                FROM events
                UNION ALL
                SELECT user_id, CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS ts,
                       event_id, value + 1000.0 AS value
                FROM events)
              SELECT user_id, ts, event_id, value FROM (
                SELECT user_id, ts, event_id, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM all_ev) WHERE rn = 1
              ORDER BY user_id""")),

    // mapGroupsWithState running stats, oracle-checked: runs the EXACT
    // statefulUserStats transform the streaming fixture exercises —
    // batch execution feeds each key's rows through the same state
    // function as one micro-batch — so the custom-state primitive gets a
    // hash oracle, not just a fixture. The converged state equals the
    // per-user total aggregate, which DuckDB expresses directly. The
    // double accumulator folds in group-iteration order, so the output
    // rounds to 2dp on both sides (≈1e-12 fold-order skew vs 0.005
    // boundary — the cross-engine bridge the decimal policy can't cover
    // inside an opaque state function).
    QuerySpec(
      "stream_running_stats",
      (s, dir) =>
        graft.streaming.EventStreams.statefulUserStats(s, events(s, dir))
          .select(col("user_id"), col("n_events"), col("n_purchases"),
            round(col("total_purchase_value"), 2).as("total_purchase_value"))
          .orderBy("user_id"),
      Some("""SELECT user_id, COUNT(*) AS n_events,
                     COUNT(*) FILTER (event_type = 'purchase') AS n_purchases,
                     ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2)
                       AS total_purchase_value
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // transformWithState (Spark 4's arbitrary-state API: StatefulProcessor
    // + named typed ValueState on the RocksDB store) EXECUTED as a stream
    // and oracle-checked: the same per-user purchase totals as
    // stream_running_stats, produced by the new API generation under real
    // readStream machinery — so BOTH stateful APIs carry hash evidence,
    // not just the legacy one. Same rounding bridge as the mapGroups twin.
    QuerySpec(
      "stream_running_stats_tws",
      (s, dir) => graft.streaming.EventStreams.userStatsTwsEffect(s, dir),
      Some("""SELECT user_id, COUNT(*) AS n_events,
                     COUNT(*) FILTER (event_type = 'purchase') AS n_purchases,
                     ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2)
                       AS total_purchase_value
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // flatMapGroupsWithState sessionizer, oracle-checked: runs the EXACT
    // sessionizedEvents transform the streaming fixture exercises. In
    // batch, every user's events arrive as one group invocation, so the
    // kernel interval-merges them all and emits every session EXCEPT the
    // still-open last one (sealed only by gap evidence, per the emission
    // contract) — which the oracle reproduces as lag-gap sessionization
    // minus each user's final session. Gap semantics are strict-< on
    // merge, i.e. a new session at separation ≥ 30 min, matching the
    // kernel exactly.
    QuerySpec(
      "stream_sessionizer",
      (s, dir) =>
        graft.streaming.EventStreams.sessionizedEvents(s, events(s, dir))
          .orderBy("user_id", "start_us"),
      Some("""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
              g AS (SELECT user_id, us,
                           CASE WHEN LAG(us) OVER w IS NULL
                                  OR us - LAG(us) OVER w >= 1800000000
                                THEN 1 ELSE 0 END AS new_s
                    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
              sm AS (SELECT user_id, us,
                            SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                             ROWS UNBOUNDED PRECEDING) AS sid
                     FROM g),
              agg AS (SELECT user_id, sid, MIN(us) AS start_us, MAX(us) AS end_us,
                             CAST(COUNT(*) AS INT) AS n
                      FROM sm GROUP BY user_id, sid)
              SELECT user_id, start_us, end_us, n
              FROM agg
              WHERE sid < (SELECT MAX(sid) FROM agg a2 WHERE a2.user_id = agg.user_id)
              ORDER BY user_id, start_us""")),

    // mapGroupsWithState funnel, oracle-checked: runs the EXACT
    // funnelProgress transform the streaming fixture exercises — in
    // batch each user's events arrive as one sorted group fold, which
    // the oracle reproduces as the win_funnel stacked strictly-before
    // running-min windows over epoch micros.
    QuerySpec(
      "stream_funnel",
      (s, dir) =>
        graft.streaming.EventStreams.funnelProgress(s, events(s, dir))
          .orderBy("user_id"),
      Some("""WITH e AS (SELECT user_id, event_id,
                                epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
                         FROM events),
              x AS (SELECT user_id, event_id, us, event_type,
                           MIN(CASE WHEN event_type = 'view' THEN us END) OVER w AS v_us
                    FROM e
                    WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
              y AS (SELECT user_id, event_id, us, event_type, v_us,
                           MIN(CASE WHEN event_type = 'click' AND v_us < us THEN us END)
                             OVER w AS c_us
                    FROM x
                    WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
              SELECT user_id,
                     COUNT(CASE WHEN event_type = 'purchase' AND c_us < us THEN 1 END) AS n_completions,
                     MIN(CASE WHEN event_type = 'purchase' AND c_us < us THEN us END) AS first_completion_us
              FROM y GROUP BY user_id ORDER BY user_id""")),

    // Stream-stream interval join, oracle-checked: this runs the EXACT
    // transform EventStreams.errorPurchaseJoins executes under
    // readStream — same function, same watermark declarations (the
    // optimizer's EliminateEventTimeWatermark erases them in batch, they
    // bound state eviction under a stream) — so the driver hash-checks
    // the very code path the streaming fixture exercises. The join is an
    // equi-join on user_id with the time interval as a residual
    // predicate: per-user work, never a corpus-wide cross product.
    QuerySpec(
      "stream_interval_join",
      (s, dir) =>
        graft.streaming.EventStreams.errorPurchaseJoins(events(s, dir))
          .orderBy("error_id", "purchase_id"),
      Some("""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events)
              SELECT a.event_id AS error_id, b.event_id AS purchase_id
              FROM e a JOIN e b
                ON a.user_id = b.user_id
               AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
              WHERE a.event_type = 'error' AND b.event_type = 'purchase'
              ORDER BY error_id, purchase_id""")),

    // LEFT-OUTER stream-stream interval join — the audit twin of
    // stream_interval_join: every error appears exactly once, with NULL
    // purchase_id when no purchase followed within the hour ("which
    // errors did the user walk away from"). Under a stream this is the
    // semantics only watermark-driven state eviction can provide (a null
    // row may only emit once the engine can PROVE no match is coming);
    // EventStreamsSpec executes this exact function under readStream
    // with a watermark-pushing sentinel and asserts equality with this
    // batch run. NULL ordering is spelled out on both engines.
    QuerySpec(
      "stream_interval_join_left",
      (s, dir) =>
        graft.streaming.EventStreams.errorPurchaseJoinsLeft(events(s, dir))
          .orderBy(col("error_id"), col("purchase_id").asc_nulls_first),
      Some("""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events)
              SELECT a.event_id AS error_id, b.event_id AS purchase_id
              FROM (SELECT * FROM e WHERE event_type = 'error') a
              LEFT JOIN (SELECT * FROM e WHERE event_type = 'purchase') b
                ON a.user_id = b.user_id
               AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
              ORDER BY error_id, purchase_id NULLS FIRST""")),

    // FULL-OUTER stream-stream interval join — the reconciliation twin:
    // unmatched rows from BOTH sides emit NULL-extended exactly once
    // (an unmatched error once the purchase watermark clears its hour,
    // an unmatched purchase once the error watermark clears the same
    // interval looking backwards). With inner/left/full all three
    // null-emission regimes of the same join are pinned by the same
    // oracle family; NULL ordering spelled out on both engines.
    QuerySpec(
      "stream_interval_join_full",
      (s, dir) =>
        graft.streaming.EventStreams.errorPurchaseJoinsFull(events(s, dir))
          .orderBy(col("error_id").asc_nulls_first,
            col("purchase_id").asc_nulls_first),
      Some("""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events)
              SELECT a.event_id AS error_id, b.event_id AS purchase_id
              FROM (SELECT * FROM e WHERE event_type = 'error') a
              FULL JOIN (SELECT * FROM e WHERE event_type = 'purchase') b
                ON a.user_id = b.user_id
               AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
              ORDER BY error_id NULLS FIRST, purchase_id NULLS FIRST""")),

    // TWO stateful operators in ONE streaming query (Spark 4 multi-
    // stateful support): independent watermarked tumbling aggregations
    // of clicks and purchases, joined stream-stream on (window, user) —
    // the per-window conversion view. The join key carries the event-
    // time window, so the downstream join's state is evicted by the same
    // watermark that seals the upstream aggregates; nothing accumulates
    // beyond the horizon. Batch twin = two groupBys + an equi-join, the
    // exact plan the oracle hash-checks here; EventStreamsSpec drains
    // the same function under readStream.
    QuerySpec(
      "stream_window_join",
      (s, dir) =>
        graft.streaming.EventStreams.windowedClickPurchaseJoin(events(s, dir))
          .orderBy("ws", "user_id"),
      Some("""WITH w AS (
                SELECT make_timestamp((epoch_ns(ts) // 1000) // 600000000 * 600000000) AS ws,
                       user_id, event_type
                FROM events WHERE event_type IN ('click', 'purchase')),
              c AS (SELECT ws, user_id, COUNT(*) AS n_clicks
                    FROM w WHERE event_type = 'click' GROUP BY 1, 2),
              p AS (SELECT ws, user_id, COUNT(*) AS n_purchases
                    FROM w WHERE event_type = 'purchase' GROUP BY 1, 2)
              SELECT ws, user_id, n_clicks, n_purchases
              FROM c JOIN p USING (ws, user_id)
              ORDER BY ws, user_id""")),

    // Watermark-delay audit: how out-of-order is the stream, and what
    // would a given watermark drop? Per user (the stream's key), events
    // replay in arrival order (event_id); each event's lateness is the
    // gap to the max event-time already seen on that key. The aggregate
    // reports, per event type, how many events a 10-minute watermark
    // would have discarded plus the max / p95 lateness — exactly the
    // numbers an operator reads before choosing withWatermark(). The
    // running max is a per-user window (shuffle on user_id, no global
    // single-partition window), and lateness seconds are microsecond-
    // exact doubles on both engines.
    QuerySpec(
      "stream_late_audit",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")
        events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            // integer micros end-to-end: the running max and the lateness
            // subtraction stay EXACT longs, with ONE double division at
            // the end — bit-identical to the streamed twin
            // (EventStreams.latenessPerEvent) and to the oracle, where a
            // subtract-of-two-rounded-doubles formulation could flip a
            // >600s boundary or a percentile cell by ~2e-7 s
            unix_micros(col("ts")).as("us"))
          .withColumn("lag_s", (max(col("us")).over(w) - col("us")) / lit(1e6))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_events"),
            sum(when(col("lag_s") > 600d, 1L).otherwise(0L)).as("n_dropped_10m"),
            round(max(col("lag_s")), 6).as("max_lag_s"),
            round(expr("percentile(lag_s, 0.95)"), 6).as("p95_lag_s"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (
                SELECT event_id, user_id, event_type,
                       EPOCH_US(CAST(ts AS TIMESTAMP)) AS us
                FROM events),
              l AS (
                SELECT event_type,
                       (MAX(us) OVER (PARTITION BY user_id ORDER BY event_id) - us) / 1e6 AS lag_s
                FROM e)
              SELECT event_type,
                     COUNT(*) AS n_events,
                     CAST(SUM(CASE WHEN lag_s > 600 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_10m,
                     ROUND(MAX(lag_s), 6) AS max_lag_s,
                     ROUND(QUANTILE_CONT(lag_s, 0.95), 6) AS p95_lag_s
              FROM l GROUP BY event_type ORDER BY event_type""")),

    // Windowed leaderboard: top-3 event types per tumbling window —
    // the trending-now query. Composes the SAME tumblingCounts the
    // streaming fixture drains with windowTopK's per-window row_number
    // (rank-over-aggregate runs per batch in foreachBatch when
    // streamed — see EventStreams.windowTopK). The rank input is the
    // compact counts relation (windows × types rows), never raw events.
    QuerySpec(
      "stream_window_topk",
      (s, dir) =>
        graft.streaming.EventStreams
          .windowTopK(graft.streaming.EventStreams.tumblingCounts(events(s, dir)))
          .orderBy("ws", "rk"),
      Some("""WITH c AS (
                SELECT make_timestamp((epoch_ns(ts) // 1000) // 600000000 * 600000000) AS ws,
                       event_type, COUNT(*) AS n
                FROM events GROUP BY 1, 2),
              r AS (
                SELECT ws, event_type, n,
                       CAST(ROW_NUMBER() OVER (PARTITION BY ws
                                               ORDER BY n DESC, event_type) AS INT) AS rk
                FROM c)
              SELECT ws, rk, event_type, n FROM r WHERE rk <= 3
              ORDER BY ws, rk"""))
  )
}
