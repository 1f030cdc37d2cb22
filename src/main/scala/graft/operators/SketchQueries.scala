package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregates (SURVEY.md §2.4 scale path).
  *
  * At 100 TB the pattern that matters is not "estimate a distinct count in
  * one query" (agg_approx_distinct already covers that) but MERGEABLE
  * sketch state: build a constant-size sketch per partition / per day /
  * per source, persist it, and union sketches later without touching the
  * raw data again. Spark 4 ships DataSketches-backed aggregates for
  * exactly this — `hll_sketch_agg` → binary sketch, `hll_union_agg` over
  * sketches, `approx_top_k` for frequent items — and both are exercised
  * here as two-level aggregation trees (partial sketch per group, union
  * across groups), the shape a 1000-executor rollup actually runs.
  *
  * Oracle strategy: sketch binaries are engine-specific, so (like
  * agg_approx_distinct / agg_approx_quantile) each query checks an
  * ACCURACY CONTRACT the oracle can recompute exactly:
  *  - HLL: the unioned estimate over per-group sketches must land within
  *    5% of the exact global distinct (lgConfigK=14 bounds relative error
  *    at ~0.8%, far inside the contract; a broken union blows it
  *    immediately), asserted as `round(est/exact, 1) == 1.0`.
  *  - approx_top_k: a frequent-items sketch whose capacity exceeds the
  *    number of distinct keys is in the EXACT regime — Misra–Gries with
  *    no evictions has zero error, and merging exact-regime sketches
  *    stays exact — so over the bounded 31-word corpus vocabulary the
  *    sketch must reproduce the exact top-10 histogram, hash-for-hash.
  */
object SketchQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Per-returnflag HLL sketches of l_partkey — the "one sketch per
    * shard" build stage; constant bytes per group over the shuffle. */
  private def partkeySketches(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"))

  /** Union + estimate — the rollup stage that never re-reads raw data. */
  private def sketchUnionEstimate(s: SparkSession, dir: String): DataFrame =
    partkeySketches(s, dir)
      .agg(
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
        count(lit(1)).as("n_sketches"))

  def specs: Seq[QuerySpec] = Seq(

    // Two-level mergeable HLL: per-group sketches unioned into a global
    // distinct estimate. Verified against the exact distinct (accuracy
    // contract); Bench times the sketch path alone, not the exact
    // countDistinct the contract needs for comparison.
    QuerySpec(
      "agg_sketch_union",
      (s, dir) => {
        val est = sketchUnionEstimate(s, dir)
        val exact = t(s, dir, "lineitem")
          .agg(countDistinct(col("l_partkey")).as("exact_cnt"))
        est.crossJoin(exact)
          .select(
            round(col("est").cast("double") / col("exact_cnt"), 1).as("est_ratio"),
            col("n_sketches"),
            col("exact_cnt"))
      },
      // n_sketches derived, not a literal: one sketch per observed flag
      // value — a filtered or regenerated corpus missing a flag at a
      // small SF should fail as an accuracy-contract violation, not a
      // confusing hard-coded count mismatch
      Some("""SELECT 1.0 AS est_ratio,
                     COUNT(DISTINCT l_returnflag) AS n_sketches,
                     COUNT(DISTINCT l_partkey) AS exact_cnt
              FROM lineitem"""),
      bench = Some((s, dir) => sketchUnionEstimate(s, dir))),

    // Frequent-items heavy hitters over the token stream. The sketch is
    // built with capacity 4096 >> the corpus vocabulary, i.e. the exact
    // regime (zero Misra–Gries error, merge-safe), then the top 10 words
    // are taken with a deterministic (count DESC, word ASC) tie-break
    // AFTER estimation so sketch-internal ordering can never leak into
    // the result. At 100 TB: constant-size partial state per partition
    // versus the exact word-count's full shuffle of the vocabulary.
    QuerySpec(
      "agg_approx_topk",
      (s, dir) =>
        t(s, dir, "documents")
          .select(explode(split(trim(col("text")), "\\s+")).as("word"))
          .agg(expr("approx_top_k(word, 50, 4096)").as("tk"))
          .select(explode(col("tk")).as("x"))
          .select(col("x.item").as("word"), col("x.count").as("cnt"))
          .orderBy(col("cnt").desc, col("word"))
          .limit(10),
      Some("""SELECT word, cnt FROM (
                SELECT t AS word, COUNT(*) AS cnt
                FROM (SELECT UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS t
                      FROM documents)
                GROUP BY 1)
              ORDER BY cnt DESC, word LIMIT 10""")),

    // Sketch-algebra intersection: |A ∩ B| estimated as |A| + |B| − |A ∪ B|
    // from the SAME mergeable per-group HLL sketches agg_sketch_union
    // builds — the "overlap between two shards/sources without re-reading
    // either" query (cross-source contamination checks at 100 TB run on
    // persisted sketch state, never raw data). Inclusion–exclusion error
    // compounds three ±0.8% estimates, still far inside the 5% contract
    // asserted as round(est/exact, 1) == 1.0; the exact intersection the
    // contract compares against is a partial-aggregating groupBy on
    // l_partkey (Bench times the sketch path alone, cf. agg_sketch_union).
    QuerySpec(
      "agg_sketch_intersect",
      (s, dir) => {
        val est = sketchIntersectEstimate(s, dir)
        val exact = t(s, dir, "lineitem")
          .filter(col("l_returnflag").isin("A", "R"))
          .groupBy("l_partkey")
          .agg(countDistinct(col("l_returnflag")).as("nf"))
          .filter(col("nf") === 2)
          .agg(count(lit(1)).as("exact_i"))
        est.crossJoin(exact)
          .select(
            round((col("sum_est") - col("est_u")).cast("double") / col("exact_i"), 1)
              .as("est_ratio"),
            col("n_sketches"),
            col("exact_i"))
      },
      // n_sketches derived like agg_sketch_union's (restricted to the
      // A/R flags this query intersects)
      Some("""SELECT 1.0 AS est_ratio,
                     (SELECT COUNT(DISTINCT l_returnflag) FROM lineitem
                      WHERE l_returnflag IN ('A', 'R')) AS n_sketches,
                     (SELECT COUNT(*) FROM (
                        SELECT l_partkey FROM lineitem
                        WHERE l_returnflag IN ('A', 'R')
                        GROUP BY l_partkey
                        HAVING COUNT(DISTINCT l_returnflag) = 2)) AS exact_i"""),
      bench = Some((s, dir) => sketchIntersectEstimate(s, dir))),

    // Count-min sketch: the point-frequency sketch (HLL answers "how
    // many distinct", Misra–Gries "which are the heaviest", CMS "how
    // often did THIS key occur" — for ANY key, long after the raw rows
    // are gone). Built once over the corpus (elementwise-sum merge =
    // map-side combine to one 256 KiB grid per partition), probed for
    // 10 fixed supplier keys through the pure-column estimate kernel.
    // Contract: CMS can only OVER-count, and at this grid size no
    // probed key collides in all 4 rows, so est == exact and the
    // oracle's est_ratio is exactly 1.0 (same exact-regime pattern as
    // agg_approx_topk); exact per-key counts ride along, hash-checked.
    QuerySpec(
      "agg_countmin",
      (s, dir) => {
        import graft.functions.{CmsAgg, CountMinSketch}
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val (h1, h2) = CountMinSketch.hashPair(col("l_suppkey"))
        val sketch = li.select(h1.as("h1"), h2.as("h2")).as[(Long, Long)]
          .select(CmsAgg.toColumn.name("sk")).toDF("sk")
        li.filter(col("l_suppkey").between(1, 10))
          .groupBy("l_suppkey")
          .agg(count(lit(1)).as("exact_cnt"))
          .crossJoin(broadcast(sketch))
          .select(
            col("l_suppkey"),
            round(CountMinSketch.estimate(col("sk"), col("l_suppkey"))
              .cast("double") / col("exact_cnt"), 4).as("est_ratio"),
            col("exact_cnt"))
          .orderBy("l_suppkey")
      },
      Some("""SELECT l_suppkey, 1.0 AS est_ratio, COUNT(*) AS exact_cnt
              FROM lineitem WHERE l_suppkey BETWEEN 1 AND 10
              GROUP BY l_suppkey ORDER BY l_suppkey"""),
      // Bench times the sketch build + probe alone, not the exact
      // per-key counts the contract needs for comparison
      bench = Some((s, dir) => {
        import graft.functions.{CmsAgg, CountMinSketch}
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val (h1, h2) = CountMinSketch.hashPair(col("l_suppkey"))
        val sketch = li.select(h1.as("h1"), h2.as("h2")).as[(Long, Long)]
          .select(CmsAgg.toColumn.name("sk")).toDF("sk")
        li.select(col("l_suppkey")).distinct().filter(col("l_suppkey") <= 10)
          .crossJoin(broadcast(sketch))
          .select(col("l_suppkey"),
            CountMinSketch.estimate(col("sk"), col("l_suppkey")).as("est"))
          .orderBy("l_suppkey")
      })),

    // From-scratch mergeable t-digest (Dunning & Ertl 2019): the
    // distributed quantile sketch whose k₁ scale function concentrates
    // centroids at the TAILS — p95/p99 stay tight where rank-uniform
    // sketches blur. Built per returnflag as a typed Aggregator
    // (map-side combine ships ≤ ~2δ centroids per group per partition),
    // then the TOLERANCE CONTRACT (the agg_approx_quantile stance:
    // estimates are merge-order-dependent, verdicts are not): every
    // estimate within 2% of the exact percentile, digest ≤ 300
    // centroids. Merge/accuracy/monotonicity laws in TDigestSpec.
    QuerySpec(
      "agg_tdigest",
      (s, dir) => {
        val td = udaf(graft.functions.TDigest)
        val qf = udf((d: Seq[Double], q: Double) =>
          graft.functions.TDigest.quantile(d, q))
        def within(est: org.apache.spark.sql.Column, exact: String) =
          abs(est / col(exact) - 1) <= 0.02
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(td(col("l_extendedprice")).as("dig"),
            expr("percentile(l_extendedprice, CAST(0.5 AS DOUBLE))").as("e50"),
            expr("percentile(l_extendedprice, CAST(0.95 AS DOUBLE))").as("e95"),
            expr("percentile(l_extendedprice, CAST(0.99 AS DOUBLE))").as("e99"))
          .select(col("l_returnflag"),
            within(qf(col("dig"), lit(0.5)), "e50").as("p50_within"),
            within(qf(col("dig"), lit(0.95)), "e95").as("p95_within"),
            within(qf(col("dig"), lit(0.99)), "e99").as("p99_within"),
            (size(col("dig")) / 2 <= 300).as("compact"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, TRUE AS p50_within, TRUE AS p95_within,
                     TRUE AS p99_within, TRUE AS compact
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      // Bench times the digest + estimates alone — the contract drags
      // three exact percentiles (full sort per group) through the
      // verified plan
      bench = Some((s, dir) => {
        val td = udaf(graft.functions.TDigest)
        val qf = udf((d: Seq[Double], q: Double) =>
          graft.functions.TDigest.quantile(d, q))
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(td(col("l_extendedprice")).as("dig"))
          .select(col("l_returnflag"),
            qf(col("dig"), lit(0.5)).as("p50"),
            qf(col("dig"), lit(0.95)).as("p95"),
            qf(col("dig"), lit(0.99)).as("p99"))
          .orderBy("l_returnflag")
      }))
  )

  /** Per-flag sketches → Σ individual estimates + union estimate, the
    * inclusion–exclusion ingredients (constant-size state throughout). */
  private def sketchIntersectEstimate(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"))
      .agg(
        sum(expr("hll_sketch_estimate(sk)")).as("sum_est"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_u"),
        count(lit(1)).as("n_sketches"))
}
