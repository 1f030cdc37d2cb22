package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator-parity query (SURVEY.md §2 inventory).
  *
  * @param name   the `q:` tag from SURVEY.md §2
  * @param run    Spark-side implementation; `dir` is the scale-factor dir
  * @param oracle equivalent DuckDB SQL over the same parquet tables; None for
  *               ops with no SQL-expressible oracle (driver records a weaker
  *               rows-only check)
  * @param bench  what Bench times when the VERIFIED query is not the
  *               representative workload — e.g. `agg_approx_distinct`'s
  *               tolerance contract runs an exact countDistinct alongside
  *               the sketch, so timing `run` would measure the oracle
  *               scaffolding, not the fast path the operator exists for.
  *               Verify always checks `run`; None means Bench times `run`.
  * @param cacheAssisted the query deliberately reuses a per-session
  *               materialized subtree (e.g. the ensemble's published pair
  *               checkpoints), so its best-of-N bench time measures the
  *               marginal cost, not the end-to-end generators — Bench
  *               flags these in its output and reports a total excluding
  *               them so cross-round comparisons stay honest.
  *
  * Determinism contract (BASELINE.md): every query ends in a total-order
  * `ORDER BY`; double aggregation goes through DECIMAL(38,4) so partial-agg
  * order can't change the result; NULL ordering is spelled out on both sides
  * (Spark defaults NULLS FIRST, DuckDB NULLS LAST); `events.ts` is nanosecond
  * parquet that Spark truncates to micros on read, so oracles read it through
  * `CAST(ts AS TIMESTAMP)` (DuckDB truncates identically).
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Option[(SparkSession, String) => DataFrame] = None,
    cacheAssisted: Boolean = false)

/** Aggregates every module's declared queries for SparkEntry. */
object Registry {
  def all: Seq[QuerySpec] =
    operators.ReaderQueries.specs ++
      operators.RelationalQueries.specs ++
      operators.TpchQueries.specs ++
      operators.SketchQueries.specs ++
      operators.DedupQueries.specs ++
      operators.SimilarityQueries.specs ++
      operators.TextQueries.specs ++
      operators.MultimodalQueries.specs ++
      operators.StreamingQueries.specs ++
      operators.GeoQueries.specs ++
      operators.LayoutQueries.specs ++
      operators.TableQueries.specs

  lazy val byName: Map[String, QuerySpec] = all.map(q => q.name -> q).toMap
}
