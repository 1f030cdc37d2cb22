package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated corpus (TESTDATA.md).
  *
  * One parquet file per table under the scale-factor dir. All reads are plain
  * `spark.read.parquet` — columnar, vectorized, filter/column pushdown-capable —
  * mirroring the reference's `read_parquet` CTAS
  * (reference: core_processor.rs:419-424) but lazily, with no staging
  * materialization (SURVEY.md §1.1 "staging table data").
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** events.ts is INT64 TIMESTAMP(NANOS) parquet, which Spark only reads as
    * a long (spark.sql.legacy.parquet.nanosAsLong=true, set in Verify/Bench/
    * test sessions). Truncate to micros with exact integer division — the
    * same truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP.
    * Shared by the batch loader above and the streaming reader
    * (EventStreams.readEvents) so batch/stream twins can never diverge. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
}
