package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` door a v1 streaming connector must use:
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`.
  * A v1 [[org.apache.spark.sql.execution.streaming.Source]]'s `getBatch`
  * must return a frame whose plan is MARKED streaming
  * (MicroBatchExecution asserts it), and that flag is settable only
  * through this internal constructor — Spark's own FileStreamSource
  * takes exactly this path. Living in a subpackage of
  * `org.apache.spark.sql` grants the qualified-private access; nothing
  * else in the repo reaches into Spark internals. */
object GraftStreamShims {

  /** A DataFrame whose logical plan carries `isStreaming = true` — the
    * shape `Source.getBatch` must return. */
  def streamingDataFrame(
      spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** Re-materialize a sink's incremental batch as an ordinary batch
    * frame over its ALREADY-PLANNED physical rows, so the sink can run
    * normal write actions without re-analyzing the incremental plan. */
  def batchDataFrame(
      spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
