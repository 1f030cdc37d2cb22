package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** 32-bit SimHash as a typed [[Aggregator]] (SURVEY.md §2.13): input is a
  * per-token 32-bit hash, the buffer is the 32 per-bit vote counters, and
  * the result sets bit b when the votes for b are net-positive.
  *
  * Being a Spark `Aggregator`, it partial-aggregates: executors combine
  * token hashes map-side and only the 32-counter buffers cross the shuffle
  * — the 100 TB shape (bytes shuffled per doc is constant, independent of
  * document length).
  *
  * The bit math mirrors the SQL oracle exactly:
  * `(h >> b) & 1 == 1 ? +1 : -1`, result bit = votes > 0.
  */
object SimHash extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long](32)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var b = 0
    while (b < 32) {
      buf(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
      b += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var b = 0
    while (b < 32) { x(b) += y(b); b += 1 }
    x
  }

  override def finish(buf: Array[Long]): Long = {
    var out = 0L
    var b = 0
    while (b < 32) {
      if (buf(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
