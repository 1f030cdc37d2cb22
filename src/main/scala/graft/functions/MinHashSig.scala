package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** 16-permutation MinHash signature as a typed [[Aggregator]] (the
  * `q:agg_minhash` UDAF promised in SURVEY.md §2.4): input is a base
  * 32-bit element hash, the buffer/output is the per-permutation minimum
  * of `(2i+1)·h + 7919i mod P` — the same deterministic permutation family
  * as DedupQueries, so the DuckDB oracle reproduces it with 16 MIN
  * expressions.
  *
  * Partial-aggregating: signatures merge with elementwise min, so map-side
  * combine reduces each partition to one 16-long buffer before the shuffle
  * — constant bytes per group per partition at 100 TB.
  */
object MinHashSig extends Aggregator[Long, Array[Long], Array[Long]] {

  val P = 4294967311L // smallest prime > 2^32
  val K = 16

  override def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < K) {
      val v = ((2 * i + 1) * h + 7919L * i) % P
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < K) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
