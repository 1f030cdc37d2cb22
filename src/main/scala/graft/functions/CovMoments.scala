package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass covariance sufficient statistics as a typed [[Aggregator]]
  * (the `q:embedding_covariance` kernel): input is an integer-quantized
  * vector q = round(x·1000), the buffer packs
  * `[0, Tri)` upper-triangle product sums Σ qᵢ·qⱼ (row-major, j ≥ i),
  * `[Tri, Tri+Dim)` marginal sums Σ qᵢ, and `[Tri+Dim]` the row count —
  * all exact BIGINT arithmetic, so the DuckDB oracle reproduces every
  * element bit-for-bit with integer SUMs.
  *
  * Partial-aggregating: buffers merge element-wise, so map-side combine
  * reduces each partition to ONE ~17 KB long array before the shuffle —
  * the shuffle is constant-size in n (the 100 TB shape), and the inner
  * double loop is raw compiled long arithmetic (measured ~5× faster than
  * the interpreted higher-order-function fan-out it replaced).
  *
  * Overflow headroom: |q| ≤ ~530 on this corpus ⇒ |qᵢ·qⱼ| < 3e5, so the
  * partial sums stay below Long.MaxValue past 1e13 rows.
  */
object CovMoments extends Aggregator[Seq[Long], Array[Long], Array[Long]] {

  val Dim = 64
  val Tri: Int = Dim * (Dim + 1) / 2 // 2080 upper-triangle (i ≤ j) cells

  override def zero: Array[Long] = new Array[Long](Tri + Dim + 1)

  override def reduce(b: Array[Long], q: Seq[Long]): Array[Long] = {
    // fail fast with a diagnosable message (the LshBandKeys convention)
    // instead of an opaque iterator crash / silent truncation
    require(q.length == Dim,
      s"CovMoments expects $Dim-dim vectors, got ${q.length}")
    val a = new Array[Long](Dim)
    val it = q.iterator
    var i = 0
    while (i < Dim) { a(i) = it.next(); i += 1 }
    var t = 0
    i = 0
    while (i < Dim) {
      val qi = a(i)
      var j = i
      while (j < Dim) { b(t) += qi * a(j); t += 1; j += 1 }
      b(Tri + i) += qi
      i += 1
    }
    b(Tri + Dim) += 1
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
