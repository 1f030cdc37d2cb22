package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Dominant eigenvector of the 64×64 embedding covariance by fixed-count
  * power iteration — in-engine PCA's top component. The corpus-sized
  * work (the exact integer moment aggregation) happens UPSTREAM in the
  * covariance plan; what arrives here is the constant-size (i, j, cov)
  * matrix relation, so the iteration is O(20·64²) on one task regardless
  * of corpus size — exactly where a production system solves its eigen
  * problem. Mergeable concat state keeps partial aggregation lawful.
  *
  * Lockstep contract with the oracle's unrolled CTE loop: v₀ = 0.125
  * (exact double) on every coordinate; each iteration computes w = C·v
  * with j-ascending sums (the oracle's positional co-UNNEST order), the
  * norm with i-ascending sums, then rounds every coordinate of w/‖w‖ to
  * 6 decimals (DuckRound = DuckDB ROUND) — so both engines enter every
  * iteration with IDENTICAL doubles and fp drift can never accumulate.
  * Finish emits (i, loading, eigenvalue), the eigenvalue the Rayleigh
  * quotient vᵀCv of the final rounded vector.
  */
object PowerIterate extends Aggregator[
    (Int, Int, Double),
    Seq[(Int, Int, Double)],
    Seq[(Int, Double, Double)]] {

  val Dim = 64
  val Iters = 20

  override def zero: Seq[(Int, Int, Double)] = Vector.empty
  override def reduce(b: Seq[(Int, Int, Double)], a: (Int, Int, Double)): Seq[(Int, Int, Double)] =
    b :+ a
  override def merge(x: Seq[(Int, Int, Double)], y: Seq[(Int, Int, Double)]): Seq[(Int, Int, Double)] =
    x ++ y

  override def finish(rows: Seq[(Int, Int, Double)]): Seq[(Int, Double, Double)] = {
    val c = Array.ofDim[Double](Dim, Dim)
    rows.foreach { case (i, j, v) => c(i)(j) = v }
    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(Dim) { i =>
        var s = 0.0; var j = 0
        while (j < Dim) { s += c(i)(j) * v(j); j += 1 }
        s
      }
    var v = Array.fill(Dim)(0.125)
    for (_ <- 1 to Iters) {
      val w = matvec(v)
      var n2 = 0.0; var i = 0
      while (i < Dim) { n2 += w(i) * w(i); i += 1 }
      val n = math.sqrt(n2)
      v = w.map(x => DuckRound.round6(x / n))
    }
    val w = matvec(v)
    var lam = 0.0; var i = 0
    while (i < Dim) { lam += v(i) * w(i); i += 1 }
    val lamR = DuckRound.round6(lam)
    (0 until Dim).map(i => (i, v(i), lamR))
  }

  override def bufferEncoder: Encoder[Seq[(Int, Int, Double)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Int, Double, Double)]] = ExpressionEncoder()
}
