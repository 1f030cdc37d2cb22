package graft.functions

/** DuckDB `ROUND(double, 6)` replicated for Scala-side kernels that must
  * stay in lockstep with an oracle CTE: round the ×1e6-SCALED double
  * half-away-from-zero, then divide (NOT decimal-string rounding of x
  * itself — for x = 0.7·0.371485 the scaled double is 260039.49999999997,
  * which DuckDB rounds DOWN while x's shortest decimal form "0.2600395"
  * rounds up; measured divergence in rank_mmr). HALF_UP on the scaled
  * value's shortest decimal form matches C round() for every |y| ≤ 1e7
  * where doubles are dense. Includes the oracle's `+ 0.0` IEEE −0.0
  * normalization.
  */
object DuckRound {
  def round6(x: Double): Double = {
    val r = java.math.BigDecimal.valueOf(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1e6
    if (r == 0.0) 0.0 else r
  }
}
