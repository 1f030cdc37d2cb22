package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", 2019) as a typed [[Aggregator]] — the
  * streaming/distributed quantile sketch whose error is RELATIVE to
  * q(1−q), so tails (p99, p999) are far tighter than rank-uniform
  * sketches at the same size.
  *
  * Buffer = interleaved [mean₀, weight₀, mean₁, weight₁, …] centroids
  * sorted by mean, plus a small unsorted spill of raw points that
  * compresses once it fills. Compression uses the k₁ scale function
  * k(q) = (δ/2π)·asin(2q−1): adjacent centroids merge only while the
  * merged k-span stays under 1, which caps centroid count at ~2δ and
  * concentrates resolution at the tails.
  *
  * Partial-aggregating: merge() concatenates centroid lists and
  * re-compresses — constant ≤ ~2δ + SpillCap doubles per group per
  * partition cross the shuffle at any corpus size.
  *
  * Estimates interpolate linearly inside centroids with half-weight
  * endpoint handling; min/max of the data ride in the first/last
  * centroid means because singletons at the extremes never merge (the
  * k-span bound is tightest at q ∈ {0,1}).
  *
  * Determinism stance: estimates depend on merge ORDER (like every
  * t-digest), so declared queries ship the TOLERANCE CONTRACT — the
  * estimate must land within the documented bound of the exact
  * percentile — rather than the raw estimate (the agg_approx_quantile
  * pattern; TDigestSpec pins accuracy + merge laws).
  */
object TDigest extends Aggregator[Double, Array[Double], Array[Double]] {

  val Compression = 100.0
  private val SpillCap = 128 // raw points buffered before a compress

  // Buffer layout: [nCentroids, m0, w0, m1, w1, ..., nSpill, s0, s1, ...]
  // flattened into one Array[Double] so the ExpressionEncoder stays a
  // primitive array (no nested struct codegen in the shuffle).

  override def zero: Array[Double] = Array(0.0, 0.0) // 0 centroids, 0 spill

  private def nCentroids(b: Array[Double]): Int = b(0).toInt
  private def spillStart(b: Array[Double]): Int = 1 + 2 * nCentroids(b)
  private def nSpill(b: Array[Double]): Int = b(spillStart(b)).toInt

  override def reduce(buf: Array[Double], x: Double): Array[Double] = {
    val ss = spillStart(buf)
    val ns = nSpill(buf)
    val out =
      if (1 + ss + ns < buf.length) buf // room in the allocated tail
      else buf ++ new Array[Double](math.max(8, buf.length / 2))
    out(ss) = ns + 1
    out(ss + 1 + ns) = x
    if (ns + 1 >= SpillCap) compress(out) else out
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val ca = compress(a); val cb = compress(b)
    val na = nCentroids(ca); val nb = nCentroids(cb)
    val joined = new Array[Double](1 + 2 * (na + nb) + 1)
    joined(0) = na + nb
    System.arraycopy(ca, 1, joined, 1, 2 * na)
    System.arraycopy(cb, 1, joined, 1 + 2 * na, 2 * nb)
    joined(1 + 2 * (na + nb)) = 0 // empty spill
    compress(joined)
  }

  override def finish(buf: Array[Double]): Array[Double] = {
    val c = compress(buf)
    c.slice(1, 1 + 2 * nCentroids(c)) // interleaved [mean, weight] pairs
  }

  /** Sort centroids + spill by mean, then merge adjacent centroids while
    * the merged k-span stays under 1 (the k₁ scale function). */
  private def compress(buf: Array[Double]): Array[Double] = {
    val nc = nCentroids(buf); val ss = spillStart(buf); val ns = nSpill(buf)
    if (ns == 0 && nc <= 1) return buf
    val pts = new Array[(Double, Double)](nc + ns)
    var i = 0
    while (i < nc) { pts(i) = (buf(1 + 2 * i), buf(2 + 2 * i)); i += 1 }
    var j = 0
    while (j < ns) { pts(nc + j) = (buf(ss + 1 + j), 1.0); j += 1 }
    val sorted = pts.sortBy(_._1)
    val total = sorted.map(_._2).sum
    def k(q: Double): Double =
      Compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)
    val means = scala.collection.mutable.ArrayBuffer.empty[Double]
    val weights = scala.collection.mutable.ArrayBuffer.empty[Double]
    var accMean = sorted(0)._1; var accW = sorted(0)._2; var wSoFar = 0.0
    var p = 1
    while (p < sorted.length) {
      val (m, w) = sorted(p)
      val qLo = wSoFar / total
      val qHi = (wSoFar + accW + w) / total
      if (k(qHi) - k(qLo) <= 1.0) {
        // merge into the accumulating centroid (weighted mean)
        accMean = (accMean * accW + m * w) / (accW + w)
        accW += w
      } else {
        means += accMean; weights += accW; wSoFar += accW
        accMean = m; accW = w
      }
      p += 1
    }
    means += accMean; weights += accW
    val out = new Array[Double](1 + 2 * means.length + 1)
    out(0) = means.length
    var q = 0
    while (q < means.length) {
      out(1 + 2 * q) = means(q); out(2 + 2 * q) = weights(q); q += 1
    }
    out(1 + 2 * means.length) = 0 // spill emptied
    out
  }

  /** Quantile estimate from finish()'s interleaved centroid pairs:
    * linear interpolation between centroid midpoints (each centroid's
    * mean sits at the middle of its weight span). */
  def quantile(digest: Seq[Double], q: Double): Double = {
    val n = digest.length / 2
    if (n == 0) return Double.NaN
    val means = Array.tabulate(n)(i => digest(2 * i))
    val ws = Array.tabulate(n)(i => digest(2 * i + 1))
    val total = ws.sum
    val target = q * total
    if (target <= ws(0) / 2) return means(0)
    var cum = 0.0
    var i = 0
    while (i < n) {
      val mid = cum + ws(i) / 2
      if (target <= mid) {
        if (i == 0) return means(0)
        val prevMid = cum - ws(i - 1) / 2
        val f = (target - prevMid) / (mid - prevMid)
        return means(i - 1) + f * (means(i) - means(i - 1))
      }
      cum += ws(i)
      i += 1
    }
    means(n - 1)
  }

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
