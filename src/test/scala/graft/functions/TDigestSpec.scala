package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** t-digest kernel laws: accuracy vs exact quantiles on skewed data,
  * merge-order insensitivity within tolerance, estimate monotonicity,
  * and the centroid-count bound the k₁ scale function promises. */
class TDigestSpec extends AnyFunSuite {

  // deterministic heavy-tailed data: exp of a sawtooth — spans ~4 decades
  private val data: Array[Double] =
    Array.tabulate(20000)(i => math.exp((i % 997) / 100.0))

  private def exact(q: Double): Double = {
    val s = data.sorted
    s(math.min(s.length - 1, math.floor(q * s.length).toInt))
  }

  private def digestOf(xs: Seq[Double]): Array[Double] =
    TDigest.finish(xs.foldLeft(TDigest.zero)(TDigest.reduce))

  test("quantile estimates land within 2% of exact, including the tails") {
    val d = digestOf(data.toIndexedSeq)
    for (q <- Seq(0.05, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999)) {
      val est = TDigest.quantile(d.toIndexedSeq, q)
      val ex = exact(q)
      assert(math.abs(est / ex - 1) <= 0.02,
        s"q=$q est=$est exact=$ex err=${math.abs(est / ex - 1)}")
    }
  }

  test("merging partition digests matches the single-pass digest within tolerance") {
    val whole = digestOf(data.toIndexedSeq)
    val chunks = data.grouped(3000).toSeq
    val bufs = chunks.map(c => c.foldLeft(TDigest.zero)(TDigest.reduce))
    val mergedLtr = TDigest.finish(bufs.reduce(TDigest.merge))
    val mergedRtl = TDigest.finish(bufs.reverse.reduce(TDigest.merge))
    for (q <- Seq(0.5, 0.95, 0.99); m <- Seq(mergedLtr, mergedRtl)) {
      val a = TDigest.quantile(m.toIndexedSeq, q)
      val b = TDigest.quantile(whole.toIndexedSeq, q)
      assert(math.abs(a / b - 1) <= 0.02, s"q=$q merged=$a whole=$b")
    }
  }

  test("estimates are monotone in q and bounded by the data range") {
    val d = digestOf(data.toIndexedSeq).toIndexedSeq
    val qs = (0 to 100).map(_ / 100.0)
    val es = qs.map(TDigest.quantile(d, _))
    assert(es.zip(es.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(es.head >= data.min - 1e-9 && es.last <= data.max + 1e-9)
  }

  test("centroid count stays bounded near 2·delta") {
    val d = digestOf(data.toIndexedSeq)
    val n = d.length / 2
    assert(n <= 2 * TDigest.Compression.toInt + 10, s"$n centroids")
    assert(n >= 20, s"suspiciously few centroids ($n) for 20k points")
  }

  test("tiny and empty inputs behave") {
    assert(TDigest.quantile(digestOf(Seq.empty).toIndexedSeq, 0.5).isNaN)
    assert(TDigest.quantile(digestOf(Seq(42.0)).toIndexedSeq, 0.5) == 42.0)
    val two = digestOf(Seq(1.0, 3.0)).toIndexedSeq
    assert(TDigest.quantile(two, 0.0) == 1.0 && TDigest.quantile(two, 1.0) == 3.0)
  }
}
