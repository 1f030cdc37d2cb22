package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Partial-aggregation laws for the hash-sketch Aggregators: Spark may
  * split the input across any number of partitions and merge buffers in
  * any order, so reduce/merge must form a commutative monoid over the
  * input multiset. (TopKLines has its own spec; this covers the other
  * two custom Aggregators.)
  */
class AggregatorLawsSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(7)

  test("MinHashSig: any split+merge order equals the single-pass fold") {
    for (_ <- 1 to 200) {
      val xs = Vector.fill(rnd.nextInt(40))(rnd.nextLong() & 0xFFFFFFFFL)
      val direct = xs.foldLeft(MinHashSig.zero)(MinHashSig.reduce).toSeq
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1)
      val (a, b) = xs.splitAt(cut)
      val bufA = a.foldLeft(MinHashSig.zero)(MinHashSig.reduce)
      val bufB = b.foldLeft(MinHashSig.zero)(MinHashSig.reduce)
      assert(MinHashSig.merge(bufA.clone(), bufB.clone()).toSeq == direct)
      assert(MinHashSig.merge(bufB.clone(), bufA.clone()).toSeq == direct)
      // zero is the identity
      assert(MinHashSig.merge(bufA.clone(), MinHashSig.zero).toSeq == bufA.toSeq)
    }
  }

  test("MinHashSig permutation values stay inside [0, P)") {
    for (_ <- 1 to 500) {
      val h = rnd.nextLong() & 0xFFFFFFFFL
      val sig = MinHashSig.reduce(MinHashSig.zero, h)
      assert(sig.forall(v => v >= 0 && v < MinHashSig.P))
    }
  }

  test("SimHash: any split+merge order equals the single-pass fold") {
    for (_ <- 1 to 200) {
      val xs = Vector.fill(rnd.nextInt(40))(rnd.nextLong() & 0xFFFFFFFFL)
      val direct = SimHash.finish(xs.foldLeft(SimHash.zero)(SimHash.reduce))
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1)
      val (a, b) = xs.splitAt(cut)
      val bufA = a.foldLeft(SimHash.zero)(SimHash.reduce)
      val bufB = b.foldLeft(SimHash.zero)(SimHash.reduce)
      assert(SimHash.finish(SimHash.merge(bufA.clone(), bufB.clone())) == direct)
      assert(SimHash.finish(SimHash.merge(bufB.clone(), bufA.clone())) == direct)
    }
  }

  test("SimHash of identical inputs is all input bits; of complements is ties-to-zero") {
    val h = 0xDEADBEEFL & 0xFFFFFFFFL
    val buf = Seq(h, h, h).foldLeft(SimHash.zero)(SimHash.reduce)
    assert(SimHash.finish(buf) == h)
    // equal +1/-1 votes: buf(b) == 0 is NOT > 0, so the bit clears
    val tie = Seq(0xFFFFFFFFL, 0L).foldLeft(SimHash.zero)(SimHash.reduce)
    assert(SimHash.finish(tie) == 0L)
  }

  test("CovMoments: any split+merge order equals the single-pass fold") {
    def vec(): Seq[Long] = Seq.fill(CovMoments.Dim)((rnd.nextInt(1061) - 530).toLong)
    for (_ <- 1 to 50) {
      val xs = Vector.fill(rnd.nextInt(12))(vec())
      val direct = xs.foldLeft(CovMoments.zero)(CovMoments.reduce).toSeq
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1)
      val (a, b) = xs.splitAt(cut)
      val bufA = a.foldLeft(CovMoments.zero)(CovMoments.reduce)
      val bufB = b.foldLeft(CovMoments.zero)(CovMoments.reduce)
      assert(CovMoments.merge(bufA.clone(), bufB.clone()).toSeq == direct)
      assert(CovMoments.merge(bufB.clone(), bufA.clone()).toSeq == direct)
      assert(CovMoments.merge(bufA.clone(), CovMoments.zero).toSeq == bufA.toSeq)
    }
  }

  test("CovMoments buffer layout: diagonal, marginals, and count are consistent") {
    val q = (0 until CovMoments.Dim).map(i => (i - 32).toLong)
    val b = CovMoments.reduce(CovMoments.zero, q)
    // row-major upper-triangle: cell (i,i) sits at offset(i) = Σ_{k<i}(Dim-k)
    var off = 0
    for (i <- 0 until CovMoments.Dim) {
      assert(b(off) == q(i) * q(i), s"diagonal cell $i")
      off += CovMoments.Dim - i
    }
    for (i <- 0 until CovMoments.Dim)
      assert(b(CovMoments.Tri + i) == q(i), s"marginal $i")
    assert(b(CovMoments.Tri + CovMoments.Dim) == 1L)
  }
}
