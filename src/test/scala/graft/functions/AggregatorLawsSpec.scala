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
}
