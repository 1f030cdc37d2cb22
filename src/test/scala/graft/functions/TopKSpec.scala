package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Aggregator laws for TopKLines: partial aggregation is only correct if
  * any split of the input into reduce/merge trees yields the same buffer
  * — Spark chooses the split (partitions, map-side combines) at runtime,
  * so the law must hold for every cut and both merge orders. Ties on
  * price are exercised deliberately (small value ranges).
  */
class TopKSpec extends AnyFunSuite {

  private def naive(xs: Seq[(Double, Int)]): Seq[Int] =
    xs.sortBy(p => (-p._1, p._2)).take(TopKLines.K).map(_._2)

  test("reduce/merge agree with naive sort-take-k under arbitrary splits") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val n = rnd.nextInt(12)
      val xs = Vector.fill(n)((rnd.nextInt(5).toDouble, rnd.nextInt(100)))
      val cut = if (n == 0) 0 else rnd.nextInt(n + 1)
      val (a, b) = xs.splitAt(cut)
      val bufA = a.foldLeft(TopKLines.zero)(TopKLines.reduce)
      val bufB = b.foldLeft(TopKLines.zero)(TopKLines.reduce)
      val expected = naive(xs)
      assert(TopKLines.finish(TopKLines.merge(bufA, bufB)) == expected)
      assert(TopKLines.finish(TopKLines.merge(bufB, bufA)) == expected)
    }
  }

  test("NaN prices rank first, matching Spark's DESC double ordering") {
    val xs = Seq((Double.NaN, 1), (5.0, 2), (4.0, 3), (3.0, 4))
    val buf = xs.foldLeft(TopKLines.zero)(TopKLines.reduce)
    assert(TopKLines.finish(buf) == Seq(1, 2, 3))
  }

  test("signed zeros tie (like Spark's sort), line breaks the tie") {
    val xs = Seq((0.0, 5), (-0.0, 2), (1.0, 9))
    val buf = xs.foldLeft(TopKLines.zero)(TopKLines.reduce)
    // -0.0 == 0.0 in Spark's ordering, so line ASC decides: 2 before 5
    assert(TopKLines.finish(buf) == Seq(9, 2, 5))
  }

  test("buffer never exceeds K entries") {
    val xs = (1 to 100).map(i => (i.toDouble, i))
    val buf = xs.foldLeft(TopKLines.zero)(TopKLines.reduce)
    assert(buf.size == TopKLines.K)
    assert(TopKLines.finish(buf) == Seq(100, 99, 98))
  }
}
