package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CMS laws: estimates can only OVER-count (min-over-rows of summed
  * slots never loses an increment), merge must equal single-pass build
  * for any split, and the production DataFrame path (native xxhash64 →
  * partial-agg grid build → pure-column estimate) must agree with a
  * driver-side replay of the same counters. */
class CountMinSketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("estimate >= exact for every key; == exact for non-colliding keys (DataFrame path)") {
    // skewed corpus: key k occurs k times, 1..60
    val rows = (1L to 60L).flatMap(k => Seq.fill(k.toInt)(k))
    val (h1, h2) = CountMinSketch.hashPair(col("k"))
    val sketch = rows.toDF("k").repartition(5)
      .select(h1.as("h1"), h2.as("h2")).as[(Long, Long)]
      .select(CmsAgg.toColumn.name("sk")).toDF("sk")
    val est = (1L to 60L).toDF("k").crossJoin(sketch)
      .select(col("k"), CountMinSketch.estimate(col("sk"), col("k")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 60L).foreach { k =>
      assert(est(k) >= k, s"CMS under-counted key $k: ${est(k)} < $k")
    }
    // 60 keys in 8192-wide rows: all-4-row collisions are absent, so
    // the exact-regime contract the oracle relies on holds here too
    assert((1L to 60L).count(k => est(k) == k) == 60)
  }

  test("merge equals single-pass build for arbitrary splits") {
    val rnd = new scala.util.Random(99)
    val hs = Vector.fill(400)((rnd.nextLong(), rnd.nextLong()))
    val (a, b) = hs.splitAt(157)
    val whole = hs.foldLeft(CmsAgg.zero)(CmsAgg.reduce)
    val merged = CmsAgg.merge(
      a.foldLeft(CmsAgg.zero)(CmsAgg.reduce),
      b.foldLeft(CmsAgg.zero)(CmsAgg.reduce))
    assert(merged.sameElements(whole))
  }
}
