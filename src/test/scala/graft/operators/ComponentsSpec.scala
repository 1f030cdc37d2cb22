package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Stress for the connected-components kernel behind `dedup_components`
  * on graph shapes the corpus doesn't produce: a deep CHAIN (linear
  * propagation would need diameter rounds — pointer doubling must
  * converge within the 25-round cap), multiple components, and the
  * empty graph (must return empty, not NPE on a NULL sum).
  */
class ComponentsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    DedupQueries.connectedComponents(pairs.toDF("da", "db"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 60-vertex chain collapses to one component under the round cap") {
    val chain = (1L until 60L).map(i => (i, i + 1))
    val labels = cc(chain)
    assert(labels.size == 60)
    assert(labels.values.toSet == Set(1L), "every chain member labeled with the min id")
  }

  test("disjoint components keep distinct minimum labels") {
    val labels = cc(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L)))
    assert(labels == Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L))
  }

  test("empty pair graph yields an empty result") {
    assert(cc(Seq.empty).isEmpty)
  }
}
