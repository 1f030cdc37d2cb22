package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Quality floor for the product-quantized ANN path. PQ compresses far
  * harder than SQ8 (4 codes of ~4 bits vs 64 int8 codes), so ADC ranking
  * is coarser and the floor is accordingly lower than the SQ spec's 90%:
  * the test pins that the 20-candidate ADC prefilter plus exact rerank
  * still recovers a substantial share of the true top-5 — a broken code
  * assignment or distance table collapses recall toward the ~6% a random
  * 20-of-~330 candidate draw would give, far below the floor. */
class SimilarityPqSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("PQ/ADC rerank recovers >= 40% of brute-force top-5 neighbors") {
    def topsOf(name: String): Map[Long, Set[Long]] =
      Registry.byName(name).run(spark, dir)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = topsOf("topk_similarity")
    val pq = topsOf("topk_similarity_pq")
    assert(exact.keySet == pq.keySet, "query sets differ")
    val recalls = exact.map { case (q, ex) =>
      pq(q).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    info(s"mean PQ recall@5 = $mean")
    assert(mean >= 0.4, s"mean PQ recall $mean below floor; per-query=$recalls")
  }
}
