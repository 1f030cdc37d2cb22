package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Quality floor for the 1-bit sign-quantized ANN path. One bit per
  * dimension keeps only the orthant of each vector, so hamming ranking
  * is far coarser than SQ8/PQ — but for cluster-structured embeddings
  * (FIXTURES.md: label-correlated directions) same-cluster vectors
  * share most sign bits and land in the 20-candidate prefilter, which
  * the exact rerank then orders correctly. The floor is deliberately
  * lower than SQ8's 90%: the operator's value is the 32×-smaller scan,
  * not prefilter precision, and the spec pins that it still recovers a
  * usable majority of the true top-5.
  */
class SimilarityBinarySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("binary-hamming rerank recovers >= 50% of brute-force top-5 neighbors") {
    def topsOf(name: String): Map[Long, Set[Long]] =
      Registry.byName(name).run(spark, dir)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = topsOf("topk_similarity")
    val bin = topsOf("topk_similarity_binary")
    assert(exact.keySet == bin.keySet, "query sets differ")
    val recalls = exact.map { case (q, ex) =>
      bin(q).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean binary recall $mean below floor; per-query=$recalls")
  }
}
