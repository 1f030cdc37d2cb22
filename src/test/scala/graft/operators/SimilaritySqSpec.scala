package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Quality floor for the scalar-quantized ANN path: reranked SQ top-5
  * must recover (nearly all of) the exact brute-force top-5. With a
  * quantization step of 1e-3 on coordinates in [-0.6, 0.6] the
  * quantized cosine ranking is accurate to ~1e-3, so the 20-candidate
  * prefilter should practically never drop a true top-5 neighbor —
  * the floor is set at 90% to keep the test robust to corpus edits. */
class SimilaritySqSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("SQ rerank recovers >= 90% of brute-force top-5 neighbors") {
    def topsOf(name: String): Map[Long, Set[Long]] =
      Registry.byName(name).run(spark, dir)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = topsOf("topk_similarity")
    val sq = topsOf("topk_similarity_sq")
    assert(exact.keySet == sq.keySet, "query sets differ")
    val recalls = exact.map { case (q, ex) =>
      sq(q).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean SQ recall $mean below floor; per-query=$recalls")
  }
}
