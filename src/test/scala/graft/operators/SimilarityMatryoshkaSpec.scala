package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Quality floor for the Matryoshka / truncated-dimension retrieval
  * rung: the 16-of-64-dim coarse ranking plus a 20-candidate exact
  * rerank must recover most of the brute-force top-5. The corpus
  * embeddings are NOT matryoshka-trained (prefix dims carry no special
  * mass), so this floor is the UNFAVORABLE case for the technique —
  * 60% keeps the test meaningful without assuming MRL training; on an
  * actually MRL-trained model the prefix ranking approaches the full
  * one by construction. */
class SimilarityMatryoshkaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("truncated-dim rerank recovers >= 60% of brute-force top-5 neighbors") {
    def topsOf(name: String): Map[Long, Set[Long]] =
      Registry.byName(name).run(spark, dir)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = topsOf("topk_similarity")
    val mrl = topsOf("topk_similarity_matryoshka")
    assert(exact.keySet == mrl.keySet, "query sets differ")
    val recalls = exact.map { case (q, ex) =>
      mrl(q).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean matryoshka recall $mean below floor; per-query=$recalls")
    info(f"mean recall over ${recalls.size} queries: ${mean}%.3f")
  }
}
