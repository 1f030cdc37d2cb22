package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Quality floor for the IVF-PQ composition. Two lossy stages stack
  * (nprobe=2 of 8 cells, then 20-candidate residual-ADC prefilter), so
  * the floor sits between raw PQ's 40% and the exact paths: the paper's
  * claim (residual coding beats raw-vector coding at equal budget) plus
  * cell pruning should still recover a large share of the true top-5 —
  * a broken residual grid, probe, or ADC join collapses recall toward
  * the random-draw baseline. */
class SimilarityIvfPqSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("IVF-PQ rerank recovers >= 40% of brute-force top-5 neighbors") {
    def topsOf(name: String): Map[Long, Set[Long]] =
      Registry.byName(name).run(spark, dir)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = topsOf("topk_similarity")
    val ivfpq = topsOf("topk_similarity_ivfpq")
    assert(exact.keySet == ivfpq.keySet, "query sets differ")
    val recalls = exact.map { case (q, ex) =>
      ivfpq(q).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    info(s"mean IVF-PQ recall@5 = $mean")
    assert(mean >= 0.4, s"mean IVF-PQ recall $mean below floor; per-query=$recalls")
  }
}
