package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Clustering-quality laws for `embedding_kmeans`: the oracle proves the
  * query computes exactly what it claims; this spec proves what it claims
  * is a correct Lloyd iteration — the objective never increases through
  * assign/update steps, every vector stays assigned, and the trained
  * partition beats the seed partition.
  */
class KmeansSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("every vector is assigned and cluster counts sum to the corpus") {
    val out = Registry.byName("embedding_kmeans").run(spark, dir).collect()
    val n = SimilarityQueries.kmVectors(spark, dir).count()
    assert(out.map(_.getLong(1)).sum == n, "assignment lost or duplicated vectors")
    assert(out.map(_.getInt(0)).toSet.subsetOf((0 until 8).toSet))
    assert(out.nonEmpty && out.length <= 8)
  }

  test("Lloyd objective is monotonically non-increasing across steps") {
    val v = SimilarityQueries.kmVectors(spark, dir)
    val c0 = SimilarityQueries.kmInit(v)
    val a1 = SimilarityQueries.kmAssign(v, c0)
    val c1 = SimilarityQueries.kmUpdate(v, a1)
    val a2 = SimilarityQueries.kmAssign(v, c1)
    val c2 = SimilarityQueries.kmUpdate(v, a2)
    val j10 = SimilarityQueries.kmObjective(v, a1, c0) // after assign to seeds
    val j11 = SimilarityQueries.kmObjective(v, a1, c1) // update improves centroids
    val j21 = SimilarityQueries.kmObjective(v, a2, c1) // reassign improves matching
    val j22 = SimilarityQueries.kmObjective(v, a2, c2) // update improves again
    // each step minimizes the objective holding the other factor fixed;
    // the slack covers the 6-decimal rounding grid ACCUMULATED over the
    // per-vector distance sum (n rounding steps of ≤5e-7 each) plus the
    // partial-order noise of kmObjective's plain double sum — 1e-6 per
    // term, so 1e-4 bounds corpora up to ~100k vectors with margin
    val eps = 1e-4
    assert(j11 <= j10 + eps, s"update increased objective: $j10 -> $j11")
    assert(j21 <= j11 + eps, s"assign increased objective: $j11 -> $j21")
    assert(j22 <= j21 + eps, s"update increased objective: $j21 -> $j22")
    assert(j22 < j10, "training made no progress over seed centroids")
  }

  test("fused kernels (kmAssignE/kmUpdateE) equal the classic ones exactly") {
    val v = SimilarityQueries.kmVectors(spark, dir)
    val c0 = SimilarityQueries.kmInit(v)
    // classic two-iteration chain
    val a1 = SimilarityQueries.kmAssign(v, c0)
    val c1 = SimilarityQueries.kmUpdate(v, a1)
    val a2 = SimilarityQueries.kmAssign(v, c1)
    val c2 = SimilarityQueries.kmUpdate(v, a2)
    // fused chain: assignment carries e; updates never re-join v
    val a1e = SimilarityQueries.kmAssignE(v, c0)
    val c1e = SimilarityQueries.kmUpdateE(a1e)
    val a2e = SimilarityQueries.kmAssignE(v, c1e)
    val c2e = SimilarityQueries.kmUpdateE(a2e)
    def sameRows(x: org.apache.spark.sql.DataFrame,
        y: org.apache.spark.sql.DataFrame, what: String): Unit =
      assert(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty,
        s"$what diverges between fused and classic kernels")
    sameRows(a1e.select("vec_id", "cid"), a1, "iteration-1 assignment")
    sameRows(c1e, c1, "iteration-1 centroids")
    sameRows(a2e.select("vec_id", "cid"), a2, "iteration-2 assignment")
    sameRows(c2e, c2, "iteration-2 centroids")
    // the carried vector is the vector
    sameRows(a2e.select("vec_id", "e"), v, "carried vectors")
  }
}
