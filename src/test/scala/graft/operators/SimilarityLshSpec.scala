package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality property for the LSH-bucketed similarity path: the oracle
  * (check_oracle.py) proves the LSH query computes exactly what it claims;
  * this spec proves what it claims is USEFUL — candidates recalled from
  * shared sign-bit bands rank far above chance against the brute-force
  * ground truth, while never touching the full cross product.
  */
class SimilarityLshSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("LSH top-5 recalls brute-force neighbors far above chance") {
    def pairs(name: String): Set[(Long, Long)] =
      Registry.byName(name).run(spark, dir)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs("topk_similarity")
    val lsh = pairs("topk_similarity_lsh")
    val queries = bf.map(_._1)
    assert(queries.size == 16)

    val recall = (bf & lsh).size.toDouble / bf.size
    // chance level ≈ 5/499 ≈ 0.01 per slot; the band structure must do
    // far better (measured ~0.36 on this corpus — floor leaves margin)
    assert(recall >= 0.15, s"recall@5 $recall below floor")

    val hitQueries = (bf & lsh).map(_._1)
    assert(hitQueries.size * 2 >= queries.size,
      s"only ${hitQueries.size}/${queries.size} queries recalled a true neighbor")

    // pruning: every query returns at most k candidates — the rerank never
    // saw the quadratic pair space (plan-shape proof: no BNLJ, PlanAudit)
    assert(lsh.size <= queries.size * 5)
  }
}
