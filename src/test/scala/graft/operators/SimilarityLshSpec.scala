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

  test("band buckets actually prune: candidate volume far below n-squared") {
    import org.apache.spark.sql.functions._
    val bands = SimilarityQueries.lshBands(spark, dir)
    val n = bands.select("vec_id").distinct().count()
    // Σ|bucket|² across all (band, key) buckets = the pair volume the band
    // self-join materializes. The 4-bit geometry this replaced measured
    // ≈ n²/16 here — effectively no prune. 8-bit keys must do far better.
    val pairVolume = bands.groupBy("b", "key").count()
      .agg(sum(col("count") * col("count"))).collect()(0).getLong(0)
    assert(pairVolume < n * n / 8,
      s"pair volume $pairVolume vs n²=${n * n}: bands are not pruning")
  }
}
