package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Greedy maximal-marginal-relevance re-ranking (Carbonell & Goldstein
  * 1998) over a BOUNDED candidate pool: at each step pick the candidate
  * maximizing λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s) — the
  * diversity-aware second stage every retrieval pipeline runs after
  * top-k. Greedy selection is inherently sequential, so it cannot be a
  * window/join composition; but the pool is top-POOL-sized by
  * construction, so running it inside a typed Aggregator keeps the
  * sequential part O(pool²) per QUERY — the corpus-sized work (the
  * top-k scan that built the pool) stays fully distributed upstream.
  *
  * Input rows are the pool's pairwise-similarity relation
  * (a, rel_a, b, sim_ab), with every rel/sim pre-rounded to 6 decimals
  * IN THE PLAN — the greedy therefore runs on engine-identical numbers
  * and the only arithmetic added here is λ-blending + one final round,
  * mirrored exactly by the oracle's recursive CTE. State is the
  * collected pool relation: ≤ POOL·(POOL−1) tuples per group, constant
  * memory at any corpus size, mergeable (concat) so partial aggregation
  * holds.
  */
object MmrSelect extends Aggregator[
    (Long, Double, Long, Double),
    Seq[(Long, Double, Long, Double)],
    Seq[(Int, Long, Double)]] {

  val Pool = 20
  val K = 8
  val Lambda = 0.7
  // the literal 0.3, NOT 1 - 0.7 (= 0.30000000000000004 in IEEE double) —
  // the oracle's SQL writes the decimal literal
  val OneMinusLambda = 0.3

  override def zero: Seq[(Long, Double, Long, Double)] = Vector.empty

  override def reduce(
      b: Seq[(Long, Double, Long, Double)],
      a: (Long, Double, Long, Double)): Seq[(Long, Double, Long, Double)] = b :+ a

  override def merge(
      x: Seq[(Long, Double, Long, Double)],
      y: Seq[(Long, Double, Long, Double)]): Seq[(Long, Double, Long, Double)] = x ++ y

  override def finish(rows: Seq[(Long, Double, Long, Double)]): Seq[(Int, Long, Double)] = {
    val rel = rows.map(r => r._1 -> r._2).toMap
    val sim = rows.map(r => (r._1, r._3) -> r._4).toMap
    val picks = Vector.newBuilder[(Int, Long, Double)]
    var ids = Vector.empty[Long]
    var rank = 1
    while (rank <= K && ids.size < rel.size) {
      // score every unselected candidate; tie-break (score desc, id asc)
      val best = rel.keysIterator.filterNot(ids.contains).map { a =>
        val maxsim =
          if (ids.isEmpty) 0.0
          else ids.map(b => sim.getOrElse((a, b), 0.0)).max
        (a, round6(Lambda * rel(a) - OneMinusLambda * maxsim))
      }.minBy { case (a, s) => (-s, a) }
      picks += ((rank, best._1, best._2))
      ids :+= best._1
      rank += 1
    }
    picks.result()
  }

  private def round6(x: Double): Double = DuckRound.round6(x)

  override def bufferEncoder: Encoder[Seq[(Long, Double, Long, Double)]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Int, Long, Double)]] =
    ExpressionEncoder()
}
