package graft.operators

import graft.{Registry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The prefix-filtering join's two claims: COMPLETE at the threshold
  * (the prefix lemma + the exactness of the length/positional filters —
  * no pair with Jaccard >= t is ever missed, unlike the probabilistic
  * MinHash/SimHash banding) and genuinely PRUNING (the PPJoin filter
  * stack cuts the candidate volume well below both the any-shingle join
  * AND the prefix-lemma-only join — otherwise it is the exact join in
  * disguise).
  */
class PrefixJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def shingleSets(): Map[Long, Set[String]] =
    Tables(spark, dir, "documents").select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).trim.split("\\s+")
      r.getLong(0) -> toks.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    }.toMap

  private def truthPairs(sets: Map[Long, Set[String]], t: Double): Set[(Long, Long)] =
    (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
      if a < b && sa.nonEmpty && sb.nonEmpty
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= t
    } yield (a, b)).toSet

  for ((name, t) <- Seq("dedup_prefix_join" -> 0.2, "dedup_prefix_join_t5" -> 0.5))
    test(s"$name finds EVERY pair at t=$t (brute-force completeness)") {
      val got = Registry.byName(name).run(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = truthPairs(shingleSets(), t)
      assert(truth.nonEmpty, "fixture has no pairs at the threshold")
      assert(got == truth,
        s"missed ${(truth -- got).take(3)} / extra ${(got -- truth).take(3)}")
    }

  test("the PPJoin filter stack actually prunes: filtered < prefix-only < any-shingle") {
    val t = 0.2
    val sets = shingleSets().filter(_._2.nonEmpty)
    // global rarity order (df asc, shingle asc) — the query's order
    val df = sets.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    def rankedPrefix(s: Set[String]): Map[String, (Int, Int)] = {
      val sorted = s.toSeq.sortBy(x => (df(x), x))
      val p = s.size - math.ceil(s.size * t).toInt + 1
      sorted.take(p).zipWithIndex
        .map { case (x, i) => x -> (i + 1, s.size) }.toMap // rank is 1-based
    }
    val pre = sets.view.mapValues(rankedPrefix).toMap
    // prefix-lemma-only candidates (the round-6 plan)
    val prefixOnly = (for {
      (a, pa) <- pre.toSeq; (b, pb) <- pre.toSeq
      if a < b && (pa.keySet & pb.keySet).nonEmpty
    } yield (a, b)).toSet
    // + length filter + positional filter (the round-7 plan, modelled
    // exactly as the query computes them)
    val filtered = (for {
      (a, pa) <- pre.toSeq; (b, pb) <- pre.toSeq
      if a < b
      sza = sets(a).size; szb = sets(b).size
      if math.min(sza, szb).toDouble >= t * math.max(sza, szb) - 1e-9
      alpha = math.ceil(t / (1 + t) * (sza + szb) - 1e-9)
      if (pa.keySet & pb.keySet).exists { h =>
        val (rka, _) = pa(h); val (rkb, _) = pb(h)
        math.min(rka, rkb) + math.min(sza - rka, szb - rkb) >= alpha
      }
    } yield (a, b)).toSet
    def anyPairs: Int =
      (for { (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
             if a < b && (sa & sb).nonEmpty } yield 1).size
    val full = anyPairs
    assert(filtered.size < prefixOnly.size,
      s"length+positional filters prune nothing: ${filtered.size} vs prefix-only ${prefixOnly.size}")
    assert(prefixOnly.size < full,
      s"no prefix pruning: prefix pairs ${prefixOnly.size} vs full $full")
    // the filters must keep every TRUE pair (exactness, modelled)
    val truth = truthPairs(sets, t)
    assert(truth.subsetOf(filtered),
      s"filter dropped true pairs: ${(truth -- filtered).take(3)}")
    info(s"candidate pairs: ppjoin=${filtered.size} vs prefix-only=${prefixOnly.size} vs any-shingle=$full")
  }
}
