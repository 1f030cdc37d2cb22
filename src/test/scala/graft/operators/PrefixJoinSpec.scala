package graft.operators

import graft.{Registry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The prefix-filtering join's two claims: COMPLETE at the threshold
  * (the prefix lemma — no pair with Jaccard >= t is ever missed, unlike
  * the probabilistic MinHash/SimHash banding) and genuinely PRUNING
  * (candidates from shared prefix shingles are a strict subset of
  * candidates from shared any-shingles — otherwise it is the exact join
  * in disguise).
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

  test("prefix join finds EVERY pair at the threshold (brute-force completeness)") {
    val got = Registry.byName("dedup_prefix_join").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = shingleSets()
    val truth = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
      if a < b && sa.nonEmpty && sb.nonEmpty
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.2
    } yield (a, b)).toSet
    assert(truth.nonEmpty, "fixture has no pairs at the threshold")
    assert(got == truth,
      s"missed ${(truth -- got).take(3)} / extra ${(got -- truth).take(3)}")
  }

  test("the prefix actually prunes: prefix-candidate volume < any-shingle-candidate volume") {
    val sets = shingleSets().filter(_._2.nonEmpty)
    // global rarity order (df asc, shingle asc) — the query's order
    val df = sets.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    def prefix(s: Set[String]): Set[String] = {
      val p = s.size - math.ceil(s.size * 0.2).toInt + 1
      s.toSeq.sortBy(x => (df(x), x)).take(p).toSet
    }
    val pre = sets.view.mapValues(prefix).toMap
    def pairs(m: Map[Long, Set[String]]): Int =
      (for { (a, sa) <- m.toSeq; (b, sb) <- m.toSeq if a < b && (sa & sb).nonEmpty }
        yield 1).size
    val pruned = pairs(pre)
    val full = pairs(sets)
    assert(pruned < full, s"no pruning: prefix pairs $pruned vs full $full")
    info(s"candidate pairs: prefix=$pruned vs any-shingle=$full")
  }
}
