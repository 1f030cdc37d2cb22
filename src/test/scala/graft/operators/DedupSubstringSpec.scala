package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The exact-substring dedup GUARANTEE as a law: after removal, no
  * fully-surviving window of L contiguous original positions occurs
  * twice anywhere in the corpus — the certificate fixed chunks and
  * winnowing cannot give. Proven on a constructed corpus with known
  * shared passages AND on the real sf0.001 documents table.
  */
class DedupSubstringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val L = DedupQueries.SubstrL

  private def coverage(df: org.apache.spark.sql.DataFrame) =
    DedupQueries.substringCoverageOf(df)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .groupBy(_._1)
      .map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(t => (t._3, t._4 == 1))
      }

  /** All shingles over L contiguous surviving original positions. */
  private def survivingWindows(
      perDoc: Map[Long, Array[(String, Boolean)]]): Seq[String] =
    perDoc.toSeq.flatMap { case (_, toks) =>
      toks.sliding(L).filter(w => w.length == L && w.forall(!_._2))
        .map(_.map(_._1).mkString(" "))
    }

  test("a shared >= L-token passage is removed from the later doc only") {
    val spark2 = spark
    import spark2.implicits._
    val passage = (1 to 10).map(i => s"p$i").mkString(" ") // 10 > L tokens
    val df = Seq(
      (1L, s"alpha beta $passage gamma"),
      (2L, s"delta $passage epsilon zeta"),
      (3L, "totally unrelated words only here")
    ).toDF("doc_id", "text")
    val cov = coverage(df)
    // earliest occurrence (doc 1) keeps every token
    assert(cov(1L).forall(!_._2), "canonical copy must survive untouched")
    // the later copy loses the whole passage (all 10 tokens covered)
    val removed2 = cov(2L).filter(_._2).map(_._1)
    assert((1 to 10).map(i => s"p$i").forall(removed2.contains),
      s"passage not fully removed from doc 2: kept ${cov(2L).filterNot(_._2).map(_._1).mkString(" ")}")
    // unrelated docs untouched
    assert(cov(3L).forall(!_._2))
    // and the guarantee holds
    val wins = survivingWindows(cov)
    assert(wins.distinct.length == wins.length,
      "a repeated L-window survived on the constructed corpus")
  }

  test("guarantee law on the real corpus: no surviving L-window repeats") {
    val df = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val cov = coverage(df)
    val wins = survivingWindows(cov)
    val dupes = wins.groupBy(identity).filter(_._2.length > 1).keys.take(3)
    assert(dupes.isEmpty,
      s"repeated surviving windows: ${dupes.mkString(" | ")}")
  }

  test("within-doc repetition is also caught (self-similarity)") {
    val spark2 = spark
    import spark2.implicits._
    val run = (1 to 9).map(i => s"r$i").mkString(" ")
    val df = Seq((7L, s"$run middle $run")).toDF("doc_id", "text")
    val cov = coverage(df)
    val wins = survivingWindows(cov)
    assert(wins.distinct.length == wins.length,
      "within-doc repeated window survived")
    // the first copy survives; the second is removed
    assert(cov(7L).count(_._2) >= 9)
  }
}
