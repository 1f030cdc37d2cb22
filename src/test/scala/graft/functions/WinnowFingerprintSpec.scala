package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WinnowFingerprintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import WinnowFingerprint.{K, W}

  private def fingerprints(texts: Seq[String]): Map[Long, Seq[(Int, Long)]] = {
    val rows = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        WinnowFingerprint(split(trim(col("text")), "\\s+")).as("fp"))
      .select(col("doc_id"), explode(col("fp")).as("f"))
      .select(col("doc_id"), col("f.pos"), col("f.h")).collect()
    rows.groupBy(_.getLong(0)).map { case (d, rs) =>
      d -> rs.map(r => (r.getInt(1), r.getLong(2))).toSeq.sortBy(_._1)
    }
  }

  /** Reference selection: per window of W gram hashes, min value with
    * rightmost-pos tie-break, distinct — the paper's rule, independently
    * restated. */
  private def reference(tokens: Seq[String]): Seq[(Int, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = tokens.sliding(K).filter(_.length == K).toVector.map { g =>
      val d = md.digest(g.mkString(" ").getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    (0 to grams.length - W).flatMap { t =>
      val win = grams.slice(t, t + W)
      val m = win.min
      Some((t + win.lastIndexOf(m), m))
    }.distinct
  }

  test("matches an independent restatement of the winnowing rule") {
    val texts = Seq(
      "a b c d e f g h i j k l m n o p",
      "the quick brown fox jumps over the lazy dog again and again and again",
      "x y z w x y z w x y z w x y z w",   // heavy repetition → ties
      "seven tokens exactly here for one window")
    val fps = fingerprints(texts)
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.trim.split("\\s+").toSeq
      assert(fps.getOrElse(i.toLong, Nil) == reference(toks), s"doc $i")
    }
  }

  test("guarantee: a shared run of K+W-1 tokens yields a shared fingerprint") {
    // two documents, different everywhere except a 7-token copied passage
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val a = s"one two three four five $shared six seven eight nine ten"
    val b = s"red orange yellow green blue $shared indigo violet pink black white"
    val fps = fingerprints(Seq(a, b))
    val ha = fps(0L).map(_._2).toSet
    val hb = fps(1L).map(_._2).toSet
    assert((ha & hb).nonEmpty, "copied passage must surface a common fingerprint")
  }

  test("short docs are empty, null input is NULL, selection density is sane") {
    val df = Seq(
      (0L, Some("one two three four five six")),        // 6 tokens < K+W-1
      (1L, None: Option[String]),
      (2L, Some(((1 to 100).map(i => s"tok$i")).mkString(" ")))
    ).toDF("doc_id", "text")
      .select(col("doc_id"),
        WinnowFingerprint(split(trim(col("text")), "\\s+")).as("fp"))
      .collect()
    assert(df.find(_.getLong(0) == 0L).get.getSeq[Any](1).isEmpty)
    assert(df.find(_.getLong(0) == 1L).get.isNullAt(1))
    val n = df.find(_.getLong(0) == 2L).get.getSeq[Any](1).length
    // 97 grams, 94 windows, expected density 2/(W+1)=0.4 → tolerant band
    assert(n >= 10 && n <= 94, s"selected $n of 94 windows")
  }

  test("SQL surface via GraftExtensions") {
    val toks = (1 to 12).map(i => s"t$i").mkString(" ")
    val r = spark.sql(
      s"SELECT winnow_fingerprint(split('$toks', ' ')) AS fp")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    val direct = Seq((1 to 12).map(i => s"t$i")).toDF("t")
      .select(WinnowFingerprint(col("t"))).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    assert(r == direct && r.nonEmpty)
  }

  test("participates in whole-stage codegen") {
    val df = spark.range(30)
      .select(split(concat_ws(" ", lit("a b c"), col("id"), lit("d e f g")), " ").as("t"))
      .select(WinnowFingerprint(col("t")).as("fp"))
    assert(df.collect().forall(!_.isNullAt(0)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
