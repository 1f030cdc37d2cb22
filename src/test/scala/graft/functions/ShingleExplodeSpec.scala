package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native shingle Generator must agree with the composed
  * explode(transform(sequence(...))) formulation on every document — the
  * law that lets the streaming-iterator version replace the
  * array-materializing one anywhere. Plus the edge contracts: null and
  * too-short documents yield zero rows, whitespace runs collapse. */
class ShingleExplodeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def viaGenerator(texts: Seq[String]): Seq[String] = {
    texts.toDF("text").createOrReplaceTempView("shingle_spec_docs")
    spark.sql("""SELECT shingle FROM shingle_spec_docs
                 LATERAL VIEW shingle_explode(text, 3) sh AS shingle""")
      .as[String].collect().toSeq.sorted
  }

  private def viaComposition(texts: Seq[String]): Seq[String] =
    texts.toDF("text")
      .select(split(trim(col("text")), "\\s+").as("t"))
      .select(explode(when(size(col("t")) >= 3,
        expr("transform(sequence(0, size(t)-3), i -> concat(t[i],' ',t[i+1],' ',t[i+2]))"))
        .otherwise(expr("CAST(array() AS array<string>)"))).as("s"))
      .as[String].collect().toSeq.sorted

  test("generator equals the composed explode(transform(...)) form") {
    val texts = Seq(
      "a b c d e",
      "one two three",
      "  padded   with   runs  of spaces ",
      "short doc",
      "x")
    assert(viaGenerator(texts) == viaComposition(texts))
  }

  test("null and too-short documents produce no rows") {
    Seq[Option[String]](None, Some("one two"), Some(""), Some("   "))
      .toDF("text").createOrReplaceTempView("shingle_spec_edge")
    val n = spark.sql("""SELECT shingle FROM shingle_spec_edge
                         LATERAL VIEW shingle_explode(text, 3) sh AS shingle""").count()
    assert(n == 0)
  }

  test("non-literal shingle size is rejected at analysis") {
    Seq(("a b c d", 3)).toDF("text", "k").createOrReplaceTempView("shingle_spec_bad")
    val e = intercept[Exception] {
      spark.sql("""SELECT shingle FROM shingle_spec_bad
                   LATERAL VIEW shingle_explode(text, k) sh AS shingle""").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }
}
