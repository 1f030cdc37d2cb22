package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinHashBandKeysSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The composed higher-order-function form the expression replaced —
    * kept here as the semantic pin: md5-bridge shingle hashes, 16
    * min-folds of the MinHashSig permutation family, 8 "_"-joined keys. */
  private def hofKeys = {
    import MinHashSig.{K, P}
    val sig = array((0 until K).map { i =>
      expr(s"array_min(transform(hs, h -> (h * ${2 * i + 1} + ${7919L * i}) % CAST($P AS BIGINT)))")
    }: _*)
    val keys = array((0 until K / 2).map { j =>
      concat_ws("_", col("sig")(2 * j), col("sig")(2 * j + 1))
    }: _*)
    (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("hs", expr(
        """CASE WHEN size(t) >= 3 THEN
          |  transform(sequence(0, size(t)-3),
          |    i -> CAST(conv(substring(md5(concat(t[i],' ',t[i+1],' ',t[i+2])),1,8),16,10) AS BIGINT))
          |ELSE CAST(array() AS array<bigint>) END""".stripMargin))
        .withColumn("sig", sig)
        .withColumn("hof", when(size(col("hs")) > 0, keys)
          .otherwise(array().cast("array<string>")))
  }

  test("matches the composed HOF band-key chain bit-for-bit") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "Ünïcødé tokens – survive the digest boundary ✓ bytes",
      "one two three",
      "exactly three tokens",   // < 3 shingles? no: 3 tokens = 1 shingle
      "two tokens",
      "solo",
      ""
    ).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = docs.toDF("doc_id", "text")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    val rows = hofKeys(df)
      .withColumn("native", MinHashBandKeys(col("t")))
      .select("doc_id", "hof", "native").collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc ${r.getLong(0)}")
    }
    // the >=3-token docs produce 8 keys, the rest none
    assert(rows.count(_.getSeq[String](2).length == 8) == 5)
  }

  test("null input yields NULL; <3 tokens yield an empty array") {
    val df = Seq(
      (0L, Some(Seq("a", "b"))),
      (1L, None: Option[Seq[String]])
    ).toDF("doc_id", "t")
    val rows = df.select(MinHashBandKeys(col("t")).as("k")).collect()
    assert(rows(0).getSeq[String](0).isEmpty)
    assert(rows(1).isNullAt(0))
  }

  test("SQL surface via GraftExtensions") {
    val r = spark.sql(
      "SELECT minhash_band_keys(split('a b c d e', ' ')) AS k")
      .collect()(0).getSeq[String](0)
    assert(r.length == 8)
    val direct = Seq(Seq("a", "b", "c", "d", "e")).toDF("t")
      .select(MinHashBandKeys(col("t"))).collect()(0).getSeq[String](0)
    assert(r == direct)
  }

  test("participates in whole-stage codegen") {
    val df = spark.range(50)
      .select(split(concat_ws(" ", lit("tok"), col("id"), lit("a b c d")), " ").as("t"))
      .select(MinHashBandKeys(col("t")).as("k"))
    assert(df.collect().forall(_.getSeq[String](0).length == 8))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
