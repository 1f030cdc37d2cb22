package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Property gates for the round-5 curation additions. The oracle proves
  * both queries hash-exactly; these prove they do their JOB — a gate
  * that passes the oracle but keeps everything (or nothing) is
  * arithmetic, not curation.
  */
class CurationSignalsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("DSIR importance gate prefers the target-language slice by a wide margin") {
    val scored = Registry.byName("text_importance_dsir").run(spark, dir)
    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "lang")
    val byLang = scored.join(docs, "doc_id")
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.avg(
        org.apache.spark.sql.functions.col("keep").cast("double")).as("keep_rate"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val en = byLang("en")
    val others = (byLang - "en").values
    assert(en > 0.3, s"target slice mostly rejected: en keep rate $en")
    others.foreach(o =>
      assert(en > o * 2,
        s"gate does not discriminate: en=$en vs other=$o ($byLang)"))
  }

  test("pHash banding recovers EVERY jittered image copy (hamming=2 by construction)") {
    val pairs = Registry.byName("multimodal_phash_dedup").run(spark, dir).collect()
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val expected = docs.filter(_ % 7 == 0).map(id => (id, id + 1000000L)).toSet
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = expected -- found
    assert(missed.isEmpty,
      s"${missed.size} jittered copies not recovered (pigeonhole broken): ${missed.take(3)}")
    // every recovered jitter pair carries the exact constructed distance
    pairs.filter(r => expected((r.getLong(0), r.getLong(1))))
      .foreach(r => assert(r.getInt(2) == 2, s"jitter pair hamming ${r.getInt(2)} != 2"))
  }
}
