package graft.operators

import graft.{Registry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property gates for the round-7 curation additions (the oracle proves
  * hash-exactness; these prove the operators do their JOB): CCNet-style
  * keep-first line dedup and the in-engine Naive Bayes classifier.
  */
class Round7CurationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def segs = Tables(spark, dir, "documents")
    .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    .select(col("doc_id"), posexplode(expr(
      "transform(sequence(0, cast(ceil(size(t)/8.0) as int)-1), " +
        "i -> concat_ws(' ', slice(t, i*8+1, 8)))")))
    .withColumnRenamed("pos", "idx").withColumnRenamed("col", "seg")

  test("dedup_lines keeps each distinct segment exactly once, corpus-wide") {
    val out = Registry.byName("dedup_lines").run(spark, dir)
    val Array(tot) = out.agg(sum("n_kept"), sum("n_segs")).collect()
    val distinctSegs = segs.select("seg").distinct().count()
    val allSegs = segs.count()
    assert(tot.getLong(0) == distinctSegs,
      s"kept ${tot.getLong(0)} != distinct segments $distinctSegs")
    assert(tot.getLong(1) == allSegs)
    // the corpus genuinely carries duplicated segments, else keep-first
    // is vacuous at this SF
    assert(distinctSegs < allSegs, "corpus has no duplicate segments")
  }

  test("dedup_lines keep decision is first-occurrence in (doc_id, idx) order") {
    // recompute winners independently (window formulation, vs the
    // query's min-struct aggregation) and compare per-doc kept counts
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("seg").orderBy("doc_id", "idx")
    val expected = segs
      .withColumn("rn", row_number().over(w))
      .groupBy("doc_id")
      .agg(sum(when(col("rn") === 1, 1L).otherwise(0L)).as("exp_kept"))
    val out = Registry.byName("dedup_lines").run(spark, dir)
    val bad = out.join(expected, "doc_id")
      .filter(col("n_kept") =!= col("exp_kept"))
    assert(bad.isEmpty, s"keep-first mismatch: ${bad.take(3).mkString(", ")}")
  }

  test("nb model is a proper smoothed distribution per class") {
    val model = Registry.byName("text_nb_train").run(spark, dir).collect()
    val vocab = model.map(_.getString(1)).distinct.length
    // floor term: recompute ln(1/(tot_c+V)) from the model's own counts
    model.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val tot = rows.map(_.getLong(2)).sum
      val floor = math.log(1.0 / (tot + vocab))
      val presentMass = rows.map(r => math.exp(r.getDouble(3))).sum
      val absentMass = (vocab - rows.length) * math.exp(floor)
      val total = presentMass + absentMass
      assert(math.abs(total - 1.0) < 1e-4,
        s"$lang smoothed mass $total not ~1 (present ${rows.length}/$vocab)")
    }
  }

  test("nb apply emits one prediction per doc and beats the prior-only baseline") {
    val out = Registry.byName("text_nb_apply").run(spark, dir)
    val n = Tables(spark, dir, "documents").count()
    assert(out.count() == n)
    assert(out.select("doc_id").distinct().count() == n)
    val correct = out.filter(col("correct")).count()
    val majority = Tables(spark, dir, "documents")
      .groupBy("lang").count().agg(max("count")).collect()(0).getLong(0)
    assert(correct > majority,
      s"NB accuracy $correct/$n does not beat prior-only $majority/$n")
    // multinomial log-scores are strictly negative
    assert(out.filter(col("score") >= 0).isEmpty)
  }
}
