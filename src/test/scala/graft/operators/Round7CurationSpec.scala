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

  test("mmr picks 8 distinct ranks per query, leads with pure relevance, and diversifies") {
    val out = Registry.byName("rank_mmr").run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val topk = Registry.byName("topk_similarity").run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byQuery = out.groupBy(_._1)
    assert(byQuery.size == 16)
    byQuery.foreach { case (qid, picks) =>
      assert(picks.map(_._2).sorted.toSeq == (1 to 8), s"query $qid ranks: ${picks.toSeq}")
      assert(picks.map(_._3).distinct.length == 8, s"query $qid repeated a pick")
      // rank 1 is the pure-relevance winner — same as cosine top-1
      val top1 = topk.filter(_._1 == qid).maxBy(t => (t._3, -t._2))._2
      assert(picks.find(_._2 == 1).get._3 == top1,
        s"query $qid rank-1 pick != cosine top-1 $top1")
      // scores are non-increasing is NOT an MMR invariant (the diversity
      // penalty can dip then recover), but every score must be ≤ the
      // rank-1 score, which no later λ-blend can exceed
      val s1 = picks.find(_._2 == 1).get._4
      assert(picks.forall(_._4 <= s1), s"query $qid has a score above rank 1's")
    }
    // the point of MMR: across queries, the selected sets are more
    // diverse than plain top-8 — compare mean pairwise cosine of the
    // two selections (computed from raw embeddings)
    val e = Tables(spark, dir, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    def meanPairSim(sel: Seq[Long]): Double = {
      val ps = for (i <- sel.indices; j <- i + 1 until sel.size)
        yield cos(e(sel(i)), e(sel(j)))
      ps.sum / ps.size
    }
    val mmrSim = byQuery.toSeq.map { case (_, picks) =>
      meanPairSim(picks.sortBy(_._2).map(_._3).toSeq) }
    // plain top-8 baseline recomputed directly (topk_similarity stops at 5)
    val topSim = (0L until 16L).map { qid =>
      val top8 = e.keys.filter(_ != qid).toSeq
        .map(id => id -> cos(e(qid), e(id)))
        .sortBy { case (id, s) => (-s, id) }.take(8).map(_._1)
      meanPairSim(top8)
    }
    assert(mmrSim.sum / mmrSim.size < topSim.sum / topSim.size,
      f"MMR selections not more diverse: ${mmrSim.sum / mmrSim.size}%.4f vs ${topSim.sum / topSim.size}%.4f")
  }

  test("sample_priority plans as TakeOrdered and skews toward heavy docs") {
    val df = Registry.byName("sample_priority").run(spark, dir)
    // per-partition top-k heaps + driver merge, never a global sort
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      df.queryExecution.executedPlan.toString.linesIterator.take(5).mkString("\n"))
    val rows = df.collect()
    assert(rows.length == 64)
    // inclusion probability ∝ min(1, w/τ): the sampled mean weight must
    // exceed the corpus mean (the entire point of weighting)
    val sampledMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    val corpusMean = Tables(spark, dir, "documents")
      .agg(avg(col("n_chars") + 1)).collect()(0).getDouble(0)
    assert(sampledMean > corpusMean,
      f"weighted sample not weight-skewed: $sampledMean%.1f <= $corpusMean%.1f")
  }

  test("repetition battery: dup coverage is monotone non-increasing in n") {
    // a duplicated n-gram's two occurrences make every constituent
    // (n-1)-gram duplicated too, so the covered-position set at n-1 is a
    // superset of the one at n: dup_5 >= dup_6 >= ... >= dup_10 per doc
    // (up to the 1e-6 rounding each fraction carries independently)
    val out = Registry.byName("text_repetition_full").run(spark, dir)
    val cols = Seq("dup_5", "dup_6", "dup_7", "dup_8", "dup_9", "dup_10")
    val bad = out.filter(cols.sliding(2).map { case Seq(a, b) =>
      col(a) < col(b) - lit(1e-6)
    }.reduce(_ || _))
    assert(bad.isEmpty, s"coverage not monotone: ${bad.take(3).mkString(", ")}")
  }

  test("repetition battery: discriminates on both ladders and stays in [0,1]") {
    val out = Registry.byName("text_repetition_full").run(spark, dir).cache()
    try {
      val all = Seq("top_2", "top_3", "top_4",
        "dup_5", "dup_6", "dup_7", "dup_8", "dup_9", "dup_10")
      assert(out.filter(all.map(c => col(c) < 0 || col(c) > 1).reduce(_ || _)).isEmpty)
      // every injection-carrying doc must be caught by the dup ladder
      val injectedKept = out.filter(col("doc_id") % 3 === 0 && col("keep")).count()
      assert(injectedKept == 0, s"$injectedKept injected docs passed the gate")
      // and the clean majority must survive, else the gate is a constant
      val clean = out.filter(col("doc_id") % 3 =!= 0)
      val cleanKept = clean.filter(col("keep")).count()
      assert(cleanKept * 2 > clean.count(),
        s"gate rejects the clean majority: $cleanKept of ${clean.count()}")
    } finally out.unpersist()
  }

  test("c4 filter discriminates on every injected rule and keeps a clean majority") {
    val out = Registry.byName("text_c4_filter").run(spark, dir).cache()
    try {
      // page-level injections are fatal regardless of line quality
      assert(out.filter(col("doc_id") % 41 === 0 && col("keep")).count() == 0,
        "a lorem-ipsum doc passed")
      assert(out.filter(col("doc_id") % 43 === 0 && col("keep")).count() == 0,
        "a curly-brace doc passed")
      // the line rules genuinely drop lines (kept < lines somewhere) but
      // not everything (gate would be a constant)
      assert(out.filter(col("n_kept") < col("n_lines")).count() > 0)
      val clean = out.filter(col("doc_id") % 41 =!= 0 && col("doc_id") % 43 =!= 0)
      val kept = clean.filter(col("keep")).count()
      assert(kept * 2 > clean.count(),
        s"gate rejects the clean majority: $kept of ${clean.count()}")
      assert(kept < clean.count(), "3-sentence rule never fires on clean docs")
    } finally out.unpersist()
  }

  test("Kneser-Ney: P(.|w1) sums to exactly 1 over the vocabulary per context") {
    // independent restatement over the FULL vocab (the query only scores
    // seen bigrams; this check includes the unseen backoff mass, so it
    // validates the discount/continuation constants end-to-end)
    val bi = Tables(spark, dir, "documents")
      .select(split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12")).cache()
    try {
      val ctx = c12.groupBy("w1")
        .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1f"))
      val cont = c12.groupBy("w2").agg(count(lit(1)).as("n1b"))
      val nall = c12.count().toDouble
      val top3 = ctx.orderBy(col("c1").desc).limit(3)
      val mass = top3.crossJoin(cont) // every vocab word as candidate w2
        .join(c12, Seq("w1", "w2"), "left")
        .select(col("w1"),
          ((greatest(coalesce(col("c12"), lit(0L)) - 0.75, lit(0.0)) +
            lit(0.75) * col("n1f") * col("n1b") / nall) / col("c1")).as("p"))
        .groupBy("w1").agg(sum("p").as("mass"))
        .collect()
      assert(mass.length == 3)
      mass.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
        s"context ${r.getString(0)}: mass ${r.getDouble(1)}"))
    } finally c12.unpersist()
  }

  test("RepetitionStats reaches SQL-text callers via GraftExtensions") {
    import spark.implicits._
    val sqlRow = spark.sql(
      "SELECT repetition_stats(split('a b a b a b c', ' ')) AS r")
      .select(col("r.tot"), col("r.top2"), col("r.cov5")).collect()(0)
    val direct = Seq(Seq("a", "b", "a", "b", "a", "b", "c")).toDF("t")
      .select(graft.functions.RepetitionStats(col("t")).as("r"))
      .select(col("r.tot"), col("r.top2"), col("r.cov5")).collect()(0)
    assert(sqlRow == direct, s"SQL $sqlRow != Column API $direct")
  }

  test("RepetitionStats kernel matches an independent brute-force restatement") {
    // random token arrays with a small alphabet (forces real n-gram
    // collisions at every n), checked against a from-scratch Scala
    // groupBy formulation — no shared code with the kernel's
    // prefix-sum/hashmap loop
    val rnd = new scala.util.Random(7)
    val docsArr: Seq[Seq[String]] = (0 until 60).map { _ =>
      val m = 12 + rnd.nextInt(40)
      (0 until m).map(_ => ("tok" + rnd.nextInt(6)).take(3 + rnd.nextInt(4)))
    }
    def brute(t: Seq[String]): Seq[Long] = {
      val tot = t.map(_.length.toLong).sum
      val tops = (2 to 4).map { n =>
        val gs = t.sliding(n).toSeq
        val byG = gs.groupBy(identity).toSeq.map { case (g, occ) =>
          (occ.size.toLong, g.map(_.length).sum.toLong) }
        val best = byG.max // count, tie → longer gram
        best._1 * best._2
      }
      val covs = (5 to 10).map { n =>
        val gs = t.sliding(n).toSeq.zipWithIndex
        val dup = gs.groupBy(_._1).filter(_._2.size >= 2)
        val pos = dup.values.flatten.flatMap { case (_, s) => s until s + n }.toSet
        pos.toSeq.map(p => t(p).length.toLong).sum
      }
      tot +: (tops ++ covs)
    }
    import spark.implicits._
    val got = docsArr.toDF("t")
      .select(graft.functions.RepetitionStats(col("t")).as("r"))
      .select((Seq(col("r.tot")) ++ (2 to 4).map(n => col(s"r.top$n")) ++
        (5 to 10).map(n => col(s"r.cov$n"))): _*)
      .collect().map(_.toSeq.map(_.asInstanceOf[Long]))
    docsArr.zip(got).zipWithIndex.foreach { case ((t, g), i) =>
      assert(g == brute(t), s"doc $i: tokens=$t kernel=$g brute=${brute(t)}")
    }
  }
}
