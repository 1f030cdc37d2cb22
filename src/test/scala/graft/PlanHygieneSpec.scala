package graft

import org.scalatest.funsuite.AnyFunSuite

/** Enforced version of the PlanAudit checks: plan SHAPE is the scale-
  * invariant property (a quadratic join is quadratic at any SF), so
  * regressions that would melt down at 100 TB fail here at sf0.001.
  */
class PlanHygieneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  // declared exceptions: the cross-join parity query, the brute-force
  // similarity baseline (non-equi ⇒ nested-loop by construction), the
  // SQ prefilter scan (same declared shape over 4×-narrower quantized
  // codes, bounded 16-row broadcast side), and the SCALAR cross joins
  // (one broadcast row carrying a corpus-wide constant — tf-idf's doc
  // count, sketch-union's exact-distinct contract — constant-size, not
  // quadratic)
  private val allowedQuadratic =
    Set("join_cross", "topk_similarity", "topk_similarity_sq",
      // the SAME brute baseline fed from the Arrow landing zone — the
      // source swap is the point, the shape is topk_similarity's
      "topk_similarity_arrow",
      // binary-hamming prefilter: the same bounded-16-row broadcast
      // non-equi scan as the SQ prefilter, over 32×-narrower sign words
      "topk_similarity_binary", "text_tfidf",
      // the MIPS reduction: same bounded-16-row brute baseline shape as
      // topk_similarity plus a 1-row max-norm broadcast
      "topk_similarity_mips",
      // truncated-dim coarse pass over the same bounded-16-row shape
      "topk_similarity_matryoshka",
      "text_unigram_logprob", "text_bigram_logprob", "text_bm25",
      // 1-row corpus-totals broadcast (the tf-idf scalar shape)
      "text_importance_dsir",
      // the unigram-LM scorer reused under CCNet bucketing — same 1-row
      // token-total broadcast as text_unigram_logprob
      "text_perplexity_buckets",
      // the composed curation pipeline carries the same scorer
      "pipeline_curate_soft",
      "agg_sketch_union", "agg_sketch_intersect",
      "embedding_kmeans", "embedding_covariance", "graph_pagerank",
      // PCA rides the covariance kernel's declared broadcast shapes; the
      // eigen solve itself is a constant-size single-group aggregate,
      // and the projection adds one 1-row loading/mean-array broadcast
      "embedding_pca_power", "embedding_pca_project",
      // k broadcast centroids against every vector — the kmAssign shape
      // embedding_kmeans declares, reused for the SemDeDup clustering pass
      "dedup_semantic",
      // 1-row broadcast carrying a constant-size sketch to every task
      "join_bloom_prune", "text_decontaminate_bloom", "agg_countmin",
      // rank_hybrid carries the 1-row stats + query-vector broadcasts
      "rank_hybrid",
      // 1-row normalization-total broadcast (the text_tfidf scalar shape)
      "sample_mixture",
      // 1-row time-range-bounds broadcast driving the densification grid
      "win_gapfill",
      // NB model kernel: 1-row vocab-size broadcast (train + apply), and
      // apply additionally fans docs across the |classes|-row (5-row)
      // class table — constant-size sides, not quadratic
      "text_nb_train", "text_nb_apply",
      // MMR's pool builder is the same bounded-16-row-query brute scan
      // topk_similarity declares; everything after is pool²-bounded
      "rank_mmr",
      // the recall audit composes the two declared topk shapes (exact
      // baseline + IVF) — the audit join itself is 16×5 rows
      "topk_similarity_recall",
      // true IVF rides the kmAssign 8-centroid-broadcast shape
      // embedding_kmeans declares, plus a 32-row probe broadcast
      "topk_similarity_ivf2",
      // WSS audit rides the same kmAssign centroid-broadcast shape
      "embedding_kmeans_quality",
      // IVF-PQ composes the ivf2 probe shape (8-row centroid broadcast
      // crossJoin) with PQ's bounded codebook broadcasts
      "topk_similarity_ivfpq",
      // HT estimator: 1-row tau / exact-total broadcasts (tf-idf scalar
      // shape) over the 65-row TakeOrdered survivors
      "sample_priority_estimate",
      // jackknife: 1-row group-total / replicate-mean / ssq broadcasts
      "eval_jackknife_ci",
      // KN smoothing: 1-row N1+(··) model-normalizer broadcast
      "text_lm_kneser_ney",
      // ride the same nbPredictions relation text_nb_apply declares
      // (1-row doc-total + 5-row class broadcasts; holdout adds the
      // 1-row train-majority broadcast)
      "text_nb_confusion", "text_nb_prf", "text_nb_holdout",
      // softmax over the ≤|domains| mixture relation: 1-row exp-total
      // broadcast (the tf-idf scalar shape)
      "text_domain_mixture")

  // One broken query must not blind the audit for the other ~150
  // (VERDICT r4 #3): evaluate per query, collect failures, assert at the
  // end — an analysis error is itself reported as an offender, never as
  // an aborted suite that silently skips the remaining plans.
  private def audit(queries: Seq[QuerySpec])(check: QuerySpec => Option[String]): Seq[String] =
    queries.flatMap { q =>
      try check(q)
      catch {
        case e: Exception =>
          // null-safe message extraction: an NPE's null message (or an
          // empty one) must not re-abort the audit this helper exists to
          // keep alive
          val msg = Option(e.getMessage).flatMap(_.linesIterator.toSeq.headOption)
            .getOrElse("(no message)")
          Some(s"${q.name} FAILED TO PLAN: ${e.getClass.getSimpleName}: $msg")
      }
    }

  test("no undeclared cartesian or nested-loop joins anywhere in the surface") {
    val offenders = audit(Registry.all) { q =>
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString
      val quad = plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct")
      if (quad && !allowedQuadratic(q.name)) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"quadratic plans appeared in: $offenders")
  }

  test("geo/reader/pipeline plans contain no scalar-UDF nodes (native kernels only)") {
    // SURVEY §7.5 promotion, verified: the geo scalar chain runs as native
    // expressions, so no ScalaUDF (printed as "UDF(") may appear in any
    // geo, reader round-trip, or ingest-pipeline query plan
    val scoped = Registry.all.filter(q =>
      q.name.startsWith("geo_") || q.name.startsWith("sql_geo") ||
        q.name.startsWith("scan_") || q.name == "pipeline_ingest")
    assert(scoped.nonEmpty)
    val offenders = audit(scoped) { q =>
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("UDF(")) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"scalar UDF nodes remain in: $offenders")
  }

  test("Q18 computes the HAVING key set once and reuses its exchange") {
    // the derived key set (lineitem grouped by l_orderkey, HAVING sum>300)
    // feeds TWO consumers — the orders semi-join and the lineitem semi-
    // join. The executed plan must materialize it once: exactly one
    // shuffle of lineitem on l_orderkey, with the second consumer reading
    // a ReusedExchange. A Catalyst/AQE change that silently re-plans this
    // doubles the largest shuffle in the query at 100 TB.
    val q = Registry.all.find(_.name == "sql_tpch_q18").get
    val df = q.run(spark, dir)
    df.collect()
    // AdaptiveSparkPlan.toString appends the pre-reuse "Initial Plan"
    // section, which prints the shared subtree once per consumer — only
    // the "Final Plan" section reflects what actually executed
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("ReusedExchange"),
      "Q18 derived-key exchange is not reused — the HAVING subquery runs twice")
    val keyShuffles = "Exchange hashpartitioning\\(l_orderkey".r
      .findAllIn(plan).length
    assert(keyShuffles == 1,
      s"expected exactly one lineitem l_orderkey shuffle, saw $keyShuffles")
  }

  test("every declared query runs under whole-stage codegen") {
    // sql_ctas executes its aggregate eagerly (so the staging table can
    // be dropped inside the builder) and returns the materialized rows —
    // the codegen happened in the eager run; the returned LocalRelation
    // has no span to audit. table_metadata_agg's entire POINT is a plan
    // with no scan: the answer comes from the transaction log's zone
    // maps, so its output is a 1-row LocalRelation by design.
    val eager = Set("sql_ctas", "table_metadata_agg")
    // AQE finalizes the physical plan lazily: execute first, then read the
    // formatted explain, whose "codegen id" tags mark codegen stages
    val offenders = audit(Registry.all.filterNot(q => eager(q.name))) { q =>
      val df = q.run(spark, dir)
      df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      if (!plan.contains("codegen id")) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"no codegen span in: $offenders")
  }
}
