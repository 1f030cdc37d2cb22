package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runtime scaling audit for the corpus-superlinear-risk operators
  * (dedup / similarity / text / graph): synthesizes an m× corpus that
  * models MORE INDEPENDENT DATA — not bigger duplicate families — then
  * times each query at 1× and m× and reports the ratio. A blocked /
  * bucketed operator should scale ~linearly in corpus size (ratio ≈ m,
  * minus fixed overhead); a ratio trending toward m² means a blocking
  * scheme silently degenerated and would not survive 100 TB.
  *
  * Corpus construction (deterministic, no RNG):
  * - `documents`: m copies, `doc_id` offset by copy stride; every TOKEN
  *   (maximal \S+ run, whitespace preserved byte-for-byte) suffixed with
  *   the copy index so copy i and copy j share zero grams — within-copy
  *   text structure, df distributions, and dup families are preserved
  *   exactly, but cross-copy near-dup pairs cannot exist, which is what
  *   sampling m× more real documents looks like to a dedup pipeline. A
  *   plain text copy would instead multiply every dup-family size by m
  *   and the PAIR OUTPUT ITSELF would grow m² — measuring that would
  *   confound output growth with algorithmic growth. `n_chars` is
  *   recomputed from the suffixed text so the table stays internally
  *   consistent for the text_* queries.
  * - `embeddings`: m copies with `vec_id` offset, vectors unchanged —
  *   same cluster/bucket geometry at m× the density, which is how more
  *   data from the same distribution lands in IVF/LSH structures.
  * - `orders`/`lineitem`: m copies with the shared `*_orderkey` FK
  *   offset, every other key untouched — m× more orders against the
  *   SAME customer/part/supplier dimensions (which ride along unscaled),
  *   the shape of a growing transactional corpus. Exercises the
  *   join/TPC-H tier: broadcast choices, shuffle sizing, decorrelation.
  * - `events`: m copies with `event_id` offset and timestamps shifted
  *   into disjoint whole-day epochs — m× more history from the same
  *   user base, so windows/sessions replicate rather than stack.
  *
  * Both sides of every ratio read SPARK-WRITTEN parquet: the 1× corpus
  * is rewritten through the same writer as the m× one, so t1 and tm see
  * identical file layout / row-group parallelism and the ratio isolates
  * query cost (the driver-generated originals are single-row-group files
  * that scan as one task — timing those against a 32-file scaled dir
  * would bias every ratio low and mask degeneration).
  *
  * Run: `sbt "runMain graft.ScaleStress [baseSfDir] [multiplier] [prefixCsv]"`.
  * Dev tool like PlanAudit — not part of the driver contract. The scaled
  * dir carries the FULL corpus (scaled facts + unscaled dims), so any
  * query family can be audited by prefix; a query that fails reports -1.
  */
object ScaleStress {

  /** Queries whose cost could go superlinear in corpus size — the
    * dedup/similarity tier (pair-explosion risk) PLUS the relational
    * join/TPC-H/window tier (join-strategy and shuffle-degeneration
    * risk: a plan that silently flips from broadcast to a skewed SMJ,
    * or a window whose per-key state grows faster than its input, shows
    * up here as a ratio ≫ m). */
  private val DefaultPrefixes = Seq(
    "dedup_", "topk_similarity", "embedding_", "text_", "pipeline_curate",
    "graph_", "multimodal_phash",
    "join_", "sql_tpch_", "win_")

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(4)
    val prefixes = args.lift(2).map(_.split(",").toSeq).getOrElse(DefaultPrefixes)
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val oneDir = scaledDir(baseDir, 1)
    val mDir = scaledDir(baseDir, mult)
    writeScaled(spark, baseDir, oneDir, 1)
    writeScaled(spark, baseDir, mDir, mult)

    val queries = Registry.all.filter(q => prefixes.exists(q.name.startsWith))
    if (queries.isEmpty) { println(s"no queries match $prefixes"); spark.stop(); return }
    println(f"${"query"}%-28s ${"t1(s)"}%8s ${"tm(s)"}%8s ${"ratio"}%7s ${"rows1"}%9s ${"rowsM"}%9s")
    val rows = queries.map { q =>
      val fn = q.bench.getOrElse(q.run)
      val (t1, r1) = time(fn(spark, oneDir))
      val (tm, rm) = time(fn(spark, mDir))
      val ratio = if (t1 > 0 && tm >= 0) tm / t1 else -1.0
      println(f"${q.name}%-28s $t1%8.2f $tm%8.2f $ratio%7.2f $r1%9d $rm%9d")
      (q.name, t1, tm, ratio)
    }
    val ok = rows.filter(_._4 >= 0)
    if (ok.nonEmpty) {
      val worst = ok.maxBy(_._4)
      println(f"\nmultiplier=$mult worst ratio: ${worst._1} ×${worst._4}%.2f " +
        f"(linear=~$mult, quadratic=~${mult * mult}); " +
        f"${rows.length - ok.length} queries skipped (-1: failed or needs other tables)")
    }
    spark.stop()
  }

  /** best-of-2 wall-clock + row count (same steady-state rationale as
    * Bench); a failing query reports (-1, -1) and never aborts the audit
    * (cf. Bench's per-query isolation). */
  private def time(df: => DataFrame): (Double, Long) = {
    var rows = 0L
    try {
      val t = (1 to 2).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        rows = df.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      (t, rows)
    } catch {
      case e: Throwable =>
        System.err.println(s"SCALE FAIL: ${e.getMessage}")
        (-1.0, -1L)
    }
  }

  /** Output dir keyed on BOTH the base corpus and the multiplier so runs
    * against a different base (or regenerated testdata) never reuse a
    * stale scaled corpus. */
  private def scaledDir(baseDir: String, mult: Int): String = {
    val key = java.lang.Integer.toHexString(baseDir.hashCode)
    s"${System.getProperty("java.io.tmpdir")}/graft-scale-$key-${mult}x"
  }

  private def writeScaled(
      spark: SparkSession, baseDir: String, outDir: String, mult: Int): Unit = {
    val marker = new java.io.File(s"$outDir/_DONE")
    if (marker.exists()) return
    val docs = Tables(spark, baseDir, "documents")
    val stride = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1
    val docsM = (0 until mult).map { i =>
      // suffix every \S+ run in place — whitespace untouched, so copy 0
      // is byte-identical to the base and copies i≥1 differ ONLY in the
      // per-token suffix (no token merging/splitting artifacts)
      val text =
        if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"$$1·$i")
      docs.select(
        (col("doc_id") + lit(i * stride)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }.reduce(_.unionAll(_))
    docsM.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = Tables(spark, baseDir, "embeddings")
    val estride = emb.agg(max("vec_id")).collect()(0).getLong(0) + 1
    val embM = (0 until mult).map { i =>
      emb.select((col("vec_id") + lit(i * estride)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_.unionAll(_))
    embM.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // Relational facts: m× more ORDERS against the SAME dimension
    // tables — o_orderkey/l_orderkey offset by copy stride (the one FK
    // that binds the two facts), every other key untouched so copy i's
    // orders reference the original customers/parts/suppliers. That is
    // how a transactional corpus actually grows: the order book scales,
    // the entity dimensions don't. Dup-family semantics don't apply
    // here — plain copies are exactly right, because each copy's rows
    // carry distinct orderkeys and land in different join partitions.
    val orders = Tables(spark, baseDir, "orders")
    val ostride = orders.agg(max("o_orderkey")).collect()(0).getLong(0) + 1
    (0 until mult).map { i =>
      orders.withColumn("o_orderkey", col("o_orderkey") + lit(i * ostride))
    }.reduce(_.unionAll(_))
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    val li = Tables(spark, baseDir, "lineitem")
    (0 until mult).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * ostride))
    }.reduce(_.unionAll(_))
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    // Events: m× more HISTORY from the same user base — event_id offset
    // for uniqueness, timestamps shifted by disjoint whole-day epochs so
    // sessions/windows replicate m× instead of stacking m coincident
    // copies inside every original session (which would grow per-window
    // state m× without growing window count — a different, unrealistic
    // stress). Per-user data grows m×, so per-key window sort cost is
    // the honest m·log(m) and anything beyond that is the query's fault.
    val ev = Tables(spark, baseDir, "events")
    val Array(spanRow) = ev.agg(min("ts").as("lo"), max("ts").as("hi"))
      .select(datediff(col("hi"), col("lo")).as("d")).collect()
    val spanDays = spanRow.getInt(0) + 2
    val evStride = ev.agg(max("event_id")).collect()(0).getLong(0) + 1
    (0 until mult).map { i =>
      ev.withColumn("event_id", col("event_id") + lit(i * evStride))
        .withColumn("ts", expr(s"timestampadd(DAY, ${i * spanDays}, ts)"))
    }.reduce(_.unionAll(_))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    // Dimensions ride along UNSCALED — through the same writer, so both
    // sides of every ratio read identical file layout.
    Seq("region", "nation", "customer", "supplier", "part").foreach { tn =>
      Tables(spark, baseDir, tn)
        .write.mode("overwrite").parquet(s"$outDir/$tn.parquet")
    }
    java.nio.file.Files.write(marker.toPath, Array.emptyByteArray): Unit
  }
}
