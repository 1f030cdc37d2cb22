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
  *   suffixed with the copy index so copy i and copy j share zero grams
  *   — within-copy df distributions (and thus blocking behavior) are
  *   preserved exactly, but cross-copy near-dup pairs cannot exist,
  *   which is what sampling m× more real documents looks like to a
  *   dedup pipeline. A plain text copy would instead multiply every
  *   dup-family size by m and the PAIR OUTPUT ITSELF would grow m² —
  *   measuring that would confound output growth with algorithmic
  *   growth.
  * - `embeddings`: m copies with `vec_id` offset, vectors unchanged —
  *   same cluster/bucket geometry at m× the density, which is how more
  *   data from the same distribution lands in IVF/LSH structures.
  *
  * Run: `sbt "runMain graft.ScaleStress [baseSfDir] [multiplier] [prefixCsv]"`.
  * Dev tool like PlanAudit — not part of the driver contract.
  */
object ScaleStress {

  /** Queries whose cost could go superlinear in corpus size. */
  private val DefaultPrefixes = Seq(
    "dedup_", "topk_similarity", "embedding_", "text_tfidf", "text_bm25",
    "graph_pagerank")

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(4)
    val prefixes = args.lift(2).map(_.split(",").toSeq).getOrElse(DefaultPrefixes)
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scaledDir = s"${System.getProperty("java.io.tmpdir")}/graft-scale-${mult}x"
    writeScaled(spark, baseDir, scaledDir, mult)

    val queries = Registry.all.filter(q => prefixes.exists(q.name.startsWith))
    println(f"${"query"}%-28s ${"t1(s)"}%8s ${"tm(s)"}%8s ${"ratio"}%7s ${"rows1"}%9s ${"rowsM"}%9s")
    val rows = queries.map { q =>
      val fn = q.bench.getOrElse(q.run)
      val (t1, r1) = time(fn(spark, baseDir))
      val (tm, rm) = time(fn(spark, scaledDir))
      val ratio = tm / t1
      println(f"${q.name}%-28s $t1%8.2f $tm%8.2f $ratio%7.2f $r1%9d $rm%9d")
      (q.name, t1, tm, ratio)
    }
    val worst = rows.maxBy(_._4)
    println(f"\nmultiplier=$mult worst ratio: ${worst._1} ×${worst._4}%.2f " +
      f"(linear=~$mult, quadratic=~${mult * mult})")
    spark.stop()
  }

  /** best-of-2 wall-clock + row count (same steady-state rationale as Bench). */
  private def time(df: => DataFrame): (Double, Long) = {
    var rows = 0L
    val t = (1 to 2).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      rows = df.count()
      (System.nanoTime() - t0) / 1e9
    }.min
    (t, rows)
  }

  private def writeScaled(
      spark: SparkSession, baseDir: String, outDir: String, mult: Int): Unit = {
    val marker = new java.io.File(s"$outDir/_DONE_$mult")
    if (marker.exists()) return
    val docs = Tables(spark, baseDir, "documents")
    val stride = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1
    val docsM = (0 until mult).map { i =>
      docs.select(
        (col("doc_id") + lit(i * stride)).as("doc_id"),
        // suffix every token with the copy index (copy 0 unchanged so the
        // base corpus embeds verbatim)
        (if (i == 0) col("text")
         else array_join(
           transform(split(col("text"), "\\s+"), t => concat(t, lit(s"·$i"))),
           " ")).as("text"),
        col("lang"), col("source"),
        col("n_chars"))
    }.reduce(_.unionAll(_))
    docsM.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = Tables(spark, baseDir, "embeddings")
    val estride = emb.agg(max("vec_id")).collect()(0).getLong(0) + 1
    val embM = (0 until mult).map { i =>
      emb.select((col("vec_id") + lit(i * estride)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_.unionAll(_))
    embM.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    marker.getParentFile.mkdirs()
    java.nio.file.Files.write(marker.toPath, Array.emptyByteArray): Unit
  }
}
