package graft.operators

import graft.{Registry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property gates for the round-6 curation additions (the oracle proves
  * hash-exactness; these prove the operators do their JOB).
  */
class Round6CurationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("perplexity buckets are balanced within each language and ordered by score") {
    val rows = Registry.byName("text_perplexity_buckets").run(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byLang = rows.groupBy(_._1)
    byLang.foreach { case (lang, bs) =>
      assert(bs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L),
        s"$lang missing buckets: ${bs.toSeq}")
      // NTILE balance: bucket sizes differ by at most one
      val sizes = bs.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang unbalanced: ${bs.toSeq}")
      // the head third must genuinely outscore the tail third
      val byBucket = bs.map(b => b._2 -> b._4).toMap
      assert(byBucket(1L) > byBucket(3L),
        s"$lang head ${byBucket(1L)} not above tail ${byBucket(3L)}")
      assert(byBucket(1L) >= byBucket(2L) && byBucket(2L) >= byBucket(3L),
        s"$lang bucket means not monotone: $byBucket")
    }
  }

  test("chunking emits exactly min(32, n - 24k) tokens for chunk k of every doc") {
    val chunks = Registry.byName("text_chunking").run(spark, dir)
    val nTok = Tables(spark, dir, "documents")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
    val bad = chunks.join(nTok, "doc_id")
      .withColumn("expected", least(lit(32L), col("n") - col("chunk_idx") * 24))
      .filter(col("n_tokens") =!= col("expected"))
    assert(bad.isEmpty, s"wrong chunk sizes: ${bad.take(3).mkString(", ")}")
    // chunk count per doc matches floor((n-1)/24)+1 — no token unreachable
    val counts = chunks.groupBy("doc_id").agg(count(lit(1)).as("c"))
      .join(nTok, "doc_id")
      .filter(col("c") =!= floor((col("n") - 1) / 24) + 1)
    assert(counts.isEmpty, s"wrong chunk counts: ${counts.take(3).mkString(", ")}")
  }

  test("soft-dedup weights down-weight exact-duplicate families") {
    val w = Registry.byName("dedup_soft_weights").run(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    // weight = 1/mean_df with mean_df >= 1 (every shingle occurs in its
    // own doc) -> weights always in (0, 1]
    w.values.foreach { case (meanDf, weight) =>
      assert(meanDf >= 1.0 && weight > 0.0 && weight <= 1.0, (meanDf, weight))
    }
    // the corpus carries NEAR-dup families (no byte-identical copies):
    // members of verified MinHash pairs (jaccard >= 0.2, so >= a fifth
    // of their shingles are shared) must sit measurably above the
    // non-member average commonness — that separation IS the signal the
    // reweighting exploits
    val pairDocs = Registry.byName("dedup_minhash").run(spark, dir)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(pairDocs.nonEmpty, "fixture has no near-dup pairs")
    def avgOf(ids: Iterable[Long]) = {
      val dfs = ids.map(w(_)._1)
      dfs.sum / dfs.size
    }
    val dupAvg = avgOf(pairDocs)
    val restAvg = avgOf(w.keySet -- pairDocs)
    assert(dupAvg > restAvg * 1.2,
      s"near-dup docs not above the rest: dup=$dupAvg rest=$restAvg")
  }

  test("soft-dedup resampling keeps ~sum(weights) docs, hash-deterministically") {
    val rows = Registry.byName("dedup_soft_resample").run(spark, dir)
      .collect().map(r => (r.getDouble(1), r.getBoolean(2)))
    val expected = rows.map(_._1).sum
    val kept = rows.count(_._2)
    // a deterministic uniform draw under each weight concentrates the
    // survivor count on sum(weights); 25% slack covers the fixture size
    assert(math.abs(kept - expected) <= math.max(10.0, expected * 0.25),
      s"kept=$kept far from sum(weights)=$expected")
    // determinism: a second run keeps the identical set
    val again = Registry.byName("dedup_soft_resample").run(spark, dir)
      .collect().map(r => (r.getDouble(1), r.getBoolean(2)))
    assert(rows.toSeq == again.toSeq, "resampling decisions not reproducible")
  }
}
