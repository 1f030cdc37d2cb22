package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale property for the rarest-gram blocking scheme behind
  * `dedup_ngram_jaccard`: the pair volume the blocking self-join
  * materializes (Σ|block|²) must stay FAR below the n² all-pairs space,
  * and no single block may exceed the hard cap — prefix blocking on
  * natural text fails both (stopword prefixes collect a constant
  * fraction of the corpus, making the hot block quadratic at 100 TB).
  */
class NgramBlockingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("rarest-gram sub-blocks bound pair volume without dropping docs") {
    val sets = DedupQueries.bigramSets(spark, dir)
    val blocks = DedupQueries.ngramBlocks(sets)
    val n = sets.count()
    // sub-blocking must not drop anyone: one block row per doc with grams
    assert(blocks.count() == n, "docs lost their blocking key")
    val sizes = blocks.groupBy("blk", "sub").count()
    val maxBlock = sizes.agg(max("count")).collect()(0).getLong(0)
    // hash split is uneven, so allow 2× headroom over the 64 target
    assert(maxBlock <= 128, s"sub-block of $maxBlock docs — split not effective")
    val pairVolume = sizes
      .agg(sum(col("count") * col("count"))).collect()(0).getLong(0)
    assert(pairVolume <= 128L * n,
      s"pair volume $pairVolume exceeds 128·n=${128L * n} (n=$n)")
  }
}
