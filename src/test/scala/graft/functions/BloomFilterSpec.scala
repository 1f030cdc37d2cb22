package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the Bloom-pruning kernel: the JVM build side and the SQL
  * probe side must agree on every probe position (a single disagreement
  * shows up as a false NEGATIVE, which breaks the pruning contract —
  * inserted keys may never test false), merge must be order-free OR, and
  * the false-positive rate has to stay near design (k=5, 2^17 bits) so
  * the prune factor is real. The end-to-end tests run the exact
  * DataFrame shape the queries use: native xxhash64 → BloomAgg across
  * forced partial-agg partitions → mightContain column composition.
  */
class BloomFilterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Bloom bit set over `keys`, built through the production path with
    * partial aggregation forced across 7 partitions. */
  private def build(keys: Seq[Long]) = {
    val (h1, h2) = BloomFilter.hashPair(col("k"))
    keys.toDF("k").repartition(7)
      .select(h1.as("h1"), h2.as("h2")).as[(Long, Long)]
      .select(BloomAgg.toColumn.name("bloom")).toDF("bloom")
  }

  test("no false negatives: every inserted key probes true (JVM build ≡ SQL probe)") {
    val keys = (1L to 5000L).map(i => i * 2654435761L + 17)
    val hits = build(keys).crossJoin(keys.toDF("k"))
      .filter(BloomFilter.mightContain(col("bloom"), col("k")))
      .count()
    assert(hits == keys.size, s"false negatives: ${keys.size - hits} of ${keys.size}")
  }

  test("false-positive rate stays near design (< 2% at 5k keys, k=5, 2^17 bits)") {
    val inserted = (1L to 5000L).map(i => i * 2654435761L + 17)
    val probes = (1L to 10000L).map(i => i * 40503L + 977777L) // disjoint domain
    assert(inserted.toSet.intersect(probes.toSet).isEmpty)
    val fp = build(inserted).crossJoin(probes.toDF("k"))
      .filter(BloomFilter.mightContain(col("bloom"), col("k")))
      .count()
    assert(fp < probes.size * 0.02, s"fp rate ${fp.toDouble / probes.size}")
  }

  test("merge is elementwise OR: split builds union to the whole") {
    val rnd = new scala.util.Random(4242)
    val hs = Vector.fill(500)((rnd.nextLong(), rnd.nextLong()))
    val (a, b) = hs.splitAt(173)
    val whole = hs.foldLeft(BloomAgg.zero)(BloomAgg.reduce)
    val merged = BloomAgg.merge(
      a.foldLeft(BloomAgg.zero)(BloomAgg.reduce),
      b.foldLeft(BloomAgg.zero)(BloomAgg.reduce))
    assert(merged.sameElements(whole))
  }
}
