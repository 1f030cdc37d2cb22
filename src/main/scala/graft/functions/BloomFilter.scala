package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.ShiftRightUnsigned
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Mergeable Bloom filter for runtime join pruning (`q:join_bloom_prune`,
  * `q:text_decontaminate_bloom`) — the 100 TB alternative to broadcasting
  * a key SET: the filter is CONSTANT-SIZE (16 KiB here) regardless of how
  * many keys went in, so a selective dimension's key domain rides to every
  * fact-scan task for the cost of one small array, and fact rows that
  * cannot join are dropped BEFORE the shuffle. False positives are then
  * removed by the exact join that was going to run anyway, so the
  * composed operator stays exact — the filter only prunes, never decides.
  *
  * Split of labor keeps every hash evaluation inside Tungsten codegen:
  *  - BUILD: callers hash keys with the native `xxhash64` SQL kernel
  *    ([[BloomFilter.hashPair]]) and feed the two 64-bit hashes to
  *    [[BloomAgg]], whose state is the raw `Array[Long]` bit set; merge
  *    is elementwise OR, so map-side combine reduces each partition to
  *    one 2 KiB-word buffer before the shuffle (same partial-agg shape as
  *    [[MinHashSig]]).
  *  - PROBE: [[BloomFilter.mightContain]] recomputes the identical
  *    double-hash probe positions as a pure column composition (pmod +
  *    element_at + unsigned shift), so the membership test runs inside
  *    whole-stage codegen — no UDF, no per-row boxing.
  *
  * Probe-position math is wrap-free by construction (`pmod` before the
  * multiply keeps every intermediate ≤ 5·NumBits), so it is safe under
  * ANSI arithmetic and bit-identical between the JVM build side and the
  * SQL probe side.
  */
object BloomFilter {

  /** 2^17 bits = 16 KiB; with k=5 probes, ~1% false positives at ~13k
    * inserted keys and still useful far beyond (prune factor degrades
    * gracefully, exactness never depends on it). */
  val NumBits = 1 << 17
  val NumWords: Int = NumBits / 64
  val K = 5

  /** The two independent 64-bit hashes of a key, computed by the NATIVE
    * xxhash64 kernel — build and probe must both come through here so the
    * probe positions agree bit-for-bit. */
  def hashPair(key: Column): (Column, Column) =
    (xxhash64(key), xxhash64(key, lit(7)))

  /** Probe position i = (h1 + i·h2) mod NumBits, computed mod-first so no
    * intermediate can overflow (JVM twin: [[BloomAgg.position]]). */
  private def position(h1: Column, h2: Column, i: Int): Column =
    pmod(pmod(h1, lit(NumBits.toLong)) + lit(i.toLong) * pmod(h2, lit(NumBits.toLong)),
      lit(NumBits.toLong))

  /** Variable-distance unsigned shift — the functions API only accepts a
    * literal distance, but the underlying catalyst expression is general. */
  private def shru(v: Column, dist: Column): Column =
    Bridge.column(ShiftRightUnsigned(Bridge.expression(v), Bridge.expression(dist)))

  /** True iff `key` MAY be in the filter (never false for inserted keys).
    * Pure column composition over the broadcast `Array[Long]` column. */
  def mightContain(bloom: Column, key: Column): Column = {
    val (h1, h2) = hashPair(key)
    (0 until K).map { i =>
      val pos = position(h1, h2, i)
      val word = element_at(bloom, (pos / 64).cast("int") + lit(1))
      shru(word, (pos % 64).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}

/** Build-side UDAF: folds (h1, h2) hash pairs into the shared bit set. */
object BloomAgg extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  import BloomFilter.{K, NumBits, NumWords}

  /** JVM twin of [[BloomFilter.position]] — same mod-first, wrap-free form. */
  private def position(h1: Long, h2: Long, i: Int): Int =
    Math.floorMod(
      Math.floorMod(h1, NumBits.toLong) + i.toLong * Math.floorMod(h2, NumBits.toLong),
      NumBits.toLong).toInt

  override def zero: Array[Long] = new Array[Long](NumWords)

  override def reduce(buf: Array[Long], h: (Long, Long)): Array[Long] = {
    var i = 0
    while (i < K) {
      val pos = position(h._1, h._2, i)
      buf(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumWords) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
