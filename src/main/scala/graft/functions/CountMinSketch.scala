package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable count-min sketch (`q:agg_countmin`) — the point-frequency
  * member of the sketch family (HLL = distinct, Misra–Gries = top-k,
  * CMS = "how often did THIS key occur" for any key, after the raw data
  * is gone). State is a depth×width counter grid; merge is elementwise
  * sum, so partial aggregation reduces each partition to one grid before
  * the shuffle and per-shard sketches roll up without re-reading raw
  * data. Estimates are min-over-rows and can only OVER-count (collision
  * adds, never subtracts) — the one-sided error the accuracy contract
  * checks.
  *
  * Same split of labor as [[BloomFilter]]: callers hash keys with the
  * native `xxhash64` kernel ([[CountMinSketch.hashPair]]); the
  * Aggregator only does wrap-free floorMod row-position math, and the
  * probe side ([[CountMinSketch.estimate]]) recomputes identical
  * positions as a pure column composition over the broadcast grid.
  */
object CountMinSketch {

  /** depth 4 × width 8192 longs = 256 KiB per grid — wide enough that
    * a key colliding in ALL rows (the only way an estimate moves) is
    * vanishingly rare at our key cardinalities, small enough that
    * map-side combine stays cheap. */
  val Depth = 4
  val Width = 8192

  def hashPair(key: Column): (Column, Column) =
    (xxhash64(key), xxhash64(key, lit(13)))

  /** Row-d slot = (h1 + d·h2) mod Width, mod-first so ANSI arithmetic
    * can't overflow (JVM twin: [[CmsAgg.position]]). */
  private def position(h1: Column, h2: Column, d: Int): Column =
    pmod(pmod(h1, lit(Width.toLong)) + lit(d.toLong) * pmod(h2, lit(Width.toLong)),
      lit(Width.toLong))

  /** Point estimate for `key`: min over rows of the key's slot count. */
  def estimate(grid: Column, key: Column): Column = {
    val (h1, h2) = hashPair(key)
    (0 until Depth).map { d =>
      element_at(grid, (lit(d.toLong * Width) + position(h1, h2, d)).cast("int") + lit(1))
    }.reduce(least(_, _))
  }
}

/** Build-side UDAF: folds (h1, h2) hash pairs into the counter grid. */
object CmsAgg extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  import CountMinSketch.{Depth, Width}

  private def position(h1: Long, h2: Long, d: Int): Int =
    Math.floorMod(
      Math.floorMod(h1, Width.toLong) + d.toLong * Math.floorMod(h2, Width.toLong),
      Width.toLong).toInt

  override def zero: Array[Long] = new Array[Long](Depth * Width)

  override def reduce(buf: Array[Long], h: (Long, Long)): Array[Long] = {
    var d = 0
    while (d < Depth) {
      buf(d * Width + position(h._1, h._2, d)) += 1
      d += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
