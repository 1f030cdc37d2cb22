package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded grouped top-k as a typed Aggregator — the partial-aggregation
  * alternative to the `row_number() OVER (PARTITION BY …) <= k` window
  * (q:win_topk). A window must shuffle and SORT every row of the group;
  * this buffer keeps at most K (price, line) entries per group, so the
  * map side reduces each partition to K rows per key before the shuffle
  * and the reduce side never sorts — at 100 TB that turns a full-data
  * sort-exchange into a constant-bytes-per-key hash aggregation.
  *
  * Ordering is the exact total order the window spec declares
  * (price DESC, line ASC), so ranks — and therefore oracle hashes — are
  * identical to the window formulation's.
  */
object TopKLines extends Aggregator[(Double, Int), Seq[(Double, Int)], Seq[Int]] {
  val K = 3

  override def zero: Seq[(Double, Int)] = Vector.empty

  override def reduce(b: Seq[(Double, Int)], a: (Double, Int)): Seq[(Double, Int)] =
    insert(b, a)

  override def merge(x: Seq[(Double, Int)], y: Seq[(Double, Int)]): Seq[(Double, Int)] =
    y.foldLeft(x)(insert)

  /** Lines of the K kept entries, in rank order. */
  override def finish(b: Seq[(Double, Int)]): Seq[Int] = b.map(_._2)

  // buffer stays sorted by (price desc, line asc) and capped at K
  private def insert(b: Seq[(Double, Int)], a: (Double, Int)): Seq[(Double, Int)] = {
    if (b.size == K && !before(a, b.last)) b
    else {
      val i = b.indexWhere(p => before(a, p))
      val ins = if (i < 0) b :+ a else (b.take(i) :+ a) ++ b.drop(i)
      ins.take(K)
    }
  }

  // Spark's double sort order (nanSafeCompareDoubles): primitive == first
  // (so -0.0 ties 0.0, unlike raw Double.compare), then Double.compare
  // (so NaN ranks ABOVE +Inf in a DESC window, unlike IEEE `>`)
  private def before(a: (Double, Int), p: (Double, Int)): Boolean = {
    val c = if (a._1 == p._1) 0 else java.lang.Double.compare(a._1, p._1)
    c > 0 || (c == 0 && a._2 < p._2)
  }

  override def bufferEncoder: Encoder[Seq[(Double, Int)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder()
}
