package graft.operators

import graft.{Registry, TestSpark, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-safety laws for the sketch aggregates (SURVEY.md §2.4 scale
  * path). A mergeable sketch's defining property is that the result
  * cannot depend on how rows were split across partitions — that is
  * what makes "sketch per shard, union later" sound at 100 TB. Both
  * queries are re-run under adversarial repartitionings and must
  * reproduce their single-partition answer bit-for-bit:
  *  - approx_top_k runs in the exact regime (capacity > vocabulary ⇒
  *    Misra–Gries tracks every item with zero error, and merging
  *    exact-regime sketches stays exact), so the histogram must equal
  *    the exact groupBy count under ANY partitioning.
  *  - the HLL union estimate is a deterministic function of the SET of
  *    hashed items (register maxima), so partitioning must not move it.
  */
class SketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("approx_top_k in the exact regime equals the exact histogram under any partitioning") {
    val exact = Tables(spark, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    for (parts <- Seq(1, 7, 32)) {
      val sketched = Tables(spark, dir, "documents")
        .repartition(parts)
        .select(explode(split(trim(col("text")), "\\s+")).as("word"))
        .agg(expr("approx_top_k(word, 50, 4096)").as("tk"))
        .select(explode(col("tk")).as("x"))
        .select(col("x.item").as("word"), col("x.count").as("cnt"))
        .orderBy(col("cnt").desc, col("word")).limit(10)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(sketched == exact, s"sketch diverged from exact histogram at $parts partitions")
    }
  }

  test("HLL union estimate is invariant to partitioning and within the accuracy contract") {
    def estimate(parts: Int): Long =
      Tables(spark, dir, "lineitem")
        .repartition(parts)
        .groupBy("l_returnflag")
        .agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
        .collect().head.getLong(0)
    val estimates = Seq(1, 7, 32).map(estimate)
    assert(estimates.distinct.size == 1, s"estimate moved with partitioning: $estimates")
    val exact = Tables(spark, dir, "lineitem")
      .agg(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    val ratio = estimates.head.toDouble / exact
    assert(math.abs(ratio - 1.0) <= 0.05, s"estimate $estimates vs exact $exact outside 5%")
  }

  test("declared sketch queries return the contracted shapes") {
    val union = Registry.byName("agg_sketch_union").run(spark, dir).collect()
    assert(union.length == 1 && union.head.getDouble(0) == 1.0)
    val topk = Registry.byName("agg_approx_topk").run(spark, dir).collect()
    assert(topk.length == 10)
  }
}
