package graft.operators

import graft.{Registry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The binning rewrite is only worth having if (a) it is EXACTLY the
  * naive pure-range join, and (b) the naive formulation really is the
  * nested-loop disaster the rewrite exists to avoid. Both are asserted
  * here: result equality window-for-window, and the plan-shape contrast
  * (naive → BroadcastNestedLoopJoin, binned → hash join on bucket).
  */
class BinnedRangeJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def sides = {
    val e = Tables(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("e_us"), col("event_type"))
    val w = e.filter(col("event_type") === "error" && col("event_id") % 97 === 0)
      .select(col("event_id").as("w_id"), col("e_us").as("ws_us"),
        (col("e_us") + lit(1800000000L)).as("we_us"))
    (e, w)
  }

  test("binned interval join equals the naive pure-range join") {
    val (e, w) = sides
    val naive = w.join(e, col("e_us") >= col("ws_us") && col("e_us") < col("we_us"))
      .groupBy("w_id").agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val binned = Registry.byName("join_range_binned").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(naive.nonEmpty, "no incident windows in fixture — gate too selective")
    assert(binned == naive)
  }

  test("naive plans nested-loop; the binned rewrite plans a hash join on bucket") {
    val (e, w) = sides
    val naive = w.join(e, col("e_us") >= col("ws_us") && col("e_us") < col("we_us"))
    naive.collect()
    assert(naive.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "naive twin no longer nested-loop — the demonstration premise changed")
    val binned = Registry.byName("join_range_binned").run(spark, dir)
    binned.collect()
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binned rewrite still quadratic:\n$plan")
    assert(plan.contains("bucket"), s"no bucket join key in plan:\n$plan")
  }
}
