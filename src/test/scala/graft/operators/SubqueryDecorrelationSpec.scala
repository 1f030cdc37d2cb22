package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The subquery-family queries exist to prove the decorrelation CLAIMS,
  * not just the answers: a correlated subquery that silently re-planned
  * to per-outer-row execution would still return correct rows at sf0.001
  * and then melt down at 100 TB. Each assertion here pins the plan shape
  * that makes the operator scale — the same property PlanHygieneSpec
  * enforces registry-wide, sharpened to the specific rewrite each query
  * was added to exercise.
  */
class SubqueryDecorrelationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def executedPlan(name: String): String = {
    val df = Registry.byName(name).run(spark, dir)
    df.collect() // let AQE finalize before reading the plan
    df.queryExecution.executedPlan.toString
  }

  test("correlated EXISTS decorrelates to a semi join carrying the cross-table predicate") {
    val plan = executedPlan("sql_exists_corr")
    assert(plan.contains("LeftSemi"), s"no semi join:\n$plan")
    // the correlated l_shipdate > o_orderdate comparison must ride the
    // join itself, not a post-join filter over an exploded intermediate
    assert(plan.linesIterator.exists(l =>
      l.contains("LeftSemi") && l.contains("l_shipdate") && l.contains("o_orderdate")),
      s"correlated predicate not on the semi join:\n$plan")
  }

  test("NOT EXISTS + scalar threshold plans as anti join + one-row subqueries") {
    val plan = executedPlan("sql_notexists_scalar")
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("correlated scalar subquery becomes one grouped aggregate joined on the correlation key") {
    val plan = executedPlan("sql_scalar_corr")
    // the rewrite's signature: a join keyed on l_partkey (never a
    // nested-loop re-evaluation), fed by a grouped aggregate
    assert(plan.linesIterator.exists(l =>
      l.contains("Join") && l.contains("l_partkey")),
      s"no equi-join on the correlation key:\n$plan")
    assert(plan.contains("HashAggregate"), s"no aggregate for the scalar:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("LATERAL ORDER BY+LIMIT decorrelates to a rank window with group-limit pushdown") {
    val plan = executedPlan("join_lateral")
    assert(plan.contains("WindowGroupLimit"),
      s"per-group limit not pushed below the window sort:\n$plan")
    assert(plan.contains("row_number"), s"no rank window:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("recursive CTE spine joins the rollup once, broadcast, with zero-filled tail months") {
    val q = Registry.byName("sql_recursive_cte")
    val df = q.run(spark, dir)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the data pass is one aggregate + one join against the 84-row spine
    assert(rows.length == 84)
    assert(plan.contains("HashAggregate"))
    // gap-fill property: the corpus ends 2001-08, the spine runs to
    // 2001-12 — the recursion must surface months the data cannot
    val tail = rows.takeRight(4)
    assert(tail.forall(r => r.getLong(1) == 0L && r.getDouble(2) == 0.0),
      s"tail months not zero-filled: ${tail.mkString(", ")}")
  }
}
