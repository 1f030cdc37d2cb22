package graft.operators

import graft.{Registry, Tables, TestSpark}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** join_anti_nullaware's oracle proves the two counts; this proves the
  * 0 means what the query claims — three-valued logic killed the anti
  * join, not a degenerate fixture — and that Spark really planned the
  * null-aware variant instead of a plain anti join.
  */
class NullAwareAntiJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("the nullable NOT IN returns 0 BECAUSE a NULL exists, and the clean branch does not") {
    val row = Registry.byName("join_anti_nullaware").run(spark, dir).collect()(0)
    val (clean, nullable) = (row.getLong(0), row.getLong(1))
    // the fixture must actually inject a NULL at this SF
    val nNulls = Tables(spark, dir, "customer")
      .filter(col("c_custkey") % 10 === 7).count()
    assert(nNulls > 0, "no customer hits the NULL-injection predicate — fixture degenerate")
    assert(nullable == 0L, s"NOT IN over a NULL-bearing subquery must be empty, got $nullable")
    assert(clean > 0L, "clean anti join unexpectedly empty — the 0 above would prove nothing")
  }

  test("Spark plans the nullable branch as a null-aware anti join") {
    val df = Registry.byName("join_anti_nullaware").run(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // BroadcastHashJoinExec prints its isNullAwareAntiJoin flag as the
    // trailing boolean: "LeftAnti, BuildRight, true"
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"no null-aware anti join in the plan:\n$plan")
  }
}
