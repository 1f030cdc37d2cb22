package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** sql_join_hints' oracle proves both branches agree on the rows; this
  * proves the hints actually steered the planner — one SortMergeJoin
  * branch, one BroadcastHashJoin branch, in the same executed plan.
  */
class JoinHintSpec extends AnyFunSuite {
  test("SHUFFLE_MERGE and BROADCAST hints each produce their strategy") {
    val df = Registry.byName("sql_join_hints").run(TestSpark.spark, TestSpark.sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"SHUFFLE_MERGE hint ignored:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"BROADCAST hint ignored:\n$plan")
  }
}
