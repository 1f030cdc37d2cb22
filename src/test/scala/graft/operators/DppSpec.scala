package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** join_dpp's load-bearing claim is the PLAN, not the rows: the
  * hive-partitioned fact scan must carry a dynamic pruning subquery in
  * its PartitionFilters (fed from the broadcast dim), so only matching
  * partitions are listed and read. Without it the query still
  * hash-matches — while silently scanning every partition. */
class DppSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("join_dpp's fact scan carries a dynamic partition pruning filter") {
    val df = Registry.byName("join_dpp").run(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning expression in the executed plan:\n$plan")
  }
}
