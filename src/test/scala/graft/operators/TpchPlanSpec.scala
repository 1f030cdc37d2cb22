package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape gates for the closing TPC-H family (TpchQueries). The
  * oracle proves the ANSWERS; these prove the plans are the ones that
  * survive 100 TB — decorrelated subqueries, extracted equi-keys, and
  * top-k that never sorts the facts. Each test names the single rewrite
  * the query was added to exercise.
  */
class TpchPlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def executedPlan(name: String): String = {
    val df = Registry.byName(name).run(spark, dir)
    df.collect() // let AQE finalize before reading the plan
    df.queryExecution.executedPlan.toString
  }

  private def noQuadratic(plan: String, name: String): Unit =
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"$name planned a quadratic join:\n$plan")

  test("q2's correlated MIN becomes a grouped aggregate joined back on partkey") {
    val plan = executedPlan("sql_tpch_q2")
    assert(plan.linesIterator.exists(l => l.contains("Join") && l.contains("l_partkey")),
      s"no equi-join on the correlation key:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"no aggregate for the scalar MIN:\n$plan")
    noQuadratic(plan, "sql_tpch_q2")
  }

  test("q6's conjunctive filter reaches the parquet scan as pushed predicates") {
    val df = Registry.byName("sql_tpch_q6").run(spark, dir)
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("l_shipdate"),
      s"shipdate bound not pushed to the scan:\n$scan")
  }

  test("q19's OR-of-ANDs join still extracts the partkey equi-key (hash join, not nested loop)") {
    val plan = executedPlan("sql_tpch_q19")
    assert(plan.linesIterator.exists(l =>
      (l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
        && l.contains("p_partkey")),
      s"no hash join keyed on p_partkey:\n$plan")
    noQuadratic(plan, "sql_tpch_q19")
  }

  test("q21's EXISTS + NOT EXISTS plan as semi + anti joins on orderkey") {
    val plan = executedPlan("sql_tpch_q21")
    assert(plan.contains("LeftSemi"), s"no semi join for EXISTS:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti join for NOT EXISTS:\n$plan")
    noQuadratic(plan, "sql_tpch_q21")
  }

  test("q10's top-20 ends in TakeOrderedAndProject — facts are never globally sorted") {
    val plan = executedPlan("sql_tpch_q10")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k planned as full sort:\n$plan")
    noQuadratic(plan, "sql_tpch_q10")
  }

  test("q15's scalar MAX and q11's HAVING threshold stay one-row subqueries, never per-row") {
    Seq("sql_tpch_q15", "sql_tpch_q11").foreach { name =>
      val plan = executedPlan(name)
      assert(plan.contains("Subquery") || plan.contains("subquery"),
        s"$name: expected a scalar subquery node:\n$plan")
      noQuadratic(plan, name)
    }
  }

  test("the whole TPC-H closing family is quadratic-free and returns rows") {
    TpchQueries.specs.foreach { q =>
      val df = q.run(spark, dir)
      val n = df.count()
      assert(n > 0, s"${q.name} returned no rows at $dir")
      noQuadratic(df.queryExecution.executedPlan.toString, q.name)
    }
  }
}
