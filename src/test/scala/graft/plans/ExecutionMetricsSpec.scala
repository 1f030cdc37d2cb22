package graft.plans

import graft.{Registry, Tables, TestSpark}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.scalatest.funsuite.AnyFunSuite

/** SQL-metrics observability: on a real cluster these per-operator
  * counters (rows scanned, rows output, shuffle bytes) are the ONLY way
  * to see where a 100 TB query spends itself — this spec pins that the
  * engine's plans actually populate them and that they carry truthful
  * values, using the corpus row count as ground truth.
  */
class ExecutionMetricsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case x => x }.flatMap {
      case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
      case q: QueryStageExec => q +: allNodes(q.plan)
      case o => Seq(o)
    }

  test("scan metrics report the true row count after execution") {
    val df = Registry.byName("agg_group").run(spark, dir)
    df.collect()
    val expected = Tables(spark, dir, "lineitem").count()
    val scans = allNodes(df.queryExecution.executedPlan)
      .filter(_.getClass.getSimpleName.contains("FileSourceScan"))
    assert(scans.nonEmpty, "no parquet scan in the flagship plan")
    val scanned = scans.flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
    assert(scanned == expected,
      s"scan metric reports $scanned rows, table has $expected")
  }

  test("every operator in the flagship plan exposes populated metrics") {
    val df = Registry.byName("agg_group").run(spark, dir)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
      .filterNot(n => n.getClass.getSimpleName.startsWith("InputAdapter"))
    assert(nodes.count(_.metrics.nonEmpty) >= 3,
      s"metrics surface missing: ${nodes.map(_.getClass.getSimpleName).mkString(", ")}")
  }
}
