package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The skew-join demonstration's claim is about the EXECUTED plan, not
  * the rows (the oracle proves those): under the tuned thresholds, AQE
  * must actually have split the hot partition — otherwise the query
  * demonstrates nothing and the hot reducer is back at 100 TB.
  */
class SkewJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("AQE splits the hot partition (isSkew marks in the executed plan)") {
    val (df, plan) = RelationalQueries.skewAqeRun(spark, dir)
    assert(plan.contains("skew=true") || plan.contains("isSkew"),
      s"no skew-split in the executed plan — thresholds no longer trigger:\n$plan")
    // half of lineitem funnels onto key 0 → bucket 0 must dominate
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(0L) > rows.filter(_._1 != 0L).values.max * 3,
      s"fixture lost its skew: $rows")
  }

  test("the child session's aggressive confs do not leak into the parent session") {
    // pin the parent's PRE-test values and assert them unchanged after
    // the run — comparing against a literal the child never sets (the
    // child's advisory is the computed input-scaled byte string) would
    // make the assertion vacuous
    val beforeBhj = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val beforeAdv = spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    RelationalQueries.skewAqeRun(spark, dir)
    assert(spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold") == beforeBhj
      && spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1",
      "broadcast threshold leaked — every dimension join would go SMJ")
    assert(spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes") == beforeAdv,
      "advisory partition size leaked — every shuffle would fragment")
    val childAdv = RelationalQueries.skewAdvisoryBytes(dir).toString
    assert(spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB") != childAdv,
      s"advisory partition size leaked the child's computed value $childAdv")
  }
}
