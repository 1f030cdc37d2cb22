package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-definition surfaces added in round 6: a SQL-language UDF must
  * be INLINED into the plan (the whole point of preferring it over a
  * Scala UDF at 100 TB), and parameter markers must bind values
  * out-of-band of the SQL text.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("SQL UDF is inlined — no black-box UDF node survives into the plan") {
    val df = Registry.byName("sql_udf_scalar").run(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("), s"black-box UDF node in plan:\n$plan")
    // the expanded arithmetic is what executes
    assert(plan.contains("* 7") && plan.contains("/ 2"),
      s"inlined UDF body not visible in plan:\n$plan")
  }

  test("parameter markers bind out-of-band — a hostile value cannot break the statement") {
    graft.Tables(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    val hostile = "1994-01-01' OR '1'='1"
    // as a parameter the hostile string is just a (non-matching) value:
    // the statement parses, binds, and filters everything out
    val n = spark.sql(
      "SELECT COUNT(*) AS n FROM lineitem WHERE CAST(l_shipdate AS STRING) = :d",
      Map("d" -> hostile)).collect()(0).getLong(0)
    assert(n == 0L, s"hostile parameter matched $n rows")
    // the same text INTERPOLATED would change the statement's meaning
    // (or fail to parse) — the vulnerability markers exist to close
    val interpolated = spark.sql(
      s"SELECT COUNT(*) AS n FROM lineitem WHERE CAST(l_shipdate AS STRING) = '$hostile'")
      .collect()(0).getLong(0)
    assert(interpolated > 0L,
      "interpolation did not change semantics — the demonstration is inert")
  }
}
