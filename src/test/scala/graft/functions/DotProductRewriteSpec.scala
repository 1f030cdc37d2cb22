package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DotProductRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("HOF aggregate(zip_with(*), 0, +) is rewritten to native dot_product") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try {
      val df = spark.range(50)
        .select(array(col("id").cast("double"), lit(1.0)).as("a"),
          array(lit(2.0), col("id").cast("double")).as("b"))
        .select(
          aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x).as("hof"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dot_product"), optimized)
      // and the rewritten plan computes the same values
      val rows = df.collect()
      assert(rows.length == 50)
      assert(rows(3).getDouble(0) == 2.0 * 3 + 1.0 * 3)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
    }
  }

  test("non-matching folds are left alone") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try {
      // zero != 0.0 → not a dot product
      val df = spark.range(5)
        .select(array(col("id").cast("double")).as("a"), array(lit(2.0)).as("b"))
        .select(
          aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
            lit(10.0), (acc, x) => acc + x).as("v"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("dot_product"))
      assert(df.collect()(3).getDouble(0) == 10.0 + 6.0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
    }
  }
}
