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

  test("a non-identity finish lambda blocks the rewrite") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try {
      val df = spark.range(5)
        .select(array(col("id").cast("double")).as("a"), array(lit(2.0)).as("b"))
        .select(
          aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x, acc => acc / 10.0).as("v"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("dot_product"))
      assert(df.collect()(3).getDouble(0) == (3.0 * 2.0) / 10.0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
    }
  }

  test("a variable captured from an enclosing lambda blocks the rewrite") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try {
      // inner multiply uses outer `t`, not zip_with's own second variable:
      // sum(a_i * t) per t — NOT a dot product of a and b
      val df = spark.range(5)
        .select(array(col("id").cast("double"), lit(1.0)).as("a"),
          array(lit(2.0), lit(3.0)).as("b"))
        .select(transform(col("b"), t =>
          aggregate(zip_with(col("a"), col("b"), (x, _) => x * t),
            lit(0.0), (acc, v) => acc + v)).as("sums"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("dot_product"))
      val row = df.collect()(4).getSeq[Double](0)
      // a = [4,1]; per t in b=[2,3]: (4+1)*t
      assert(row == Seq(10.0, 15.0))
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
