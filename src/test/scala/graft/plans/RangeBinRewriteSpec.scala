package graft.plans

import graft.{Registry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The automatic range-join rewrite must (a) fire on the naive pattern
  * and eliminate the nested-loop plan, (b) be result-identical to both
  * the un-rewritten execution and the hand-binned twin, and (c) leave
  * every non-matching shape — extra conjuncts, variable upper bounds —
  * exactly alone. Null handling gets its own case: rows with a null
  * interval start or null probe value must vanish identically on both
  * paths.
  */
class RangeBinRewriteSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("naive constant-width range join plans with no nested-loop node") {
    val df = Registry.byName("join_range_auto").run(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"RangeBinRewrite did not fire:\n$plan")
    assert(plan.contains("graft_bin"), s"no bin columns in plan:\n$plan")
  }

  test("rewritten result equals the hand-binned twin") {
    val auto = Registry.byName("join_range_auto").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val manual = Registry.byName("join_range_binned").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(auto.nonEmpty)
    assert(auto == manual)
  }

  test("null interval starts and null probe values drop on both paths") {
    import spark.implicits._
    val w = Seq((1L, Some(100L)), (2L, None), (3L, Some(220L)))
      .toDF("w_id", "lo")
      .select(col("w_id"), col("lo").cast("long").as("lo"))
    val e = Seq((10L, Some(105L)), (11L, None), (12L, Some(230L)), (13L, Some(299L)), (14L, Some(320L)))
      .toDF("e_id", "x")
      .select(col("e_id"), col("x").cast("long").as("x"))
    val joined = w.join(e, col("x") >= col("lo") && col("x") < col("lo") + lit(100L))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"rewrite missed the tiny case:\n$plan")
    val rows = joined.select("w_id", "e_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // nulls gone; 105 ∈ [100,200), 230 & 299 ∈ [220,320), 320 excluded
    assert(rows == Set((1L, 10L), (3L, 12L), (3L, 13L)))
  }

  test("negative interval starts spanning bucket zero stay exact") {
    import spark.implicits._
    // truncating division behaves differently around zero — the bucket
    // range [trunc(lo/C), trunc((lo+C-1)/C)] must still cover every x
    val w = Seq((1L, -150L), (2L, -100L), (3L, -50L), (4L, 0L)).toDF("w_id", "lo")
    val e = (-160L to 110L by 10).map(x => (x, x)).toDF("e_id", "x")
    val joined = w.join(e, col("x") >= col("lo") && col("x") < col("lo") + lit(100L))
    val got = joined.select("w_id", "e_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (wid, lo) <- Seq((1L, -150L), (2L, -100L), (3L, -50L), (4L, 0L))
      x <- -160L to 110L by 10 if x >= lo && x < lo + 100L
    } yield (wid, x)).toSet
    assert(got == want)
  }

  test("interval starts near Long.MaxValue keep the user's overflow semantics") {
    import spark.implicits._
    // lo + (C-1) overflows. Under Spark 4's default ANSI mode the USER'S
    // own predicate (lo + C) throws ARITHMETIC_OVERFLOW — the rewrite
    // must surface the same error, not mask or alter it. With ANSI off,
    // the wrap makes the predicate vacuously false — the rewrite must
    // return the same rows in constant work (an unclamped Sequence stop
    // would default to step -1 and fabricate a billions-long bucket
    // list; the Greatest clamp caps it at one bucket).
    val w = Seq((1L, Long.MaxValue - 10L), (2L, 100L)).toDF("w_id", "lo")
    val e = Seq((10L, 105L), (11L, Long.MaxValue - 5L)).toDF("e_id", "x")
    def joined = w.join(e, col("x") >= col("lo") && col("x") < col("lo") + lit(100L))
    val err = intercept[Exception] { joined.select("w_id", "e_id").collect() }
    assert(err.getMessage.contains("ARITHMETIC_OVERFLOW"), err.getMessage)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val rows = joined.select("w_id", "e_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // w=2 catches x=105; w=1's bound wraps negative, nothing qualifies
      assert(rows == Set((2L, 10L)))
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("shapes outside the contract are left alone") {
    import spark.implicits._
    val w = Seq((1L, 100L, 180L)).toDF("w_id", "lo", "hi")
    val e = Seq((10L, 105L)).toDF("e_id", "x")
    // variable upper bound — no constant width, must NOT rewrite
    val varWidth = w.join(e, col("x") >= col("lo") && col("x") < col("hi"))
    varWidth.collect()
    assert(varWidth.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    // extra equi conjunct — join_range's shape, must NOT rewrite (the
    // equi key already hash-partitions it; binning would be pure loss)
    val w2 = Seq((1L, 7L, 100L)).toDF("w_id", "k", "lo")
    val e2 = Seq((10L, 7L, 105L)).toDF("e_id", "k2", "x")
    val equi = w2.join(e2, col("k") === col("k2") &&
      col("x") >= col("lo") && col("x") < col("lo") + lit(100L))
    equi.collect()
    val p = equi.queryExecution.executedPlan.toString
    assert(!p.contains("graft_bin"), s"rewrite fired despite equi key:\n$p")
  }
}
