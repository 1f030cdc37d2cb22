package graft.plans

import graft.{Registry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The whole-operator extension stack must actually engage and agree
  * with the declarative formulation: the executed plan contains
  * AsofJoinExec (the injected strategy planned the custom node), its
  * result equals the union+window join_asof twin row-for-row, and the
  * merge handles the no-build-rows and all-build-later edges. */
class AsofJoinNativeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("native as-of join plans through AsofJoinExec and matches the window twin") {
    val native = Registry.byName("join_asof_native").run(spark, dir)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom exec missing from plan:\n$plan")
    val a = native.collect().map(_.toSeq).toSeq
    val b = Registry.byName("join_asof").run(spark, dir).collect().map(_.toSeq).toSeq
    assert(a.nonEmpty)
    assert(a == b)
  }

  test("probe rows with no qualifying build row get a null asof_id") {
    import spark.implicits._
    // build rows exist only for key 1, and key 2's build row is LATER
    // than its probe — both must yield null
    val probe = Seq((1L, 100L, 10L), (1L, 5L, 11L), (2L, 50L, 20L), (3L, 9L, 30L))
      .toDF("k", "t_us", "id")
    val build = Seq((1L, 40L, 900L), (1L, 100L, 901L), (2L, 60L, 902L))
      .toDF("k", "t_us", "id")
    val out = AsofJoin(probe, build)
      .select("id", "asof_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(
      10L -> Some(901L), // inclusive: build at exactly t=100 qualifies
      11L -> None,       // probe earlier than every build row on the key
      20L -> None,       // build row exists but only later
      30L -> None))      // no build rows on the key at all
  }

  test("equal-time build ties resolve to the largest id (window-order contract)") {
    import spark.implicits._
    val probe = Seq((7L, 10L, 1L)).toDF("k", "t_us", "id")
    val build = Seq((7L, 10L, 500L), (7L, 10L, 501L), (7L, 3L, 400L))
      .toDF("k", "t_us", "id")
    val out = AsofJoin(probe, build).select("asof_id").collect()
    assert(out(0).getLong(0) == 501L)
  }

  test("non-conforming schemas are rejected") {
    import spark.implicits._
    val bad = Seq(("x", 1L, 2L)).toDF("k", "t", "id")
    val ok = Seq((1L, 1L, 2L)).toDF("k", "t", "id")
    val e = intercept[IllegalArgumentException](AsofJoin(bad, ok))
    assert(e.getMessage.contains("key: long"))
  }
}
