package graft.operators

import graft.{Registry, TestSpark, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The grid join's defining law: bucketing is PHYSICAL strategy only.
  * The 9-cell probe join must return exactly the pairs the naive
  * all-pairs distance predicate returns — if the cell size ever drops
  * below the search radius, pairs silently vanish and this fails. */
class GeoGridJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("grid-bucketed join equals the all-pairs distance join") {
    val grid = Registry.byName("geo_grid_join").run(spark, dir)
      .select("s_suppkey", "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cu = Tables(spark, dir, "customer").select(
      col("c_custkey"),
      (((col("c_custkey") % 60) - 30).cast("double") + 0.5).as("clon"),
      (((col("c_custkey") % 40) - 20).cast("double") + 0.5).as("clat"))
    val su = Tables(spark, dir, "supplier").select(
      col("s_suppkey"),
      (((col("s_suppkey") * 7 % 60) - 30).cast("double") + 0.25).as("slon"),
      (((col("s_suppkey") * 13 % 40) - 20).cast("double") + 0.25).as("slat"))
    val d2 = (col("clon") - col("slon")) * (col("clon") - col("slon")) +
      (col("clat") - col("slat")) * (col("clat") - col("slat"))
    val naive = su.crossJoin(cu).filter(d2 <= 1.0)
      .select("s_suppkey", "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "degenerate fixture: no pairs within radius")
    assert(grid == naive,
      s"grid join diverged: missing=${naive.diff(grid)} extra=${grid.diff(naive)}")
  }
}
