package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** scan_agg_pushdown's claim is the SCAN SHAPE: MIN/MAX/COUNT answered
  * from parquet footers with zero data pages read. The oracle proves the
  * numbers; this proves they came from metadata.
  */
class ScanPushdownSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("MIN/MAX/COUNT are pushed into the parquet scan as PushedAggregation") {
    val df = Registry.byName("scan_agg_pushdown").run(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [MIN(l_orderkey), MAX(l_orderkey), COUNT(*)]"),
      s"aggregate not pushed to the scan:\n$plan")
  }

  test("the child session's pushdown conf does not leak into the parent") {
    Registry.byName("scan_agg_pushdown").run(spark, dir).collect()
    assert(spark.conf.get("spark.sql.parquet.aggregatePushdown") == "false",
      "aggregatePushdown leaked — filtered aggregates elsewhere could silently misplan")
  }

  test("URL canonicalization really collapses crawl noise into shared canonical pages") {
    val rows = Registry.byName("text_url_dedup").run(spark, dir).collect()
    val nDocs = graft.Tables(spark, dir, "documents").count()
    assert(rows.map(_.getLong(2)).sum == nDocs, "dedup lost or duplicated documents")
    assert(rows.exists(_.getLong(2) > 1), "no URL collisions — fixture degenerate")
    rows.foreach(r => assert(!r.getString(0).exists(_.isUpper)
      && !r.getString(0).contains("utm_") && !r.getString(0).contains("#"),
      s"noise survived canonicalization: ${r.getString(0)}"))
  }
}
