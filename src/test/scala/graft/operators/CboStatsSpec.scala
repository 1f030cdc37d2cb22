package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** sql_ctas' oracle proves the staged rows; this proves the ANALYZE
  * actually left cost-based-optimizer statistics behind — exact row
  * counts the planner reads instead of guessing from file sizes. Runs
  * under an isolated child session with CBO on, so the assertion covers
  * the full stats path without flipping the shared session's optimizer.
  */
class CboStatsSpec extends AnyFunSuite {
  test("ANALYZE leaves exact row-count statistics the CBO can read") {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    // dropAfter = false: the declared query reclaims its staging table
    // immediately after the verifying aggregate, so the stats inspection
    // uses the shared body with the drop deferred to this test
    val rows = RelationalQueries.ctasStage(s, TestSpark.sfDir, dropAfter = false).collect()
    assert(rows.nonEmpty)
    val tn = RelationalQueries.ctasName(TestSpark.sfDir)
    try {
      // the CTAS query's own read cached the relation BEFORE the ANALYZE
      // landed its stats in the catalog; drop that cache entry
      s.catalog.refreshTable(tn)
      val expected = s.table(tn).count()
      // read the stats through the session's own planner (EXPLAIN COST) —
      // plan.stats accessed from a test thread would consult the wrong
      // thread-local conf and silently drop rowCount
      val cost = s.sql(s"EXPLAIN COST SELECT * FROM $tn").collect()(0).getString(0)
      val rc = "rowCount=([0-9.E+]+)".r.findFirstMatchIn(cost).map(_.group(1).toDouble)
      assert(rc.contains(expected.toDouble),
        s"catalog rowCount=$expected not visible to the optimizer (got $rc):\n$cost")
    } finally s.sql(s"DROP TABLE IF EXISTS $tn"): Unit
  }
}
