package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must execute at sf0.001; the flagship must return
  * rows; declared oracles must reference only corpus tables. Exact value
  * parity is checked against DuckDB by the driver (and locally by
  * tools/check_oracle.py) — this spec guards executability + determinism. */
class QueriesSmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    val extra = SparkEntry.oracleSql.keySet.diff(qs)
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  for (q <- Registry.all) {
    test(s"query ${q.name} executes and is deterministic") {
      val df1 = q.run(spark, dir)
      val rows1 = df1.collect()
      val rows2 = q.run(spark, dir).collect()
      assert(rows1.length == rows2.length, "row count changed between runs")
      assert(
        rows1.map(_.toString).toSeq == rows2.map(_.toString).toSeq,
        s"${q.name} output is not deterministic")
    }
  }
}
