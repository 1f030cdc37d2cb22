package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must execute at sf0.001; the flagship must return
  * rows; declared oracles must reference only corpus tables. Exact value
  * parity is checked against DuckDB by the driver (and locally by
  * tools/check_oracle.py) — this spec guards executability + determinism,
  * plus the IEEE negative-zero policy: no query may emit a bitwise -0.0
  * cell. Spark's BigDecimal-based `round` never does, but raw doubles can;
  * any negative-capable rounded oracle column carries a `+ 0.0`
  * normalization on BOTH engines (the DuckDB side is exercised by the
  * driver's hash gate — `embedding_covariance` failed round 3 on exactly
  * this, 3/2080 cells where DuckDB's ROUND kept the sign of an
  * underflowing negative). */
class QueriesSmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private val NegZeroD = java.lang.Double.doubleToRawLongBits(-0.0d)
  private val NegZeroF = java.lang.Float.floatToRawIntBits(-0.0f)

  /** Recursively true if any scalar inside `v` is bitwise IEEE -0.0. */
  private def hasNegZero(v: Any): Boolean = v match {
    case null                              => false
    case d: java.lang.Double               => java.lang.Double.doubleToRawLongBits(d) == NegZeroD
    case f: java.lang.Float                => java.lang.Float.floatToRawIntBits(f) == NegZeroF
    case r: org.apache.spark.sql.Row       => r.toSeq.exists(hasNegZero)
    case s: scala.collection.Seq[_]        => s.exists(hasNegZero)
    case m: scala.collection.Map[_, _]     => m.valuesIterator.exists(hasNegZero)
    case _                                 => false
  }

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
      val negZeroRows = rows1.filter(hasNegZero)
      assert(
        negZeroRows.isEmpty,
        s"${q.name} emits bitwise -0.0 (hash-divergence hazard vs DuckDB): " +
          negZeroRows.take(3).mkString("; "))
    }
  }
}
