package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HilbertIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference d2xy inverse walk (Wikipedia "Hilbert curve", public
    * domain) — used to prove the expression's output IS the curve. */
  private def d2xy(d: Long): (Long, Long) = {
    var x = 0L; var y = 0L; var t = d; var s = 1L
    while (s < 65536L) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  test("inverts the reference d2xy walk (bijectivity on a sample)") {
    val ds = (0L until 4096L) ++ Seq(1L << 20, (1L << 32) - 1, 123456789L)
    val pts = ds.map(d => { val (x, y) = d2xy(d); (d, x, y) })
    val rows = pts.toDF("d", "x", "y")
      .select(col("d"), HilbertIndex(col("x"), col("y")).as("h"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("consecutive curve positions are grid-adjacent (the locality law)") {
    // The property Z-order lacks: |Δx| + |Δy| == 1 for every step along
    // the curve — the reason a Hilbert-sorted file range has tight
    // extents in BOTH dimensions.
    var d = 0L
    var (px, py) = d2xy(0L)
    while (d < 8192L) {
      val (x, y) = d2xy(d + 1)
      assert(math.abs(x - px) + math.abs(y - py) == 1L,
        s"step $d -> ${d + 1} jumped from ($px,$py) to ($x,$y)")
      px = x; py = y
      d += 1
    }
  }

  test("interpreted eval matches codegen") {
    val df = spark.range(2000)
      .select((col("id") * 7919L % 65536L).as("x"),
        (col("id") * 104729L % 65536L).as("y"))
    val native = df.select(HilbertIndex(col("x"), col("y")).as("h")).collect()
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interpreted = df.collect().map { r =>
      HilbertIndex(Literal(r.getLong(0)), Literal(r.getLong(1))).eval(null)
    }
    native.map(_.getLong(0)).zip(interpreted).foreach {
      case (c, i) => assert(c == i.asInstanceOf[Long])
    }
  }

  test("SQL-text surface resolves via GraftExtensions") {
    val out = spark.sql("SELECT hilbert_index(3L, 5L) AS h").collect()
    val expected = HilbertIndex(
      org.apache.spark.sql.catalyst.expressions.Literal(3L),
      org.apache.spark.sql.catalyst.expressions.Literal(5L)).eval(null)
    assert(out.head.getLong(0) == expected.asInstanceOf[Long])
  }

  test("participates in whole-stage codegen") {
    val df = spark.range(100)
      .select(HilbertIndex(col("id"), col("id") + 1L).as("h"))
    assert(df.collect().length == 100)
    // '*' prefixes mark operators inside a WholeStageCodegen stage
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }
}
