package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The k-D Hilbert kernel: the defining curve properties, proven
  * exhaustively on small grids, plus expression/codegen parity. */
class HilbertKSpec extends AnyFunSuite {

  private def walk(n: Int, bits: Int): Array[Array[Long]] = {
    // invert by brute force: index every cell, order cells by index
    val side = 1 << bits
    val cells = for {
      flat <- 0 until math.pow(side, n).toInt
    } yield {
      var rest = flat
      val c = new Array[Long](n)
      var i = 0
      while (i < n) { c(i) = rest % side; rest /= side; i += 1 }
      c
    }
    cells.sortBy(c => HilbertK.index(c, bits)).toArray
  }

  test("3-D curve is a bijection visiting every cell exactly once") {
    val side = 8 // bits = 3 → 512 cells
    val idx = for (x <- 0L until side; y <- 0L until side; z <- 0L until side)
      yield HilbertK.index(Array(x, y, z), 3)
    assert(idx.toSet == (0L until side * side * side).toSet,
      "indexes must be a permutation of [0, 512)")
  }

  test("consecutive 3-D indexes are unit steps along exactly one axis") {
    val path = walk(3, 3)
    path.sliding(2).foreach { case Array(a, b) =>
      val diffs = a.zip(b).map { case (u, v) => math.abs(u - v) }
      assert(diffs.sum == 1 && diffs.max == 1,
        s"non-adjacent consecutive cells: ${a.toSeq} -> ${b.toSeq}")
    }
  }

  test("4-D curve keeps both properties") {
    val path = walk(4, 2) // 16^... 2 bits → 4^4 = 256 cells
    assert(path.length == 256)
    path.sliding(2).foreach { case Array(a, b) =>
      val diffs = a.zip(b).map { case (u, v) => math.abs(u - v) }
      assert(diffs.sum == 1 && diffs.max == 1)
    }
  }

  test("expression output matches the kernel, interpreted and codegen'd") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, 2L, 3L), (7L, 0L, 5L), (4L, 4L, 4L)).toDF("x", "y", "z")
    val out = df.select(
      HilbertK(3, org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y"),
        org.apache.spark.sql.functions.col("z")).as("h"))
      .as[Long].collect().toSeq
    val expected = Seq(
      HilbertK.index(Array(1L, 2L, 3L), 3),
      HilbertK.index(Array(7L, 0L, 5L), 3),
      HilbertK.index(Array(4L, 4L, 4L), 3))
    assert(out == expected)
    // null coordinate → null index
    val withNull = Seq((Some(1L), None: Option[Long], Some(2L))).toDF("x", "y", "z")
      .select(HilbertK(3, org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y"),
        org.apache.spark.sql.functions.col("z")).as("h"))
    assert(withNull.collect().head.isNullAt(0))
  }
}
