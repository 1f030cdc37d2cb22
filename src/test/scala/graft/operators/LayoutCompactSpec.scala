package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The compaction op's file-count effect (the half the SQL oracle cannot
  * see — it only proves content preservation): 32 deliberately-fragmented
  * input files must collapse to the size-targeted output count. */
class LayoutCompactSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("layout_compact collapses 32 small files to the size-targeted count") {
    val row = Registry.byName("layout_compact").run(spark, dir).collect()(0)

    def dataFiles(d: String): Array[java.io.File] =
      new java.io.File(d).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

    val small = dataFiles(ReaderQueries.fixturePath(dir, "compact_small"))
    val out = dataFiles(ReaderQueries.fixturePath(dir, "compact_out"))
    assert(small.length == 32, s"fixture should fragment to 32 files, got ${small.length}")
    // sf0.001 documents total ~100 KB << the 8 MiB target → exactly 1 file
    assert(out.length < small.length,
      s"compaction did not reduce file count: ${small.length} -> ${out.length}")
    assert(out.map(_.length).sum > 0)

    // content census survives (the oracle checks this cross-engine too;
    // here it guards the spec's own read-back path)
    val docs = graft.Tables(spark, dir, "documents")
    assert(row.getLong(0) == docs.count())
  }
}
