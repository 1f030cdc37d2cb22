package graft.operators

import graft.{Registry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The parquet point-lookup sink must actually arm the machinery it
  * claims: the written footer carries a bloom filter for the key column,
  * and the read-back plan pushes the literal IN-predicate into the scan
  * (the two preconditions for row-group skipping — without them the
  * query silently degrades to a full scan and still hash-matches). */
class ParquetBloomSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("sink_parquet_bloom writes bloom filters and pushes the point filter") {
    val df = Registry.byName("sink_parquet_bloom").run(spark, dir)
    df.collect() // materialize: the sink write happens inside run

    // (a) the scan must carry the pushed IN-filter on the key
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters") &&
      "PushedFilters: \\[[^\\]]*In\\(o_orderkey".r.findFirstIn(plan).isDefined,
      s"point predicate not pushed to the parquet scan:\n$plan")

    // (b) the written footer must carry a bloom filter offset for the key
    val out = ReaderQueries.fixturePath(dir, "sink_bloom")
    val part = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .minBy(_.getName)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(part.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    try {
      val blocks = reader.getFooter.getBlocks
      assert(!blocks.isEmpty, "no row groups written")
      import scala.jdk.CollectionConverters._
      val keyChunks = blocks.asScala.map(_.getColumns.asScala
        .find(_.getPath.toDotString == "o_orderkey")
        .getOrElse(fail("o_orderkey column chunk missing")))
      assert(keyChunks.forall(_.getBloomFilterOffset >= 0),
        "bloom filter absent from the o_orderkey column chunks")
      // row groups are key-sorted, so min/max stats are disjoint — the
      // OTHER half of the skipping story (meaningful once > 1 group)
      val ranges = keyChunks.map(c => (
        c.getStatistics.genericGetMin.asInstanceOf[Long],
        c.getStatistics.genericGetMax.asInstanceOf[Long]))
      assert(ranges.sliding(2).forall(w => w.length < 2 || w(0)._2 <= w(1)._1),
        s"row-group key ranges overlap: $ranges")
    } finally reader.close()
  }
}
