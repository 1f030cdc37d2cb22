package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs — same GraftSession config as the
  * Bench/Verify entry points, smaller parallelism. */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.builder("4", "4")
    .appName("graft-test")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
}
