package graft

import org.apache.spark.sql.SparkSession

/** The ONE place graft session config lives — Bench, Verify, and the
  * test harness all build from here, so a tuning change can never land
  * in one entry point and skew behavior between them.
  */
object GraftSession {

  /** @param cores             local[] worker threads
    * @param shufflePartitions sized to the cores, not the 200 default */
  def builder(cores: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // local small-SF files are single-row-group parquet, so scans are
      // 1 task; without this AQE also coalesces every small shuffle to 1
      // partition and runs serialize on one core. 64k floor sizes
      // post-shuffle parallelism to the SF (default 1m is tuned for
      // cluster-scale shuffles).
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      // ~96 queries × several codegen units exceed the 100-entry default
      // generated-class cache; re-running freshly-built query objects
      // would then recompile every stage (janino 50-500 ms each) — fatal
      // to bench timings, pure waste in Verify/tests.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // FileOutputCommitter v2: task outputs promote at task commit (one
      // rename) instead of being re-renamed at job commit — measured
      // ~5-10% per fixture write (single-JVM A/B, 64-file write 0.87 →
      // 0.78 s). Safe here: graft-table visibility is gated by the TxLog
      // entry (names publish atomically AFTER the write), and the
      // query-fixture writes are single-writer scratch. On an object
      // store without atomic rename this choice would be revisited with
      // a manifest committer — which the TxLog path effectively is.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // native graft functions + optimizer rules for SQL-text callers
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries INT64 TIMESTAMP(NANOS); Tables converts
      // the raw longs to micros explicitly
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
