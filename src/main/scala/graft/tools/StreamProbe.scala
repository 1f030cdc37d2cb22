package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: drain one streaming bench query and dump per-batch
  * durationMs so the drain cost decomposes (addBatch vs walCommit vs
  * stateStore commit etc.). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(cpus, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.streaming.Trigger

    (1 to 2).foreach { round =>
      System.err.println(s"--- dedup_effect round $round ---")
      val t0 = System.nanoTime()
      val events = graft.streaming.EventStreams.readEvents(spark, dir)
      val deduped = graft.streaming.EventStreams.dedupedEvents(events.union(events))
      val sink = s"probe_dedup_$round"
      val q = deduped.writeStream
        .format("memory").queryName(sink).outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("probe-ckpt").toString)
        .start()
      q.awaitTermination(120000)
      val t1 = System.nanoTime()
      spark.table(sink).groupBy("event_type").agg(count(lit(1))).collect()
      val t2 = System.nanoTime()
      System.err.println(f"drain ${(t1 - t0) / 1e9}%.3f s, post-agg ${(t2 - t1) / 1e9}%.3f s")
      q.recentProgress.foreach { p =>
        System.err.println(s"batch ${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
        p.stateOperators.foreach(so => System.err.println(
          s"  stateOp commitTime=${so.commitTimeMs} rowsTotal=${so.numRowsTotal} " +
          s"memoryUsedBytes=${so.memoryUsedBytes}"))
      }
    }
    spark.stop()
  }
}
