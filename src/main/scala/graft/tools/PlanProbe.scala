package graft.tools

/** Dev-only: print `.explain("formatted")` for named registry queries and
  * optionally time them (SPARK_GRAFT_PROBE=q1,q2; SPARK_GRAFT_PROBE_TIME=1). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup_prefix_join")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val time = sys.env.getOrElse("SPARK_GRAFT_PROBE_TIME", "0") == "1"
    val out = sys.env.get("SPARK_GRAFT_PROBE_OUT")
    val spark = graft.GraftSession.builder(cpus, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val spec = graft.Registry.byName(n)
      val fn = spec.bench.getOrElse(spec.run)
      if (time) { // warm pass first, then 2 timed
        try fn(spark, dir).count() catch { case e: Throwable => System.err.println(s"WARM FAIL $n: $e") }
        (1 to 2).foreach { i =>
          System.gc()
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          System.err.println(f"TIME $n pass$i ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        }
      }
      val plan = fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      out match {
        case Some(d) =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
          java.nio.file.Files.write(java.nio.file.Paths.get(d, s"$n.txt"),
            plan.getBytes("UTF-8"))
          System.err.println(s"PLAN $n -> $d/$n.txt")
        case None =>
          System.err.println(s"===== PLAN $n =====")
          System.err.println(plan)
      }
    }
    spark.stop()
  }
}
