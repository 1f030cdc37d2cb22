package graft.tools

/** Dev-only: planning-vs-execution split per registry query, measured
  * within one JVM (robust to cross-run machine drift). */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE", "sql_tpch_q2")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val spec = graft.Registry.byName(n)
      val fn = spec.bench.getOrElse(spec.run)
      try fn(spark, dir).count() catch { case e: Throwable => System.err.println(s"WARM FAIL $n: $e") }
      (1 to 2).foreach { i =>
        System.gc()
        val t0 = System.nanoTime()
        val df = fn(spark, dir)          // query-closure work (fixtures etc.)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan   // analysis+optimization+physical planning
        val t2 = System.nanoTime()
        df.count()                       // execution (incl. AQE re-planning)
        val t3 = System.nanoTime()
        System.err.println(f"SPLIT $n pass$i closure=${(t1 - t0) / 1e9}%6.3f " +
          f"plan=${(t2 - t1) / 1e9}%6.3f exec=${(t3 - t2) / 1e9}%6.3f total=${(t3 - t0) / 1e9}%6.3f")
      }
    }
    spark.stop()
  }
}
