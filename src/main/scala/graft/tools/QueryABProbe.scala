package graft.tools

/** Dev-only: single-JVM alternating A/B of registry queries with the
  * DirectParquet path ON vs OFF (classic df.write + footer harvest).
  * SPARK_GRAFT_PROBE names the queries. */
object QueryABProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE", "table_delete_sql")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val spec = graft.Registry.byName(n)
      val fn = spec.bench.getOrElse(spec.run)
      def run(direct: Boolean): Double = {
        graft.plans.DirectParquet.enabled = direct
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      run(true); run(false) // warm both
      (1 to 3).foreach { i =>
        val on = run(true)
        val off = run(false)
        System.err.println(f"QAB $n pass$i direct=$on%6.3f classic=$off%6.3f")
      }
      graft.plans.DirectParquet.enabled = true
    }
    spark.stop()
  }
}
