package graft.tools

/** Dev-only: single-JVM alternating A/B of registry queries with an
  * internal flag ON vs OFF. SPARK_GRAFT_PROBE names the queries;
  * SPARK_GRAFT_AB picks the flag: `direct` (DirectParquet vs classic
  * df.write + footer harvest) or `overlap` (concurrent vs sequential
  * merge CDF write). */
object QueryABProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE", "table_delete_sql")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val mode = sys.env.getOrElse("SPARK_GRAFT_AB", "direct")
    val set: Boolean => Unit = mode match {
      case "overlap" => graft.plans.TxLog.overlapWrites = _
      case _ => graft.plans.DirectParquet.enabled = _
    }
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val spec = graft.Registry.byName(n)
      val fn = spec.bench.getOrElse(spec.run)
      def run(on: Boolean): Double = {
        set(on)
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      run(true); run(false) // warm both
      (1 to 3).foreach { i =>
        val on = run(true)
        val off = run(false)
        System.err.println(f"QAB $mode $n pass$i on=$on%6.3f off=$off%6.3f")
      }
      set(true)
    }
    spark.stop()
  }
}
