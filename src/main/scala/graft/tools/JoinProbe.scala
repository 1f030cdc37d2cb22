package graft.tools

/** Dev-only: preferSortMergeJoin true/false A/B in one JVM. */
object JoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("sql_tpch_q2", "sql_tpch_q21", "sql_tpch_q18", "join_shj",
      "dedup_prefix_join", "sql_tpch_q9")
    def run(n: String, pref: Boolean): Double = {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", pref.toString)
      val spec = graft.Registry.byName(n)
      val fn = spec.bench.getOrElse(spec.run)
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      try {
        run(n, true); run(n, false) // warm
        val rs = (1 to 2).map(_ => (run(n, true), run(n, false)))
        rs.zipWithIndex.foreach { case ((a, b), i) =>
          System.err.println(f"JOIN $n pass$i smj=$a%6.3f shj=$b%6.3f")
        }
      } catch { case e: Throwable => System.err.println(s"FAIL $n: $e") }
    }
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    spark.stop()
  }
}
