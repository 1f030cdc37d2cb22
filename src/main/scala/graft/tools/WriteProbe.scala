package graft.tools

/** Dev-only: FileOutputCommitter v1 vs v2 for a 64-file fixture write. */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = graft.Tables(spark, dir, "orders")
    def run(algo: Int, i: Int): Double = {
      spark.sparkContext.hadoopConfiguration.setInt(
        "mapreduce.fileoutputcommitter.algorithm.version", algo)
      val out = s"/tmp/probe_write_v${algo}_$i"
      val t0 = System.nanoTime()
      orders.repartition(64).write.mode("overwrite").parquet(out)
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 2).foreach(i => { run(1, 100 + i); run(2, 100 + i) })
    (1 to 3).foreach { i =>
      System.gc(); val a = run(1, i)
      System.gc(); val b = run(2, i)
      System.err.println(f"WRITE pass$i v1=$a%6.3f v2=$b%6.3f")
    }
    spark.stop()
  }
}
