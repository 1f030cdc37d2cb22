package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: A/B the two commit-time footer-harvest strategies in one
  * JVM — (a) driver-side bounded thread pool (round-13 shape) vs (b) a
  * Spark job (`parallelize(files).map(fileStats)`, the executor-side
  * shape a 100 TB commit needs). Alternated best-of-3 per file count so
  * machine weather cancels. */
object HarvestProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.Tables(spark, dir, "orders")

    def mkFiles(n: Int): (String, Seq[String]) = {
      val root = java.nio.file.Files.createTempDirectory("harvest").toString
      base.repartition(n).write.mode("overwrite").parquet(s"$root/data/c0")
      val files = Option(new java.io.File(s"$root/data/c0").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(f => s"data/c0/${f.getName}").sorted.toSeq
      (root, files)
    }

    def poolHarvest(root: String, files: Seq[String]): Int = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(files.size, Runtime.getRuntime.availableProcessors())))
      try {
        val futures = files.map { rel =>
          rel -> pool.submit(new java.util.concurrent.Callable[Map[String, graft.plans.TxLog.ColStats]] {
            def call() = graft.plans.TxLog.fileStats(java.nio.file.Paths.get(root, rel))
          })
        }
        futures.map(_._2.get()).map(_.size).sum
      } finally pool.shutdown()
    }

    def jobHarvest(root: String, files: Seq[String]): Int = {
      val slices = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
      spark.sparkContext.parallelize(files, slices)
        .map(rel => rel -> graft.plans.TxLog.fileStats(java.nio.file.Paths.get(root, rel)))
        .collect().map(_._2.size).sum
    }

    Seq(2, 8, 64).foreach { n =>
      val (root, files) = mkFiles(n)
      require(files.size == n, s"expected $n files, got ${files.size}")
      // warm both paths
      poolHarvest(root, files); jobHarvest(root, files)
      (1 to 3).foreach { i =>
        System.gc(); var t0 = System.nanoTime(); poolHarvest(root, files)
        val a = (System.nanoTime() - t0) / 1e6
        System.gc(); t0 = System.nanoTime(); jobHarvest(root, files)
        val b = (System.nanoTime() - t0) / 1e6
        System.err.println(f"HP n=$n%3d pass$i pool=$a%8.1f ms job=$b%8.1f ms")
      }
    }
    spark.stop()
  }
}
