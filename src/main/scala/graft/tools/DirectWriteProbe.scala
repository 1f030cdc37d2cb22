package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Dev-only: A/B the commit write path in one JVM —
  * (a) `df.write.parquet` + driver-pool footer harvest (round-13 shape) vs
  * (b) direct per-task ParquetWriter with in-task stats (the
  * write-task-harvest design VERDICT r13 names), alternated best-of-3.
  * Also cross-checks that (b)'s rows and stats match (a)'s. */
object DirectWriteProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = graft.Tables(spark, dir, "orders")

    def rmrf(path: String): Unit = {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => { java.nio.file.Files.delete(q); () })
        finally s.close()
      }
    }

    def sparkWrite(df: DataFrame, out: String): Seq[String] = {
      df.write.mode("errorifexists").parquet(out)
      val files = Option(new java.io.File(out).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).sorted.toSeq
      // driver-pool footer harvest (round-13 production shape)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(files.size, Runtime.getRuntime.availableProcessors())))
      try {
        files.map { f =>
          pool.submit(new java.util.concurrent.Callable[Int] {
            def call() = graft.plans.TxLog.fileStats(java.nio.file.Paths.get(f)).size
          })
        }.foreach(_.get())
      } finally pool.shutdown()
      files
    }

    def directWrite(df: DataFrame, out: String): Seq[(String, Map[String, graft.plans.TxLog.ColStats])] = {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
      graft.plans.DirectParquet.write(df, out).get
    }

    // correctness cross-check at n=4
    locally {
      val a = "/tmp/dwp_check_a"; val b = "/tmp/dwp_check_b"
      rmrf(a); rmrf(b)
      val df4 = orders.repartition(4)
      sparkWrite(df4, a)
      val direct = directWrite(df4, b)
      val ra = spark.read.parquet(a)
      val rb = spark.read.parquet(b)
      require(ra.schema.map(f => (f.name, f.dataType)) == rb.schema.map(f => (f.name, f.dataType)),
        s"schema mismatch:\n${ra.schema}\n${rb.schema}")
      val ca = ra.count(); val cb = rb.count()
      require(ca == cb, s"count mismatch $ca vs $cb")
      require(ra.exceptAll(rb).isEmpty && rb.exceptAll(ra).isEmpty, "row content mismatch")
      // stats equivalence: in-task stats must match footer harvest per file
      direct.foreach { case (f, st) =>
        val ft = graft.plans.TxLog.fileStats(java.nio.file.Paths.get(b, f))
        require(st == ft, s"stats mismatch for $f:\n in-task: $st\n footer:  $ft")
      }
      System.err.println(s"DWP correctness check PASSED (${direct.size} files, $ca rows)")
    }

    var i = 0
    Seq(2, 8, 64).foreach { n =>
      val dfn = orders.repartition(n)
      def runA(): Double = {
        i += 1; val out = s"/tmp/dwp_a_$i"; rmrf(out)
        val t0 = System.nanoTime(); sparkWrite(dfn, out); (System.nanoTime() - t0) / 1e9
      }
      def runB(): Double = {
        i += 1; val out = s"/tmp/dwp_b_$i"; rmrf(out)
        val t0 = System.nanoTime(); directWrite(dfn, out); (System.nanoTime() - t0) / 1e9
      }
      runA(); runB() // warm
      (1 to 3).foreach { p =>
        System.gc(); val a = runA()
        System.gc(); val b = runB()
        System.err.println(f"DWP n=$n%3d pass$p spark+pool=$a%6.3f s direct=$b%6.3f s")
      }
    }
    spark.stop()
  }
}
