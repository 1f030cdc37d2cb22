package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.TxLog

/** Dev-only phase profiler for heavy bench queries (not part of the
  * driver contract; run with `sbt "runMain graft.tools.DevProbe"`). */
object DevProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(cpus, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val table = java.nio.file.Paths.get(dir, "_graft_fixtures", "probe_cluster3d").toString

    def deleteRecursively(path: String): Unit = {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(p)) {
        val stream = java.nio.file.Files.walk(p)
        try stream.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => { java.nio.file.Files.delete(q); () })
        finally stream.close()
      }
    }
    val orders = graft.Tables(spark, dir, "orders")

    // sub-phase: raw 64-file write vs footer harvest
    (1 to 2).foreach { round =>
      val tmp = table + s"_w$round"
      deleteRecursively(tmp)
      t("raw write 64 files") { orders.repartition(64).write.parquet(tmp) }
      val files = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      val parquets = {
        val b = Seq.newBuilder[java.nio.file.Path]
        while (files.hasNext) { val p = files.next(); if (p.toString.endsWith(".parquet")) b += p }
        b.result()
      }
      t(s"harvest ${parquets.size} footers serial") {
        val conf = new org.apache.hadoop.conf.Configuration()
        parquets.foreach { p =>
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(p.toUri), conf))
          try r.getFooter.getBlocks.size() finally r.close()
        }
      }
      deleteRecursively(tmp)
    }

    (1 to 2).foreach { round =>
      System.err.println(s"--- round $round ---")
      t("delete") { deleteRecursively(table) }
      t("append 64 files") { TxLog.append(orders.repartition(64), table) }
      val r = t("minmax scan") {
        orders.agg(
          min(col("o_custkey")), max(col("o_custkey")),
          min(col("o_orderkey")), max(col("o_orderkey")),
          min(col("o_totalprice")), max(col("o_totalprice"))).head()
      }
      def lband(lo: Long, hi: Long): (Long, Long) =
        (lo + (hi - lo) * 30 / 100, lo + (hi - lo) * 40 / 100)
      val (cLo, cHi) = lband(r.getLong(0), r.getLong(1))
      val (kLo, kHi) = lband(r.getLong(2), r.getLong(3))
      val (pLo, pHi) = (
        r.getDouble(4) + (r.getDouble(5) - r.getDouble(4)) * 0.30,
        r.getDouble(4) + (r.getDouble(5) - r.getDouble(4)) * 0.40)
      def planned(pred: org.apache.spark.sql.Column): Long = {
        val df = spark.read.format("graft").load(table).filter(pred)
        df.queryExecution.executedPlan.collectLeaves().collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.selectedPartitions.totalNumberOfFiles
        }.getOrElse(throw new IllegalStateException("no file scan in plan"))
      }
      t("3 probes before") {
        Seq(
          planned(col("o_custkey").between(cLo, cHi)),
          planned(col("o_orderkey").between(kLo, kHi)),
          planned(col("o_totalprice").between(pLo, pHi)))
      }
      t("compact clusterBy 3d") {
        TxLog.compact(spark, table, 64,
          clusterBy = Seq("o_custkey", "o_orderkey", "o_totalprice"))
      }
      t("3 probes after") {
        Seq(
          planned(col("o_custkey").between(cLo, cHi)),
          planned(col("o_orderkey").between(kLo, kHi)),
          planned(col("o_totalprice").between(pLo, pHi)))
      }
      t("final agg count") {
        spark.read.format("graft").load(table)
          .filter(col("o_custkey").between(cLo, cHi))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n")).count()
      }
    }
    spark.stop()
  }
}
