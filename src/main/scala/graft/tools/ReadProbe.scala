package graft.tools

/** Dev-only: cost of spark.read.parquet metadata resolution per call. */
object ReadProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    (1 to 3).foreach(_ => spark.read.parquet(s"$dir/orders.parquet").schema)
    val n = 100
    var t0 = System.nanoTime()
    (1 to n).foreach(_ => spark.read.parquet(s"$dir/orders.parquet").schema)
    System.err.println(f"PROBE infer-schema per call ${(System.nanoTime() - t0) / 1e6 / n}%8.3f ms")
    val sch = spark.read.parquet(s"$dir/orders.parquet").schema
    t0 = System.nanoTime()
    (1 to n).foreach(_ => spark.read.schema(sch).parquet(s"$dir/orders.parquet").schema)
    System.err.println(f"PROBE explicit-schema per call ${(System.nanoTime() - t0) / 1e6 / n}%8.3f ms")
    // cost of a trivial action on the smallest table
    t0 = System.nanoTime()
    (1 to 20).foreach(_ => spark.read.parquet(s"$dir/region.parquet").count())
    System.err.println(f"PROBE count region per call ${(System.nanoTime() - t0) / 1e6 / 20}%8.3f ms")
    spark.stop()
  }
}
