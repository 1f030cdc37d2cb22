package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: single-task vs repartitioned tokenize+count (one JVM). */
object TokProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val toks = split(trim(col("text")), "\\s+")
    def run(rep: Boolean): Long = {
      val d0 = graft.Tables(spark, dir, "documents")
      val d = if (rep) d0.repartition(spark.sparkContext.defaultParallelism) else d0
      d.select(col("doc_id"), explode(toks).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        .count()
    }
    (1 to 3).foreach { i =>
      run(rep = false); run(rep = true) // warm both
    }
    (1 to 3).foreach { i =>
      System.gc()
      var t0 = System.nanoTime()
      run(rep = false)
      val a = (System.nanoTime() - t0) / 1e9
      System.gc()
      t0 = System.nanoTime()
      run(rep = true)
      val b = (System.nanoTime() - t0) / 1e9
      System.err.println(f"TOK pass$i single=$a%6.3f repart=$b%6.3f")
    }
    spark.stop()
  }
}
