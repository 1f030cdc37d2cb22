package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Dev-only: vad pipeline with/without repartition, one JVM. */
object VadProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def vad(rep: Boolean): Long = {
      val pcm0 = graft.Tables(spark, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("b0"))
      val pcm1 = if (rep) pcm0.repartition(spark.sparkContext.defaultParallelism) else pcm0
      val pcm = pcm1.withColumn("hex",
        concat(col("b0"), md5(col("b0")), md5(md5(col("b0"))), md5(md5(md5(col("b0"))))))
      val wins = pcm.select(col("doc_id"), explode(expr(
        """transform(sequence(0, 7), w -> struct(
             CAST(w AS BIGINT) AS win,
             aggregate(sequence(0, 7), 0L, (acc, i) ->
               acc + (CAST(conv(substring(hex, (w*8+i)*2+1, 2), 16, 10) AS BIGINT) - 128)
                   * (CAST(conv(substring(hex, (w*8+i)*2+1, 2), 16, 10) AS BIGINT) - 128)) AS energy))"""))
        .as("e"))
        .select(col("doc_id"), col("e.win").as("win"), col("e.energy").as("energy"))
        .withColumn("active", col("energy") > 43500L)
      val runs = wins.filter(col("active"))
        .withColumn("grp", col("win") - row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("win")))
        .groupBy("doc_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy("doc_id").agg(max(col("len")).as("longest"))
      wins.groupBy("doc_id")
        .agg(sum(when(col("active"), 1L).otherwise(0L)).as("n_active"),
          max(col("energy")).as("max_energy"))
        .join(runs, Seq("doc_id"), "left")
        .orderBy("doc_id").count()
    }
    (1 to 2).foreach(_ => { vad(false); vad(true) })
    (1 to 3).foreach { i =>
      System.gc(); var t0 = System.nanoTime(); vad(false)
      val a = (System.nanoTime() - t0) / 1e9
      System.gc(); t0 = System.nanoTime(); vad(true)
      val b = (System.nanoTime() - t0) / 1e9
      System.err.println(f"VAD pass$i single=$a%6.3f repart=$b%6.3f")
    }
    spark.stop()
  }
}
