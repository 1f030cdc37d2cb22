package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Dev-only: A/B repartition-before-kernel for per-doc expression
  * kernels, one JVM. */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = () => graft.Tables(spark, dir, "documents")
    def rep(d: DataFrame): DataFrame = d.repartition(spark.sparkContext.defaultParallelism)

    def winnow(d: DataFrame): Long =
      d.select(col("doc_id"),
          graft.functions.WinnowFingerprint(split(trim(col("text")), "\\s+")).as("fp"))
        .select(col("doc_id"), explode(col("fp")).as("f"))
        .select(col("doc_id"), col("f.h").as("h"))
        .distinct().count()

    def shingles(d: DataFrame): Long =
      d.select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
        .select(col("doc_id"),
          explode(expr("transform(sequence(0, size(t)-3), i -> concat(t[i],' ',t[i+1],' ',t[i+2]))")).as("s"))
        .select(col("doc_id"), graft.functions.HashBridge.h32(col("s")).as("h"))
        .distinct().count()

    def ab(name: String, f: DataFrame => Long): Unit = {
      (1 to 2).foreach(_ => { f(docs()); f(rep(docs())) })
      (1 to 3).foreach { i =>
        System.gc(); var t0 = System.nanoTime(); f(docs())
        val a = (System.nanoTime() - t0) / 1e9
        System.gc(); t0 = System.nanoTime(); f(rep(docs()))
        val b = (System.nanoTime() - t0) / 1e9
        System.err.println(f"KP $name pass$i single=$a%6.3f repart=$b%6.3f")
      }
    }
    ab("winnow", winnow)
    ab("shingles", shingles)
    spark.stop()
  }
}
