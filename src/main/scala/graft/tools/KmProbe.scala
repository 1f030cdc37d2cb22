package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.SimilarityQueries._

/** Dev-only: single-JVM A/B of the two-iteration Lloyd closure — classic
  * kernels (kmAssign re-joined with the vector relation in every
  * kmUpdate and residual step) vs fused kernels (kmAssignE carries the
  * vector through the argmin aggregation). Asserts identical a2/c2
  * relations, then times the ivfpq-shaped closure (through the residual
  * join) both ways. */
object KmProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def classicClosure(): DataFrame = {
      val v = kmVectors(spark, dir)
      val c0 = kmInit(v)
      val a1 = kmAssign(v, c0); val c1 = kmUpdate(v, a1).localCheckpoint()
      val a2 = kmAssign(v, c1).localCheckpoint(); val c2 = kmUpdate(v, a2).localCheckpoint()
      v.join(a2, "vec_id").join(broadcast(c2), "cid")
        .select(col("vec_id"), col("cid"), expr(
          "zip_with(e, c, (x, y) -> CAST(round((x - y) * 1000, 0) AS BIGINT))").as("rq"))
    }

    def fusedClosure(): DataFrame = {
      val v = kmVectors(spark, dir)
      val c0 = kmInit(v)
      val a1 = kmAssignE(v, c0); val c1 = kmUpdateE(a1).localCheckpoint()
      val a2 = kmAssignE(v, c1).localCheckpoint(); val c2 = kmUpdateE(a2).localCheckpoint()
      a2.join(broadcast(c2), "cid")
        .select(col("vec_id"), col("cid"), expr(
          "zip_with(e, c, (x, y) -> CAST(round((x - y) * 1000, 0) AS BIGINT))").as("rq"))
    }

    // equality of the residual relations (covers a2 and c2 transitively)
    val ra = classicClosure(); val rb = fusedClosure()
    require(ra.exceptAll(rb).isEmpty && rb.exceptAll(ra).isEmpty,
      "classic and fused residual relations differ")
    System.err.println("KM residuals identical")

    def time(f: () => DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      f().count()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).foreach { i =>
      val b = time(fusedClosure)
      val a = time(classicClosure)
      System.err.println(f"KM pass$i classic=$a%6.3f fused=$b%6.3f")
    }

    // ivf2 shape: the carried e is never consumed downstream of c2, so
    // the fatter a2 checkpoint could lose what the dropped joins gain —
    // measure the full query both ways
    import org.apache.spark.sql.expressions.Window
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = graft.functions.DotProduct(a, b)
    def ivf2(fused: Boolean): DataFrame = {
      val v = kmVectors(spark, dir)
      val c0 = kmInit(v)
      val (a2, c2) =
        if (fused) {
          val a1 = kmAssignE(v, c0); val c1 = kmUpdateE(a1).localCheckpoint()
          val a2 = kmAssignE(v, c1).localCheckpoint(); (a2, kmUpdateE(a2).localCheckpoint())
        } else {
          val a1 = kmAssign(v, c0); val c1 = kmUpdate(v, a1).localCheckpoint()
          val a2 = kmAssign(v, c1).localCheckpoint(); (a2, kmUpdate(v, a2).localCheckpoint())
        }
      val wp = Window.partitionBy("query_id").orderBy(col("d"), col("cid"))
      val probes = v.filter(col("vec_id") < 16)
        .withColumn("vn2", dot(col("e"), col("e")))
        .crossJoin(broadcast(c2.withColumn("cn2", dot(col("c"), col("c")))))
        .select(col("vec_id").as("query_id"), col("cid"),
          round(col("vn2") + col("cn2") - lit(2.0) * dot(col("e"), col("c")), 6).as("d"))
        .withColumn("rn", row_number().over(wp))
        .filter(col("rn") <= 2)
        .select("query_id", "cid")
      val n = v.withColumn("nrm", sqrt(dot(col("e"), col("e"))))
      val cand = broadcast(probes).join(a2.select("vec_id", "cid"), "cid")
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
      val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
      cand
        .join(n.as("q"), col("q.vec_id") === col("query_id"))
        .join(n.as("c"), col("c.vec_id") === col("neighbor_id"))
        .withColumn("sim",
          round(dot(col("q.e"), col("c.e")) / (col("q.nrm") * col("c.nrm")), 6) + lit(0.0))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("query_id", "neighbor_id", "sim")
        .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
    }
    def timeI(fused: Boolean): Double = {
      System.gc()
      val t0 = System.nanoTime()
      ivf2(fused).count()
      (System.nanoTime() - t0) / 1e9
    }
    timeI(true); timeI(false)
    (1 to 3).foreach { i =>
      val b = timeI(true)
      val a = timeI(false)
      System.err.println(f"IVF2 pass$i classic=$a%6.3f fused=$b%6.3f")
    }
    spark.stop()
  }
}
