package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: jpeg decode kernel with/without repartition, one JVM. */
object JpegProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def run(rep: Boolean): Long = {
      val ids0 = graft.Tables(spark, dir, "documents").select(col("doc_id"))
      val ids = if (rep) ids0.repartition(spark.sparkContext.defaultParallelism) else ids0
      ids.as[Long].mapPartitions { it =>
        it.map { id =>
          val w = 16 + (id % 3).toInt * 8
          val h = 16 + (id % 2).toInt * 8
          val rgb = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val o = (y * w + x) * 3
              rgb(o) = (128 + 90 * StrictMath.sin((x + id % 17) * 2 * math.Pi / w)).toInt.toByte
              rgb(o + 1) = (128 + 90 * StrictMath.cos((y + id % 11) * 2 * math.Pi / h)).toInt.toByte
              rgb(o + 2) = (40 + (180 * (x + y)) / (w + h)).toByte
              x += 1
            }
            y += 1
          }
          val jpeg = graft.functions.Jpeg.encodeRgb444(w, h, rgb)
          val (info, out) = graft.functions.Jpeg.decode(jpeg)
          (id, info.width, out.length)
        }
      }.toDF("doc_id", "w", "n").orderBy("doc_id").count()
    }
    (1 to 2).foreach(_ => { run(false); run(true) })
    (1 to 3).foreach { i =>
      System.gc(); var t0 = System.nanoTime(); run(false)
      val a = (System.nanoTime() - t0) / 1e9
      System.gc(); t0 = System.nanoTime(); run(true)
      val b = (System.nanoTime() - t0) / 1e9
      System.err.println(f"JPEG pass$i single=$a%6.3f repart=$b%6.3f")
    }
    spark.stop()
  }
}
