package graft.tools

/** Dev-only: pure-CPU timing + bit-identity digest for the jpeg decode
  * kernel (no Spark involved). Run before and after an IDCT change: the
  * digest must not move; the time should. */
object JpegIdctProbe {
  def main(args: Array[String]): Unit = {
    val images = (0L until 200L).map { id =>
      val w = 16 + (id % 5).toInt * 8
      val h = 16 + (id % 3).toInt * 8
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
      graft.functions.Jpeg.encodeRgb444(w, h, rgb)
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    images.foreach { j =>
      val (_, out) = graft.functions.Jpeg.decode(j)
      md.update(out)
    }
    System.err.println("JPEG decode digest: " +
      md.digest().map("%02x".format(_)).mkString)
    // warm
    (1 to 10).foreach(_ => images.foreach(graft.functions.Jpeg.decode))
    (1 to 3).foreach { p =>
      System.gc()
      val t0 = System.nanoTime()
      (1 to 20).foreach(_ => images.foreach(graft.functions.Jpeg.decode))
      System.err.println(f"JPEG decode pass$p ${(System.nanoTime() - t0) / 1e9}%6.3f s / 4000 decodes")
    }
  }
}
