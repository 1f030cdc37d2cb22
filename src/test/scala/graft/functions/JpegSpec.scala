package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The from-scratch baseline JPEG codec (ITU-T T.81): encoder/decoder
  * round trip under a quantization-error tolerance, cross-decode parity
  * against the JDK's own ImageIO JPEG implementation (fixture-generation
  * only — production decode is ours), and loud malformed rejections. */
class JpegSpec extends AnyFunSuite {

  /** Smooth deterministic RGB test card (low-frequency content, so the
    * Annex K quantization error stays bounded). */
  private def testCard(w: Int, h: Int, phase: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = (128 + 90 * StrictMath.sin((x + phase) * 2 * math.Pi / w)).toInt.toByte
      rgb(o + 1) = (128 + 90 * StrictMath.cos((y + phase) * 2 * math.Pi / h)).toInt.toByte
      rgb(o + 2) = (40 + (180 * (x + y)) / (w + h)).toByte
    }
    rgb
  }

  private def maxMeanErr(a: Array[Byte], b: Array[Byte]): (Int, Double) = {
    require(a.length == b.length, s"pixel buffers differ: ${a.length} vs ${b.length}")
    var maxE = 0
    var sum = 0L
    var i = 0
    while (i < a.length) {
      val d = math.abs((a(i) & 0xff) - (b(i) & 0xff))
      if (d > maxE) maxE = d
      sum += d
      i += 1
    }
    (maxE, sum.toDouble / a.length)
  }

  test("RGB 4:4:4 round trip stays inside the quantization tolerance") {
    for ((w, h) <- Seq((24, 17), (16, 16), (33, 9))) {
      val rgb = testCard(w, h, phase = w + h)
      val jpeg = Jpeg.encodeRgb444(w, h, rgb)
      val (info, out) = Jpeg.decode(jpeg)
      assert(info.width == w && info.height == h && info.components == 3)
      assert(info.hMax == 1 && info.vMax == 1)
      val (maxE, meanE) = maxMeanErr(rgb, out)
      assert(maxE <= 32 && meanE <= 6.0,
        s"${w}x$h round-trip error too high: max $maxE mean $meanE")
    }
  }

  test("grayscale round trip") {
    val w = 21; val h = 14
    val gray = Array.tabulate(w * h) { i =>
      (128 + 100 * StrictMath.sin(i * 2 * math.Pi / 97.0)).toInt.toByte
    }
    val jpeg = Jpeg.encodeGray(w, h, gray)
    val (info, out) = Jpeg.decode(jpeg)
    assert(info.width == w && info.height == h && info.components == 1)
    val (maxE, meanE) = maxMeanErr(gray, out)
    assert(maxE <= 24 && meanE <= 5.0, s"gray round-trip: max $maxE mean $meanE")
  }

  test("encoder is deterministic") {
    val rgb = testCard(24, 17, 3)
    assert(Jpeg.encodeRgb444(24, 17, rgb).toSeq == Jpeg.encodeRgb444(24, 17, rgb).toSeq)
  }

  test("cross-decode parity with the JDK decoder on a JDK-written 4:2:0 jpeg") {
    // ImageIO writes 4:2:0 chroma subsampling by default for RGB — this
    // exercises the multi-block MCU loop and the chroma upsampler on
    // bytes OUR encoder never produced
    val w = 40; val h = 26
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = testCard(w, h, 7)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "JDK refused to write jpeg")
    val jpegBytes = bos.toByteArray
    val (info, ours) = Jpeg.decode(jpegBytes)
    assert(info.width == w && info.height == h && info.components == 3)
    assert(info.hMax == 2, "JDK default should be chroma-subsampled (hMax 2)")
    val theirsImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpegBytes))
    val theirs = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = theirsImg.getRGB(x, y)
      val o = (y * w + x) * 3
      theirs(o) = ((p >> 16) & 0xff).toByte
      theirs(o + 1) = ((p >> 8) & 0xff).toByte
      theirs(o + 2) = (p & 0xff).toByte
    }
    val (maxE, meanE) = maxMeanErr(theirs, ours)
    // same bitstream, two IDCT/upsampler implementations: differences
    // are rounding + chroma interpolation styles (JDK interpolates, we
    // use nearest) on smooth content
    assert(maxE <= 24 && meanE <= 3.0,
      s"cross-decode disagreement too high: max $maxE mean $meanE")
  }

  test("cross-decode parity on a JDK-written grayscale jpeg") {
    val w = 19; val h = 23
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (128 + 100 * StrictMath.sin((x * h + y) / 29.0)).toInt & 0xff
      // raster samples ARE the jpeg samples; setRGB would push the
      // value through the gray colorspace gamma first
      img.getRaster.setSample(x, y, 0, v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val (info, ours) = Jpeg.decode(bos.toByteArray)
    assert(info.components == 1 && info.width == w && info.height == h)
    val theirsImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val theirs = Array.tabulate(w * h) { i =>
      theirsImg.getRaster.getSample(i % w, i / w, 0).toByte
    }
    val (maxE, meanE) = maxMeanErr(theirs, ours)
    assert(maxE <= 4 && meanE <= 1.0,
      s"grayscale cross-decode disagreement: max $maxE mean $meanE")
  }

  test("malformed inputs refuse loudly") {
    val good = Jpeg.encodeRgb444(16, 16, testCard(16, 16, 1))
    // progressive (SOF2) refused by name — find the SOF0 marker and flip it
    val sofAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && i + 1 < good.length && (good(i + 1) & 0xff) == 0xc0).get
    val progressive = good.clone(); progressive(sofAt + 1) = 0xc2.toByte
    val e1 = intercept[IllegalArgumentException](Jpeg.decode(progressive))
    assert(e1.getMessage.contains("non-baseline"))
    // truncated entropy data
    val truncated = good.take(good.length - 20)
    val e2 = intercept[Exception](Jpeg.decode(truncated))
    assert(e2.getMessage.toLowerCase.contains("truncat"))
    // not a jpeg at all
    val e3 = intercept[IllegalArgumentException](
      Jpeg.decode("PAR1 definitely not a jpeg".getBytes))
    assert(e3.getMessage.contains("SOI"))
  }

  test("0xFF fill bytes before a marker are legal padding (T.81 B.1.1.2)") {
    val good = Jpeg.encodeRgb444(16, 16, testCard(16, 16, 2))
    val (_, reference) = Jpeg.decode(good)
    // pad before the first post-SOI marker (good(2) is that marker's 0xFF)
    val padded = good.take(2) ++ Array.fill(3)(0xff.toByte) ++ good.drop(2)
    val (info, out) = Jpeg.decode(padded)
    assert(info.width == 16 && info.height == 16)
    assert(out.toSeq == reference.toSeq, "fill bytes must not change the decode")
  }
}
