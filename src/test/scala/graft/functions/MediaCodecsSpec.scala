package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The real-byte media codecs: layout round-trips on hand-made
  * fixtures, the chunk/stride behaviors a fake header never exercises,
  * and controlled failures on malformed bytes.
  */
class MediaCodecsSpec extends AnyFunSuite {
  import MediaCodecs._

  test("BMP round-trip: header fields and stride-aware pixel sum") {
    // 3x2 @24bpp: row bytes 9, stride 12 (3 pad bytes per row)
    val pixels = (1 to 24).map(_.toByte) // fills 2 rows x stride 12
    val bmp = encodeBmp24(3, 2, pixels.iterator)
    val h = parseBmp(bmp)
    assert(h == BmpHeader(3, 2, 24, 54 + 24, 54))
    // pixel sum skips the pad positions (10,11,12) and (22,23,24)
    val expected = (1 to 24).filterNot(i => Seq(10, 11, 12, 22, 23, 24).contains(i)).sum
    assert(bmpPixelSum(bmp) == expected)
  }

  test("BMP stride is the identity when width*3 is already 4-aligned") {
    val bmp = encodeBmp24(4, 1, Iterator.continually(7.toByte))
    assert(parseBmp(bmp).fileSize == 54 + 12)
    assert(bmpPixelSum(bmp) == 12 * 7)
  }

  test("BMP parser rejects bad magic, truncation, and a lying data offset") {
    val good = encodeBmp24(2, 2, Iterator.empty)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](parseBmp(badMagic))
      .getMessage.contains("magic"))
    assert(intercept[IllegalArgumentException](parseBmp(good.take(20)))
      .getMessage.contains("magic") ||
      intercept[IllegalArgumentException](parseBmp(good.take(20)))
        .getMessage.nonEmpty)
    val lyingOffset = good.clone()
    java.nio.ByteBuffer.wrap(lyingOffset)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(10, 100000)
    assert(intercept[IllegalArgumentException](parseBmp(lyingOffset))
      .getMessage.contains("outside"))
  }

  test("WAV round-trip: fields, samples, energy") {
    val samples = Array[Byte](128.toByte, 130.toByte, 126.toByte, 200.toByte)
    val wav = encodeWavPcm8(16000, samples)
    val (info, data) = parseWav(wav)
    assert(info == WavInfo(1, 16000, 8, 4))
    assert(data.toSeq == samples.toSeq)
    assert(pcm8Energy(data) == 0 + 4 + 4 + 72 * 72)
  }

  test("WAV chunk walk skips an odd-sized junk chunk via the alignment pad") {
    val samples = Array.tabulate(10)(i => (120 + i).toByte)
    val wav = encodeWavPcm8(8000, samples, junkChunk = true)
    // a fixed-offset reader would land inside the LIST chunk here
    val (info, data) = parseWav(wav)
    assert(info.sampleRate == 8000 && info.nSamples == 10)
    assert(data.toSeq == samples.toSeq)
  }

  test("WAV parser rejects non-RIFF, overrunning chunks, and non-PCM") {
    assert(intercept[IllegalArgumentException](
      parseWav("nope".getBytes ++ new Array[Byte](20)))
      .getMessage.contains("RIFF"))
    val wav = encodeWavPcm8(8000, Array[Byte](1, 2, 3))
    val overrun = wav.clone()
    // data chunk size field -> absurd value
    val dataOff = wav.length - 3 - 8
    java.nio.ByteBuffer.wrap(overrun)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(dataOff + 4, 1 << 20)
    assert(intercept[IllegalArgumentException](parseWav(overrun))
      .getMessage.contains("overruns"))
    val nonPcm = wav.clone()
    java.nio.ByteBuffer.wrap(nonPcm)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(20, 3.toShort)
    assert(intercept[IllegalArgumentException](parseWav(nonPcm))
      .getMessage.contains("non-PCM"))
  }

  test("png round-trips raw RGB through all five scanline filters") {
    // 6 rows → filters 0..4 plus a repeat; deterministic pseudo-pixels
    val w = 5; val h = 6
    val pix = Array.tabulate(w * 3 * h)(i => ((i * 37 + 11) % 256).toByte)
    val png = encodePng(w, h, pix.iterator)
    assert(png.take(8).sameElements(MediaCodecs.PngSig))
    val (hdr, raw) = decodePng(png)
    assert(hdr == MediaCodecs.PngHeader(w, h, 8, 2))
    assert(raw.toSeq == pix.toSeq, "filter reversal did not invert the encoder")
    assert(pngPixelSum(raw) == pix.map(_ & 0xFF).map(_.toLong).sum)
  }

  test("png single-row and single-pixel edge shapes survive") {
    val one = encodePng(1, 1, Iterator(1.toByte, 2.toByte, 3.toByte))
    assert(decodePng(one)._2.toSeq == Seq[Byte](1, 2, 3))
    val row = encodePng(4, 1, Iterator.continually(200.toByte).take(12))
    assert(decodePng(row)._2.forall(b => (b & 0xFF) == 200))
  }

  test("png malformed containers fail loudly, never garbage-decode") {
    val good = encodePng(3, 2, Iterator.tabulate(18)(i => i.toByte))
    // bad signature
    val sig = good.clone(); sig(1) = 'Q'.toByte
    assert(intercept[IllegalArgumentException](decodePng(sig))
      .getMessage.contains("signature"))
    // flip one IDAT payload byte -> CRC mismatch (IDAT starts after
    // 8-byte sig + 25-byte IHDR chunk; +8 header puts us in its data)
    val crc = good.clone(); crc(8 + 25 + 8) = (crc(8 + 25 + 8) ^ 0x5A).toByte
    assert(intercept[IllegalArgumentException](decodePng(crc))
      .getMessage.contains("CRC"))
    // truncation mid-chunk
    assert(intercept[IllegalArgumentException](
      decodePng(good.take(good.length - 6)))
      .getMessage.toLowerCase.contains("truncated"))
    // declared length overrunning the buffer
    val over = good.clone()
    java.nio.ByteBuffer.wrap(over).putInt(8, 1 << 20) // IHDR len field
    assert(intercept[IllegalArgumentException](decodePng(over))
      .getMessage.contains("beyond the buffer"))
  }
}
