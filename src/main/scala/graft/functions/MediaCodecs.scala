package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Real byte-format media codecs — the NON-STUB path of the multimodal
  * tier. BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + stride-padded pixel
  * rows) and PCM WAV (RIFF chunk walk) are pure struct layouts
  * implementable from the public specs with no codec library, so the
  * tier's decode plumbing can be proven on REAL bytes: the writer and
  * parser are independent implementations of the layout, the parser
  * walks real offsets/strides/chunks (not a fake header), and the
  * decoded fields sit under the DuckDB hash oracle
  * (`multimodal_decode_bmp` / `multimodal_decode_wav`). The remaining
  * multimodal queries keep their declared md5-chain stubs — compressed
  * codecs (JPEG/MP3/H.264) don't ship in this container.
  */
object MediaCodecs {

  // ------------------------------------------------------------------ BMP

  final case class BmpHeader(width: Int, height: Int, bpp: Int,
      fileSize: Int, dataOffset: Int)

  /** 24-bit uncompressed BMP: 14-byte file header, 40-byte
    * BITMAPINFOHEADER, rows padded to 4-byte stride. `pixelFill` supplies
    * the data area bytes (including padding positions); exhausted → 0. */
  def encodeBmp24(width: Int, height: Int, pixelFill: Iterator[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"degenerate dims ${width}x$height")
    val stride = ((width * 3 + 3) / 4) * 4
    val dataSize = stride * height
    val fileSize = 54 + dataSize
    val b = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(fileSize)
    b.putInt(0) // reserved
    b.putInt(54) // pixel data offset
    b.putInt(40) // BITMAPINFOHEADER size
    b.putInt(width)
    b.putInt(height)
    b.putShort(1) // planes
    b.putShort(24) // bits per pixel
    b.putInt(0) // BI_RGB, uncompressed
    b.putInt(dataSize)
    b.putInt(2835).putInt(2835) // 72 DPI in px/metre
    b.putInt(0).putInt(0) // palette sizes (none at 24bpp)
    var i = 0
    while (i < dataSize) {
      b.put(if (pixelFill.hasNext) pixelFill.next() else 0.toByte)
      i += 1
    }
    b.array()
  }

  /** Header fields read through the real layout offsets (all LE). */
  def parseBmp(bytes: Array[Byte]): BmpHeader = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP: missing 'BM' magic or truncated header")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val fileSize = b.getInt(2)
    val dataOffset = b.getInt(10)
    val dibSize = b.getInt(14)
    require(dibSize >= 40, s"unsupported DIB header size $dibSize (pre-v3)")
    val width = b.getInt(18)
    val height = b.getInt(22)
    val bpp = b.getShort(28) & 0xFFFF
    require(width > 0 && height != 0, s"degenerate BMP dims ${width}x$height")
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      s"pixel data offset $dataOffset outside file of ${bytes.length} bytes")
    BmpHeader(width, height, bpp, fileSize, dataOffset)
  }

  /** Sum of the ACTUAL pixel bytes — rows walked by the 4-byte-aligned
    * stride from the parsed data offset, padding bytes skipped. The
    * stride arithmetic is the part a fake decode never exercises. */
  def bmpPixelSum(bytes: Array[Byte]): Long = {
    val h = parseBmp(bytes)
    require(h.bpp == 24, s"pixel walk implemented for 24bpp, got ${h.bpp}")
    val stride = ((h.width * 3 + 3) / 4) * 4
    val rows = math.abs(h.height) // negative height = top-down row order
    require(h.dataOffset + stride.toLong * rows <= bytes.length,
      "pixel data overruns the file")
    var sum = 0L
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < h.width * 3) {
        sum += bytes(h.dataOffset + r * stride + c) & 0xFF
        c += 1
      }
      r += 1
    }
    sum
  }

  // ------------------------------------------------------------------ WAV

  final case class WavInfo(channels: Int, sampleRate: Int,
      bitsPerSample: Int, nSamples: Int)

  /** Mono 8-bit PCM WAV. `junkChunk = true` inserts a LIST chunk (with an
    * ODD payload size, so the word-alignment rule is exercised) between
    * fmt and data — a well-formed reader must skip it by the chunk walk,
    * not by assuming fixed offsets. */
  def encodeWavPcm8(sampleRate: Int, samples: Array[Byte],
      junkChunk: Boolean = false): Array[Byte] = {
    val junkPayload = 7 // odd on purpose: consumes 8 + 7 + 1 pad bytes
    val junk = if (junkChunk) 8 + junkPayload + 1 else 0
    val dataSize = samples.length
    val riffSize = 4 + (8 + 16) + junk + (8 + dataSize)
    val b = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1) // PCM
    b.putShort(1) // mono
    b.putInt(sampleRate)
    b.putInt(sampleRate) // byte rate = rate * channels * bytes/sample
    b.putShort(1) // block align
    b.putShort(8) // bits per sample
    if (junkChunk) {
      b.put("LIST".getBytes("US-ASCII")).putInt(junkPayload)
      b.put("INFOjnk".getBytes("US-ASCII")) // 7 payload bytes
      b.put(0.toByte) // word-alignment pad, not counted in the size
    }
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    b.put(samples)
    b.array()
  }

  /** RIFF chunk walk: finds fmt + data wherever they sit, skips unknown
    * chunks, honors the word-alignment pad, rejects overruns. */
  def parseWav(bytes: Array[Byte]): (WavInfo, Array[Byte]) = {
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE file")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[Array[Byte]] = None
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(off)
      val size = b.getInt(off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length,
        s"chunk '$id' of $size bytes overruns the file")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val audioFormat = b.getShort(off + 8) & 0xFFFF
          require(audioFormat == 1, s"non-PCM audio format $audioFormat")
          fmt = Some((b.getShort(off + 10) & 0xFFFF, b.getInt(off + 12),
            b.getShort(off + 22) & 0xFFFF))
        case "data" =>
          data = Some(java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size))
        case _ => () // LIST/INFO/fact/...: skip by size
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    val (ch, rate, bits) = fmt.getOrElse(
      throw new IllegalArgumentException("no fmt chunk"))
    val d = data.getOrElse(throw new IllegalArgumentException("no data chunk"))
    require(bits == 8 && ch == 1,
      s"sample walk implemented for mono 8-bit PCM, got ${ch}ch/${bits}bit")
    (WavInfo(ch, rate, bits, d.length), d)
  }

  /** Energy of 8-bit unsigned PCM: Σ (s − 128)² — integer-exact, the
    * same midpoint convention the VAD stub pins. */
  def pcm8Energy(samples: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < samples.length) {
      val d = (samples(i) & 0xFF) - 128
      sum += d.toLong * d
      i += 1
    }
    sum
  }
}
