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

  // ------------------------------------------------------------------ PNG
  // The COMPRESSED-format class BMP/WAV never exercise: chunk framing
  // with CRC32 integrity, zlib (JDK Deflater/Inflater — no codec
  // library), and the five adaptive scanline filters whose REVERSAL is
  // where real PNG decoders break. RGB8 (colour type 2, bit depth 8,
  // no interlace) — the shape the encoder emits and the tier needs.

  final case class PngHeader(width: Int, height: Int, bitDepth: Int, colorType: Int)

  val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val b = ByteBuffer.allocate(12 + data.length) // PNG ints are BE
    b.putInt(data.length).put(t).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    b.putInt(crc.getValue.toInt)
    b.array()
  }

  /** Paeth predictor (PNG spec §9.4): nearest of left/above/upper-left
    * to p = a + b − c, ties a > b > c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** RGB8 PNG encoder: signature, IHDR, one zlib IDAT, IEND. Scanlines
    * are forward-filtered rotating through ALL FIVE spec filters
    * (row r uses filter r % 5), so a decoder that botches any reversal
    * breaks the pixel sum. `pixelFill` supplies raw RGB bytes row-major;
    * exhausted → 0. */
  def encodePng(width: Int, height: Int, pixelFill: Iterator[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"degenerate dims ${width}x$height")
    val bpp = 3
    val raw = Array.fill(height, width * bpp)(
      if (pixelFill.hasNext) pixelFill.next() else 0.toByte)
    val filtered = new java.io.ByteArrayOutputStream()
    var prev = new Array[Byte](width * bpp)
    var r = 0
    while (r < height) {
      val row = raw(r)
      val f = r % 5
      filtered.write(f)
      var c = 0
      while (c < row.length) {
        val x = row(c) & 0xFF
        val a = if (c >= bpp) row(c - bpp) & 0xFF else 0
        val b = prev(c) & 0xFF
        val ul = if (c >= bpp) prev(c - bpp) & 0xFF else 0
        val v = f match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, ul)
        }
        filtered.write(v & 0xFF)
        c += 1
      }
      prev = row
      r += 1
    }
    val fb = filtered.toByteArray
    val defl = new java.util.zip.Deflater()
    defl.setInput(fb); defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte).put(2.toByte) // bit depth 8, colour type 2 (RGB)
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
    PngSig ++ pngChunk("IHDR", ihdr.array()) ++
      pngChunk("IDAT", comp.toByteArray) ++ pngChunk("IEND", Array.empty)
  }

  /** Chunk walk + inflate + filter reversal: verifies the signature and
    * EVERY chunk CRC, concatenates IDAT segments (the spec allows
    * splitting), inflates to exactly height·(1 + width·3) filtered
    * bytes, reverses the per-row filter, and returns the raw RGB bytes.
    * Ancillary chunks are skipped; structural damage fails loudly. */
  def decodePng(bytes: Array[Byte]): (PngHeader, Array[Byte]) = {
    require(bytes.length >= 8 && bytes.take(8).sameElements(PngSig),
      "not a PNG: bad signature")
    val bb = ByteBuffer.wrap(bytes) // big-endian by default
    var pos = 8
    var hdr: PngHeader = null
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended) {
      require(pos + 8 <= bytes.length, "truncated PNG: chunk header cut off")
      val len = bb.getInt(pos)
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      require(len >= 0 && pos + 12 + len <= bytes.length,
        s"truncated PNG: $typ declares $len bytes beyond the buffer")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == bb.getInt(pos + 8 + len),
        s"PNG chunk $typ fails CRC — corrupt container")
      typ match {
        case "IHDR" =>
          require(len == 13, s"IHDR must be 13 bytes, got $len")
          hdr = PngHeader(bb.getInt(pos + 8), bb.getInt(pos + 12),
            bytes(pos + 16) & 0xFF, bytes(pos + 17) & 0xFF)
          require(hdr.bitDepth == 8 && hdr.colorType == 2,
            s"decoder covers RGB8 (depth 8, colour 2); got " +
              s"depth ${hdr.bitDepth}, colour ${hdr.colorType}")
          require(bytes(pos + 20) == 0, "interlaced PNG not supported")
        case "IDAT" =>
          require(hdr != null, "IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" => ended = true
        case _ => () // ancillary chunk — skipped, CRC already verified
      }
      pos += 12 + len
    }
    require(hdr != null, "PNG without IHDR")
    val bpp = 3
    val rowBytes = hdr.width * bpp
    val expect = hdr.height * (1 + rowBytes)
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    val fb = new Array[Byte](expect)
    var got = 0
    while (got < expect && !infl.finished()) {
      val n = infl.inflate(fb, got, expect - got)
      // n == 0 mid-stream is always terminal: needsInput means the
      // deflate data ran out (truncated), and a zero-progress inflater
      // that is neither finished nor awaiting input is a stall — the
      // FDICT preset-dictionary case (needsDictionary true with input
      // still buffered) would otherwise spin this loop forever
      require(n > 0,
        if (infl.needsDictionary)
          "IDAT requires a preset dictionary (zlib FDICT) — unsupported"
        else "truncated IDAT stream")
      got += n
    }
    val trailing = infl.inflate(new Array[Byte](1))
    infl.end()
    require(got == expect && trailing == 0,
      s"IDAT inflates to $got bytes (+$trailing extra), want exactly $expect")
    // reverse the per-row filter in place row by row
    val raw = new Array[Byte](hdr.height * rowBytes)
    var r = 0
    while (r < hdr.height) {
      val f = fb(r * (1 + rowBytes)) & 0xFF
      require(f <= 4, s"unknown PNG filter $f on row $r")
      val src = r * (1 + rowBytes) + 1
      val dst = r * rowBytes
      var c = 0
      while (c < rowBytes) {
        val x = fb(src + c) & 0xFF
        val a = if (c >= bpp) raw(dst + c - bpp) & 0xFF else 0
        val b = if (r > 0) raw(dst - rowBytes + c) & 0xFF else 0
        val ul = if (r > 0 && c >= bpp) raw(dst - rowBytes + c - bpp) & 0xFF else 0
        val v = f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, ul)
        }
        raw(dst + c) = (v & 0xFF).toByte
        c += 1
      }
      r += 1
    }
    (hdr, raw)
  }

  /** Σ of raw RGB bytes — the decode-parity scalar the oracle recomputes
    * from the same md5 chain (filters + deflate must round-trip). */
  def pngPixelSum(raw: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < raw.length) { sum += raw(i) & 0xFF; i += 1 }
    sum
  }
}
