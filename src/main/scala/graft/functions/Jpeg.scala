package graft.functions

/** Baseline JPEG (ITU-T T.81) from scratch — no codec library, like the
  * BMP/WAV/PNG kernels in [[MediaCodecs]]: the format 90% of real
  * training images arrive in, decoded in the SCAN TASK so a 100 TB image
  * corpus never funnels bytes through the driver.
  *
  * Decoder (`decode`): baseline sequential DCT (SOF0) — marker walk,
  * 8/16-bit DQT, DHT canonical tables read per T.81 F.2.2.3
  * (mincode/maxcode/valptr), interleaved MCU scan with generic 1-2
  * sampling factors (4:4:4 / 4:2:2 / 4:2:0), DRI restart markers with
  * predictor reset, 0xFF00 byte unstuffing, dequant → dezigzag → float
  * IDCT → level shift, triangle-filter chroma upsampling, JFIF
  * YCbCr→RGB. Non-baseline frames (progressive SOF2, arithmetic coding,
  * 12-bit precision), truncation, and malformed tables refuse loudly —
  * a silent half-decode poisons a training corpus.
  *
  * Encoder (`encodeRgb444` / `encodeGray`): the deterministic-fixture
  * half (what PNG's `encodePng` is to `decodePng`) — 4:4:4 baseline
  * with the T.81 Annex K example quantization and Huffman tables, so
  * specs and the registry query can synthesize real JPEG bytes from md5
  * chains executor-side. Being LOSSY, the oracle contract is a
  * tolerance BOOLEAN (quantization error bound), not pixel equality —
  * the same stance as the t-digest sketches.
  */
object Jpeg {

  final case class JpegInfo(
      width: Int, height: Int, components: Int, hMax: Int, vMax: Int,
      restartInterval: Int)

  // zigzag scan order: zigzag(i) = natural position of the i-th scanned coef
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // T.81 Annex K.1 example quantization tables (luminance, chrominance)
  private val QLumA: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)
  private val QChrA: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)

  // T.81 Annex K.3 typical Huffman tables: (bits[1..16], values)
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChrBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChrBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    for (u <- 0 until 8; x <- 0 until 8)
      t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private def cC(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  // ------------------------------------------------------------------
  // decoder
  // ------------------------------------------------------------------

  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    // canonical decode tables per T.81 F.2.2.3
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Byte] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        k += bits(l)
        maxCode(l) = code - 1
        if (bits(l) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
      require(k == vals.length, s"DHT: ${vals.length} values for $k codes")
    }
  }

  /** Bit reader over the entropy-coded segment with 0xFF00 unstuffing;
    * stops AT markers (0xFF xx, xx != 0) for the caller to inspect. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "jpeg: entropy data truncated")
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "jpeg: truncated after 0xFF")
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed byte: data 0xFF
          else throw MarkerInData(m) // caller handles RST/EOI
        }
        acc = b
        nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def alignToByte(): Unit = nbits = 0
  }

  private final case class MarkerInData(marker: Int) extends RuntimeException

  private def huffDecode(r: BitReader, t: HuffTable): Int = {
    var code = r.bit()
    var l = 1
    while (code > t.maxCode(l)) {
      require(l < 16, "jpeg: corrupt Huffman stream (code > 16 bits)")
      code = (code << 1) | r.bit()
      l += 1
    }
    t.values(t.valPtr(l) + code - t.minCode(l)) & 0xff
  }

  /** T.81 F.2.2.1 EXTEND: v in [0, 2^s) → signed coefficient. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final class Comp(
      val id: Int, val h: Int, val v: Int, val tq: Int) {
    var td = 0
    var ta = 0
    var pred = 0
    var planeW = 0
    var planeH = 0
    var plane: Array[Int] = null
  }

  /** Decode a baseline JPEG. Returns the info and interleaved 8-bit
    * pixels: 1 byte/pixel grayscale or 3 bytes/pixel RGB. */
  def decode(bytes: Array[Byte]): (JpegInfo, Array[Byte]) = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "jpeg: missing SOI marker")
    var pos = 2
    val qt = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var width = 0
    var height = 0
    var restartInterval = 0

    def u16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)

    var out: Array[Byte] = null
    var hMax = 0
    var vMax = 0
    while (out == null) {
      require(pos + 1 < bytes.length, "jpeg: truncated before EOI")
      require((bytes(pos) & 0xff) == 0xff, f"jpeg: expected marker at $pos")
      // T.81 B.1.1.2: any number of 0xFF fill bytes may pad before the
      // marker code — skip them (real-world encoders emit them)
      while (pos + 1 < bytes.length && (bytes(pos + 1) & 0xff) == 0xff) pos += 1
      require(pos + 1 < bytes.length, "jpeg: truncated inside fill bytes")
      val marker = bytes(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd8 => // stray SOI — tolerate
        case 0xc0 => // SOF0 baseline
          val len = u16(pos)
          val prec = bytes(pos + 2) & 0xff
          require(prec == 8, s"jpeg: only 8-bit precision supported, got $prec")
          height = u16(pos + 3)
          width = u16(pos + 5)
          require(width > 0 && height > 0, "jpeg: zero frame dimension")
          val nc = bytes(pos + 7) & 0xff
          require(nc == 1 || nc == 3, s"jpeg: $nc components unsupported")
          comps = (0 until nc).map { i =>
            val o = pos + 8 + i * 3
            val hv = bytes(o + 1) & 0xff
            val c = new Comp(bytes(o) & 0xff, hv >> 4, hv & 0xf, bytes(o + 2) & 0xff)
            require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
              s"jpeg: sampling factor ${c.h}x${c.v} unsupported")
            c
          }.toArray
          pos += len
        case m if m == 0xc1 || m == 0xc2 || m == 0xc3 || (m >= 0xc5 && m <= 0xc7) ||
            (m >= 0xc9 && m <= 0xcb) || (m >= 0xcd && m <= 0xcf) =>
          throw new IllegalArgumentException(
            f"jpeg: non-baseline frame (SOF$m%02x) — only baseline SOF0 is supported")
        case 0xdb => // DQT
          val len = u16(pos)
          var o = pos + 2
          while (o < pos + len) {
            val pq = (bytes(o) & 0xff) >> 4
            val tq = bytes(o) & 0x0f
            require(pq <= 1, "jpeg: bad DQT precision")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(Zigzag(i)) =
                if (pq == 0) bytes(o + 1 + i) & 0xff else u16(o + 1 + 2 * i)
              i += 1
            }
            qt(tq) = t
            o += 1 + (if (pq == 0) 64 else 128)
          }
          pos += len
        case 0xc4 => // DHT
          val len = u16(pos)
          var o = pos + 2
          while (o < pos + len) {
            val tc = (bytes(o) & 0xff) >> 4
            val th = bytes(o) & 0x0f
            val bits = new Array[Int](17)
            var total = 0
            var i = 1
            while (i <= 16) { bits(i) = bytes(o + i) & 0xff; total += bits(i); i += 1 }
            val vals = new Array[Byte](total)
            System.arraycopy(bytes, o + 17, vals, 0, total)
            val tbl = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = tbl else acTables(th) = tbl
            o += 17 + total
          }
          pos += len
        case 0xdd => // DRI
          restartInterval = u16(pos + 2)
          pos += u16(pos)
        case 0xda => // SOS — decode the scan
          require(comps != null, "jpeg: SOS before SOF0")
          val len = u16(pos)
          val ns = bytes(pos + 2) & 0xff
          require(ns == comps.length, "jpeg: partial-scan files unsupported")
          var i = 0
          while (i < ns) {
            val cs = bytes(pos + 3 + 2 * i) & 0xff
            val c = comps.find(_.id == cs).getOrElse(
              throw new IllegalArgumentException(s"jpeg: SOS names unknown component $cs"))
            c.td = (bytes(pos + 4 + 2 * i) & 0xff) >> 4
            c.ta = bytes(pos + 4 + 2 * i) & 0x0f
            i += 1
          }
          pos += len
          out = decodeScan(bytes, pos, comps, qt, dcTables, acTables,
            width, height, restartInterval)
          hMax = comps.map(_.h).max
          vMax = comps.map(_.v).max
        case 0xd9 =>
          throw new IllegalArgumentException("jpeg: EOI before any scan")
        case m if m >= 0xe0 && m <= 0xef => pos += u16(pos) // APPn
        case 0xfe => pos += u16(pos) // COM
        case other =>
          throw new IllegalArgumentException(f"jpeg: unsupported marker FF$other%02x")
      }
    }
    (JpegInfo(width, height, comps.length, hMax, vMax, restartInterval), out)
  }

  private def decodeScan(
      bytes: Array[Byte], start: Int, comps: Array[Comp],
      qt: Array[Array[Int]], dcT: Array[HuffTable], acT: Array[HuffTable],
      width: Int, height: Int, restartInterval: Int): Array[Byte] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      require(qt(c.tq) != null, s"jpeg: component ${c.id} names missing DQT ${c.tq}")
      require(dcT(c.td) != null && acT(c.ta) != null,
        s"jpeg: component ${c.id} names missing DHT")
    }
    val r = new BitReader(bytes, start)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    // scratch for decodeBlock's nonzero-term IDCT (reused across blocks)
    val nzUV = new Array[Int](64)
    val nzK = new Array[Double](64)
    var mcu = 0
    var expectRst = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // between intervals an RSTn marker must appear; predictors reset
        r.alignToByte()
        require(r.pos + 1 < bytes.length && (bytes(r.pos) & 0xff) == 0xff,
          "jpeg: missing restart marker")
        val m = bytes(r.pos + 1) & 0xff
        require(m == 0xd0 + expectRst, f"jpeg: expected RST$expectRst, got FF$m%02x")
        r.pos += 2
        expectRst = (expectRst + 1) % 8
        comps.foreach(_.pred = 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      comps.foreach { c =>
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            try decodeBlock(r, c, qt(c.tq), dcT(c.td), acT(c.ta), coef, block, nzUV, nzK)
            catch {
              case MarkerInData(m) => throw new IllegalArgumentException(
                f"jpeg: marker FF$m%02x inside entropy data (truncated scan?)")
            }
            // place the 8×8 block into the component plane
            val px0 = (mx * c.h + bx) * 8
            val py0 = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                c.plane((py0 + yy) * c.planeW + (px0 + xx)) = block(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
      }
      mcu += 1
    }
    // color reconstruction
    val nc = comps.length
    val out = new Array[Byte](width * height * (if (nc == 1) 1 else 3))
    if (nc == 1) {
      val c = comps(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = clamp(c.plane(y * c.planeW + x)).toByte
          x += 1
        }
        y += 1
      }
    } else {
      val Array(cy, cb, cr) = comps
      // subsampled chroma upsamples with the TRIANGLE filter (bilinear
      // at half-pixel offsets — libjpeg's "fancy upsampling", what the
      // JDK decoder also does), not nearest-neighbor: visibly better on
      // edges and within rounding of other decoders on smooth content
      def sample(c: Comp, x: Int, y: Int): Double = {
        val fx = hMax / c.h
        val fy = vMax / c.v
        if (fx == 1 && fy == 1) c.plane(y * c.planeW + x).toDouble
        else {
          val validW = (width * c.h + hMax - 1) / hMax
          val validH = (height * c.v + vMax - 1) / vMax
          def axis(p: Int, f: Int, valid: Int): (Int, Int, Double) = {
            val u = (p + 0.5) / f - 0.5
            val i0 = math.floor(u).toInt
            val frac = u - i0
            (math.max(0, math.min(i0, valid - 1)),
              math.max(0, math.min(i0 + 1, valid - 1)), frac)
          }
          val (x0, x1, wx) = axis(x, fx, validW)
          val (y0, y1, wy) = axis(y, fy, validH)
          val p00 = c.plane(y0 * c.planeW + x0)
          val p10 = c.plane(y0 * c.planeW + x1)
          val p01 = c.plane(y1 * c.planeW + x0)
          val p11 = c.plane(y1 * c.planeW + x1)
          (p00 * (1 - wx) + p10 * wx) * (1 - wy) + (p01 * (1 - wx) + p11 * wx) * wy
        }
      }
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = cy.plane((y * cy.v / vMax) * cy.planeW + (x * cy.h / hMax)).toDouble
          val bv = sample(cb, x, y)
          val rv = sample(cr, x, y)
          val o = (y * width + x) * 3
          out(o) = clamp(math.round(yv + 1.402 * (rv - 128)).toInt).toByte
          out(o + 1) = clamp(math.round(
            yv - 0.344136 * (bv - 128) - 0.714136 * (rv - 128)).toInt).toByte
          out(o + 2) = clamp(math.round(yv + 1.772 * (bv - 128)).toInt).toByte
          x += 1
        }
        y += 1
      }
    }
    out
  }

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def decodeBlock(
      r: BitReader, c: Comp, q: Array[Int],
      dc: HuffTable, ac: HuffTable, coef: Array[Int], out: Array[Int],
      nzUV: Array[Int], nzK: Array[Double]): Unit = {
    java.util.Arrays.fill(coef, 0)
    val s = huffDecode(r, dc)
    require(s <= 11, "jpeg: DC category > 11")
    val diff = extend(r.bits(s), s)
    c.pred += diff
    coef(0) = c.pred * q(0)
    var k = 1
    while (k < 64) {
      val rs = huffDecode(r, ac)
      val run = rs >> 4
      val size = rs & 0xf
      if (size == 0) {
        if (run == 15) k += 16 // ZRL: sixteen zeros
        else k = 64 // EOB
      } else {
        k += run
        require(k < 64, "jpeg: AC index overflow (corrupt stream)")
        val zz = Zigzag(k)
        coef(zz) = extend(r.bits(size), size) * q(zz)
        k += 1
      }
    }
    // float IDCT (T.81 A.3.3), direct form. Quantized blocks are sparse
    // (often DC + a few ACs), so the nonzero (u, v) terms are collected
    // ONCE per block — in exactly the u-outer/v-inner order of the
    // reference double loop — with their cC(u)*cC(v)*coef prefix
    // products. Per pixel the sum then runs over nz terms (2 mults each)
    // instead of 64 slots (4 mults each). BIT-IDENTICAL to the reference
    // loop: same terms, same left-to-right multiply association
    // (((cC(u)*cC(v))*cuv)*Cos(u,x))*Cos(v,y), same accumulation order —
    // pinned by JpegIdctProbe's digest. A separable IDCT would be faster
    // still but reassociates the floats, which this fixture contract
    // cannot afford.
    var nz = 0
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        val cuv = coef(v * 8 + u)
        if (cuv != 0) {
          nzUV(nz) = u * 8 + v
          nzK(nz) = cC(u) * cC(v) * cuv
          nz += 1
        }
        v += 1
      }
      u += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var t = 0
        while (t < nz) {
          val uv = nzUV(t)
          sum += nzK(t) * CosTable((uv >> 3) * 8 + x) * CosTable((uv & 7) * 8 + y)
          t += 1
        }
        out(y * 8 + x) = clamp(math.round(sum / 4.0 + 128.0).toInt)
        x += 1
      }
      y += 1
    }
  }

  // ------------------------------------------------------------------
  // encoder (deterministic-fixture half; 4:4:4 / grayscale baseline)
  // ------------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) flushByte()
        i -= 1
      }
    }
    private def flushByte(): Unit = {
      out.write(acc & 0xff)
      if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
      acc = 0; nbits = 0
    }
    def pad(): Unit = if (nbits > 0) { // pad with 1s per T.81 F.1.2.3
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      nbits = 8
      flushByte()
    }
  }

  private def encHuff(bits: Array[Int], vals: Array[Byte]): (Array[Int], Array[Int]) = {
    val codeOf = new Array[Int](256)
    val sizeOf = new Array[Int](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) {
        codeOf(vals(k) & 0xff) = code
        sizeOf(vals(k) & 0xff) = l
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    (codeOf, sizeOf)
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode interleaved RGB (3 bytes/pixel) as baseline 4:4:4 JPEG with
    * the Annex K tables. Deterministic: same bytes in, same jpeg out. */
  def encodeRgb444(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "encodeRgb444: bad pixel buffer")
    val planes = Array.fill(3)(new Array[Double](width * height))
    var i = 0
    while (i < width * height) {
      val r = rgb(3 * i) & 0xff
      val g = rgb(3 * i + 1) & 0xff
      val b = rgb(3 * i + 2) & 0xff
      planes(0)(i) = 0.299 * r + 0.587 * g + 0.114 * b
      planes(1)(i) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
      planes(2)(i) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
      i += 1
    }
    encodePlanes(width, height, planes)
  }

  /** Encode a grayscale plane (1 byte/pixel) as a 1-component baseline
    * JPEG. */
  def encodeGray(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == width * height, "encodeGray: bad pixel buffer")
    encodePlanes(width, height, Array(gray.map(b => (b & 0xff).toDouble)))
  }

  private def encodePlanes(
      width: Int, height: Int, planes: Array[Array[Double]]): Array[Byte] = {
    val nc = planes.length
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { out.write(0xff); out.write(b) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    // DQT (both tables in zigzag order)
    def dqt(id: Int, t: Array[Int]): Unit = {
      m(0xdb); u16(2 + 1 + 64); out.write(id)
      var i = 0
      while (i < 64) { out.write(t(Zigzag(i))); i += 1 }
    }
    dqt(0, QLumA)
    if (nc == 3) dqt(1, QChrA)
    // SOF0
    m(0xc0); u16(8 + 3 * nc); out.write(8); u16(height); u16(width); out.write(nc)
    for (ci <- 0 until nc) {
      out.write(ci + 1); out.write(0x11); out.write(if (ci == 0) 0 else 1)
    }
    // DHT
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      m(0xc4); u16(2 + 1 + 16 + vals.length); out.write((tc << 4) | th)
      var i = 1
      while (i <= 16) { out.write(bits(i)); i += 1 }
      out.write(vals)
    }
    dht(0, 0, DcLumBits, DcLumVals); dht(1, 0, AcLumBits, AcLumVals)
    if (nc == 3) { dht(0, 1, DcChrBits, DcChrVals); dht(1, 1, AcChrBits, AcChrVals) }
    // SOS
    m(0xda); u16(6 + 2 * nc); out.write(nc)
    for (ci <- 0 until nc) {
      out.write(ci + 1); out.write(if (ci == 0) 0x00 else 0x11)
    }
    out.write(0); out.write(63); out.write(0)
    // entropy-coded data: interleaved 1×1 MCUs (4:4:4)
    val w = new BitWriter(out)
    val (dcLumC, dcLumS) = encHuff(DcLumBits, DcLumVals)
    val (acLumC, acLumS) = encHuff(AcLumBits, AcLumVals)
    val (dcChrC, dcChrS) = encHuff(DcChrBits, DcChrVals)
    val (acChrC, acChrS) = encHuff(AcChrBits, AcChrVals)
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    val pred = new Array[Int](nc)
    val blk = new Array[Double](64)
    val qcoef = new Array[Int](64)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var ci = 0
        while (ci < nc) {
          val plane = planes(ci)
          // gather with edge replication, level shift
          var y = 0
          while (y < 8) {
            val py = math.min(my * 8 + y, height - 1)
            var x = 0
            while (x < 8) {
              val px = math.min(mx * 8 + x, width - 1)
              blk(y * 8 + x) = plane(py * width + px) - 128.0
              x += 1
            }
            y += 1
          }
          // forward DCT + quantize
          val q = if (ci == 0) QLumA else QChrA
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              var sum = 0.0
              var x = 0
              while (x < 8) {
                var yy = 0
                while (yy < 8) {
                  sum += blk(yy * 8 + x) * CosTable(u * 8 + x) * CosTable(v * 8 + yy)
                  yy += 1
                }
                x += 1
              }
              val coefv = cC(u) * cC(v) * sum / 4.0
              qcoef(v * 8 + u) = math.round(coefv / q(v * 8 + u)).toInt
              v += 1
            }
            u += 1
          }
          // huffman-encode
          val (dcC, dcS) = if (ci == 0) (dcLumC, dcLumS) else (dcChrC, dcChrS)
          val (acC, acS) = if (ci == 0) (acLumC, acLumS) else (acChrC, acChrS)
          val dcv = qcoef(0)
          val diff = dcv - pred(ci)
          pred(ci) = dcv
          val s = category(diff)
          w.write(dcC(s), dcS(s))
          if (s > 0)
            w.write(if (diff < 0) diff + (1 << s) - 1 else diff, s)
          var k = 1
          var run = 0
          while (k < 64) {
            val v = qcoef(Zigzag(k))
            if (v == 0) run += 1
            else {
              while (run > 15) { w.write(acC(0xf0), acS(0xf0)); run -= 16 }
              val sz = category(v)
              val rs = (run << 4) | sz
              w.write(acC(rs), acS(rs))
              w.write(if (v < 0) v + (1 << sz) - 1 else v, sz)
              run = 0
            }
            k += 1
          }
          if (run > 0) w.write(acC(0x00), acS(0x00)) // EOB
          ci += 1
        }
        mx += 1
      }
      my += 1
    }
    w.pad()
    m(0xd9) // EOI
    out.toByteArray
  }
}
