package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Legacy `.xls` (BIFF8 inside a CFBF compound file) → DataFrame.
  *
  * The reference DETECTS legacy Excel (CFBF magic, core_processor.rs:362)
  * but its `read_xlsx()` cannot actually read one — this reader goes
  * beyond parity so ingest genuinely covers both Excel generations. Scope
  * is the common cell surface of real-world simple workbooks: the first
  * worksheet, shared strings (LABELSST), inline labels, NUMBER/RK/MULRK
  * numerics, BOOLERR booleans, and blanks. Formulas contribute their
  * cached numeric value when present.
  *
  * Both formats converge on the same (header row + string cells) shape
  * that [[XlsxReader]] produces, so everything downstream (schema
  * inference, coordinate-pair discovery) is shared.
  */
object XlsReader {

  def read(spark: SparkSession, path: String): DataFrame = {
    val (header, rows) = parse(path)
    XlsxReader.toDataFrame(spark, header, rows)
  }

  /** Raw cells in the XlsxReader shape: header row + data rows. */
  def parse(path: String): (Seq[String], Seq[Array[Option[String]]]) = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val wb = Cfb.stream(bytes, Set("Workbook", "Book"))
      .getOrElse(throw new IllegalArgumentException(
        s"'$path' has no Workbook stream — not a BIFF workbook"))
    val cells = Biff8.cells(wb)
    if (cells.isEmpty) return (Seq.empty, Seq.empty)
    val byRow = cells.groupBy(_._1)
    val rowIds = byRow.keys.toSeq.sorted
    val width = cells.iterator.map(_._2).max + 1
    def rowArr(r: Int): Array[Option[String]] = {
      val m = byRow(r).map(c => c._2 -> c._3).toMap
      Array.tabulate(width)(i => m.get(i))
    }
    val header = rowArr(rowIds.head).zipWithIndex
      .map { case (v, i) => v.getOrElse(s"col$i") }.toSeq
    (header, rowIds.tail.map(rowArr))
  }

  // ------------------------------------------------- CFBF compound file

  /** Minimal read-only CFBF (MS-CFB) walker: header → FAT (DIFAT in the
    * header, first 109 entries) → directory chain → stream by name, with
    * mini-stream (MiniFAT) support for streams under the 4096 cutoff. */
  private object Cfb {
    private val FreeSect = -1
    private val EndOfChain = -2

    def stream(bytes: Array[Byte], names: Set[String]): Option[Array[Byte]] = {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(buf.getLong(0) == 0xE11AB1A1E011CFD0L, "not a CFBF container")
      val sectorShift = buf.getShort(30).toInt     // usually 9 → 512
      val miniShift = buf.getShort(32).toInt       // usually 6 → 64
      // spec values are 9/12 and 6; a lying header declaring shift 30
      // would make the FAT materialization below allocate by 1 GB
      // sectors — bound both so corruption fails as a parse error, not
      // an OutOfMemoryError
      require(sectorShift >= 7 && sectorShift <= 16,
        s"corrupt CFBF: sector shift $sectorShift outside [7,16]")
      require(miniShift >= 2 && miniShift <= sectorShift,
        s"corrupt CFBF: mini shift $miniShift outside [2,$sectorShift]")
      val sectorSize = 1 << sectorShift
      val miniSize = 1 << miniShift
      val nFat = buf.getInt(44)
      val firstDir = buf.getInt(48)
      val miniCutoff = buf.getInt(56)
      val firstMiniFat = buf.getInt(60)
      val nMiniFat = buf.getInt(64)

      def sectorAt(i: Int): Array[Byte] = {
        val off = (i + 1) * sectorSize
        bytes.slice(off, off + sectorSize)
      }
      // FAT from the header DIFAT (109 entries — plenty for test/real
      // small files; DIFAT overflow sectors are out of scope)
      val fatSectors = (0 until math.min(nFat, 109)).map(i => buf.getInt(76 + 4 * i))
      val fat: Array[Int] = fatSectors.flatMap { s =>
        val b = ByteBuffer.wrap(sectorAt(s)).order(ByteOrder.LITTLE_ENDIAN)
        Array.fill(sectorSize / 4)(b.getInt)
      }.toArray

      def chain(start: Int): Seq[Int] = {
        val out = Seq.newBuilder[Int]
        var s = start; var guard = 0
        while (s != EndOfChain && s != FreeSect && s >= 0 && guard < fat.length + 1) {
          if (s >= fat.length)
            throw new IllegalArgumentException(
              s"corrupt CFBF: sector $s beyond FAT (${fat.length} entries; " +
                "files needing DIFAT-overflow FATs, ~7 MB+, are unsupported)")
          out += s; s = fat(s); guard += 1
        }
        out.result()
      }

      val dirBytes = chain(firstDir).flatMap(sectorAt).toArray
      final case class Entry(name: String, objType: Int, start: Int, size: Long)
      val entries = (0 until dirBytes.length / 128).map { i =>
        val e = ByteBuffer.wrap(dirBytes, i * 128, 128).order(ByteOrder.LITTLE_ENDIAN)
        val nameLen = e.getShort(i * 128 + 64) & 0xFFFF
        val name =
          if (nameLen >= 2)
            new String(dirBytes, i * 128, nameLen - 2, "UTF-16LE")
          else ""
        Entry(name, dirBytes(i * 128 + 66) & 0xFF,
          e.getInt(i * 128 + 116), e.getLong(i * 128 + 120) & 0xFFFFFFFFL)
      }

      entries.find(en => en.objType == 2 && names.contains(en.name)).map { en =>
        if (en.size >= miniCutoff)
          chain(en.start).flatMap(sectorAt).toArray.take(en.size.toInt)
        else {
          // mini stream: sectors of the ROOT entry's chain, diced by MiniFAT
          val root = entries.find(_.objType == 5).getOrElse(
            throw new IllegalArgumentException("CFBF has no root entry"))
          val miniStream = chain(root.start).flatMap(sectorAt).toArray
          val miniFat: Array[Int] =
            if (nMiniFat == 0) Array.empty
            else {
              val mfBytes = chain(firstMiniFat).flatMap(sectorAt).toArray
              val b = ByteBuffer.wrap(mfBytes).order(ByteOrder.LITTLE_ENDIAN)
              Array.fill(mfBytes.length / 4)(b.getInt)
            }
          val out = Array.newBuilder[Byte]
          var s = en.start; var guard = 0
          while (s != EndOfChain && s != FreeSect && s >= 0 && guard < miniFat.length + 1) {
            if (s >= miniFat.length)
              throw new IllegalArgumentException(
                s"corrupt CFBF: mini sector $s beyond MiniFAT (${miniFat.length})")
            out ++= miniStream.slice(s * miniSize, (s + 1) * miniSize)
            s = miniFat(s); guard += 1
          }
          out.result().take(en.size.toInt)
        }
      }
    }
  }

  // ----------------------------------------------------- BIFF8 records

  private object Biff8 {
    // record ids
    private val BOF = 0x0809
    private val EOF = 0x000A
    private val SST = 0x00FC
    private val CONTINUE = 0x003C
    private val LABELSST = 0x00FD
    private val LABEL = 0x0204
    private val NUMBER = 0x0203
    private val RK = 0x027E
    private val MULRK = 0x00BD
    private val BOOLERR = 0x0205
    private val FORMULA = 0x0006

    /** (row, col, value) for every populated cell of the first WORKSHEET
      * substream (chart/macro substreams are skipped by their BOF dt). */
    def cells(wb: Array[Byte]): Seq[(Int, Int, String)] = {
      val buf = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
      var pos = 0
      var sst = IndexedSeq.empty[String]
      var inSheet = false
      var bofDepth = 0
      val out = Seq.newBuilder[(Int, Int, String)]

      while (pos + 4 <= wb.length) {
        val id = buf.getShort(pos) & 0xFFFF
        val len = buf.getShort(pos + 2) & 0xFFFF
        if (id == 0) pos = wb.length // zero padding: stop
        else {
          val body = pos + 4
          id match {
            case BOF =>
              val vers = buf.getShort(body) & 0xFFFF
              val dt = buf.getShort(body + 2) & 0xFFFF
              if (bofDepth == 0 && vers != 0x0600)
                throw new IllegalArgumentException(
                  f"BIFF version 0x$vers%04X is not BIFF8 — pre-Excel-97 " +
                    "(BIFF5/7) workbooks are unsupported; re-save in a newer format")
              bofDepth += 1
              if (bofDepth >= 2 && dt == 0x0010) inSheet = true // worksheet only
            case EOF =>
              if (inSheet) { pos = wb.length } // done with the first worksheet
            case SST if bofDepth == 1 =>
              sst = readSst(wb, pos)
            case LABELSST if inSheet =>
              val r = buf.getShort(body) & 0xFFFF
              val c = buf.getShort(body + 2) & 0xFFFF
              val idx = buf.getInt(body + 6)
              sst.lift(idx).foreach(v => out += ((r, c, v)))
            case LABEL if inSheet =>
              val r = buf.getShort(body) & 0xFFFF
              val c = buf.getShort(body + 2) & 0xFFFF
              out += ((r, c, readUnicodeString(wb, body + 6)._1))
            case NUMBER if inSheet =>
              val r = buf.getShort(body) & 0xFFFF
              val c = buf.getShort(body + 2) & 0xFFFF
              out += ((r, c, fmtNum(buf.getDouble(body + 6))))
            case FORMULA if inSheet =>
              val r = buf.getShort(body) & 0xFFFF
              val c = buf.getShort(body + 2) & 0xFFFF
              // cached result: a real double unless the last 2 bytes are FFFF
              if ((buf.getShort(body + 12) & 0xFFFF) != 0xFFFF)
                out += ((r, c, fmtNum(buf.getDouble(body + 6))))
            case RK if inSheet =>
              val r = buf.getShort(body) & 0xFFFF
              val c = buf.getShort(body + 2) & 0xFFFF
              out += ((r, c, fmtNum(decodeRk(buf.getInt(body + 6)))))
            case MULRK if inSheet =>
              val r = buf.getShort(body) & 0xFFFF
              val cFirst = buf.getShort(body + 2) & 0xFFFF
              val nCells = (len - 6) / 6
              for (i <- 0 until nCells)
                out += ((r, cFirst + i, fmtNum(decodeRk(buf.getInt(body + 4 + 6 * i + 2)))))
            case BOOLERR if inSheet =>
              val r = buf.getShort(body) & 0xFFFF
              val c = buf.getShort(body + 2) & 0xFFFF
              if ((wb(body + 7) & 0xFF) == 0) // fError=0 → boolean
                out += ((r, c, if (wb(body + 6) != 0) "true" else "false"))
            case _ => ()
          }
          if (pos < wb.length) pos = body + len
        }
      }
      out.result()
    }

    /** SST: total(4) unique(4) then unique XLUnicodeRichExtendedStrings;
      * strings may continue into CONTINUE records, restating the option
      * byte at each boundary. */
    private def readSst(wb: Array[Byte], recPos: Int): IndexedSeq[String] = {
      val buf = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
      // bounds of this record + its CONTINUEs: list of (bodyStart, bodyEnd)
      var segs = List.newBuilder[(Int, Int)]
      var p = recPos
      var first = true
      while (p + 4 <= wb.length) {
        val id = buf.getShort(p) & 0xFFFF
        val len = buf.getShort(p + 2) & 0xFFFF
        if (first && id == SST) { segs += ((p + 4, p + 4 + len)); first = false; p = p + 4 + len }
        else if (!first && id == CONTINUE) { segs += ((p + 4, p + 4 + len)); p = p + 4 + len }
        else p = wb.length
      }
      val segments = segs.result()
      var (segIdx, cur) = (0, segments.head._1)
      def remaining: Int = segments(segIdx)._2 - cur
      def nextSeg(): Unit = {
        if (segIdx + 1 >= segments.length)
          throw new IllegalArgumentException(
            "corrupt SST: declared string count exceeds record data")
        segIdx += 1; cur = segments(segIdx)._1
      }
      def u8(): Int = { if (remaining == 0) nextSeg(); val v = wb(cur) & 0xFF; cur += 1; v }
      def u16(): Int = u8() | (u8() << 8)
      def u32(): Int = u16() | (u16() << 16)

      val nUnique = { u32(); u32() } // skip total, read unique
      (0 until nUnique).map { _ =>
        val charCount = u16()
        var grbit = u8()
        val richRuns = if ((grbit & 0x08) != 0) u16() else 0
        val extSize = if ((grbit & 0x04) != 0) u32() else 0
        val sb = new StringBuilder
        var read = 0
        while (read < charCount) {
          if (remaining == 0) { nextSeg(); grbit = u8() } // boundary restates grbit
          if ((grbit & 0x01) != 0) sb += u16().toChar
          else sb += u8().toChar
          read += 1
        }
        // skip rich-text runs (4 bytes each) + extended data
        var skip = richRuns * 4 + extSize
        while (skip > 0) { u8(); skip -= 1 }
        sb.toString
      }
    }

    /** XLUnicodeRichExtendedString at offset:
      * cch(2) grbit(1) [cRun(2) if rich] [cbExt(4) if ext] chars … */
    private def readUnicodeString(wb: Array[Byte], off: Int): (String, Int) = {
      val buf = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
      val cch = buf.getShort(off) & 0xFFFF
      val grbit = wb(off + 2) & 0xFF
      var p = off + 3
      if ((grbit & 0x08) != 0) p += 2 // rich-run count header
      if ((grbit & 0x04) != 0) p += 4 // extended (phonetic) size header
      if ((grbit & 0x01) != 0)
        (new String(wb, p, cch * 2, "UTF-16LE"), p - off + cch * 2)
      else
        (new String(wb, p, cch, "ISO-8859-1"), p - off + cch)
    }

    /** RK number: bit0 = ÷100, bit1 = 30-bit int vs high-30-bits double. */
    private def decodeRk(rk: Int): Double = {
      val base =
        if ((rk & 0x02) != 0) (rk >> 2).toDouble
        else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
      if ((rk & 0x01) != 0) base / 100.0 else base
    }

    /** Same textual shape the xlsx path yields ("1" not "1.0"). */
    private def fmtNum(d: Double): String =
      if (d == math.rint(d) && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
  }
}
