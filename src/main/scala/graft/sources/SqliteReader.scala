package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal read-only SQLite file reader — just enough of the public SQLite
  * file format (sqlite.org/fileformat2.html) to enumerate tables and scan
  * table B-trees, which is all GeoPackage needs (SURVEY.md §7 hard-part
  * #1: no sqlite-jdbc offline).
  *
  * Supports: table B-tree leaf/interior pages, record serial types,
  * overflow-page chains (geometry blobs routinely spill), rowid
  * materialization for INTEGER PRIMARY KEY columns. Not supported (not
  * needed for reading a .gpkg): indexes, WAL, freelist reuse, WITHOUT
  * ROWID tables.
  *
  * The whole file is mapped into one byte array on the driver — .gpkg is
  * a single-file ingest container (same position as the zip readers; GDAL
  * reads it on one node too).
  */
final class SqliteReader(path: String) {

  private val bytes: Array[Byte] = Files.readAllBytes(Paths.get(path))
  require(bytes.length >= 100 &&
    new String(bytes.take(15), "US-ASCII") == "SQLite format 3",
    s"'$path' is not an SQLite database")

  private val pageSize: Int = {
    val raw = ((bytes(16) & 0xFF) << 8) | (bytes(17) & 0xFF)
    if (raw == 1) 65536 else raw
  }
  // the spec pins page size to a power of two in [512, 65536] and usable
  // size ≥ 480; a lying header outside that range would break every
  // offset computation below (a 0-byte page even stalls the overflow
  // walk) — corruption must fail HERE as a parse error
  require(pageSize >= 512 && pageSize <= 65536 && (pageSize & (pageSize - 1)) == 0,
    s"corrupt sqlite: page size $pageSize not a power of two in [512, 65536]")
  private val reserved: Int = bytes(20) & 0xFF
  private val usable: Int = pageSize - reserved
  require(usable >= 480, s"corrupt sqlite: usable page size $usable < 480")

  // ------------------------------------------------------------- varints

  /** (value, bytesConsumed) big-endian base-128; 9th byte uses all 8 bits. */
  private def varint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L; var i = 0
    while (i < 8) {
      val x = b(off + i) & 0xFF
      v = (v << 7) | (x & 0x7F)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b(off + 8) & 0xFF), 9)
  }

  // ------------------------------------------------------------- b-tree

  private def pageOffset(pageNo: Int): Int = (pageNo - 1) * pageSize

  /** Walk a table B-tree from `rootPage`, yielding (rowid, payload). */
  def scanTable(rootPage: Int): Seq[(Long, Array[Byte])] = {
    val out = Seq.newBuilder[(Long, Array[Byte])]
    val visited = scala.collection.mutable.Set[Int]()
    def walk(pageNo: Int): Unit = {
      // corrupt files can point pages at themselves/ancestors: without
      // this guard the recursion never terminates
      if (!visited.add(pageNo))
        throw new IllegalArgumentException(s"corrupt sqlite: page cycle at $pageNo")
      val base = pageOffset(pageNo)
      val hdr = base + (if (pageNo == 1) 100 else 0)
      val pageType = bytes(hdr) & 0xFF
      val nCells = (((bytes(hdr + 3) & 0xFF) << 8) | (bytes(hdr + 4) & 0xFF))
      pageType match {
        case 0x05 => // interior table page
          val ptrArray = hdr + 12
          for (i <- 0 until nCells) {
            val cellOff = base + ((((bytes(ptrArray + 2 * i) & 0xFF) << 8) |
              (bytes(ptrArray + 2 * i + 1) & 0xFF)))
            walk(ByteBuffer.wrap(bytes, cellOff, 4).order(ByteOrder.BIG_ENDIAN).getInt)
          }
          walk(ByteBuffer.wrap(bytes, hdr + 8, 4).order(ByteOrder.BIG_ENDIAN).getInt)
        case 0x0D => // leaf table page
          val ptrArray = hdr + 8
          for (i <- 0 until nCells) {
            val cellOff = base + ((((bytes(ptrArray + 2 * i) & 0xFF) << 8) |
              (bytes(ptrArray + 2 * i + 1) & 0xFF)))
            val (payloadLen, n1) = varint(bytes, cellOff)
            val (rowid, n2) = varint(bytes, cellOff + n1)
            out += ((rowid, readPayload(cellOff + n1 + n2, payloadLen.toInt)))
          }
        case other =>
          throw new IllegalStateException(s"unexpected page type 0x${other.toHexString} on page $pageNo")
      }
    }
    walk(rootPage)
    out.result()
  }

  /** Local bytes + overflow chain per the spec's spill formula. */
  private def readPayload(off: Int, total: Int): Array[Byte] = {
    // a payload cannot exceed the file that contains it: a lying
    // cell-length varint must fail here, before `new Array[Byte](total)`
    // turns it into a multi-GB allocation
    require(total >= 0 && total <= bytes.length,
      s"corrupt sqlite: payload length $total exceeds file size ${bytes.length}")
    val x = usable - 35
    if (total <= x) return bytes.slice(off, off + total)
    val m = ((usable - 12) * 32) / 255 - 23
    val k = m + ((total - m) % (usable - 4))
    val local = if (k <= x) k else m
    val out = new Array[Byte](total)
    System.arraycopy(bytes, off, out, 0, local)
    var want = total - local
    var dst = local
    var page = ByteBuffer.wrap(bytes, off + local, 4).order(ByteOrder.BIG_ENDIAN).getInt
    // each hop must deliver usable-4 bytes, so a well-formed chain has
    // at most total/(usable-4)+1 pages — a cyclic chain (corrupt next
    // pointers) would otherwise spin forever when its cycle length
    // divides the remaining byte count
    val maxHops = total / (usable - 4) + 2
    var hops = 0
    while (page != 0 && want > 0) {
      hops += 1
      require(hops <= maxHops,
        s"corrupt sqlite: overflow chain exceeds $maxHops pages (cycle?)")
      val pOff = pageOffset(page)
      val next = ByteBuffer.wrap(bytes, pOff, 4).order(ByteOrder.BIG_ENDIAN).getInt
      val chunk = math.min(want, usable - 4)
      System.arraycopy(bytes, pOff + 4, out, dst, chunk)
      dst += chunk; want -= chunk; page = next
    }
    out
  }

  // ------------------------------------------------------------- records

  /** Decode a record payload → column values (Long / Double / String /
    * Array[Byte] / null). */
  def decodeRecord(payload: Array[Byte]): IndexedSeq[Any] = {
    val (hdrLen, n0) = varint(payload, 0)
    var hoff = n0
    val serials = IndexedSeq.newBuilder[Long]
    while (hoff < hdrLen) {
      val (s, n) = varint(payload, hoff)
      serials += s; hoff += n
    }
    var doff = hdrLen.toInt
    serials.result().map { s =>
      val (value, size): (Any, Int) = s match {
        case 0 => (null, 0)
        case 1 => (payload(doff).toLong, 1)
        case 2 => (BigInt(payload.slice(doff, doff + 2)).toLong, 2)
        case 3 => (BigInt(payload.slice(doff, doff + 3)).toLong, 3)
        case 4 => (BigInt(payload.slice(doff, doff + 4)).toLong, 4)
        case 5 => (BigInt(payload.slice(doff, doff + 6)).toLong, 6)
        case 6 => (BigInt(payload.slice(doff, doff + 8)).toLong, 8)
        case 7 => (java.lang.Double.longBitsToDouble(
          ByteBuffer.wrap(payload, doff, 8).order(ByteOrder.BIG_ENDIAN).getLong), 8)
        case 8 => (0L, 0)
        case 9 => (1L, 0)
        case n if n >= 13 && n % 2 == 1 =>
          val len = ((n - 13) / 2).toInt
          (new String(payload, doff, len, "UTF-8"), len)
        case n if n >= 12 && n % 2 == 0 =>
          val len = ((n - 12) / 2).toInt
          (payload.slice(doff, doff + len), len)
        case n => throw new IllegalStateException(s"reserved serial type $n")
      }
      doff += size
      value
    }
  }

  // ------------------------------------------------------------ catalog

  final case class MasterRow(kind: String, name: String, tblName: String,
      rootPage: Int, sql: String)

  /** sqlite_master (root = page 1). */
  lazy val master: Seq[MasterRow] =
    scanTable(1).flatMap { case (_, payload) =>
      decodeRecord(payload) match {
        case IndexedSeq(t: String, name: String, tbl: String, root: Long, sql) =>
          Some(MasterRow(t, name, tbl, root.toInt,
            sql match { case s: String => s; case _ => "" }))
        case _ => None
      }
    }

  def tableRoot(name: String): Option[Int] =
    master.find(m => m.kind == "table" && m.name.equalsIgnoreCase(name)).map(_.rootPage)

  /** Column names in declaration order, from a light parse of the CREATE
    * TABLE text; flags which column is INTEGER PRIMARY KEY (its values are
    * stored as NULL and materialize from the rowid). */
  def tableColumns(name: String): Seq[(String, Boolean)] = {
    val sql = master.find(m => m.kind == "table" && m.name.equalsIgnoreCase(name))
      .map(_.sql).getOrElse(return Seq.empty)
    val open = sql.indexOf('(')
    val body = sql.substring(open + 1, sql.lastIndexOf(')'))
    // split on commas at nesting depth 0, OUTSIDE quoted identifiers and
    // string literals — `"station name" TEXT` or `DEFAULT 'a,b'` must not
    // split mid-token ('' / "" escapes stay inside their token)
    val parts = Seq.newBuilder[String]
    var depth = 0; var quote: Char = 0; val cur = new StringBuilder
    body.foreach { c =>
      if (quote != 0) {
        cur += c
        if (c == quote) quote = 0
      } else c match {
        case '"' | '\'' | '`' => quote = c; cur += c
        case '[' => quote = ']'; cur += c
        case '(' => depth += 1; cur += '('
        case ')' => depth -= 1; cur += ')'
        case ',' if depth == 0 => parts += cur.toString; cur.clear(): Unit
        case other => cur += other
      }
    }
    parts += cur.toString
    val all = parts.result().map(_.trim).filter(_.nonEmpty)
    def unquote(s: String): String =
      s.stripPrefix("\"").stripSuffix("\"").stripPrefix("`").stripSuffix("`")
        .stripPrefix("[").stripSuffix("]")
    // column name = first token, honoring quoted identifiers w/ spaces and
    // doubled-quote escapes ("my""col" → my"col)
    def colNameOf(colDef: String): String = colDef.headOption match {
      case Some(q @ ('"' | '`' | '\'')) =>
        val sb = new StringBuilder; var i = 1; var closed = false
        while (i < colDef.length && !closed) {
          if (colDef(i) == q) {
            if (i + 1 < colDef.length && colDef(i + 1) == q) { sb += q; i += 2 }
            else closed = true
          } else { sb += colDef(i); i += 1 }
        }
        if (closed) sb.toString else unquote(colDef)
      case Some('[') =>
        val end = colDef.indexOf(']', 1)
        if (end > 0) colDef.substring(1, end) else unquote(colDef)
      case _ => colDef.takeWhile(c => !c.isWhitespace)
    }
    // a single-column table-level `PRIMARY KEY(col)` on an INTEGER column
    // also aliases rowid (values stored NULL), same as the inline form
    val tablePk: Option[String] = all
      .find(p => p.toUpperCase.replaceAll("^CONSTRAINT\\s+\\S+\\s+", "")
        .matches("(?s)PRIMARY\\s*KEY\\s*\\(.*"))
      .flatMap { p =>
        val inner = p.substring(p.indexOf('(') + 1, p.lastIndexOf(')'))
        inner.split(',').map(c => unquote(c.trim)).toList match {
          case one :: Nil => Some(one)
          case _ => None // composite PK never aliases rowid
        }
      }
    all
      .filterNot(p => Seq("PRIMARY", "FOREIGN", "UNIQUE", "CHECK", "CONSTRAINT")
        .exists(k => p.toUpperCase.startsWith(k + " ") || p.toUpperCase.startsWith(k + "(")))
      .map { colDef =>
        val colName = colNameOf(colDef)
        val upperDef = colDef.toUpperCase
        val isAlias = upperDef.contains("INTEGER PRIMARY KEY") ||
          (tablePk.exists(_.equalsIgnoreCase(colName)) && upperDef.contains("INTEGER"))
        (colName, isAlias)
      }
  }

  /** Full table scan → (columnNames, rows) with rowid substituted for the
    * INTEGER PRIMARY KEY column. */
  def readTable(name: String): (Seq[String], Seq[IndexedSeq[Any]]) = {
    val root = tableRoot(name)
      .getOrElse(throw new IllegalArgumentException(s"no such table '$name'"))
    val cols = tableColumns(name)
    val pkIdx = cols.indexWhere(_._2)
    val rows = scanTable(root).map { case (rowid, payload) =>
      val rec = decodeRecord(payload)
      val padded = rec.padTo(cols.length, null) // ALTER TABLE ADD COLUMN tail
      if (pkIdx >= 0 && (pkIdx >= padded.length || padded(pkIdx) == null))
        padded.updated(pkIdx, rowid)
      else padded
    }
    (cols.map(_._1), rows)
  }
}
