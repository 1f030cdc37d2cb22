package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory, LinearRing, Polygon}

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Zipped-shapefile → DataFrame, replacing the reference's
  * `st_read('/vsizip/<zip>/<shp>')` CTAS (core_processor.rs:399-406).
  * Parses the `.shp` main file (geometry; public ESRI shapefile
  * whitepaper) and the sibling `.dbf` (attributes; dBase III spec) from
  * inside the zip, joins them positionally (record i ↔ row i), and emits
  * attributes + a `geom` WKB BinaryType column (discoverable by
  * SchemaHeuristics' BLOB-named-geom arm).
  *
  * Parsing happens on the driver — a zip is a single compressed stream, so
  * there is no split to distribute (GDAL's vsizip is equally sequential);
  * the DataFrame that results distributes normally. Z/M variants are read
  * and flattened to 2D, matching the pipeline-wide ST_Force2D.
  */
object ShapefileReader {

  def read(spark: SparkSession, zipPath: String): DataFrame = {
    val (schema, data) = parsed(zipPath)
    val rows = data.map(Row.fromSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 50000)), schema)
  }

  /** Container parse shared by the driver-side [[read]] and the DSv2
    * executor-side partition reader ([[ShpZipSource]]) — on an executor
    * this moves the whole zip+shp+dbf walk off the driver, making
    * many-archive ingest scan-task parallel. */
  def parsed(zipPath: String): (StructType, Seq[Seq[Any]]) = {
    val shpName = FileTypeDetector.findShapefilePath(zipPath)
      .fold(e => throw new IllegalArgumentException(e), identity)
    val dbfName = shpName.replaceAll("\\.shp$", ".dbf")

    Using.resource(new ZipFile(zipPath)) { zf =>
      def bytesOf(name: String): Option[Array[Byte]] =
        Option(zf.getEntry(name)).map(e => zf.getInputStream(e).readAllBytes())

      val geoms = parseShp(bytesOf(shpName)
        .getOrElse(throw new IllegalArgumentException(s"zip member '$shpName' unreadable")))
      val (fields, attrs) = bytesOf(dbfName) match {
        case Some(b) => parseDbf(b)
        case None    => (Seq.empty[StructField],
          Seq.fill(geoms.length)(Some(Seq.empty[Any]): Option[Seq[Any]]))
      }

      val schema = StructType(fields :+ StructField("geom", BinaryType))
      // .dbf record slots align positionally with .shp records; a deleted
      // ('*') slot keeps its position (None) and drops the WHOLE feature,
      // so later features keep their own attributes
      val rows = geoms.zipWithIndex.flatMap { case (g, i) =>
        val slot: Option[Seq[Any]] =
          if (i < attrs.length) attrs(i) else Some(Seq.fill(fields.length)(null))
        slot.map(a => a :+ g.map(graft.functions.GeoFunctions.toWkb).orNull)
      }
      (schema, rows)
    }
  }

  // ------------------------------------------------------------------ .shp

  private val gf = new GeometryFactory()

  /** Main-file walk: 100-byte header, then (8-byte BE record header +
    * little-endian shape record)*. Returns one Option[Geometry] per record
    * (None = null shape, type 0). */
  def parseShp(bytes: Array[Byte]): Seq[Option[Geometry]] = {
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994, "not a shapefile: bad file code")
    val fileLenBytes = buf.getInt(24).toLong * 2
    var pos = 100L
    val out = Seq.newBuilder[Option[Geometry]]
    while (pos + 8 <= math.min(fileLenBytes, bytes.length)) {
      val contentLenBytes = buf.getInt(pos.toInt + 4) * 2
      val rec = ByteBuffer.wrap(bytes, pos.toInt + 8, contentLenBytes)
        .order(ByteOrder.LITTLE_ENDIAN)
      out += parseRecord(rec)
      pos += 8 + contentLenBytes
    }
    out.result()
  }

  private def parseRecord(b: ByteBuffer): Option[Geometry] = {
    val shapeType = b.getInt
    shapeType match {
      case 0 => None
      case 1 | 11 | 21 => // Point / PointZ / PointM — XY first, extras ignored
        Some(gf.createPoint(new Coordinate(b.getDouble, b.getDouble)))
      case 8 | 18 | 28 => // MultiPoint family: box, n, points
        skip(b, 32)
        val n = checkedCount(b, "nPoints", 16)
        Some(gf.createMultiPointFromCoords(Array.fill(n)(new Coordinate(b.getDouble, b.getDouble))))
      case 3 | 13 | 23 => // PolyLine family: box, nParts, nPoints, parts, points
        val (parts, pts) = partsAndPoints(b)
        val lines = sliceParts(parts, pts).map(gf.createLineString)
        Some(if (lines.length == 1) lines.head else gf.createMultiLineString(lines.toArray))
      case 5 | 15 | 25 => // Polygon family — rings CW=shell, CCW=hole
        val (parts, pts) = partsAndPoints(b)
        Some(assemblePolygons(sliceParts(parts, pts)))
      case other =>
        throw new IllegalArgumentException(s"unsupported shape type $other")
    }
  }

  private def skip(b: ByteBuffer, n: Int): Unit = b.position(b.position() + n)

  /** Reads a declared element count and bounds it by the bytes actually
    * present: a lying header (a corrupt or hostile container declaring
    * 2^31 points in a 1 KB record) must fail as a parse error BEFORE the
    * `Array.fill` allocates by the declared count — an OutOfMemoryError
    * is not a controlled failure. */
  private def checkedCount(b: ByteBuffer, what: String, bytesPer: Int): Int = {
    val n = b.getInt
    require(n >= 0 && n.toLong * bytesPer <= b.remaining(),
      s"corrupt shapefile: declared $what=$n needs ${n.toLong * bytesPer} bytes, " +
        s"record has ${b.remaining()}")
    n
  }

  private def partsAndPoints(b: ByteBuffer): (Array[Int], Array[Coordinate]) = {
    skip(b, 32) // bounding box
    val nParts = checkedCount(b, "nParts", 4)
    // nPoints is declared before the parts array is consumed, so the
    // bound must cover both regions that follow it
    val nPoints = {
      val n = b.getInt
      require(n >= 0 && nParts.toLong * 4 + n.toLong * 16 <= b.remaining(),
        s"corrupt shapefile: declared nPoints=$n + nParts=$nParts exceed " +
          s"record's ${b.remaining()} bytes")
      n
    }
    val parts = Array.fill(nParts)(b.getInt)
    val pts = Array.fill(nPoints)(new Coordinate(b.getDouble, b.getDouble))
    (parts, pts)
  }

  private def sliceParts(parts: Array[Int], pts: Array[Coordinate]): Seq[Array[Coordinate]] =
    parts.indices.map { i =>
      val end = if (i + 1 < parts.length) parts(i + 1) else pts.length
      pts.slice(parts(i), end)
    }

  /** Shapefile ring convention: clockwise = shell, counter-clockwise =
    * hole; holes belong to the shell that contains them. */
  private[graft] def assemblePolygons(rings: Seq[Array[Coordinate]]): Geometry = {
    val closed = rings.filter(_.length >= 4).map(gf.createLinearRing)
    val (shells, holes) = closed.partition(r => !Orientation.isCCW(r.getCoordinateSequence))
    if (shells.isEmpty)
      return if (closed.isEmpty) gf.createPolygon()
      else gf.createPolygon(closed.head) // degenerate: treat lone CCW ring as shell
    // covers(), not contains(): a hole may legally TOUCH its shell at the
    // probe vertex (contains() is false on the boundary and would drop the
    // hole, silently filling it). With nested shells, each hole goes to
    // the SMALLEST covering shell — the innermost one it punches.
    val shellPolys = shells.map(s => (s, gf.createPolygon(s)))
    val assignment: Map[Int, Seq[org.locationtech.jts.geom.LinearRing]] =
      holes.flatMap { h =>
        val p = gf.createPoint(h.getCoordinateN(0))
        val covering = shellPolys.zipWithIndex.filter(_._1._2.covers(p))
        if (covering.isEmpty) None
        else Some(covering.minBy(_._1._2.getArea)._2 -> h)
      }.groupBy(_._1).map { case (i, hs) => i -> hs.map(_._2) }
    val polys: Seq[Polygon] = shellPolys.zipWithIndex.map { case ((shell, _), i) =>
      gf.createPolygon(shell, assignment.getOrElse(i, Seq.empty).toArray)
    }
    if (polys.length == 1) polys.head else gf.createMultiPolygon(polys.toArray)
  }

  // ------------------------------------------------------------------ .dbf

  /** dBase III table: header (record count, sizes), 32-byte field
    * descriptors to 0x0D, then fixed-width records. Returns one entry per
    * record slot; a deleted record ('*' flag) is None, preserving the
    * positional alignment with .shp records. */
  def parseDbf(bytes: Array[Byte]): (Seq[StructField], Seq[Option[Seq[Any]]]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRecords = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xFFFF
    val recordSize = buf.getShort(10) & 0xFFFF

    final case class DbfField(name: String, ftype: Char, len: Int, dec: Int)
    val fields = Iterator.from(0)
      .map(i => 32 + i * 32)
      .takeWhile(off => off + 32 <= headerSize && bytes(off) != 0x0D)
      .map { off =>
        val nameBytes = bytes.slice(off, off + 11).takeWhile(_ != 0)
        DbfField(new String(nameBytes, "US-ASCII").trim, bytes(off + 11).toChar,
          bytes(off + 16) & 0xFF, bytes(off + 17) & 0xFF)
      }.toSeq

    val structFields = fields.map { f =>
      val t = f.ftype match {
        case 'N' if f.dec == 0 && f.len < 19 => LongType
        case 'N' | 'F' => DoubleType
        case 'L' => BooleanType
        case 'D' => DateType
        case _ => StringType
      }
      StructField(f.name, t)
    }

    // one entry per record SLOT (deleted → None) so the caller's positional
    // geometry pairing never shifts
    val rows = (0 until nRecords).map { r =>
      val base = headerSize + r * recordSize
      if (base + recordSize > bytes.length || bytes(base) == '*') None
      else {
        var off = base + 1
        Some(fields.map { f =>
          val raw = new String(bytes.slice(off, off + f.len), "ISO-8859-1").trim
          off += f.len
          if (raw.isEmpty) null
          else f.ftype match {
            case 'N' if f.dec == 0 && f.len < 19 =>
              raw.toLongOption.map(Long.box).orNull
            case 'N' | 'F' => raw.toDoubleOption.map(Double.box).orNull
            case 'L' => "YyTt".contains(raw.head)
            case 'D' => scala.util.Try(java.sql.Date.valueOf(
              s"${raw.take(4)}-${raw.slice(4, 6)}-${raw.slice(6, 8)}")).getOrElse(null)
            case _ => raw
          }
        })
      }
    }
    (structFields, rows)
  }
}
