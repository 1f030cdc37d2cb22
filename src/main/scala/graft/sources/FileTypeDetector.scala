package graft.sources

import java.io.{FileInputStream, IOException}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Content-detected input format (reference: core_processor.rs:14-37). */
sealed abstract class FileType(val displayName: String)
object FileType {
  case object Geopackage extends FileType("Geopackage")
  case object Shapefile  extends FileType("Shapefile")
  case object Geojson    extends FileType("GeoJSON")
  /** Beyond-reference: the reference's detection dispatches only the 6
    * types above, but GDAL's `st_read` would accept KML if fed it —
    * additive branch, never reachable by the ported decision-tree tests
    * (their inputs are magic-matched or '{'-prefixed or extension-matched). */
  case object Kml        extends FileType("KML")
  /** Beyond-reference like [[Kml]]: GDAL's `st_read` accepts GML; schema
    * resolves from the `.xsd` sidecar (GmlReader). */
  case object Gml        extends FileType("GML")
  case object Excel      extends FileType("Excel")
  case object Csv        extends FileType("CSV")
  case object Parquet    extends FileType("Parquet")
  /** Arrow IPC (beyond-reference like KML/GML): the columnar
    * interchange format training dataloaders exchange. */
  case object Arrow      extends FileType("Arrow")
  /** FlatGeobuf 3 (beyond-reference): GDAL's streaming-first geo
    * container beside gpkg/shapefile. */
  case object Flatgeobuf extends FileType("FlatGeobuf")
}

/** File-type detection: magic numbers, then content sniff, then extension —
  * the same decision tree as the reference (core_processor.rs:286-388),
  * kept a pure session-free function so it stays unit/property-testable
  * (reference exposes it `pub` for exactly that, tests/duckdb_tests.rs).
  *
  * Driver-side only: detection reads at most the file header plus (for the
  * GeoJSON sniff) the file body of a *local* staged file — never executor
  * data. At 100 TB the detected format fans out to a distributed
  * `spark.read`, so nothing here is on the data path.
  */
object FileTypeDetector {

  /** ≤150-byte header magic match → full-body GeoJSON sniff → `.csv`
    * extension fallback (reference: core_processor.rs:286-317). */
  def detect(filePath: String): Either[String, FileType] = {
    // A Spark-written parquet dataset is a DIRECTORY of part files; detect
    // on the first data file inside (the reference only ever saw single
    // files — this is the Spark-native generalization).
    val f = new java.io.File(filePath)
    if (f.isDirectory) {
      val children = Option(f.listFiles()).getOrElse(Array.empty)
        .filterNot(c => c.getName.startsWith("_") || c.getName.startsWith("."))
        .sortBy(_.getName)
      // no direct data file → recurse into the first partition directory
      // (partitionBy output holds only key=... subdirs + _SUCCESS)
      return children.find(_.isFile).orElse(children.find(_.isDirectory)) match {
        case Some(c) => detect(c.getPath)
        case None => Left(s"directory '$filePath' contains no data files")
      }
    }
    val header =
      try Using.resource(new FileInputStream(filePath)) { in =>
        val buf = new Array[Byte](150)
        val n = math.max(in.read(buf), 0)
        buf.take(n)
      } catch { case e: IOException => return Left(s"cannot read '$filePath': ${e.getMessage}") }

    matchMagicNumbers(header) match {
      case Some(ft) => Right(ft)
      case None =>
        // GeoJSON REQUIRES a '{' as the first non-whitespace char
        // (reference: core_processor.rs:378-380) — gate the full-body read
        // on a bounded 4 KB prefix so a multi-GB CSV is never slurped into
        // driver memory just to fall through to the extension fallback.
        // Same whitespace definition as detectGeoJson (Character
        // .isWhitespace covers U+2028 etc. that String.trim would miss).
        val prefix =
          try Using.resource(new FileInputStream(filePath)) { in =>
            val buf = new Array[Byte](4096)
            val n = math.max(in.read(buf), 0)
            new String(buf.take(n), StandardCharsets.UTF_8)
          } catch { case e: IOException => return Left(s"cannot read '$filePath': ${e.getMessage}") }
        val startsJsonObject =
          prefix.dropWhile(Character.isWhitespace).startsWith("{")
        val body =
          if (!startsJsonObject) Array.empty[Byte]
          else
            try Files.readAllBytes(Paths.get(filePath))
            catch { case e: IOException => return Left(s"cannot read '$filePath': ${e.getMessage}") }
        if (startsJsonObject && detectGeoJson(body)) Right(FileType.Geojson)
        // KML content sniff (beyond-reference, disjoint from the GeoJSON
        // gate: XML starts '<', never '{'): the root element `<kml` with
        // the OGC namespace inside the bounded 4 KB prefix. Tag match is
        // case-sensitive — XML element names are.
        else if (prefix.contains("<kml") &&
            prefix.contains("http://www.opengis.net/kml")) Right(FileType.Kml)
        // GML content sniff (beyond-reference, same additive rationale):
        // a gml-prefixed element plus the OGC GML namespace in the
        // bounded prefix. Ordered after KML — KML never declares the gml
        // namespace, so the branches are disjoint.
        else if (prefix.contains("<gml:") &&
            prefix.contains("http://www.opengis.net/gml")) Right(FileType.Gml)
        else {
          // Extension fallback for CSV (reference's own "hack", :305-314).
          val name = Paths.get(filePath).getFileName.toString
          val ext = name.lastIndexOf('.') match {
            case -1 => ""
            case i  => name.substring(i + 1).toLowerCase
          }
          if (ext == "csv") Right(FileType.Csv)
          else Left("Unknown or unsupported file type")
        }
    }
  }

  // The 13 xlsx member-name patterns vs 4 shapefile member-name patterns
  // searched inside a PKZip header window (core_processor.rs:324-340).
  private val ExcelPatterns: Seq[Array[Byte]] = Seq(
    "xl/worksheets", "xl/_rels", "docProps/", "[Content_Types]", "xl/workbook",
    "xl/styles", "xl/theme", "xl/strings", "xl/charts", "xl/drawings",
    "xl/sharedStrings", "xl/metadata", "xl/calc"
  ).map(_.getBytes(StandardCharsets.US_ASCII))

  private val ShapefilePatterns: Seq[Array[Byte]] =
    Seq(".shp", ".dbf", ".prj", ".shx").map(_.getBytes(StandardCharsets.US_ASCII))

  private val SqliteHeader: Array[Byte] =
    "SQLite format 3".getBytes(StandardCharsets.US_ASCII) :+ 0x00.toByte

  private def containsPattern(hay: Array[Byte], needle: Array[Byte]): Boolean = {
    if (needle.length > hay.length) return false
    var i = 0
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return true
      i += 1
    }
    false
  }

  private def startsWith(buf: Array[Byte], prefix: Array[Byte]): Boolean =
    buf.length >= prefix.length && java.util.Arrays.equals(buf.take(prefix.length), prefix)

  /** Byte-for-byte port of the magic-number decision tree
    * (core_processor.rs:319-371). PKZip containers disambiguate on member
    * names; an archive matching both Excel AND Shapefile patterns is
    * rejected (None), matching the reference's "both found" branch. */
  def matchMagicNumbers(buffer: Array[Byte]): Option[FileType] = buffer match {
    case b if startsWith(b, Array(0x50, 0x4B, 0x03, 0x04).map(_.toByte)) =>
      val rest = b.drop(4)
      val isExcel = ExcelPatterns.exists(containsPattern(rest, _))
      val isShape = ShapefilePatterns.exists(containsPattern(rest, _))
      (isExcel, isShape) match {
        case (true, false) => Some(FileType.Excel)
        case (false, true) => Some(FileType.Shapefile)
        case _             => None
      }
    case b if startsWith(b, Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)) =>
      Some(FileType.Excel) // legacy .xls, Compound File Binary Format
    case b if startsWith(b, "PAR1".getBytes(StandardCharsets.US_ASCII)) =>
      Some(FileType.Parquet)
    case b if startsWith(b, SqliteHeader) =>
      Some(FileType.Geopackage)
    // Arrow IPC, both encodings (additive branch, beyond the ported
    // decision tree — the reference never saw Arrow): the FILE format's
    // ARROW1 magic, or the STREAM format's IPC continuation marker
    // prefixing the schema message (every modern writer emits it).
    case b if startsWith(b, "ARROW1".getBytes(StandardCharsets.US_ASCII)) =>
      Some(FileType.Arrow)
    // Four 0xFF bytes alone are NOT unique to the IPC continuation
    // marker; require the 4-byte LE metadata length that must follow it
    // to be plausible — positive, 8-byte aligned (the encapsulated
    // message format pads the schema flatbuffer so the body starts on an
    // 8-byte boundary), and bounded — so unrelated binaries fall through
    // to content/extension dispatch instead of the Arrow reader.
    case b if startsWith(b, Array(0xFF, 0xFF, 0xFF, 0xFF).map(_.toByte)) &&
        b.length >= 8 && {
          val len = java.nio.ByteBuffer.wrap(b, 4, 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
          len > 0 && len % 8 == 0 && len < (1 << 30)
        } =>
      Some(FileType.Arrow)
    // FlatGeobuf 3 magic: fgb, version 3, fgb, patch 0 (additive branch
    // like Arrow/KML/GML — the reference never saw it)
    case b if startsWith(b, graft.sources.FlatGeobuf.Magic) =>
      Some(FileType.Flatgeobuf)
    case _ => None
  }

  /** GeoJSON content sniff (core_processor.rs:373-388): valid UTF-8, body
    * starts `{` after leading whitespace, and (lowercased) contains
    * `"type"` plus one of the three GeoJSON kind markers. */
  def detectGeoJson(buffer: Array[Byte]): Boolean = {
    val text =
      try {
        val dec = StandardCharsets.UTF_8.newDecoder()
        dec.decode(java.nio.ByteBuffer.wrap(buffer)).toString
      } catch { case _: java.nio.charset.CharacterCodingException => return false }
    val t = text.dropWhile(_.isWhitespace).toLowerCase
    t.startsWith("{") && t.contains("\"type\"") &&
      (t.contains("\"featurecollection\"") || t.contains("\"feature\"") || t.contains("\"geometry\""))
  }

  /** Strip everything from the last '.' and trim (core_processor.rs:87-94). */
  /** CFBF (legacy Office compound file) magic sniff — the one shared
    * check behind legacy-.xls routing (IngestPipeline) and XlsxReader's
    * early rejection. */
  def isCfbf(path: String): Boolean =
    scala.util.Try {
      Using.resource(new FileInputStream(path)) { in =>
        val b = new Array[Byte](4); in.read(b)
        b.sameElements(Array(0xD0, 0xCF, 0x11, 0xE0).map(_.toByte))
      }
    }.getOrElse(false)

  def cleanTableName(tableName: String): String = {
    val base = tableName.lastIndexOf('.') match {
      case -1 => tableName
      case i  => tableName.substring(0, i)
    }
    base.trim
  }

  /** First `.shp` member of a zip archive (core_processor.rs:270-283). */
  def findShapefilePath(zipPath: String): Either[String, String] =
    try Using.resource(new ZipFile(zipPath)) { zf =>
      zf.entries.asScala.map(_.getName).find(_.endsWith(".shp"))
        .toRight("No .shp file found in ZIP archive")
    } catch { case e: IOException => Left(s"cannot open zip '$zipPath': ${e.getMessage}") }
}
