package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Single-file writers for the ingest formats the readers parse —
  * GeoJSON (RFC 7946), xlsx (ECMA-376 minimal), zipped ESRI shapefile,
  * and GeoPackage (OGC spec on a from-scratch SQLite file, the write-side
  * twin of [[SqliteReader]]).
  *
  * Primary role: generate deterministic reader-oracle fixtures from
  * corpus rows at query time (ReaderQueries), which makes every custom
  * binary reader verifiable against DuckDB SQL that composes the same
  * rows. Each call emits ONE container — single-file by format, no split
  * to distribute — but the caller decides where it runs: fixture
  * composers invoke these on the driver, while the DSv2 write half
  * ([[ContainerWriteSupport]]) invokes them INSIDE write tasks, one
  * container per partition on the executors.
  */
object FormatWriters {

  /** (key, name, x, y) rows → FeatureCollection of Points with two
    * properties. Keys/coords emitted as JSON numbers. */
  def writeGeoJson(path: String, rows: Seq[(Long, String, Double, Double)],
      keyName: String, nameName: String): Unit = {
    def num(d: Double): String = {
      // literal NaN/Infinity tokens are not JSON (RFC 8259): fail at the
      // writer with a pointable error, not at the reader with an opaque one
      require(!d.isNaN && !d.isInfinite, s"non-finite coordinate $d")
      // only take the integer form while toLong is exact (cf. XlsReader's
      // guard) — 1e19 must print as 1.0E19, not clamp to Long.MaxValue
      if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString
    }
    val features = rows.map { case (k, n, x, y) =>
      s"""{"type":"Feature","geometry":{"type":"Point","coordinates":[${num(x)},${num(y)}]},""" +
        s""""properties":{"$keyName":$k,"$nameName":${jsonString(n)}}}"""
    }
    val body = s"""{"type":"FeatureCollection","features":[${features.mkString(",")}]}"""
    Files.write(Paths.get(path), body.getBytes(UTF_8)): Unit
  }

  /** (key, name, region) rows → one JSON object per line (JSON Lines —
    * the de-facto interchange format of LLM training corpora). */
  def writeJsonl(path: String, rows: Seq[(Long, String, Long)],
      keyName: String, nameName: String, regionName: String): Unit = {
    val body = rows.map { case (k, n, r) =>
      s"""{"$keyName":$k,"$nameName":${jsonString(n)},"$regionName":$r}"""
    }.mkString("\n")
    Files.write(Paths.get(path), body.getBytes(UTF_8)): Unit
  }

  /** (key, name, region) rows → pipe-delimited plain-text lines (the
    * schemaless one-record-per-line shape `spark.read.text` ingests).
    * Guards against a delimiter or newline inside the name — nation
    * names never contain either, and a corrupted fixture must fail
    * loudly rather than silently mis-split. */
  def writeTextLines(path: String, rows: Seq[(Long, String, Long)]): Unit = {
    val body = rows.map { case (k, n, r) =>
      require(!n.contains('|') && !n.contains('\n'), s"delimiter in name: $n")
      s"$k|$n|$r"
    }.mkString("\n")
    Files.write(Paths.get(path), body.getBytes(UTF_8)): Unit
  }

  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** One-sheet xlsx: header row + (long, string, long) data rows.
    * Strings go inline (no sharedStrings part needed). */
  def writeXlsx(path: String, header: (String, String, String),
      rows: Seq[(Long, String, Long)]): Unit = {
    def inline(s: String): String =
      s"""<c t="inlineStr"><is><t>${xmlEscape(s)}</t></is></c>"""
    def num(v: Long): String = s"<c><v>$v</v></c>"
    val headerXml = s"<row r=\"1\">${inline(header._1)}${inline(header._2)}${inline(header._3)}</row>"
    val dataXml = rows.zipWithIndex.map { case ((k, n, r), i) =>
      s"""<row r="${i + 2}">${num(k)}${inline(n)}${num(r)}</row>"""
    }.mkString
    val sheet =
      s"""<?xml version="1.0"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
         |$headerXml$dataXml
         |</sheetData></worksheet>""".stripMargin
    val zip = zipOf(
      "[Content_Types].xml" -> "<Types/>".getBytes(UTF_8),
      "xl/workbook.xml" -> "<workbook/>".getBytes(UTF_8),
      "xl/worksheets/sheet1.xml" -> sheet.getBytes(UTF_8))
    Files.write(Paths.get(path), zip): Unit
  }

  /** Multi-sheet xlsx with a REAL workbook.xml + rels graph: named
    * sheets in workbook order, worksheet parts deliberately NOT named
    * sheetN.xml — so reading any sheet but the first must resolve
    * name → r:id → relationship target, the path real workbooks
    * (which bury data behind cover/summary sheets) force. */
  def writeXlsxSheets(path: String,
      sheets: Seq[(String, (String, String, String), Seq[(Long, String, Long)])]): Unit = {
    def inline(s: String): String =
      s"""<c t="inlineStr"><is><t>${xmlEscape(s)}</t></is></c>"""
    def num(v: Long): String = s"<c><v>$v</v></c>"
    val parts = sheets.zipWithIndex.map { case ((_, header, rows), si) =>
      val headerXml =
        s"<row r=\"1\">${inline(header._1)}${inline(header._2)}${inline(header._3)}</row>"
      val dataXml = rows.zipWithIndex.map { case ((k, n, r), i) =>
        s"""<row r="${i + 2}">${num(k)}${inline(n)}${num(r)}</row>"""
      }.mkString
      val sheetXml =
        s"""<?xml version="1.0"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
           |$headerXml$dataXml
           |</sheetData></worksheet>""".stripMargin
      s"xl/worksheets/ws${si + 1}.xml" -> sheetXml.getBytes(UTF_8)
    }
    val wb =
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"""" +
        """ xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        sheets.zipWithIndex.map { case ((name, _, _), i) =>
          s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString + "</sheets></workbook>"
    val rels =
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        sheets.indices.map { i =>
          s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/ws${i + 1}.xml"/>"""
        }.mkString + "</Relationships>"
    val zip = zipOf(
      (Seq("[Content_Types].xml" -> "<Types/>".getBytes(UTF_8),
        "xl/workbook.xml" -> wb.getBytes(UTF_8),
        "xl/_rels/workbook.xml.rels" -> rels.getBytes(UTF_8)) ++ parts): _*)
    Files.write(Paths.get(path), zip): Unit
  }

  /** Coordinate-pair xlsx (id, name, longitude, latitude) — the Excel leg
    * of the ingest-pipeline oracle (`pipeline_ingest_xlsx`). Doubles are
    * written with plain toString ("13.5"), which XlsxReader's inference
    * types as DOUBLE — the shape the coordinate-pair heuristics require. */
  def writeXlsxCoords(path: String, header: (String, String, String, String),
      rows: Seq[(Long, String, Double, Double)]): Unit = {
    def inline(s: String): String =
      s"""<c t="inlineStr"><is><t>${xmlEscape(s)}</t></is></c>"""
    def num(v: String): String = s"<c><v>$v</v></c>"
    val headerXml = s"<row r=\"1\">${inline(header._1)}${inline(header._2)}" +
      s"${inline(header._3)}${inline(header._4)}</row>"
    val dataXml = rows.zipWithIndex.map { case ((k, n, x, y), i) =>
      s"""<row r="${i + 2}">${num(k.toString)}${inline(n)}${num(x.toString)}${num(y.toString)}</row>"""
    }.mkString
    val sheet =
      s"""<?xml version="1.0"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
         |$headerXml$dataXml
         |</sheetData></worksheet>""".stripMargin
    val zip = zipOf(
      "[Content_Types].xml" -> "<Types/>".getBytes(UTF_8),
      "xl/workbook.xml" -> "<workbook/>".getBytes(UTF_8),
      "xl/worksheets/sheet1.xml" -> sheet.getBytes(UTF_8))
    Files.write(Paths.get(path), zip): Unit
  }

  /** Record-per-row XML document (`scan_xml` fixture): one `<record>`
    * element per nation row under a single root, the rowTag shape the
    * built-in XML datasource extracts. */
  def writeXmlRecords(path: String, rows: Seq[(Long, String, Long)]): Unit = {
    val parent = Paths.get(path).getParent
    if (parent != null) Files.createDirectories(parent): Unit
    val body = rows.map { case (k, n, r) =>
      s"  <record><id>$k</id><name>${xmlEscape(n)}</name><region>$r</region></record>"
    }.mkString("\n")
    val doc = s"""<?xml version="1.0" encoding="UTF-8"?>\n<records>\n$body\n</records>\n"""
    Files.write(Paths.get(path), doc.getBytes(UTF_8)): Unit
  }

  /** KML 2.2 document (`scan_kml` fixture, beyond the reference — its
    * detection never dispatches KML): one `<Placemark>` per row with the
    * key in `<ExtendedData>` and a `<Point>` geometry, the OGC shape
    * GDAL's KML driver reads. Coordinates are `lon,lat` (KML mandates
    * WGS84 lon/lat order). */
  def writeKml(path: String, rows: Seq[(Long, String, Double, Double)],
      keyName: String): Unit = {
    val parent = Paths.get(path).getParent
    if (parent != null) Files.createDirectories(parent): Unit
    def num(d: Double): String = {
      require(!d.isNaN && !d.isInfinite, s"non-finite coordinate $d")
      if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString
    }
    val marks = rows.map { case (k, n, x, y) =>
      s"""    <Placemark>
         |      <name>${xmlEscape(n)}</name>
         |      <ExtendedData><Data name="$keyName"><value>$k</value></Data></ExtendedData>
         |      <Point><coordinates>${num(x)},${num(y)}</coordinates></Point>
         |    </Placemark>""".stripMargin
    }.mkString("\n")
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<kml xmlns="http://www.opengis.net/kml/2.2">
         |  <Document>
         |$marks
         |  </Document>
         |</kml>
         |""".stripMargin
    Files.write(Paths.get(path), doc.getBytes(UTF_8)): Unit
  }

  /** GML 2.1 FeatureCollection + the `.xsd` SIDECAR GDAL's driver writes
    * beside it (`scan_gml` fixture, beyond the reference): one
    * `<graftfeat>` member per row with `fkey`/`fname` properties and a
    * `gml:Point` geometry. `srsName` uses the LEGACY `EPSG:n` form
    * (lon/lat storage order) unless `urnForm`, which emits
    * `urn:ogc:def:crs:EPSG::n` and the official lat/lon axis order —
    * exercising the reader's axis swap. */
  def writeGml(path: String, rows: Seq[(Long, String, Double, Double)],
      keyName: String, epsg: Int = 4326, urnForm: Boolean = false): Unit = {
    val parent = Paths.get(path).getParent
    if (parent != null) Files.createDirectories(parent): Unit
    def num(d: Double): String = {
      require(!d.isNaN && !d.isInfinite, s"non-finite coordinate $d")
      if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString
    }
    val srs = if (urnForm) s"urn:ogc:def:crs:EPSG::$epsg" else s"EPSG:$epsg"
    val members = rows.map { case (k, n, x, y) =>
      val pos = if (urnForm) s"${num(y)} ${num(x)}" else s"${num(x)} ${num(y)}"
      s"""  <gml:featureMember>
         |    <graftfeat>
         |      <geom><gml:Point srsName="$srs"><gml:pos>$pos</gml:pos></gml:Point></geom>
         |      <$keyName>$k</$keyName>
         |      <fname>${xmlEscape(n)}</fname>
         |    </graftfeat>
         |  </gml:featureMember>""".stripMargin
    }.mkString("\n")
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">
         |$members
         |</gml:FeatureCollection>
         |""".stripMargin
    Files.write(Paths.get(path), doc.getBytes(UTF_8)): Unit
    val xsd =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
         |           xmlns:gml="http://www.opengis.net/gml"
         |           elementFormDefault="qualified">
         |  <xs:complexType name="graftfeatType">
         |    <xs:complexContent>
         |      <xs:extension base="gml:AbstractFeatureType">
         |        <xs:sequence>
         |          <xs:element name="geom" type="gml:GeometryPropertyType"/>
         |          <xs:element name="$keyName" type="xs:long"/>
         |          <xs:element name="fname" type="xs:string"/>
         |        </xs:sequence>
         |      </xs:extension>
         |    </xs:complexContent>
         |  </xs:complexType>
         |  <xs:element name="graftfeat" type="graftfeatType"
         |              substitutionGroup="gml:_Feature"/>
         |</xs:schema>
         |""".stripMargin
    Files.write(Paths.get(path.replaceAll("\\.[Gg][Mm][Ll]$", ".xsd")),
      xsd.getBytes(UTF_8)): Unit
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def zipOf(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, bytes) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(bytes)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** Zipped point shapefile (.shp + .dbf): attribute columns are a
    * numeric key N(10,0) and a text name C(32). */
  def writeShapefileZip(path: String, baseName: String,
      keyField: String, nameField: String,
      rows: Seq[(Long, String, Double, Double)]): Unit = {
    // ---- .shp: 100-byte header + per-record (BE header, LE point body)
    val recBytes = 8 + 4 + 16 // record header + shape type + x,y
    val shp = ByteBuffer.allocate(100 + rows.length * recBytes)
    shp.order(ByteOrder.BIG_ENDIAN)
    shp.putInt(0, 9994)                      // file code
    shp.putInt(24, shp.capacity() / 2)       // file length in 16-bit words
    shp.order(ByteOrder.LITTLE_ENDIAN)
    shp.putInt(28, 1000)                     // version
    shp.putInt(32, 1)                        // shape type: Point
    if (rows.nonEmpty) {                     // bbox (readers may ignore it)
      shp.putDouble(36, rows.map(_._3).min); shp.putDouble(44, rows.map(_._4).min)
      shp.putDouble(52, rows.map(_._3).max); shp.putDouble(60, rows.map(_._4).max)
    }
    rows.zipWithIndex.foreach { case ((_, _, x, y), i) =>
      val off = 100 + i * recBytes
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(off, i + 1)                 // record number, 1-based
      shp.putInt(off + 4, (recBytes - 8) / 2) // content length in words
      shp.order(ByteOrder.LITTLE_ENDIAN)
      shp.putInt(off + 8, 1)                 // Point
      shp.putDouble(off + 12, x)
      shp.putDouble(off + 20, y)
    }

    // ---- .dbf: dBASE III header + fixed-width records
    val fields = Seq((keyField, 'N', 10), (nameField, 'C', 32))
    val headerSize = 32 + fields.length * 32 + 1
    val recordSize = 1 + fields.map(_._3).sum
    val dbf = ByteBuffer.allocate(headerSize + rows.length * recordSize + 1)
    dbf.order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0, 0x03.toByte)
    dbf.putInt(4, rows.length)
    dbf.putShort(8, headerSize.toShort)
    dbf.putShort(10, recordSize.toShort)
    fields.zipWithIndex.foreach { case ((fname, ftype, flen), i) =>
      val off = 32 + i * 32
      val nb = fname.getBytes("US-ASCII").take(10)
      dbf.put(off, nb, 0, nb.length)
      dbf.put(off + 11, ftype.toByte)
      dbf.put(off + 16, flen.toByte)
      dbf.put(off + 17, 0.toByte)
    }
    dbf.put(32 + fields.length * 32, 0x0D.toByte)
    rows.zipWithIndex.foreach { case ((k, n, _, _), i) =>
      var off = headerSize + i * recordSize
      dbf.put(off, ' '.toByte); off += 1     // not deleted
      // fail fast like writeGeoPackage's page-overflow require — an N(10)
      // field silently truncating an 11-digit key would corrupt
      // round-trips; ditto a C(32) field truncating or '?'-mangling a
      // long/non-ASCII name (DBF text is single-byte)
      require(k.toString.length <= 10, s"key $k exceeds DBF N(10) field")
      require(n.length <= 32 && n.forall(_ < 128),
        s"name '$n' does not fit an ASCII DBF C(32) field")
      val ks = k.toString.reverse.padTo(10, ' ').reverse // right-justified N
      dbf.put(off, ks.getBytes("US-ASCII"), 0, 10); off += 10
      val ns = n.padTo(32, ' ')              // left-justified C
      dbf.put(off, ns.getBytes("US-ASCII"), 0, 32)
    }
    dbf.put(dbf.capacity() - 1, 0x1A.toByte) // EOF marker

    Files.write(Paths.get(path), zipOf(
      s"$baseName.shp" -> shp.array(),
      s"$baseName.dbf" -> dbf.array())): Unit
  }

  // ------------------------------------------------------------ GeoPackage

  /** Point-feature GeoPackage written from scratch (SQLite file format +
    * OGC GeoPackage spec): sqlite_master on page 1, gpkg_contents,
    * gpkg_geometry_columns, and one feature table. Geometry rows carry a
    * GPB (magic + flags + srs + WKB). The feature table grows past one
    * page via interior B-tree pages and overflow chains (see
    * [[writeGeoPackageTable]]). */
  def writeGeoPackage(path: String, table: String, keyField: String,
      nameField: String, srsId: Int,
      rows: Seq[(Long, String, Double, Double)]): Unit =
    writeGeoPackageTable(path, table,
      columns = Seq(keyField -> "INTEGER", nameField -> "TEXT", "geom" -> "BLOB"),
      srsId = srsId, geomColumn = Some("geom"),
      rows = rows.iterator.map { case (k, n, x, y) => Seq(k, n, gpb(srsId, x, y)) })

  /** General GeoPackage writer — the write side of [[GeoPackageReader]]
    * and the backing of [[graft.plans.GeoPackageSink]]. `columns` are
    * (name, SQLite decl type) pairs aligned with each row's values
    * (Long / String / Double / Array[Byte] / null); a geometry column's
    * values must already be GPB blobs (see [[gpbWrap]]).
    * `geomColumn = None` writes an attributes-only container (data_type
    * "attributes", no gpkg_geometry_columns row).
    *
    * The feature table is a REAL multi-page table B-tree: leaves are
    * packed greedily in rowid order, interior pages (type 0x05) fan out
    * over them level by level, and any record larger than the spec's
    * local-payload maximum spills to an overflow chain — the exact
    * inverse of [[SqliteReader]]'s walk, which is also the round-trip
    * proof (FormatWritersSpec + `sink_gpkg`'s hash oracle). Rows stream
    * through one leaf at a time, so memory stays bounded at one page of
    * cells plus the emitted file bytes. One call = one container (an
    * SQLite file has no split to distribute); the DSv2 write half runs
    * this inside write tasks, one container per partition. */
  def writeGeoPackageTable(path: String, table: String,
      columns: Seq[(String, String)], srsId: Int,
      geomColumn: Option[String], rows: Iterator[Seq[Any]]): Unit = {
    val featureSql =
      s"CREATE TABLE $table (${columns.map { case (n, t) => s"$n $t" }.mkString(", ")})"
    val contentsSql =
      "CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT, srs_id INTEGER)"
    val geomColsSql =
      "CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT, " +
        "geometry_type_name TEXT, srs_id INTEGER, z INTEGER, m INTEGER)"
    val dataType = if (geomColumn.isDefined) "features" else "attributes"

    val pf = new SqlitePageFile
    val masterPage = pf.allocate() // page 1: sqlite_master, filled last
    var rowid = 0L
    val featureRoot = pf.writeTable(rows.map { r =>
      require(r.length == columns.length,
        s"row arity ${r.length} != ${columns.length} columns")
      rowid += 1
      (rowid, record(r))
    })
    val contentsRoot = pf.writeTable(
      Iterator((1L, record(Seq(table, dataType, srsId.toLong)))))
    val geomColsRoot = pf.writeTable(geomColumn.iterator.map(g =>
      (1L, record(Seq(table, g, "GEOMETRY", srsId.toLong, 0L, 0L)))))
    val masterCells = Seq(
      masterRecord(1, "gpkg_contents", contentsRoot.toLong, contentsSql),
      masterRecord(2, "gpkg_geometry_columns", geomColsRoot.toLong, geomColsSql),
      masterRecord(3, table, featureRoot.toLong, featureSql))
    pf.setPage(masterPage, leafPage(masterCells, reservedPrefix = 100))
    Files.write(Paths.get(path), pf.toBytes): Unit
  }

  /** GeoPackage binary wrapper around arbitrary WKB: "GP", version 0,
    * flags 0x01 (LE, no envelope), srs_id, geometry bytes — the generic
    * form of the point-only [[gpb]]. */
  def gpbWrap(srsId: Int, wkb: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + wkb.length)
    b.put('G'.toByte).put('P'.toByte).put(0.toByte).put(0x01.toByte)
    b.order(ByteOrder.LITTLE_ENDIAN).putInt(srsId)
    b.put(wkb)
    b.array()
  }

  private val PageSize = 4096

  /** Append-only SQLite page-file builder: whole table B-trees with
    * greedy leaf packing, interior fan-out (page type 0x05), and
    * overflow chains for oversized records — the write-side mirror of
    * [[SqliteReader]]'s walk (its readPayload spill formula, inverted).
    * Page numbers are 1-based; page 1 must be allocated first and filled
    * by the caller with the sqlite_master leaf. */
  private final class SqlitePageFile {
    private val pages = scala.collection.mutable.ArrayBuffer[Array[Byte]]()

    def allocate(): Int = { pages += null; pages.length }

    def setPage(no: Int, bytes: Array[Byte]): Unit = {
      require(bytes.length == PageSize, s"page must be $PageSize bytes")
      pages(no - 1) = bytes
    }

    def toBytes: Array[Byte] = {
      val out = new Array[Byte](PageSize * pages.length)
      pages.zipWithIndex.foreach { case (p, i) =>
        require(p != null, s"page ${i + 1} allocated but never written")
        System.arraycopy(p, 0, out, i * PageSize, PageSize)
      }
      writeSqliteHeader(out, pages.length)
      out
    }

    // the spec's local-payload bounds for leaf table cells (usable page
    // size = PageSize: the header declares 0 reserved bytes per page)
    private val X = PageSize - 35
    private val M = ((PageSize - 12) * 32) / 255 - 23

    /** Leaf cell for (rowid, payload); payloads past the local maximum
      * spill to an overflow chain allocated here. */
    private def leafCell(rowid: Long, payload: Array[Byte]): Array[Byte] =
      if (payload.length <= X)
        varint(payload.length.toLong) ++ varint(rowid) ++ payload
      else {
        val total = payload.length
        val k = M + ((total - M) % (PageSize - 4))
        val local = if (k <= X) k else M
        val chunks = payload.drop(local).grouped(PageSize - 4).toVector
        val chain = chunks.map(_ => allocate())
        chunks.zipWithIndex.foreach { case (chunk, i) =>
          val pg = new Array[Byte](PageSize)
          val next = if (i + 1 < chain.length) chain(i + 1) else 0
          ByteBuffer.wrap(pg).order(ByteOrder.BIG_ENDIAN).putInt(0, next)
          System.arraycopy(chunk, 0, pg, 4, chunk.length)
          setPage(chain(i), pg)
        }
        varint(total.toLong) ++ varint(rowid) ++ payload.take(local) ++
          ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
            .putInt(chain.head).array()
      }

    /** Write a table B-tree from (ascending rowid, record payload) rows;
      * returns the root page number. Streams one leaf of cells at a
      * time — driver memory stays bounded regardless of table size. */
    def writeTable(rows: Iterator[(Long, Array[Byte])]): Int = {
      val leaves = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
      val cur = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      var curBytes = 0
      var lastRowid = 0L
      def flushLeaf(): Unit = {
        val no = allocate()
        setPage(no, leafPage(cur.toSeq))
        leaves += ((no, lastRowid))
        cur.clear(); curBytes = 0
      }
      rows.foreach { case (rid, payload) =>
        val c = leafCell(rid, payload)
        if (cur.nonEmpty &&
            8 + 2 * (cur.length + 1) + curBytes + c.length > PageSize)
          flushLeaf()
        cur += c; curBytes += c.length; lastRowid = rid
      }
      if (cur.nonEmpty || leaves.isEmpty) flushLeaf()
      buildInterior(leaves.toSeq)
    }

    // conservative interior fan-out: every child costs a pointer slot +
    // 4-byte child page + worst-case 9-byte rowid varint
    private val Fanout = (PageSize - 12) / (2 + 4 + 9)

    /** Fold children up interior levels until one root remains. */
    @scala.annotation.tailrec
    private def buildInterior(children: Seq[(Int, Long)]): Int =
      if (children.length == 1) children.head._1
      else buildInterior(children.grouped(Fanout).map { g =>
        val no = allocate()
        setPage(no, interiorPage(g))
        (no, g.last._2)
      }.toSeq)

    /** Interior table page (0x05): cells carry (left-child page, max
      * rowid in that subtree) for all children but the last, which
      * becomes the header's rightmost pointer. */
    private def interiorPage(children: Seq[(Int, Long)]): Array[Byte] = {
      val page = new Array[Byte](PageSize)
      page(0) = 0x05
      val cells = children.init.map { case (child, maxRowid) =>
        ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
          .putInt(child).array() ++ varint(maxRowid)
      }
      page(3) = ((cells.length >> 8) & 0xFF).toByte
      page(4) = (cells.length & 0xFF).toByte
      ByteBuffer.wrap(page).order(ByteOrder.BIG_ENDIAN)
        .putInt(8, children.last._1)
      var contentOff = PageSize
      cells.zipWithIndex.foreach { case (c, i) =>
        contentOff -= c.length
        System.arraycopy(c, 0, page, contentOff, c.length)
        page(12 + 2 * i) = ((contentOff >> 8) & 0xFF).toByte
        page(12 + 2 * i + 1) = (contentOff & 0xFF).toByte
      }
      page(5) = ((contentOff >> 8) & 0xFF).toByte
      page(6) = (contentOff & 0xFF).toByte
      page
    }
  }

  private def writeSqliteHeader(file: Array[Byte], pageCount: Int): Unit = {
    val magic = "SQLite format 3 ".getBytes("US-ASCII")
    System.arraycopy(magic, 0, file, 0, 16)
    val b = ByteBuffer.wrap(file).order(ByteOrder.BIG_ENDIAN)
    b.putShort(16, PageSize.toShort)
    file(18) = 1; file(19) = 1                  // file format r/w versions
    file(20) = 0                                // reserved bytes per page
    file(21) = 64; file(22) = 32; file(23) = 32 // payload fractions (fixed)
    b.putInt(28, pageCount)
    b.putInt(40, 1)                             // schema cookie
    b.putInt(44, 1)                             // schema format
    b.putInt(56, 1)                             // text encoding: UTF-8
  }

  /** sqlite_master row: (type, name, tbl_name, rootpage, sql). */
  private def masterRecord(rowid: Long, name: String, rootPage: Long,
      sql: String): Array[Byte] =
    cell(rowid, record(Seq("table", name, name, rootPage, sql)))

  /** Record format: header (self-inclusive length varint + serial types)
    * then value bodies. Longs use the smallest integer serial type. */
  private def record(values: Seq[Any]): Array[Byte] = {
    val parts = values.map {
      case null => (0L, Array.empty[Byte])
      case l: Long =>
        if (l >= -128 && l <= 127)
          (1L, Array(l.toByte))
        else if (l >= Short.MinValue && l <= Short.MaxValue)
          (2L, ByteBuffer.allocate(2).order(ByteOrder.BIG_ENDIAN).putShort(l.toShort).array())
        else if (l >= Int.MinValue && l <= Int.MaxValue)
          (4L, ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(l.toInt).array())
        else
          (6L, ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putLong(l).array())
      case d: Double =>
        (7L, ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putDouble(d).array())
      case s: String =>
        val b = s.getBytes(UTF_8); (13L + 2 * b.length, b)
      case b: Array[Byte] => (12L + 2 * b.length, b)
      case other => throw new IllegalArgumentException(s"unsupported value: $other")
    }
    val serials = parts.flatMap(p => varint(p._1)).toArray
    // header length varint includes itself; serial types here are small
    // enough that the length always fits one or two varint bytes
    val hdrLen =
      if (serials.length + 1 < 128) serials.length + 1 else serials.length + 2
    varint(hdrLen.toLong) ++ serials ++ parts.flatMap(_._2)
  }

  /** Leaf table cell: payload-length varint, rowid varint, payload.
    * Payloads must fit the page (no overflow chains in the writer). */
  private def cell(rowid: Long, payload: Array[Byte]): Array[Byte] = {
    require(payload.length <= PageSize - 35,
      s"record of ${payload.length} bytes needs overflow pages (unsupported)")
    varint(payload.length.toLong) ++ varint(rowid) ++ payload
  }

  /** Pack cells into one leaf table B-tree page (type 0x0D): 8-byte page
    * header, cell pointer array, cells packed from the page end. */
  private def leafPage(cells: Seq[Array[Byte]], reservedPrefix: Int = 0): Array[Byte] = {
    val page = new Array[Byte](PageSize)
    val hdr = reservedPrefix
    require(hdr + 8 + 2 * cells.length + cells.map(_.length).sum <= PageSize,
      s"${cells.length} cells (${cells.map(_.length).sum} bytes) overflow one page")
    page(hdr) = 0x0D
    page(hdr + 3) = ((cells.length >> 8) & 0xFF).toByte
    page(hdr + 4) = (cells.length & 0xFF).toByte
    var contentOff = PageSize
    cells.zipWithIndex.foreach { case (c, i) =>
      contentOff -= c.length
      System.arraycopy(c, 0, page, contentOff, c.length)
      page(hdr + 8 + 2 * i) = ((contentOff >> 8) & 0xFF).toByte
      page(hdr + 8 + 2 * i + 1) = (contentOff & 0xFF).toByte
    }
    page(hdr + 5) = ((contentOff >> 8) & 0xFF).toByte
    page(hdr + 6) = (contentOff & 0xFF).toByte
    page
  }

  /** Big-endian base-128 varint (SQLite flavor). Values here are always
    * non-negative and far below the 9-byte form. */
  private def varint(v: Long): Array[Byte] = {
    require(v >= 0, s"negative varint $v")
    if (v < 0x80) Array(v.toByte)
    else {
      val out = scala.collection.mutable.ArrayBuffer[Byte]()
      var rest = v
      while (rest >= 0x80) { out.prepend((rest & 0x7F).toByte); rest >>= 7 }
      out.prepend(rest.toByte)
      // set continuation bits on all but the last byte
      out.indices.dropRight(1).foreach(i => out(i) = (out(i) | 0x80).toByte)
      out.toArray
    }
  }

  /** GeoPackage binary blob for POINT(x y): [[gpbWrap]] over point WKB. */
  private def gpb(srsId: Int, x: Double, y: Double): Array[Byte] =
    gpbWrap(srsId, graft.functions.GeoFunctions.toWkb(
      graft.functions.GeoFunctions.point(x, y)))
}
