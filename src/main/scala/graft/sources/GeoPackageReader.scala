package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.nio.{ByteBuffer, ByteOrder}

/** GeoPackage → DataFrame, replacing the reference's `st_read('x.gpkg')`
  * (core_processor.rs:393-398). A .gpkg is an SQLite database (OGC
  * GeoPackage spec): `gpkg_geometry_columns` names the feature tables and
  * their geometry column + SRS; feature rows carry geometry as a GPB
  * (GeoPackage binary) blob = 8-byte header + optional envelope + standard
  * WKB. We walk the SQLite B-trees with [[SqliteReader]], strip the GPB
  * envelope, and emit the WKB as a BinaryType column under its original
  * name (so SchemaHeuristics finds it by the same rules the reference's
  * information_schema query would).
  */
object GeoPackageReader {

  def read(spark: SparkSession, path: String): DataFrame = {
    val (schema, data) = parsed(path)
    val rows = data.map(Row.fromSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, data.length / 50000)), schema)
  }

  /** Container parse shared by the driver-side [[read]] and the DSv2
    * executor-side partition reader ([[GpkgSource]]): (inferred schema
    * with geometry/CRS metadata, rows coerced to the schema's external
    * types). Runs wherever it is called — on an executor this moves the
    * whole SQLite walk off the driver, which is what makes
    * `format("gpkg").load(manyFiles)` parallel ingest. */
  def parsed(path: String): (StructType, Seq[Seq[Any]]) = {
    val db = new SqliteReader(path)
    val featureTable = firstFeatureTable(db)
      .getOrElse(throw new IllegalArgumentException(
        s"'$path' has no feature table in gpkg_geometry_columns/gpkg_contents"))
    val (geomCol, srs) = geometryColumn(db, featureTable)
    val (cols, rows) = db.readTable(featureTable)

    // when the declared/default name isn't a column (contents-only files),
    // sniff the first column whose values carry the GPB magic "GP"
    val declaredIdx = cols.indexWhere(_.equalsIgnoreCase(geomCol))
    val geomIdx =
      if (declaredIdx >= 0) declaredIdx
      else cols.indices.find { i =>
        rows.iterator.map(_(i)).collectFirst { case b: Array[Byte] => b }
          .exists(b => b.length >= 2 && b(0) == 'G' && b(1) == 'P')
      }.getOrElse(-1)
    val effectiveGeomCol = if (geomIdx >= 0) cols(geomIdx) else geomCol
    val converted = rows.map { r =>
      if (geomIdx >= 0) r(geomIdx) match {
        case b: Array[Byte] => r.updated(geomIdx, gpbToWkb(b))
        case _ => r
      } else r
    }
    // tag the authoritative geometry column (from gpkg_geometry_columns,
    // or GPB-sniffed) so downstream discovery finds it regardless of name,
    // and carry the SRS in the same metadata so the pipeline's CRS lookup
    // doesn't re-read and re-walk the whole container
    val schema = schemaFor(cols, converted,
      geomCol = Some(effectiveGeomCol), srs = Some(srs))
    (schema, converted.map(r => r.zip(schema.fields).map {
      case (v, f) => coerce(v, f.dataType)
    }))
  }

  /** Any SQLite table in the container → DataFrame with the widened
    * inferred schema (no geometry handling) — for gpkg attribute/side
    * tables alongside the feature table. */
  def readAttributeTable(spark: SparkSession, path: String, table: String): DataFrame = {
    val (cols, rows) = new SqliteReader(path).readTable(table)
    toDataFrame(spark, cols, rows)
  }

  /** Field-metadata key carrying the declared SRS of a geometry column. */
  val CrsTag = "graft.crs"

  private def schemaFor(cols: Seq[String], rows: Seq[IndexedSeq[Any]],
      geomCol: Option[String], srs: Option[Int]): StructType =
    StructType(cols.zipWithIndex.map { case (c, i) =>
      val md =
        if (geomCol.exists(_.equalsIgnoreCase(c))) {
          val b = new MetadataBuilder().putBoolean(SchemaHeuristics.GeometryTag, true)
          srs.foreach(s => b.putString(CrsTag, s.toString))
          b.build()
        } else Metadata.empty
      StructField(c, inferType(rows.iterator.map(r => r(i))), metadata = md)
    })

  private def toDataFrame(
      spark: SparkSession, cols: Seq[String], rows: Seq[IndexedSeq[Any]],
      geomCol: Option[String] = None, srs: Option[Int] = None): DataFrame = {
    val schema = schemaFor(cols, rows, geomCol, srs)
    val data = rows.map(r => Row.fromSeq(r.zip(schema.fields).map {
      case (v, f) => coerce(v, f.dataType)
    }))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, math.max(1, data.length / 50000)), schema)
  }

  /** First feature table: gpkg_geometry_columns, falling back to
    * gpkg_contents rows with data_type='features'. */
  private def firstFeatureTable(db: SqliteReader): Option[String] =
    db.tableRoot("gpkg_geometry_columns").flatMap { _ =>
      val (cols, rows) = db.readTable("gpkg_geometry_columns")
      val ti = cols.indexWhere(_.equalsIgnoreCase("table_name"))
      rows.headOption.map(_(ti).asInstanceOf[String])
    }.orElse {
      db.tableRoot("gpkg_contents").flatMap { _ =>
        val (cols, rows) = db.readTable("gpkg_contents")
        val ti = cols.indexWhere(_.equalsIgnoreCase("table_name"))
        val di = cols.indexWhere(_.equalsIgnoreCase("data_type"))
        rows.find(r => r(di) == "features").map(_(ti).asInstanceOf[String])
      }
    }

  /** (geometry column name, srs_id) for a feature table. Tolerates a
    * missing gpkg_geometry_columns table — the gpkg_contents fallback in
    * [[firstFeatureTable]] exists precisely for such containers: the SRS
    * then comes from gpkg_contents' own srs_id column (NOT a hardcoded
    * 4326, which would sneak meter-grid coordinates past the pipeline's
    * unsupported-CRS fail-fast), and the geometry column is GPB-sniffed
    * by the caller when 'geom' doesn't exist. */
  def geometryColumn(db: SqliteReader, table: String): (String, Int) =
    if (db.tableRoot("gpkg_geometry_columns").isEmpty)
      ("geom", contentsSrsId(db, table).getOrElse(4326))
    else geometryColumnFromCatalog(db, table)

  private def contentsSrsId(db: SqliteReader, table: String): Option[Int] =
    db.tableRoot("gpkg_contents").flatMap { _ =>
      val (cols, rows) = db.readTable("gpkg_contents")
      val ti = cols.indexWhere(_.equalsIgnoreCase("table_name"))
      val si = cols.indexWhere(_.equalsIgnoreCase("srs_id"))
      if (si < 0) None
      else rows.find(_(ti) == table).flatMap(_(si) match {
        case l: java.lang.Long => Some(l.toInt)
        case l: Long => Some(l.toInt)
        case _ => None
      })
    }

  private def geometryColumnFromCatalog(db: SqliteReader, table: String): (String, Int) = {
    val (cols, rows) = db.readTable("gpkg_geometry_columns")
    val ti = cols.indexWhere(_.equalsIgnoreCase("table_name"))
    val ci = cols.indexWhere(_.equalsIgnoreCase("column_name"))
    val si = cols.indexWhere(_.equalsIgnoreCase("srs_id"))
    rows.find(_(ti) == table)
      .map(r => (r(ci).asInstanceOf[String], r(si) match {
        case l: java.lang.Long => l.toInt; case l: Long => l.toInt; case _ => 4326
      }))
      .getOrElse(("geom", 4326))
  }

  /** The declared SRS of the first feature table — the `st_read_meta` CRS
    * lookup (reference: geo_strategy.rs:55-70). */
  def srsId(path: String): Option[String] =
    scala.util.Try {
      val db = new SqliteReader(path)
      firstFeatureTable(db).map(t => geometryColumn(db, t)._2.toString)
    }.toOption.flatten

  /** GPB header (GeoPackage spec §2.1.3): magic "GP", version, flags
    * (bit 0 = little-endian srs_id, bits 1-3 = envelope kind), srs_id,
    * envelope doubles, then plain WKB. */
  def gpbToWkb(gpb: Array[Byte]): Array[Byte] = {
    if (gpb.length < 8 || gpb(0) != 'G' || gpb(1) != 'P') return gpb // already WKB
    val flags = gpb(3) & 0xFF
    val envelopeKind = (flags >> 1) & 0x07
    val envelopeDoubles = envelopeKind match {
      case 0 => 0
      case 1 => 4
      case 2 | 3 => 6
      case 4 => 8
      case _ => return null // invalid envelope contents indicator
    }
    val off = 8 + envelopeDoubles * 8
    if (off >= gpb.length) null else gpb.drop(off)
  }

  // SQLite columns are dynamically typed: widen over the whole sample
  // (NUMERIC affinity stores 1 as INTEGER next to 2.5 as REAL), never
  // decide from the first value alone
  private def inferType(values: Iterator[Any]): DataType = {
    def isLong(v: Any) = v.isInstanceOf[Long] || v.isInstanceOf[java.lang.Long]
    def isDouble(v: Any) = v.isInstanceOf[Double] || v.isInstanceOf[java.lang.Double]
    val present = values.filter(_ != null).take(1000).toSeq
    if (present.isEmpty) StringType
    else if (present.forall(_.isInstanceOf[Array[Byte]])) BinaryType
    else if (present.forall(isLong)) LongType
    else if (present.forall(v => isLong(v) || isDouble(v))) DoubleType
    else StringType
  }

  // total: every SQLite storage class maps to SOMETHING valid for the
  // target type (worst case null) — a value that slipped past the 1000-row
  // inference sample must never produce a Row that violates the schema
  // (Spark would throw "[B is not a valid external type..." at action time)
  private def coerce(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (l: Long, LongType) => l
    case (l: Long, DoubleType) => l.toDouble
    case (d: Double, DoubleType) => d
    // a Double in a Long-typed column can only appear past the 1000-row
    // inference sample; truncation is the documented lossy fallback there
    case (d: Double, LongType) => d.toLong
    case (_, LongType) => null // non-numeric past the sample
    case (_, DoubleType) => null
    case (b: Array[Byte], StringType) => // BLOB in a text column: hex, like SQLite's quote()
      b.map("%02X".format(_)).mkString
    case (x, StringType) => x.toString
    case (b: Array[Byte], BinaryType) => b
    case (_, BinaryType) => null // non-blob past the sample in a blob column
    case (x, _) => x
  }
}
