package graft.plans

import graft.functions.{CrsInference, GeoFunctions}
import graft.sources.{FileType, FileTypeDetector, SchemaHeuristics}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BinaryType, StringType}

import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Immutable job parameters — the reference's `CoreProcessor` fields minus
  * the live connection (core_processor.rs:40-48). */
final case class IngestJob(
    filePath: String,
    tableName: String,
    schemaName: String)

/** The end-to-end ingest pipeline — the Spark re-expression of
  * `launch_core_processor` (reference: core_processor.rs:97-117):
  * detect → read (lazy) → discover geometry → strategy dispatch →
  * transform (still lazy) → sink write.
  *
  * Where the reference materializes staging tables (`data`,
  * `transformed_data`) inside DuckDB, everything here stays a single lazy
  * Catalyst plan until the sink action: at 100 TB that is the difference
  * between two full materializations and zero. The only driver-side data
  * movement is the bounded ≤10-row CRS probe (CrsInference).
  */
object IngestPipeline {

  final case class Result(
      fileType: FileType,
      tableName: String,
      geometry: SchemaHeuristics.GeometryColumns,
      crs: Option[String],
      transformed: DataFrame)

  val TargetCrs = "4326" // geo_strategy.rs:259 — everything lands as WGS84

  /** `process_file` equivalent (core_processor.rs:463-476). */
  def run(spark: SparkSession, job: IngestJob, sink: Sink): Result = {
    val prepared = plan(spark, job)
    sink.createSchema(job.schemaName)
    sink.dropTable(job.schemaName, prepared.tableName)
    if (prepared.geometry.names.isEmpty)
      sink.write(prepared.transformed, job.schemaName, prepared.tableName)
    else
      sink.writeGeo(prepared.transformed, job.schemaName, prepared.tableName,
        prepared.geometry.names)
    prepared
  }

  /** Pure planning half: everything up to (not including) the sink action —
    * separately testable without any writable target. */
  def plan(spark: SparkSession, job: IngestJob): Result = {
    val fileType = FileTypeDetector.detect(job.filePath)
      .fold(e => throw new IllegalArgumentException(e), identity)
    val tableName = FileTypeDetector.cleanTableName(job.tableName)
    val df = read(spark, job.filePath, fileType)
    val geometry = SchemaHeuristics.findGeometryColumns(df.schema, fileType)
    if (geometry.names.isEmpty)
      Result(fileType, tableName, geometry, None, df) // NonGeoStrategy: identity
    else {
      val crs = currentCrs(df, fileType, geometry, job.filePath)
      // fail FAST on a CRS our closed-form math can't reproject (e.g. a
      // gpkg declaring EPSG:25832): proceeding would Try-swallow the
      // per-row transform error into NULL for 100% of geometries — silent
      // total data loss reported as success
      if (!crs.toIntOption.exists(graft.functions.CrsTransform.SupportedEpsg.contains))
        throw new IllegalArgumentException(
          s"unsupported source CRS EPSG:$crs for '${job.filePath}' — " +
            s"supported: ${graft.functions.CrsTransform.SupportedEpsg.toSeq.sorted.mkString(", ")}")
      Result(fileType, tableName, geometry, Some(crs),
        GeoTransform(df, fileType, geometry, crs, TargetCrs))
    }
  }

  /** Format-dispatched lazy read — the `create_duckb_table` CTAS switch
    * (core_processor.rs:391-428), as `DataFrameReader` calls. The two
    * binary container formats ride the DataSourceV2 connector tier
    * (`format("gpkg")` / `format("shpzip")`), so their parse runs in the
    * SCAN TASK on an executor — the reference-shaped end-to-end path and
    * the ten-thousand-container ingest share one code path, and the
    * driver touches only the schema-inference container. */
  def read(spark: SparkSession, path: String, fileType: FileType): DataFrame =
    fileType match {
      case FileType.Parquet =>
        // detection sees PAR1 either way; GeoParquet is parquet whose
        // footer declares its geometry — one driver-side footer probe
        // routes it so the declared CRS (not the row probe) drives the
        // transform, and the data path stays Spark's parquet source
        if (graft.sources.GeoParquet.isGeoParquet(path))
          graft.sources.GeoParquet.read(spark, path)
        else spark.read.parquet(path)
      case FileType.Csv =>
        // header+infer+tolerate mirrors read_csv(ignore_errors, header);
        // the bounded-prefix dialect sniff mirrors DuckDB's delimiter
        // auto-detection (semicolon/tab exports would otherwise load as
        // one mangled column) — driver-side, one 16 KB read, no job
        spark.read.option("header", true).option("inferSchema", true)
          .option("sep", graft.sources.CsvDialect.sniffSeparator(path))
          .option("mode", "DROPMALFORMED").csv(path)
      case FileType.Geojson =>
        graft.sources.GeoJsonReader.read(spark, path)
      case FileType.Excel =>
        // both Excel generations: CFBF magic → BIFF8 reader (beyond the
        // reference, whose read_xlsx fails on legacy files); else OOXML
        if (FileTypeDetector.isCfbf(path)) graft.sources.XlsReader.read(spark, path)
        else graft.sources.XlsxReader.read(spark, path)
      case FileType.Shapefile =>
        spark.read.format("shpzip").load(path)
      case FileType.Geopackage =>
        spark.read.format("gpkg").load(path)
      case FileType.Kml =>
        graft.sources.KmlReader.read(spark, path)
      case FileType.Gml =>
        graft.sources.GmlReader.read(spark, path)
      case FileType.Arrow =>
        // executor-side batch decode (binaryFile + arrow-vector); a
        // directory landing zone rides the same call
        graft.sources.ArrowIpc.read(spark, path)
      case FileType.Flatgeobuf =>
        // executor-side feature decode (binaryFile + the from-scratch
        // flatbuffers walk); WKB geometry + schema-borne CRS
        graft.sources.FlatGeobuf.read(spark, path)
    }

  /** Multi-container landing-zone ingest (beyond the reference's
    * single-file API): detect the container type from the FIRST file in
    * lexicographic order, then plan ONE connector read over the whole
    * directory — every container parses in its own scan task. The
    * geometry/CRS/transform half is byte-identical to [[plan]]; the CRS
    * is taken from the probe container (one landing zone = one source
    * system = one CRS, the same contract the count-anchored streaming
    * offset documents). */
  def planDir(spark: SparkSession, dirPath: String, tableName: String,
      schemaName: String): Result = {
    val files = Option(new java.io.File(dirPath).listFiles())
      .getOrElse(Array.empty).filter(_.isFile).map(_.getAbsolutePath).sorted
    require(files.nonEmpty, s"no container files under '$dirPath'")
    val fileType = FileTypeDetector.detect(files.head)
      .fold(e => throw new IllegalArgumentException(e), identity)
    require(fileType == FileType.Geopackage || fileType == FileType.Shapefile
        || fileType == FileType.Kml || fileType == FileType.Gml
        || fileType == FileType.Flatgeobuf || fileType == FileType.Arrow,
      s"directory ingest supports the container formats (gpkg, zipped " +
        s"shapefile, fgb, arrow) and the XML geo formats KML/GML (whose " +
        s"XML source reads a directory natively); '${files.head}' " +
        s"detected as $fileType")
    val cleaned = FileTypeDetector.cleanTableName(tableName)
    val df = read(spark, dirPath, fileType)
    val geometry = SchemaHeuristics.findGeometryColumns(df.schema, fileType)
    if (geometry.names.isEmpty)
      Result(fileType, cleaned, geometry, None, df)
    else {
      val crs = currentCrs(df, fileType, geometry, files.head)
      if (!crs.toIntOption.exists(graft.functions.CrsTransform.SupportedEpsg.contains))
        throw new IllegalArgumentException(
          s"unsupported source CRS EPSG:$crs for '$dirPath' — " +
            s"supported: ${graft.functions.CrsTransform.SupportedEpsg.toSeq.sorted.mkString(", ")}")
      Result(fileType, cleaned, geometry, Some(crs),
        GeoTransform(df, fileType, geometry, crs, TargetCrs))
    }
  }

  /** `get_crs_number` (geo_strategy.rs:21-72): per-format CRS source. */
  def currentCrs(
      df: DataFrame,
      fileType: FileType,
      geometry: SchemaHeuristics.GeometryColumns,
      sourcePath: String): String = fileType match {
    case FileType.Shapefile =>
      prjCrs(sourcePath).getOrElse("4326")
    case FileType.Parquet =>
      // a GeoParquet footer DECLARES its CRS (stamped into the schema by
      // the reader) — declaration beats the ≤10-row probe; plain parquet
      // still goes through the reference-mirrored inference chain
      df.schema.fields
        .find(f => f.metadata.contains(graft.sources.GeoParquet.CrsTag))
        .map(_.metadata.getString(graft.sources.GeoParquet.CrsTag)
          .stripPrefix("EPSG:"))
        .getOrElse(CrsInference.inferCrs(df, geometry.names))
    case FileType.Csv | FileType.Excel | FileType.Arrow =>
      "4326" // geo_strategy.rs:48-54 — hard default for tabular sources
              // (Arrow carries no CRS metadata — same tabular stance)
    case FileType.Geojson =>
      "4326" // GeoJSON spec (RFC 7946) mandates CRS84 == lon/lat WGS84
    case FileType.Kml =>
      "4326" // KML (OGC 07-147r2 §6.2) mandates WGS84 lon/lat
    case FileType.Gml =>
      // the reader stamped the srsName sniff into the geometry field's
      // metadata (bounded 4 KB prefix) — same schema-borne contract as
      // GeoPackage's container SRS
      df.schema.fields
        .find(f => f.metadata.contains(graft.sources.GmlReader.CrsTag))
        .map(_.metadata.getString(graft.sources.GmlReader.CrsTag))
        .getOrElse("4326")
    case FileType.Geopackage =>
      // the reader stamped the SRS into the geometry field's metadata —
      // read it from the schema instead of re-walking the whole container
      df.schema.fields
        .find(f => f.metadata.contains(graft.sources.GeoPackageReader.CrsTag))
        .map(_.metadata.getString(graft.sources.GeoPackageReader.CrsTag))
        .orElse(graft.sources.GeoPackageReader.srsId(sourcePath))
        .getOrElse("4326")
    case FileType.Flatgeobuf =>
      // the header's Crs table, stamped into the geometry field by the
      // reader — the same schema-borne contract as GeoPackage/GML
      df.schema.fields
        .find(f => f.metadata.contains(graft.sources.FlatGeobuf.CrsTag))
        .map(_.metadata.getString(graft.sources.FlatGeobuf.CrsTag))
        .getOrElse("4326")
  }

  /** `.prj` member sniff inside the shapefile zip (geo_strategy.rs:23-44):
    * OSGB/27700 marker → BNG, else WGS84. */
  def prjCrs(zipPath: String): Option[String] =
    FileTypeDetector.findShapefilePath(zipPath).toOption.flatMap { shpPath =>
      val prjPath = shpPath.replaceAll("\\.shp$", ".prj")
      scala.util.Try {
        Using.resource(new ZipFile(zipPath)) { zf =>
          zf.entries.asScala.find(_.getName == prjPath).map { entry =>
            val text = new String(zf.getInputStream(entry).readAllBytes(), "UTF-8")
            if (text.contains("OSGB") || text.contains("27700")) "27700" else "4326"
          }
        }
      }.toOption.flatten
    }
}

/** `GeoStrategy::transform_geom_columns` (geo_strategy.rs:256-347) as a
  * lazy column rewrite: drop the raw geometry columns, append `<col>_wkt`
  * reprojected 2D WKT — or, for coordinate-pair tables, build the point
  * from (x, y) and keep all original columns, filtering null coordinates.
  */
object GeoTransform {

  def apply(
      df: DataFrame,
      fileType: FileType,
      geometry: SchemaHeuristics.GeometryColumns,
      currentCrs: String,
      targetCrs: String): DataFrame = fileType match {

    case FileType.Csv | FileType.Excel =>
      val (xCol, yCol) = geometry.coordinatePair.getOrElse(
        throw new IllegalStateException("No coordinate columns detected"))
      val geomName = geometry.names.head
      val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      val wkt =
        if (currentCrs == targetCrs)
          GeoFunctions.stPointWkt(col(xCol).cast("double"), col(yCol).cast("double"))
        else
          GeoFunctions.stPointTransformWkt(
            col(xCol).cast("double"), col(yCol).cast("double"),
            currentCrs.toInt, targetCrs.toInt)
      base.withColumn(s"${geomName}_wkt", wkt)

    case _ =>
      // SELECT * EXCLUDE (geoms), ST_AsText(...) per column (:271-300)
      geometry.names.foldLeft(df) { (acc, g) =>
        val src = df.schema(g).dataType
        val wkt = (src, currentCrs == targetCrs) match {
          case (BinaryType, true)  => GeoFunctions.stAsTextFromWkb(col(g))
          case (BinaryType, false) =>
            GeoFunctions.stTransformWkbToWkt(col(g), currentCrs.toInt, targetCrs.toInt)
          case (StringType, true)  => GeoFunctions.stAsTextFromWkt(col(g))
          case (StringType, false) =>
            GeoFunctions.stTransformWktToWkt(col(g), currentCrs.toInt, targetCrs.toInt)
          case (other, _) => throw new IllegalArgumentException(
            s"geometry column '$g' has unsupported type $other")
        }
        acc.withColumn(s"${g}_wkt", wkt)
      }.drop(geometry.names: _*)
  }
}
