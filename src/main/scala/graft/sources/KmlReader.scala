package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** KML (OGC 07-147r2) → DataFrame — a beyond-reference geo format (the
  * reference's detection dispatches only its 6 types; GDAL's `st_read`
  * would accept KML if fed it, so this closes part of that gap
  * Spark-first): rides the BUILT-IN XML datasource with
  * `rowTag=Placemark`, so the parse runs in scan tasks on executors and
  * a directory of KML files scans with full parallelism — no driver-side
  * DOM (contrast GeoJsonReader, where multiLine JSON is unsplittable
  * anyway).
  *
  * The schema is EXPLICIT, not inferred: inference over KML collapses
  * under mixed geometry types and costs a second pass; declaring the
  * Placemark shape makes missing elements NULL and keeps one scan.
  * Output: `name`, `data` (ExtendedData as a map — attribute names are
  * data, not schema, so they cannot be columns without a driver probe),
  * and `geometry` as WKT tagged with [[SchemaHeuristics.GeometryTag]]
  * (the reader-authoritative arm, same contract as GeoPackage's
  * declared geometry). Point and LineString are composed to WKT by
  * codegen'd column expressions; KML mandates WGS84 lon/lat, which
  * IngestPipeline.currentCrs returns as the fixed EPSG:4326.
  */
object KmlReader {

  /** Placemark element shape: `_name`/`value` follow the XML source's
    * attribute-prefix convention; coordinates stay raw strings
    * (`lon,lat[,alt]` tuples, whitespace-separated for LineString). */
  private val PlacemarkSchema = StructType(Seq(
    StructField("name", StringType),
    StructField("ExtendedData", StructType(Seq(
      StructField("Data", ArrayType(StructType(Seq(
        StructField("_name", StringType),
        StructField("value", StringType)))))))),
    StructField("Point", StructType(Seq(
      StructField("coordinates", StringType)))),
    StructField("LineString", StructType(Seq(
      StructField("coordinates", StringType))))))

  def read(s: SparkSession, path: String): DataFrame = {
    val raw = s.read.format("xml")
      .option("rowTag", "Placemark")
      .schema(PlacemarkSchema)
      .load(path)
    // "lon,lat[,alt]" → "lon lat" (2D WKT; altitude dropped like GDAL's
    // default -dim XY)
    def xy(tuple: org.apache.spark.sql.Column) = concat(
      element_at(split(tuple, ","), 1), lit(" "),
      element_at(split(tuple, ","), 2))
    val pointWkt = concat(lit("POINT ("),
      xy(trim(col("Point.coordinates"))), lit(")"))
    val lineWkt = concat(lit("LINESTRING ("),
      array_join(transform(
        split(trim(col("LineString.coordinates")), "\\s+"), t => xy(t)), ", "),
      lit(")"))
    val geomMeta = new MetadataBuilder()
      .putBoolean(SchemaHeuristics.GeometryTag, true).build()
    raw.select(
      col("name"),
      map_from_entries(coalesce(
        expr("transform(ExtendedData.Data, d -> struct(d._name, d.value))"),
        array())).as("data"),
      when(col("Point.coordinates").isNotNull, pointWkt)
        .when(col("LineString.coordinates").isNotNull, lineWkt)
        .as("geometry", geomMeta))
  }
}
