package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}

import scala.jdk.CollectionConverters._

/** GeoJSON → DataFrame, the Spark composite for the reference's
  * `st_read('file.geojson')` CTAS (core_processor.rs:393-398): flatten the
  * FeatureCollection into one row per feature with its properties as
  * columns plus the geometry as WKB `BinaryType` (column name `geometry`,
  * matching what GDAL/st_read exposes).
  *
  * Plan shape: `spark.read.json(multiLine)` → `explode(features)` →
  * `properties.*` + a geometry-decode kernel over the feature's geometry
  * JSON. The JSON scan and explode distribute normally; only the per-row
  * geometry decode is a UDF. GeoJSON coordinate nesting is heterogeneous
  * across geometry types, so the decoder works from the raw JSON text of
  * the geometry node (via `to_json`) rather than a Spark-inferred struct —
  * inference over mixed-depth arrays is lossy.
  */
object GeoJsonReader {

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", true).json(path)
    val cols = raw.columns.toSet

    val features =
      if (cols.contains("features"))
        raw.select(explode(col("features")).as("f")) // FeatureCollection
      else if (cols.contains("geometry"))
        raw.select(struct(raw.columns.map(col): _*).as("f")) // single Feature
      else
        throw new IllegalArgumentException(s"'$path' is not Feature/FeatureCollection GeoJSON")

    val fSchema = features.schema("f").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val propCols: Seq[org.apache.spark.sql.Column] =
      if (fSchema.fieldNames.contains("properties"))
        fSchema("properties").dataType match {
          case s: org.apache.spark.sql.types.StructType if s.nonEmpty =>
            Seq(col("f.properties.*"))
          case _ => Seq.empty
        }
      else Seq.empty

    features.select(propCols :+ geoJsonToWkb(to_json(col("f.geometry"))).as("geometry"): _*)
  }

  // one mapper per JVM: ObjectMapper construction is heavyweight and
  // readTree is thread-safe — a per-row instance would dominate the scan
  @transient private lazy val mapper = new ObjectMapper()

  /** GeoJSON geometry JSON text → WKB bytes (null on any malformation —
    * the pipeline-wide invalid→NULL contract). */
  val geoJsonToWkb = udf { (geojson: String) =>
    if (geojson == null) null
    else
      try GeoFunctionsBridge.toWkb(parseGeometry(mapper.readTree(geojson)))
      catch { case _: Exception => null }
  }

  private val gf = new GeometryFactory()

  private def coord(n: JsonNode): Coordinate =
    new Coordinate(n.get(0).asDouble(), n.get(1).asDouble())

  private def coords(n: JsonNode): Array[Coordinate] =
    n.elements().asScala.map(coord).toArray

  /** RFC 7946 geometry object → JTS (all seven types). */
  def parseGeometry(node: JsonNode): Geometry = node.get("type").asText() match {
    case "Point" => gf.createPoint(coord(node.get("coordinates")))
    case "MultiPoint" => gf.createMultiPointFromCoords(coords(node.get("coordinates")))
    case "LineString" => gf.createLineString(coords(node.get("coordinates")))
    case "MultiLineString" =>
      gf.createMultiLineString(
        node.get("coordinates").elements().asScala.map(l => gf.createLineString(coords(l))).toArray)
    case "Polygon" => polygon(node.get("coordinates"))
    case "MultiPolygon" =>
      gf.createMultiPolygon(
        node.get("coordinates").elements().asScala.map(polygon).toArray)
    case "GeometryCollection" =>
      gf.createGeometryCollection(
        node.get("geometries").elements().asScala.map(parseGeometry).toArray)
    case other => throw new IllegalArgumentException(s"unknown geometry type '$other'")
  }

  private def polygon(rings: JsonNode): org.locationtech.jts.geom.Polygon = {
    val all = rings.elements().asScala.map(r => gf.createLinearRing(coords(r))).toArray
    if (all.isEmpty) gf.createPolygon()
    else gf.createPolygon(all.head, all.tail)
  }
}

/** Indirection so the UDF closure doesn't capture GeoJsonReader itself. */
private object GeoFunctionsBridge {
  def toWkb(g: Geometry): Array[Byte] = graft.functions.GeoFunctions.toWkb(g)
}
