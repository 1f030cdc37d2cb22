package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}

import scala.jdk.CollectionConverters._

/** GeoJSON → DataFrame, replacing the reference's `st_read('f.geojson')`
  * CTAS (core_processor.rs:393-398): one row per feature, properties as
  * typed columns plus the geometry as WKB `BinaryType` (column name
  * `geometry`, matching what GDAL/st_read exposes).
  *
  * Parsed with Jackson on the DRIVER like the other container readers:
  * a multiLine JSON document is unsplittable for Spark's JSON source
  * anyway (one task reads the whole file), and Spark schema inference
  * over GeoJSON is actively lossy — `coordinates` nesting differs per
  * geometry type, so a FeatureCollection mixing Polygon with MultiPolygon
  * collapses to strings and silently NULLs the deeper geometries. Direct
  * parsing handles every RFC 7946 mix. The resulting DataFrame
  * distributes normally.
  */
object GeoJsonReader {

  // one mapper per JVM: ObjectMapper construction is heavyweight
  private lazy val mapper = new ObjectMapper()

  def read(spark: SparkSession, path: String): DataFrame = {
    val root = mapper.readTree(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val feats: Seq[JsonNode] =
      if (root.has("features")) root.get("features").elements().asScala.toSeq
      else if (root.has("geometry")) Seq(root) // single Feature
      else throw new IllegalArgumentException(
        s"'$path' is not Feature/FeatureCollection GeoJSON")

    // property keys in first-seen document order
    val keys: Seq[String] = {
      val seen = scala.collection.mutable.LinkedHashSet[String]()
      feats.foreach { f =>
        Option(f.get("properties")).filter(_.isObject)
          .foreach(_.fieldNames().asScala.foreach(seen.add))
      }
      seen.toSeq
    }

    def propVal(f: JsonNode, k: String): Any = {
      val n = Option(f.get("properties")).map(_.get(k)).orNull
      if (n == null || n.isNull) null
      else if (n.isIntegralNumber) n.asLong()
      else if (n.isNumber) n.asDouble()
      else if (n.isBoolean) java.lang.Boolean.valueOf(n.asBoolean())
      else if (n.isTextual) n.asText()
      else n.toString // nested object/array → compact JSON text
    }

    val cells: Seq[IndexedSeq[Any]] = feats.map { f =>
      val geom: Any = Option(f.get("geometry")).filterNot(_.isNull)
        .flatMap(g => scala.util.Try(parseGeometry(g)).toOption) // invalid → NULL
        .map(graft.functions.GeoFunctions.toWkb).orNull
      (keys.map(k => propVal(f, k)) :+ geom).toIndexedSeq
    }

    // per-property type: widen over all values (Long ⊂ Double; else text)
    def typeOf(i: Int): DataType = {
      val vs = cells.iterator.map(_(i)).filter(_ != null).toSeq
      if (vs.isEmpty) StringType
      else if (vs.forall(_.isInstanceOf[Long])) LongType
      else if (vs.forall(v => v.isInstanceOf[Long] || v.isInstanceOf[Double])) DoubleType
      else if (vs.forall(_.isInstanceOf[java.lang.Boolean])) BooleanType
      else StringType
    }
    val propTypes = keys.indices.map(typeOf)
    val schema = StructType(
      keys.zip(propTypes).map { case (k, t) => StructField(k, t) } :+
        StructField("geometry", BinaryType))
    val rows = cells.map { c =>
      Row.fromSeq(c.zipWithIndex.map {
        case (null, _) => null
        case (v, i) if i >= keys.length => v // geometry bytes
        case (v: Long, i) if propTypes(i) == DoubleType => v.toDouble
        case (v, i) if propTypes(i) == StringType && !v.isInstanceOf[String] => v.toString
        case (v, _) => v
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 50000)), schema)
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
