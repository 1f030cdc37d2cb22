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

  private val GeometryTypes = Set("Point", "MultiPoint", "LineString",
    "MultiLineString", "Polygon", "MultiPolygon", "GeometryCollection")

  def read(spark: SparkSession, path: String): DataFrame = {
    val (schema, rows) = parsed(path)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq),
        math.max(1, rows.length / 50000)), schema)
  }

  /** Whole-document parse in external types — the [[ContainerSource]]
    * DSv2 contract (`spark.read.format("geojson")`): geometry as WKB
    * bytes, properties widened per document exactly like [[read]]. */
  def parsed(path: String): (StructType, Seq[Seq[Any]]) = {
    val root = mapper.readTree(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    // document kind by the RFC 7946 `type` member (presence checks alone
    // would misroute a Feature carrying a foreign member named "features",
    // and miss bare Geometry documents that GDAL/st_read ingests)
    val rootType = Option(root.get("type")).map(_.asText()).getOrElse("")
    val feats: Seq[JsonNode] = rootType match {
      case "FeatureCollection"
          if root.has("features") && root.get("features").isArray =>
        root.get("features").elements().asScala.toSeq
      case "Feature" => Seq(root)
      case t if GeometryTypes(t) => // bare geometry: one row, no properties
        val wrapper = mapper.createObjectNode()
        wrapper.set[JsonNode]("geometry", root)
        Seq(wrapper)
      case _ => throw new IllegalArgumentException(
        s"'$path' is not Feature/FeatureCollection/Geometry GeoJSON")
    }

    // property keys in first-seen document order
    val keys: Seq[String] = {
      val seen = scala.collection.mutable.LinkedHashSet[String]()
      feats.foreach { f =>
        Option(f.get("properties")).filter(_.isObject)
          .foreach(_.fieldNames().asScala.foreach(seen.add))
      }
      seen.toSeq
    }

    def propVal(props: JsonNode, k: String): Any = {
      val n = if (props == null) null else props.get(k)
      if (n == null || n.isNull) null
      else if (n.isIntegralNumber && n.canConvertToLong) n.asLong()
      else if (n.isIntegralNumber) n.asText() // beyond Long: keep exact text
      else if (n.isNumber) n.asDouble()
      else if (n.isBoolean) java.lang.Boolean.valueOf(n.asBoolean())
      else if (n.isTextual) n.asText()
      else n.toString // nested object/array → compact JSON text
    }

    var geomPresent = 0
    var geomParsed = 0
    val cells: Seq[IndexedSeq[Any]] = feats.map { f =>
      val props = Option(f.get("properties")).filter(_.isObject).orNull
      val geomNode = Option(f.get("geometry")).filterNot(_.isNull)
      geomPresent += geomNode.size
      val geom: Any = geomNode
        .flatMap(g => scala.util.Try(parseGeometry(g)).toOption) // invalid → NULL
        .map { g => geomParsed += 1; graft.functions.GeoFunctions.toWkb(g) }
        .orNull
      (keys.map(k => propVal(props, k)) :+ geom).toIndexedSeq
    }
    // per-row invalid→NULL mirrors the reference's error tolerance, but
    // EVERY geometry failing means the file (or this parser) is broken —
    // fail fast rather than report an all-NULL ingest as success
    if (geomPresent > 0 && geomParsed == 0)
      throw new IllegalArgumentException(
        s"'$path': none of $geomPresent geometries parsed — malformed GeoJSON")

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
    // a property literally named "geometry" must not collide with the
    // geometry column (duplicate names break downstream resolution)
    def propName(k: String) = if (k == "geometry") "geometry_prop" else k
    val schema = StructType(
      keys.zip(propTypes).map { case (k, t) => StructField(propName(k), t) } :+
        StructField("geometry", BinaryType))
    val rows: Seq[Seq[Any]] = cells.map { c =>
      c.zipWithIndex.map {
        case (null, _) => null
        case (v, i) if i >= keys.length => v // geometry bytes
        case (v: Long, i) if propTypes(i) == DoubleType => v.toDouble
        case (v, i) if propTypes(i) == StringType && !v.isInstanceOf[String] => v.toString
        case (v, _) => v
      }.toSeq
    }
    (schema, rows)
  }

  private val gf = new GeometryFactory()

  private def coord(n: JsonNode): Coordinate =
    new Coordinate(n.get(0).asDouble(), n.get(1).asDouble())

  private def coords(n: JsonNode): Array[Coordinate] =
    n.elements().asScala.map(coord).toArray

  /** RFC 7946 geometry object → JTS (all seven types). Collection
    * nesting is bounded: a hostile GeometryCollection nested hundreds
    * deep must fail as a parse error, not a StackOverflowError (an
    * Error would kill the executor thread mid-scan); no legitimate
    * GeoJSON nests collections anywhere near 32. */
  def parseGeometry(node: JsonNode): Geometry = parseGeometry(node, depth = 0)

  private def parseGeometry(node: JsonNode, depth: Int): Geometry = {
    require(depth <= 32,
      s"corrupt geojson: GeometryCollection nesting exceeds 32 levels")
    node.get("type").asText() match {
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
        node.get("geometries").elements().asScala
          .map(parseGeometry(_, depth + 1)).toArray)
    case other => throw new IllegalArgumentException(s"unknown geometry type '$other'")
    }
  }

  private def polygon(rings: JsonNode): org.locationtech.jts.geom.Polygon = {
    val all = rings.elements().asScala.map(r => gf.createLinearRing(coords(r))).toArray
    if (all.isEmpty) gf.createPolygon()
    else gf.createPolygon(all.head, all.tail)
  }
}
