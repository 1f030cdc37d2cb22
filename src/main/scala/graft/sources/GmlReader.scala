package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GML (OGC Geography Markup Language) → DataFrame — the second
  * beyond-reference XML geo format after KML (GDAL's `st_read` accepts
  * GML; the reference's detection never dispatches it). Same
  * Spark-first shape as [[KmlReader]]: the feature parse rides the
  * BUILT-IN XML datasource with an EXPLICIT schema, so it runs in scan
  * tasks on executors and a directory of GML files scans with full
  * parallelism.
  *
  * Unlike KML (fixed Placemark shape), GML feature types are
  * user-defined — the schema lives in the `.xsd` SIDECAR the format
  * ships alongside the data (GDAL's driver resolves it the same way,
  * falling back to a `.gfs` scan-inference this reader deliberately
  * omits: no sidecar is a loud error, not a silent second pass). The
  * sidecar is a tiny driver-side parse (scala-xml); the data file is
  * never read on the driver beyond two bounded sniffs:
  *
  *  - feature tag + property names/types come from the XSD
  *    (`xs:element substitutionGroup="gml:_Feature"` names the row tag;
  *    its complexType's sequence lists the properties);
  *  - the CRS comes from the FIRST `srsName` attribute in a bounded
  *    4 KB prefix of the data file (one file = one source system = one
  *    CRS — the same contract as the landing-zone ingest), stamped into
  *    the geometry field's metadata under [[GmlReader.CrsTag]] exactly
  *    like GeoPackageReader stamps its container SRS, so
  *    IngestPipeline.currentCrs reads it from the schema without
  *    re-scanning data.
  *
  * Axis order is handled per the GDAL convention: legacy
  * `srsName="EPSG:4326"` means lon/lat storage; the urn form
  * `urn:ogc:def:crs:EPSG::4326` means the official lat/lon axis order,
  * so positions are SWAPPED when composing WKT (which is always x y).
  * gml:Point/gml:pos and gml:LineString/gml:posList compose to WKT via
  * codegen'd column expressions.
  */
object GmlReader {

  /** Geometry-field metadata key carrying the sniffed EPSG code. */
  val CrsTag = "graft.gml.epsg"

  private[sources] case class Sidecar(
      featureTag: String, props: Seq[(String, String)])

  /** Resolve the `.xsd` sidecar: `<data>.gml → <data>.xsd`, or the first
    * `*.xsd` inside a directory of containers. */
  private def sidecarPath(path: String): java.nio.file.Path = {
    val p = java.nio.file.Paths.get(path)
    val candidate =
      if (java.nio.file.Files.isDirectory(p))
        Option(p.toFile.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.toLowerCase.endsWith(".xsd")).sortBy(_.getName)
          .headOption.map(_.toPath)
      else {
        val s = path.replaceAll("\\.[Gg][Mm][Ll]$", ".xsd")
        Some(java.nio.file.Paths.get(s)).filter(_ != p)
      }
    candidate.filter(java.nio.file.Files.exists(_)).getOrElse(
      throw new IllegalArgumentException(
        s"GML schema sidecar (.xsd) not found beside '$path' — this reader " +
          "resolves feature schemas from the sidecar (GDAL's .gfs " +
          "scan-inference fallback is out of scope)"))
  }

  /** Driver-side XSD parse: feature element name + (property, xsd type). */
  private[sources] def parseSidecar(xsdPath: java.nio.file.Path): Sidecar = {
    val root = scala.xml.XML.loadFile(xsdPath.toFile)
    val featureEl = (root \ "element")
      .find(e => (e \@ "substitutionGroup").endsWith("_Feature"))
      .getOrElse(throw new IllegalArgumentException(
        s"no xs:element with substitutionGroup gml:_Feature in '$xsdPath'"))
    val featureTag = featureEl \@ "name"
    val props = (root \ "complexType" \\ "element").map { e =>
      ((e \@ "name"), (e \@ "type"))
    }.filter(_._1.nonEmpty)
    require(props.nonEmpty, s"feature type in '$xsdPath' declares no properties")
    Sidecar(featureTag, props)
  }

  private def sparkType(xsd: String): DataType = xsd match {
    case "xs:string" => StringType
    case "xs:integer" | "xs:long" | "xs:int" => LongType
    case "xs:double" | "xs:decimal" => DoubleType
    case "xs:boolean" => BooleanType
    case t => throw new IllegalArgumentException(s"unsupported XSD type '$t'")
  }

  private def isGeometry(xsd: String): Boolean =
    xsd == "gml:GeometryPropertyType" || xsd == "gml:PointPropertyType" ||
      xsd == "gml:CurvePropertyType"

  /** Bounded 4 KB prefix sniff of the first data file for
    * `srsName="..."`; EPSG code = trailing digits; urn/http forms imply
    * the official lat/lon axis order (swap = true). Absent → 4326
    * lon/lat (GML without srsName defaults to CRS84 in practice). */
  private[sources] def sniffSrs(path: String): (String, Boolean) = {
    val p = java.nio.file.Paths.get(path)
    val dataFile =
      if (java.nio.file.Files.isDirectory(p))
        Option(p.toFile.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.toLowerCase.endsWith(".gml")).sortBy(_.getName)
          .headOption.map(_.getAbsolutePath).getOrElse(path)
      else path
    // readNBytes, not a single read(): a short first read would truncate
    // the sniffed prefix and an srsName landing beyond it would silently
    // default the CRS to 4326 — a wrong-answer fallback, not a crash
    val prefix = scala.util.Using.resource(
      new java.io.FileInputStream(dataFile)) { in =>
      new String(in.readNBytes(4096), java.nio.charset.StandardCharsets.UTF_8)
    }
    "srsName=\"([^\"]+)\"".r.findFirstMatchIn(prefix) match {
      case Some(m) =>
        val v = m.group(1)
        val epsg = "([0-9]+)$".r.findFirstIn(v).getOrElse("4326")
        (epsg, v.startsWith("urn:") || v.startsWith("http"))
      case None => ("4326", false)
    }
  }

  def read(s: SparkSession, path: String): DataFrame = {
    val side = parseSidecar(sidecarPath(path))
    val (epsg, latLonOrder) = sniffSrs(path)

    // one fixed geometry sub-schema per geometry property: the two OGC
    // simple shapes this kernel composes (Point/pos, LineString/posList)
    val geomStruct = StructType(Seq(
      StructField("gml:Point", StructType(Seq(StructField("gml:pos", StringType)))),
      StructField("gml:LineString", StructType(Seq(StructField("gml:posList", StringType))))))
    val fields = side.props.map { case (name, t) =>
      if (isGeometry(t)) StructField(name, geomStruct)
      else StructField(name, sparkType(t))
    }

    // directory reads skip the .xsd sidecars (they carry no rowTag
    // elements, but there is no reason to open them in scan tasks)
    val reader = s.read.format("xml")
      .option("rowTag", side.featureTag)
      .schema(StructType(fields))
    val raw = (if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path)))
      reader.option("pathGlobFilter", "*.gml") else reader).load(path)

    // "a b" pos → "x y" WKT coords, swapping when the urn form declared
    // the official lat/lon axis order (WKT is always x y)
    def xy(pair: Column): Column = {
      val t = split(trim(pair), "\\s+")
      if (latLonOrder) concat(element_at(t, 2), lit(" "), element_at(t, 1))
      else concat(element_at(t, 1), lit(" "), element_at(t, 2))
    }
    def lineWkt: Column = {
      val sw = if (latLonOrder) "concat(`__gml_s`[2*i+1], ' ', `__gml_s`[2*i])"
      else "concat(`__gml_s`[2*i], ' ', `__gml_s`[2*i+1])"
      concat(lit("LINESTRING ("),
        array_join(expr(
          s"transform(sequence(0, int(size(`__gml_s`)/2) - 1), i -> $sw)"), ", "),
        lit(")"))
    }
    val geomMeta = new MetadataBuilder()
      .putBoolean(SchemaHeuristics.GeometryTag, true)
      .putString(CrsTag, epsg).build()

    side.props.foldLeft(raw) { case (df, (name, t)) =>
      if (!isGeometry(t)) df
      else df
        .withColumn("__gml_s",
          split(trim(col(s"`$name`")("gml:LineString")("gml:posList")), "\\s+"))
        .withColumn(name,
          when(col(s"`$name`")("gml:Point")("gml:pos").isNotNull,
            concat(lit("POINT ("), xy(col(s"`$name`")("gml:Point")("gml:pos")), lit(")")))
            .when(col(s"`$name`")("gml:LineString")("gml:posList").isNotNull, lineWkt))
        .withMetadata(name, geomMeta)
        .drop("__gml_s")
    }
  }
}
