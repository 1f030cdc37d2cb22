package graft.sources

import org.apache.spark.sql.types._

/** Geometry-column discovery over a Spark schema — a driver-side port of
  * the reference's `information_schema.columns` heuristics
  * (core_processor.rs:165-195) and its 14-pattern coordinate-pair finder
  * (core_processor.rs:198-267). Pure functions over `StructType`: no Spark
  * job runs, so discovery costs the same at 100 TB as at 1 row.
  */
object SchemaHeuristics {

  /** Result of discovery: geometry column names, plus the (x, y) source
    * pair when the geometry is latent coordinates in a CSV/Excel table
    * (reference's `coordinate_columns`, core_processor.rs:47). */
  final case class GeometryColumns(
      names: Seq[String],
      coordinatePair: Option[(String, String)])

  /** Dispatch on file type exactly like `find_geometry_columns`
    * (core_processor.rs:165-171): CSV/Excel → latent coordinate pairs;
    * everything else → type/name heuristics. */
  def findGeometryColumns(schema: StructType, fileType: FileType): GeometryColumns =
    fileType match {
      case FileType.Csv | FileType.Excel => findCoordinatePairs(schema.fieldNames)
      case _ => GeometryColumns(geometryColumnsByType(schema), None)
    }

  /** The reference's type/name disjunction (core_processor.rs:172-190),
    * translated to Spark types. DuckDB `GEOMETRY` has no Spark analogue
    * (geometry arrives as WKB bytes), so that arm folds into the BLOB arm:
    *  - BinaryType named like geo/geom           (BLOB LIKE '%geo%'/'%geom%')
    *  - non-(DOUBLE|INTEGER|VARCHAR) types named like geom or exactly
    *    'geometry'                               (the catch-all arm)
    * `gdb_geomattr_data` (an ESRI FileGDB internal) is excluded (:189). */
  def geometryColumnsByType(schema: StructType): Seq[String] = {
    // Reader-authoritative arm — the Spark stand-in for DuckDB's GEOMETRY
    // data type: readers that KNOW their geometry column (GeoPackage's
    // gpkg_geometry_columns) tag the field with metadata, catching columns
    // the name heuristic cannot (e.g. ArcGIS's default 'Shape').
    val tagged = schema.fields.iterator.filter(f =>
      f.metadata.contains(GeometryTag) && f.metadata.getBoolean(GeometryTag))
      .map(_.name).toSeq
    val heuristic = schema.fields.iterator.filter { f =>
      val n = f.name
      val isBlob = f.dataType == BinaryType
      // the reference excludes DOUBLE|INTEGER|VARCHAR (core_processor.rs:
      // 179); Spark readers additionally surface BIGINT/BOOLEAN/FLOAT
      // scalars (e.g. JSON integers become LongType) — excluding those too
      // is the faithful translation of "plain scalars are never geometry"
      val isExcludedScalar = f.dataType match {
        case DoubleType | IntegerType | StringType |
             LongType | BooleanType | FloatType | ShortType => true
        case _ => false
      }
      (isBlob && (n.contains("geo") || n.contains("geom"))) ||
      (!isExcludedScalar && (n.contains("geom") || n == "geometry"))
    }.map(_.name).toSeq
    (tagged ++ heuristic).distinct.filterNot(_ == "gdb_geomattr_data")
  }

  /** Field-metadata key readers use to mark a known geometry column. */
  val GeometryTag = "graft.geometry"

  // The 14 (x, y) name patterns, in priority order; generic ("x","y") is
  // deliberately last (core_processor.rs:213-232).
  private[sources] val CoordinatePatterns: Seq[(String, String)] = Seq(
    ("X-coordinate", "Y-coordinate"),
    ("x-coordinate", "y-coordinate"),
    ("x_coordinate", "y_coordinate"),
    ("longitude", "latitude"),
    ("long", "lat"),
    ("lng", "lat"),
    ("lon", "lat"),
    ("easting", "northing"),
    ("east", "north"),
    ("point_x", "point_y"),
    ("pt_x", "pt_y"),
    ("x_coord", "y_coord"),
    ("xcoord", "ycoord"),
    ("x", "y"))

  /** A column matches a pattern if (lowercased) it equals the pattern, or
    * contains it AND contains "coord" or the axis letter — the guard keeps
    * e.g. "long_description" from matching "long" unless it also smells
    * coordinate-ish. Operator precedence mirrors the Rust (`== || (contains
    * && guard)`, core_processor.rs:234-247); first pattern with both sides
    * found wins and the scan stops (:258). */
  private def matches(col: String, pattern: String, axis: String): Boolean = {
    val c = col.toLowerCase
    c == pattern.toLowerCase ||
      (c.contains(pattern.toLowerCase) && (c.contains("coord") || c.contains(axis)))
  }

  /** Synthetic geometry-column name `geom_from_<x>_<y>` with the same char
    * cleanup as the reference (core_processor.rs:252-255). */
  def syntheticGeomName(xCol: String, yCol: String): String = {
    def clean(s: String) =
      s.replace("-", "_").replace(" ", "_").replace("(", "").replace(")", "")
    s"geom_from_${clean(xCol)}_${clean(yCol)}"
  }

  def findCoordinatePairs(columns: Seq[String]): GeometryColumns = {
    // NOTE: the reference lowercases the *pattern table* entries implicitly
    // (they are already lowercase except the first), and compares against
    // lowercased column names; we lower both sides for the same behavior.
    CoordinatePatterns.iterator
      .map { case (xp, yp) =>
        (columns.find(matches(_, xp, "x")), columns.find(matches(_, yp, "y")))
      }
      .collectFirst { case (Some(x), Some(y)) =>
        GeometryColumns(Seq(syntheticGeomName(x, y)), Some((x, y)))
      }
      .getOrElse(GeometryColumns(Nil, None))
  }
}
