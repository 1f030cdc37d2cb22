package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaHeuristicsSpec extends AnyFunSuite {

  private def schema(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  test("GEOMETRY-ish columns found by type/name disjunction") {
    val s = schema(
      "id" -> IntegerType,
      "name" -> StringType,
      "geom" -> BinaryType,          // BLOB named like geom
      "the_geometry" -> ArrayType(DoubleType), // non-scalar named like geom
      "geometry" -> DecimalType(10, 2), // exactly 'geometry', non-excluded type
      "geom_count" -> LongType,      // plain scalar: excluded (JSON ints)
      "is_geometric" -> BooleanType, // plain scalar: excluded
      "price" -> DoubleType)
    val found = SchemaHeuristics.geometryColumnsByType(s)
    assert(found == Seq("geom", "the_geometry", "geometry"))
  }

  test("gdb_geomattr_data is excluded (core_processor.rs:189)") {
    val s = schema("gdb_geomattr_data" -> BinaryType)
    assert(SchemaHeuristics.geometryColumnsByType(s).isEmpty)
  }

  test("DOUBLE/INTEGER/VARCHAR geom-named columns are NOT geometry") {
    val s = schema("geom_area" -> DoubleType, "geom_id" -> IntegerType, "geom_wkt" -> StringType)
    assert(SchemaHeuristics.geometryColumnsByType(s).isEmpty)
  }

  test("longitude/latitude coordinate pair detected for CSV") {
    val got = SchemaHeuristics.findCoordinatePairs(Seq("id", "Longitude", "Latitude"))
    assert(got.coordinatePair.contains(("Longitude", "Latitude")))
    assert(got.names == Seq("geom_from_Longitude_Latitude"))
  }

  test("priority order: x_coordinate beats generic x/y; first match wins") {
    val got = SchemaHeuristics.findCoordinatePairs(
      Seq("x", "y", "x_coordinate", "y_coordinate"))
    assert(got.coordinatePair.contains(("x_coordinate", "y_coordinate")))
  }

  test("generic x/y is last-resort but does match") {
    val got = SchemaHeuristics.findCoordinatePairs(Seq("x", "y", "value"))
    assert(got.coordinatePair.contains(("x", "y")))
  }

  test("contains-guard: 'long_description' alone does not trigger 'long'") {
    val got = SchemaHeuristics.findCoordinatePairs(Seq("long_description", "lat"))
    // 'long_description' contains "long" but not "coord"/"x" → no x match
    assert(got.coordinatePair.isEmpty)
  }

  test("synthetic geom name cleans -, space, parens (core_processor.rs:252-255)") {
    assert(SchemaHeuristics.syntheticGeomName("X-coord (east)", "Y coord") ==
      "geom_from_X_coord_east_Y_coord")
  }

  test("easting/northing pair detected") {
    val got = SchemaHeuristics.findCoordinatePairs(Seq("Easting", "Northing", "height"))
    assert(got.coordinatePair.contains(("Easting", "Northing")))
  }

  test("no pair → empty result") {
    val got = SchemaHeuristics.findCoordinatePairs(Seq("id", "name", "value"))
    assert(got.names.isEmpty && got.coordinatePair.isEmpty)
  }
}
