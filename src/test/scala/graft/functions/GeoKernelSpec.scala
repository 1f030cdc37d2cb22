package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.io.WKBWriter

/** Golden/property tests for the geo kernel (SURVEY.md §7 M4) — the parts
  * the DuckDB oracle can't check offline (WKB byte parsing, BNG numerical
  * accuracy, force-2D semantics). */
class GeoKernelSpec extends AnyFunSuite {

  test("WKB roundtrip: point → bytes → parse → same coords") {
    val p = GeoFunctions.point(-0.1275, 51.5072)
    val bytes = GeoFunctions.toWkb(p)
    val back = GeoFunctions.parseWkb(bytes).get
    assert(back.getCentroid.getX == -0.1275 && back.getCentroid.getY == 51.5072)
  }

  test("hex-WKB parse matches binary parse (geo_strategy.rs:157-158)") {
    val p = GeoFunctions.point(2.5, -3.25)
    val hex = WKBWriter.toHex(GeoFunctions.toWkb(p))
    val g = GeoFunctions.parseHexWkb(hex).get
    assert(g.getCentroid.getX == 2.5 && g.getCentroid.getY == -3.25)
  }

  test("invalid WKB / hex / WKT parse to None, never throw") {
    assert(GeoFunctions.parseWkb(Array[Byte](1, 2, 3)).isEmpty)
    assert(GeoFunctions.parseHexWkb("zznothex").isEmpty)
    assert(GeoFunctions.parseWkt("POINT(oops)").isEmpty)
    assert(GeoFunctions.parseWkb(null).isEmpty)
    assert(GeoFunctions.parseWkt(null).isEmpty)
  }

  test("force2D drops Z (geo_strategy.rs:283-289)") {
    val g = GeoFunctions.parseWkt("POINT Z (1 2 3)").get
    val wkt = GeoFunctions.toWkt2D(GeoFunctions.force2D(g))
    assert(wkt == "POINT (1 2)")
  }

  test("WKT of integral coords has no decimal point (oracle string parity)") {
    assert(GeoFunctions.toWkt2D(GeoFunctions.point(-180.0, 90.0)) == "POINT (-180 90)")
    assert(GeoFunctions.toWkt2D(GeoFunctions.point(0.5, -2.25)) == "POINT (0.5 -2.25)")
  }

  test("web mercator forward matches published constants") {
    // lon 180 → πR; lat 0 → 0
    val (x, _) = CrsTransform.lonLatToWebMercator(180.0, 0.0)
    assert(math.abs(x - 20037508.342789244) < 1e-6)
    val (_, y0) = CrsTransform.lonLatToWebMercator(0.0, 0.0)
    assert(math.abs(y0) < 1e-8) // tan(π/4) ≈ 1 − 1ulp, so not exactly 0

  }

  test("web mercator roundtrip < 1e-9 deg") {
    for (lon <- -170 to 170 by 37; lat <- -80 to 80 by 23) {
      val (x, y) = CrsTransform.lonLatToWebMercator(lon, lat)
      val (lo, la) = CrsTransform.webMercatorToLonLat(x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9)
    }
  }

  test("BNG forward matches OS worked example within single-Helmert accuracy") {
    // OS "A guide to coordinate systems in Great Britain" worked example:
    // ETRS89 φ=52°39'28.8282"N λ=1°42'57.8663"E → OSGB36 National Grid
    // E=651409.903 N=313177.270. A single 7-param Helmert is ±5 m.
    val lat = 52.0 + 39.0 / 60 + 28.8282 / 3600
    val lon = 1.0 + 42.0 / 60 + 57.8663 / 3600
    val (e, n) = CrsTransform.lonLatToOsgb(lon, lat)
    assert(math.abs(e - 651409.903) < 6.0, s"easting $e")
    assert(math.abs(n - 313177.270) < 6.0, s"northing $n")
  }

  test("BNG roundtrip < 1e-6 deg over a GB grid") {
    for (lon <- Seq(-5.5, -3.0, -0.1, 1.5); lat <- Seq(50.2, 52.5, 55.0, 58.3)) {
      val (e, n) = CrsTransform.lonLatToOsgb(lon, lat)
      val (lo, la) = CrsTransform.osgbToLonLat(e, n)
      assert(math.abs(lo - lon) < 1e-6 && math.abs(la - lat) < 1e-6, s"($lon,$lat)")
    }
  }

  test("transform routes through 4326 for 27700→3857") {
    val (e, n) = CrsTransform.lonLatToOsgb(-0.1275, 51.5072) // London
    val (mx, my) = CrsTransform.transform(e, n, 27700, 3857)
    val (lon, lat) = CrsTransform.webMercatorToLonLat(mx, my)
    assert(math.abs(lon - -0.1275) < 1e-5 && math.abs(lat - 51.5072) < 1e-5)
  }

  test("transform same-CRS is identity (geo_strategy.rs:281-291 short-circuit)") {
    assert(CrsTransform.transform(1.25, 2.5, 4326, 4326) == ((1.25, 2.5)))
  }

  test("unsupported EPSG throws IllegalArgumentException") {
    intercept[IllegalArgumentException](CrsTransform.transform(0, 0, 4326, 32630))
  }

  test("CRS range inference port (geo_strategy.rs:228-253)") {
    import CrsInference.inferCrsFromRanges
    assert(inferCrsFromRanges(-0.5, 0.5, 51.0, 52.0) == "4326")     // tight lon/lat
    assert(inferCrsFromRanges(400000, 450000, 100000, 200000) == "27700")
    assert(inferCrsFromRanges(-2e6, 2e6, -2e6, 2e6) == "3857")      // wide meters
    assert(inferCrsFromRanges(-170, 170, -80, 80) == "4326")        // wide degrees → falls to 3857? no: fails 4326 tightness, fails 27700 (neg), 3857 width>10000? range 340 < 10000 → default 4326
    assert(inferCrsFromRanges(Double.NaN, 0, 0, 0) == "4326")       // NaN → default
  }

  test("native SQL surface coerces argument types like the UDF fallback") {
    val spark = graft.TestSpark.spark
    // integer literals (and numeric strings) must analyze on the
    // extensions-injected surface exactly as they do through the UDF
    // registry — the expressions carry ImplicitCastInputTypes, so the
    // analyzer inserts the casts (ADVICE rounds 2/3)
    val wkt = spark.sql("SELECT st_point_wkt(1, 2) AS w").collect()(0).getString(0)
    assert(wkt == spark.sql("SELECT st_point_wkt(1.0D, 2.0D) AS w").collect()(0).getString(0))
    val cx = spark.sql("SELECT st_centroid_x_wkt('POINT (3 4)') AS x").collect()(0).getDouble(0)
    assert(cx == 3.0)
    assert(spark.sql("SELECT infer_crs(-1, 1, 51, 52) AS c").collect()(0).getString(0) == "4326")
  }

  test("directly-constructed expressions coerce integer children (ImplicitCastInputTypes)") {
    // the coercion must live on the EXPRESSION, not the SQL builder: a
    // Column-API caller composing the raw Catalyst node gets the same
    // analyzer-inserted casts as SQL text
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = graft.TestSpark.spark
    val direct = spark.range(1)
      .select(Bridge.column(GeoKernelExpressions.StPointWkt(Literal(1), Literal(2))).as("w"))
      .collect()(0).getString(0)
    assert(direct == spark.sql("SELECT st_point_wkt(1.0D, 2.0D)").collect()(0).getString(0))
    val crs = spark.range(1)
      .select(Bridge.column(GeoKernelExpressions.InferCrs(
        Seq(Literal(-1), Literal(1), Literal(51), Literal(52)))).as("c"))
      .collect()(0).getString(0)
    assert(crs == "4326")
  }

  test("transformGeom reprojects every vertex of a linestring") {
    val g = GeoFunctions.parseWkt("LINESTRING (0 0, 10 10)").get
    val t = GeoFunctions.transformGeom(g, 4326, 3857)
    val cs = t.getCoordinates
    assert(math.abs(cs(0).x) < 1e-9 && math.abs(cs(0).y) < 1e-9)
    val (ex, ey) = CrsTransform.lonLatToWebMercator(10, 10)
    assert(math.abs(cs(1).x - ex) < 1e-9 && math.abs(cs(1).y - ey) < 1e-9)
  }

  test("force2D and transformGeom NEVER change the geometry type") {
    // the GeometryTransformer formulation collapsed 1-element multis to
    // their lone part (ST_Force2D / reprojection are type-preserving by
    // contract) — pin the law over every shape incl. the degenerate ones
    val wkts = Seq(
      "POINT (1 2)", "LINESTRING (0 0, 1 1)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
      "MULTIPOINT ((1 1))", "MULTILINESTRING ((0 0, 1 1))",
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))")
    wkts.foreach { w =>
      val g = GeoFunctions.parseWkt(w).get
      assert(GeoFunctions.force2D(g).getGeometryType == g.getGeometryType,
        s"force2D changed type of $w")
      assert(GeoFunctions.transformGeom(g, 4326, 3857).getGeometryType
        == g.getGeometryType, s"transformGeom changed type of $w")
    }
  }
}
