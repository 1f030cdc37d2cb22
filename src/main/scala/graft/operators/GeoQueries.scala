package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{CrsInference, GeoFunctions}

/** Geospatial parity queries (SURVEY.md §2.8, milestone M4).
  *
  * DuckDB's spatial extension cannot load offline, so each oracle is the
  * *arithmetic identity* of the geometry operation: coordinates are derived
  * deterministically from `customer` keys, the Spark side routes them
  * through the real JTS/CrsTransform kernel (WKT build → parse → centroid →
  * reproject), and the oracle computes what the answer must be in plain
  * SQL. Byte-level WKB/hex-WKB parsing and BNG numerical accuracy are
  * covered by ScalaTest golden fixtures (GeoKernelSpec) instead.
  *
  * Scale notes: every function here is a per-row scalar kernel — no
  * shuffle except the final presentation sort; a 100 TB table maps through
  * unchanged. UDF calls are the only non-codegen links (SURVEY.md §7.5
  * reserves Expression promotion for when bench data demands it).
  */
object GeoQueries {

  private def cust(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")

  // Integral synthetic lon/lat from the key — exact in double, exact in SQL.
  private val lonI = (col("c_custkey") % 360) - 180
  private val latI = (col("c_custkey") % 180) - 90
  // Offset variant for trig-heavy paths: keeps |lat| ≤ 80.5 (Mercator-safe).
  private val lonF = ((col("c_custkey") % 340) - 170).cast("double") + 0.5
  private val latF = ((col("c_custkey") % 160) - 80).cast("double") + 0.5

  def specs: Seq[QuerySpec] = Seq(

    // The geo kernel driven as SQL TEXT — the reference is a
    // SQL-generating engine, so its users write exactly this shape
    // (geo_strategy.rs:322-331 emits `ST_AsText(ST_Force2D(ST_Point(x,
    // y)))` SQL). st_point_wkt resolves through GraftExtensions'
    // injected NATIVE expression (the same codegen kernel the Column
    // API builds — no scalar-UDF node in this plan either); sessions
    // without the extension fall back to GeoFunctions.register's UDFs.
    QuerySpec(
      "sql_geo_point",
      (s, dir) => {
        if (!s.catalog.functionExists("st_point_wkt")) GeoFunctions.register(s)
        cust(s, dir).createOrReplaceTempView("customer")
        s.sql("""
          SELECT c_custkey,
                 st_point_wkt(CAST((c_custkey % 360) - 180 AS DOUBLE),
                              CAST((c_custkey % 180) - 90 AS DOUBLE)) AS wkt
          FROM customer ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey,
                     'POINT (' || CAST((c_custkey % 360) - 180 AS BIGINT)
                       || ' ' || CAST((c_custkey % 180) - 90 AS BIGINT) || ')' AS wkt
              FROM customer ORDER BY c_custkey""")),

    // ST_Point + ST_AsText: build a point from (x, y), write 2D WKT.
    // Exercises geo_strategy.rs:322-331's coordinate-pair path.
    QuerySpec(
      "geo_point_wkt",
      (s, dir) =>
        cust(s, dir)
          .select(col("c_custkey"),
            GeoFunctions.stPointWkt(lonI.cast("double"), latI.cast("double")).as("wkt"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
                     'POINT (' || CAST((c_custkey % 360) - 180 AS BIGINT)
                       || ' ' || CAST((c_custkey % 180) - 90 AS BIGINT) || ')' AS wkt
              FROM customer ORDER BY c_custkey""")),

    // WKT parse → centroid X/Y roundtrip: both sides build the same WKT
    // text; Spark re-parses it through JTS (geo_strategy.rs:174-183's text
    // probe) and must recover the inputs exactly.
    QuerySpec(
      "geo_wkt_centroid",
      (s, dir) => {
        val wkt = concat(lit("POINT ("), lonI.cast("string"), lit(" "),
          latI.cast("string"), lit(")"))
        cust(s, dir)
          .select(col("c_custkey"), wkt.as("wkt"))
          .select(col("c_custkey"),
            GeoFunctions.centroidXFromWkt(col("wkt")).as("cx"),
            GeoFunctions.centroidYFromWkt(col("wkt")).as("cy"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
                     CAST((c_custkey % 360) - 180 AS DOUBLE) AS cx,
                     CAST((c_custkey % 180) - 90 AS DOUBLE) AS cy
              FROM customer ORDER BY c_custkey""")),

    // ST_Transform 4326→3857 (spherical Web Mercator, closed form) —
    // oracle recomputes the published formula; cm-rounding absorbs libm
    // last-ulp skew between JVM and DuckDB.
    QuerySpec(
      "geo_webmercator",
      (s, dir) =>
        cust(s, dir)
          .select(col("c_custkey"),
            round(GeoFunctions.toMercX(lonF), 2).as("mx"),
            round(GeoFunctions.toMercY(latF), 2).as("my"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
                     ROUND(6378137.0 * RADIANS(CAST((c_custkey % 340) - 170 AS DOUBLE) + 0.5), 2) AS mx,
                     ROUND(6378137.0 * LN(TAN(PI()/4.0
                           + RADIANS(CAST((c_custkey % 160) - 80 AS DOUBLE) + 0.5)/2.0)), 2) AS my
              FROM customer ORDER BY c_custkey""")),

    // Transform roundtrip 4326→3857→4326: must restore the input to 1e-6
    // degree (the SURVEY §7 tolerance); oracle emits the inputs directly.
    QuerySpec(
      "geo_transform_roundtrip",
      (s, dir) =>
        cust(s, dir)
          .select(col("c_custkey"),
            round(GeoFunctions.invMercLon(GeoFunctions.toMercX(lonF)), 6).as("lon"),
            round(GeoFunctions.invMercLat(GeoFunctions.toMercY(latF)), 6).as("lat"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
                     ROUND(CAST((c_custkey % 340) - 170 AS DOUBLE) + 0.5, 6) AS lon,
                     ROUND(CAST((c_custkey % 160) - 80 AS DOUBLE) + 0.5, 6) AS lat
              FROM customer ORDER BY c_custkey""")),

    // CRS range inference (geo_strategy.rs:228-253) as a distributed agg:
    // bucket rows, min/max the synthetic coords per bucket, classify. The
    // aggregate runs on executors; classification is a scalar kernel.
    QuerySpec(
      "geo_crs_infer",
      (s, dir) =>
        cust(s, dir)
          .groupBy((col("c_custkey") % 7).as("bucket"))
          .agg(
            min(lonI.cast("double")).as("xmn"), max(lonI.cast("double")).as("xmx"),
            min(latI.cast("double")).as("ymn"), max(latI.cast("double")).as("ymx"))
          .select(col("bucket"),
            GeoFunctions.inferCrs(
              col("xmn"), col("xmx"), col("ymn"), col("ymx")).as("crs"))
          .orderBy("bucket"),
      Some("""WITH r AS (
                SELECT c_custkey % 7 AS bucket,
                       MIN(CAST((c_custkey % 360) - 180 AS DOUBLE)) AS xmn,
                       MAX(CAST((c_custkey % 360) - 180 AS DOUBLE)) AS xmx,
                       MIN(CAST((c_custkey % 180) - 90 AS DOUBLE)) AS ymn,
                       MAX(CAST((c_custkey % 180) - 90 AS DOUBLE)) AS ymx
                FROM customer GROUP BY 1)
              SELECT bucket,
                     CASE
                       WHEN xmn >= -180 AND xmx <= 180 AND ymn >= -90 AND ymx <= 90
                            AND (xmx - xmn) < 10 AND (ymx - ymn) < 10 THEN '4326'
                       WHEN xmn >= 0 AND xmx <= 800000 AND ymn >= 0 AND ymx <= 1400000
                            AND xmn > 1000 AND ymn > 1000 THEN '27700'
                       WHEN xmn >= -20037508 AND xmx <= 20037508
                            AND ymn >= -20037508 AND ymx <= 20037508
                            AND ((xmx - xmn) > 10000 OR (ymx - ymn) > 10000) THEN '3857'
                       ELSE '4326'
                     END AS crs
              FROM r ORDER BY bucket""")),

    // Grid-bucketed spatial join (distance-within join, the scale-safe
    // PostGIS `ST_DWithin` shape): each customer point hashes to a
    // 2°×2° grid cell; each supplier point probes its own cell plus the
    // 8 neighbors (a 9-cell explode of the SMALL side — the blow-up is
    // 9×|suppliers|, never |customers|); candidates meet in an EQUI-join
    // on the cell key and only survivors pay the exact distance test.
    // Cell size 2 ≥ the 1-degree radius guarantees no pair is missed.
    // At 100 TB this shuffles on compact (cx, cy) ints and the pair
    // volume is Σ|cell|·|probe| — a spatial join that never degenerates
    // to a cross product. The oracle checks the SEMANTIC result (plain
    // distance predicate over all pairs); the grid is pure physical
    // strategy and must not change the answer.
    QuerySpec(
      "geo_grid_join",
      (s, dir) => {
        val cu = cust(s, dir).select(
            col("c_custkey"),
            (((col("c_custkey") % 60) - 30).cast("double") + 0.5).as("clon"),
            (((col("c_custkey") % 40) - 20).cast("double") + 0.5).as("clat"))
          .withColumn("cx", floor(col("clon") / 2))
          .withColumn("cy", floor(col("clat") / 2))
        val su = Tables(s, dir, "supplier").select(
            col("s_suppkey"),
            ((col("s_suppkey") * 7 % 60) - 30).cast("double") + 0.25,
            ((col("s_suppkey") * 13 % 40) - 20).cast("double") + 0.25)
          .toDF("s_suppkey", "slon", "slat")
          .withColumn("d", explode(expr(
            "flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), dy -> struct(dx, dy))))")))
          .select(col("s_suppkey"), col("slon"), col("slat"),
            (floor(col("slon") / 2) + col("d.dx")).as("cx"),
            (floor(col("slat") / 2) + col("d.dy")).as("cy"))
        val d2 = (col("clon") - col("slon")) * (col("clon") - col("slon")) +
          (col("clat") - col("slat")) * (col("clat") - col("slat"))
        cu.join(su, Seq("cx", "cy"))
          .filter(d2 <= 1.0)
          .select(col("s_suppkey"), col("c_custkey"), round(d2, 6).as("dist2"))
          .orderBy("s_suppkey", "c_custkey")
      },
      Some("""WITH c AS (
                SELECT c_custkey,
                       CAST((c_custkey % 60) - 30 AS DOUBLE) + 0.5 AS clon,
                       CAST((c_custkey % 40) - 20 AS DOUBLE) + 0.5 AS clat
                FROM customer),
              s AS (
                SELECT s_suppkey,
                       CAST((s_suppkey * 7 % 60) - 30 AS DOUBLE) + 0.25 AS slon,
                       CAST((s_suppkey * 13 % 40) - 20 AS DOUBLE) + 0.25 AS slat
                FROM supplier)
              SELECT s_suppkey, c_custkey,
                     ROUND((clon-slon)*(clon-slon) + (clat-slat)*(clat-slat), 6) AS dist2
              FROM s, c
              WHERE (clon-slon)*(clon-slon) + (clat-slat)*(clat-slat) <= 1.0
              ORDER BY s_suppkey, c_custkey"""))
  )
}
