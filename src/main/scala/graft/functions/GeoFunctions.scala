package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf
import org.locationtech.jts.geom.{Coordinate, CoordinateXY, Geometry, GeometryFactory, PrecisionModel}
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

import scala.util.Try

/** The geospatial scalar kernel (SURVEY.md §2.8) — every DuckDB-spatial
  * function the reference's generated SQL touches, reimplemented over JTS
  * 1.20 and exposed both as Scala helpers and Spark UDF `Column`s.
  *
  * Error semantics mirror the reference end-to-end: invalid WKB/WKT parses
  * to NULL rather than failing the job — the same contract its
  * `safe_geom_from_text` PL/pgSQL wrapper enforces in Postgres
  * (reference: geo_strategy.rs:373-381) and `ignore_errors=true` enforces
  * at read time (core_processor.rs:415).
  *
  * Scale notes: JTS readers/writers are NOT thread-safe, so each call
  * allocates its own (cheap, small) reader; geometry never round-trips
  * through the driver — all functions are executor-side row kernels. WKB
  * (binary) is the preferred in-flight representation: ~half the bytes of
  * WKT and no text parse on re-read.
  */
object GeoFunctions {

  private val geomFactory = new GeometryFactory(new PrecisionModel(), 4326)

  // ----------------------------------------------------------- scalar core

  def parseWkb(bytes: Array[Byte]): Option[Geometry] =
    if (bytes == null) None else Try(new WKBReader(geomFactory).read(bytes)).toOption

  def parseHexWkb(hex: String): Option[Geometry] =
    if (hex == null) None
    else Try(new WKBReader(geomFactory).read(WKBReader.hexToBytes(hex))).toOption

  def parseWkt(wkt: String): Option[Geometry] =
    if (wkt == null) None else Try(new WKTReader(geomFactory).read(wkt)).toOption

  /** 2D WKT out — `ST_AsText(ST_Force2D(...))`, the reference's transport
    * format (geo_strategy.rs:283-289). JTS's WKTWriter(2) drops Z/M. */
  def toWkt2D(g: Geometry): String = new WKTWriter(2).write(g)

  def toWkb(g: Geometry): Array[Byte] = new WKBWriter(2).write(g)

  /** Rebuild with XY-only coordinates (`ST_Force2D`). */
  def force2D(g: Geometry): Geometry = {
    val edited = new org.locationtech.jts.geom.util.GeometryTransformer {
      override def transformCoordinates(
          cs: org.locationtech.jts.geom.CoordinateSequence,
          parent: Geometry): org.locationtech.jts.geom.CoordinateSequence = {
        val coords = Array.tabulate(cs.size)(i => new CoordinateXY(cs.getX(i), cs.getY(i)))
        geomFactory.getCoordinateSequenceFactory.create(coords.asInstanceOf[Array[Coordinate]])
      }
    }
    edited.transform(g)
  }

  def centroid(g: Geometry): (Double, Double) = {
    val c = g.getCentroid
    (c.getX, c.getY)
  }

  def point(x: Double, y: Double): Geometry =
    geomFactory.createPoint(new Coordinate(x, y))

  /** Reproject every vertex with [[CrsTransform]] (always lon-lat order). */
  def transformGeom(g: Geometry, srcEpsg: Int, dstEpsg: Int): Geometry = {
    if (srcEpsg == dstEpsg) return g
    val tr = new org.locationtech.jts.geom.util.GeometryTransformer {
      override def transformCoordinates(
          cs: org.locationtech.jts.geom.CoordinateSequence,
          parent: Geometry): org.locationtech.jts.geom.CoordinateSequence = {
        val coords = Array.tabulate(cs.size) { i =>
          val (x, y) = CrsTransform.transform(cs.getX(i), cs.getY(i), srcEpsg, dstEpsg)
          new Coordinate(x, y)
        }
        geomFactory.getCoordinateSequenceFactory.create(coords)
      }
    }
    tr.transform(g)
  }

  // --------------------------------------------------------------- columns

  /** WKB bytes → 2D WKT (NULL on parse failure). */
  val stAsTextFromWkb = udf((b: Array[Byte]) => parseWkb(b).map(g => toWkt2D(force2D(g))).orNull)

  /** hex-WKB text → 2D WKT. */
  val stAsTextFromHexWkb = udf((s: String) => parseHexWkb(s).map(g => toWkt2D(force2D(g))).orNull)

  /** WKT → normalized 2D WKT (identity parse, invalid → NULL). */
  val stAsTextFromWkt = udf((s: String) => parseWkt(s).map(g => toWkt2D(force2D(g))).orNull)

  /** Centroid X/Y from any of the three encodings, used by the CRS probe
    * chain (geo_strategy.rs:135-183). */
  val centroidXFromWkb = udf((b: Array[Byte]) => parseWkb(b).map(_.getCentroid.getX))
  val centroidYFromWkb = udf((b: Array[Byte]) => parseWkb(b).map(_.getCentroid.getY))
  val centroidXFromHex = udf((s: String) => parseHexWkb(s).map(_.getCentroid.getX))
  val centroidYFromHex = udf((s: String) => parseHexWkb(s).map(_.getCentroid.getY))
  val centroidXFromWkt = udf((s: String) => parseWkt(s).map(_.getCentroid.getX))
  val centroidYFromWkt = udf((s: String) => parseWkt(s).map(_.getCentroid.getY))

  /** `ST_AsText(ST_Force2D(ST_Point(x, y)))` — the coordinate-pair path
    * (geo_strategy.rs:322-331). */
  val stPointWkt = udf((x: Double, y: Double) => toWkt2D(point(x, y)))

  /** Coordinate-pair path WITH reprojection (geo_strategy.rs:333-340). */
  val stPointTransformWkt = udf((x: Double, y: Double, src: Int, dst: Int) =>
    Try {
      val (tx, ty) = CrsTransform.transform(x, y, src, dst)
      toWkt2D(point(tx, ty))
    }.toOption.orNull)

  /** Full geometry-column path: WKB in, reproject, 2D WKT out
    * (geo_strategy.rs:286-291). */
  val stTransformWkbToWkt = udf((b: Array[Byte], src: Int, dst: Int) =>
    parseWkb(b).flatMap(g => Try(toWkt2D(force2D(transformGeom(g, src, dst)))).toOption).orNull)

  val stTransformWktToWkt = udf((s: String, src: Int, dst: Int) =>
    parseWkt(s).flatMap(g => Try(toWkt2D(force2D(transformGeom(g, src, dst)))).toOption).orNull)

  /** Scalar lon/lat → Web-Mercator / BNG columns (each axis separately, so
    * oracles can check them as plain doubles). */
  val toMercX = udf((lon: Double, lat: Double) => CrsTransform.lonLatToWebMercator(lon, lat)._1)
  val toMercY = udf((lon: Double, lat: Double) => CrsTransform.lonLatToWebMercator(lon, lat)._2)

  /** Register the SQL-callable names (for `spark.sql` users). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("st_astext_wkb", stAsTextFromWkb)
    spark.udf.register("st_astext_hexwkb", stAsTextFromHexWkb)
    spark.udf.register("st_astext_wkt", stAsTextFromWkt)
    spark.udf.register("st_point_wkt", stPointWkt)
    spark.udf.register("st_point_transform_wkt", stPointTransformWkt)
    spark.udf.register("st_transform_wkb_wkt", stTransformWkbToWkt)
    spark.udf.register("st_transform_wkt_wkt", stTransformWktToWkt)
  }
}
