package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BinaryType, StringType}

import scala.util.Try

/** CRS inference from sampled geometry data — the Spark port of the
  * reference's probe chain (geo_strategy.rs:75-253).
  *
  * The reference tries, per geometry column: direct-WKB → hex-WKB → WKT
  * centroid extraction over a `LIMIT 10` sample, then guesses the CRS from
  * the min/max coordinate ranges. Here each probe is a
  * `filter(isNotNull).limit(10)` job whose collect brings back AT MOST 10
  * (x, y) doubles — the 100 TB safety property: driver traffic is bounded
  * by a constant regardless of table size, and Spark pushes the limit into
  * the scan (CollectLimitExec reads only the first partitions that satisfy
  * it).
  */
object CrsInference {

  /** Range heuristics, verbatim port of `infer_crs_from_ranges`
    * (geo_strategy.rs:228-253) including its quirks: small-extent lon/lat
    * boxes → 4326; positive sub-800km×1400km → 27700 (British National
    * Grid); wide meter-scale extents → 3857; everything else 4326. */
  def inferCrsFromRanges(xMin: Double, xMax: Double, yMin: Double, yMax: Double): String = {
    if (xMin >= -180.0 && xMax <= 180.0 && yMin >= -90.0 && yMax <= 90.0 &&
        (xMax - xMin) < 10.0 && (yMax - yMin) < 10.0) "4326"
    else if (xMin >= 0.0 && xMax <= 800000.0 && yMin >= 0.0 && yMax <= 1400000.0 &&
             xMin > 1000.0 && yMin > 1000.0) "27700"
    else if (xMin >= -20037508.0 && xMax <= 20037508.0 &&
             yMin >= -20037508.0 && yMax <= 20037508.0 &&
             ((xMax - xMin) > 10000.0 || (yMax - yMin) > 10000.0)) "3857"
    else "4326"
  }

  /** One probe: parse `geomCol` with the given centroid extractors over a
    * 10-row non-null sample; None when no finite coordinate comes back
    * (mirrors extract_coordinates_from_query, geo_strategy.rs:186-225). */
  private def probe(
      df: DataFrame,
      geomCol: String,
      cx: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      cy: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Option[String] = {
    val rows = Try {
      df.filter(col(geomCol).isNotNull)
        .limit(10)
        .select(cx(col(geomCol)).as("x"), cy(col(geomCol)).as("y"))
        .collect()
    }.getOrElse(Array.empty)
    val coords = rows.iterator.flatMap { r =>
      if (r.isNullAt(0) || r.isNullAt(1)) None
      else {
        val x = r.getDouble(0); val y = r.getDouble(1)
        if (x.isFinite && y.isFinite) Some((x, y)) else None
      }
    }.toSeq
    if (coords.isEmpty) None
    else {
      val xs = coords.map(_._1); val ys = coords.map(_._2)
      Some(inferCrsFromRanges(xs.min, xs.max, ys.min, ys.max))
    }
  }

  /** `analyse_geometry_column` (geo_strategy.rs:90-183): a column-type-aware
    * WKB → hex-WKB → WKT fallback chain. Binary columns try WKB only;
    * string columns try hex-WKB then WKT (a binary parse of a text column
    * can't succeed, so skipping it mirrors, not changes, the outcome). */
  def analyseGeometryColumn(df: DataFrame, geomCol: String): Option[String] = {
    import GeoFunctions._
    val dt = df.schema(geomCol).dataType
    val probes: Seq[() => Option[String]] = dt match {
      case BinaryType =>
        Seq(() => probe(df, geomCol, centroidXFromWkb(_), centroidYFromWkb(_)))
      case StringType =>
        Seq(
          () => probe(df, geomCol, centroidXFromHex(_), centroidYFromHex(_)),
          () => probe(df, geomCol, centroidXFromWkt, centroidYFromWkt))
      case _ => Seq.empty
    }
    probes.iterator.map(_()).collectFirst { case Some(crs) => crs }
  }

  /** `infer_parquet_crs_from_data` (geo_strategy.rs:75-87): first column
    * that yields an answer wins; fallback WGS84. */
  def inferCrs(df: DataFrame, geomColumns: Seq[String]): String =
    geomColumns.iterator
      .map(analyseGeometryColumn(df, _))
      .collectFirst { case Some(crs) => crs }
      .getOrElse("4326")
}
