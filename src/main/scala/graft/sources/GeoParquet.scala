package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.MetadataBuilder

/** GeoParquet 1.0.0 (the OGC-track public spec: ordinary parquet plus a
  * `geo` key in the footer key-value metadata describing geometry
  * columns — WKB encoding, primary column, CRS). The format the
  * reference's GDAL path would hand to `st_read` for .parquet geodata;
  * beyond the reference's own six detected types, same as KML/GML.
  *
  * Read shape: the footer metadata is a DRIVER-side constant-size read
  * (one parquet footer — bytes, not data); the data scan is Spark's own
  * parquet source, so column pruning, predicate pushdown, row-group
  * skipping, and distributed scan tasks all come free — at 100 TB the
  * geometry annotation costs one footer probe per table, not a custom
  * connector. The primary geometry column is stamped with
  * [[SchemaHeuristics.GeometryTag]] + [[GeoParquet.CrsTag]] (the
  * GeoPackage/GML contract, so IngestPipeline's CRS resolve composes).
  *
  * The writer half exists for fixtures and the sink tier: Spark cannot
  * attach custom footer metadata through its public writer, so rows go
  * through parquet-hadoop's example writer directly — fine for the
  * dimension-sized tables a sink writes back (the corpus-sized path
  * stays `df.write.parquet`).
  *
  * Spec details honored: missing `geo` key fails loudly (the file is
  * plain parquet — a caller wanting that uses the parquet reader);
  * `encoding` must be "WKB"; absent `crs` defaults to OGC:CRS84
  * (per spec §crs), which we surface as EPSG:4326 lon-lat.
  */
object GeoParquet {
  val CrsTag = "graft.geoparquet.crs"

  /** Minimal WKB point (little-endian, geometry type 1). */
  private def wkbPoint(x: Double, y: Double): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(21)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    b.array()
  }

  /** Write (key, name, x, y) rows as a GeoParquet point table. */
  def write(path: String, rows: Seq[(Long, String, Double, Double)],
            epsg: Int): Unit = {
    val schema = MessageTypeParser.parseMessageType(
      """message geoparquet {
        |  required int64 nkey;
        |  required binary nname (UTF8);
        |  required binary geometry;
        |}""".stripMargin)
    val xs = rows.map(_._3)
    val ys = rows.map(_._4)
    // PROJJSON carries the authority:code identity; bbox is the spec's
    // optional scan-pruning hint
    val geoMeta =
      s"""{"version":"1.0.0","primary_column":"geometry","columns":{
         |"geometry":{"encoding":"WKB","geometry_types":["Point"],
         |"crs":{"type":"GeographicCRS","id":{"authority":"EPSG","code":$epsg}},
         |"bbox":[${xs.min},${ys.min},${xs.max},${ys.max}]}}}""".stripMargin
      .replace("\n", "")
    val conf = new org.apache.hadoop.conf.Configuration()
    // idempotent like the other fixture writers: re-planning a query in
    // the same session rewrites the container (file + hadoop .crc twin)
    val f = new java.io.File(path)
    f.delete()
    new java.io.File(f.getParentFile, s".${f.getName}.crc").delete()
    val writer = ExampleParquetWriter.builder(new Path(path))
      .withConf(conf)
      .withType(schema)
      .withExtraMetaData(java.util.Collections.singletonMap("geo", geoMeta))
      .build()
    try rows.foreach { case (k, n, x, y) =>
      val g = new SimpleGroup(schema)
      g.add("nkey", k)
      g.add("nname", n)
      g.add("geometry", org.apache.parquet.io.api.Binary.fromConstantByteArray(wkbPoint(x, y)))
      writer.write(g)
    } finally writer.close()
  }

  /** Raw `geo` footer value, if the file is parquet and declares one. */
  def geoMetadata(path: String): Option[String] = {
    val f = new java.io.File(path)
    if (!f.isFile) None
    else scala.util.Try {
      val conf = new org.apache.hadoop.conf.Configuration()
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(path), conf))
      try Option(rd.getFooter.getFileMetaData.getKeyValueMetaData.get("geo"))
      finally rd.close()
    }.toOption.flatten
  }

  /** The ingest dispatch probe: parquet that declares geometry. */
  def isGeoParquet(path: String): Boolean = geoMetadata(path).isDefined

  /** Resolve the `geo` footer metadata of one container file. */
  private def footerGeo(path: String): (String, String) = {
    val geo = geoMetadata(path).orNull
    require(geo != null,
      s"$path carries no GeoParquet 'geo' footer metadata — read it as plain parquet")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(geo)
    val primary = root.path("primary_column").asText("")
    require(primary.nonEmpty, s"$path: geo metadata lacks primary_column")
    val colMeta = root.path("columns").path(primary)
    val enc = colMeta.path("encoding").asText("")
    require(enc == "WKB",
      s"$path: unsupported GeoParquet encoding '$enc' (only WKB)")
    val crsNode = colMeta.path("crs")
    val crs =
      if (crsNode.isMissingNode || crsNode.isNull) "EPSG:4326" // spec default OGC:CRS84
      else {
        val id = crsNode.path("id")
        s"${id.path("authority").asText("EPSG")}:${id.path("code").asLong(4326)}"
      }
    (primary, crs)
  }

  /** Read a GeoParquet file: Spark's parquet scan with the primary
    * geometry column tagged (GeometryTag + CrsTag). */
  def read(s: SparkSession, path: String): DataFrame = {
    val (primary, crs) = footerGeo(path)
    val df = s.read.parquet(path)
    require(df.schema.fieldNames.contains(primary),
      s"$path: primary_column '$primary' absent from parquet schema")
    val meta = new MetadataBuilder()
      .putBoolean(SchemaHeuristics.GeometryTag, true)
      .putString(CrsTag, crs).build()
    df.withMetadata(primary, meta)
  }
}
