package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** FlatGeobuf 3.x reader/writer from scratch (public spec:
  * flatgeobuf.org; schema files Header.fbs / Feature.fbs in
  * bjornharrtell/flatgeobuf) on the [[FlatBuffers]] kernel — the
  * streaming-first geo container that GDAL ships beside gpkg/shapefile,
  * completing the round-7 modern-format pair with GeoParquet.
  *
  * Layout: 8-byte magic `fgb\x03fgb\x00`, size-prefixed Header
  * flatbuffer, optional packed Hilbert R-tree, then one size-prefixed
  * Feature flatbuffer per feature. The writer emits
  * `index_node_size = 0` (no index — legal per spec, and the right
  * choice for a full-scan engine); the reader SKIPS a present index
  * using the spec's packed-tree size recurrence, so externally-written
  * indexed files scan too.
  *
  * Scope: Point geometry and Long/Double/String property columns — the
  * shapes the engine's tables use; anything else fails loudly. Read
  * path mirrors ArrowIpc: driver-side header sniff for the schema, the
  * feature decode runs INSIDE scan tasks (binaryFile + mapPartitions,
  * one task per container). Geometry lands as a WKB point column with
  * the CRS stamped into field metadata (the GeoPackage schema-borne
  * contract).
  */
object FlatGeobuf {

  val Magic: Array[Byte] =
    Array(0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x00).map(_.toByte)

  /** Field metadata key carrying the layer CRS (EPSG code as string). */
  val CrsTag = "graft.fgb.crs"

  // Header.fbs field ids
  private val HName = 0
  private val HGeometryType = 2
  private val HColumns = 7
  private val HFeaturesCount = 8
  private val HIndexNodeSize = 9
  private val HCrs = 10
  // Column.fbs field ids
  private val CName = 0
  private val CType = 1
  // Crs.fbs field ids
  private val CrsOrg = 0
  private val CrsCode = 1
  // Feature.fbs / Geometry.fbs field ids
  private val FGeometry = 0
  private val FProperties = 1
  private val GXy = 1
  private val GType = 6
  // GeometryType / ColumnType enum values (spec)
  private val GeomPoint = 1
  private val ColLong = 7
  private val ColDouble = 10
  private val ColString = 11

  // --------------------------------------------------------------- write

  /** One .fgb layer: Point features with Long/Double/String properties.
    * `rows` pairs each property Row (matching `props`) with its (x, y). */
  def write(path: String, layerName: String, props: StructType,
      rows: Seq[(Row, (Double, Double))], epsg: Int = 4326): Unit = {
    def colType(dt: DataType): Int = dt match {
      case LongType => ColLong
      case DoubleType => ColDouble
      case StringType => ColString
      case other => throw new IllegalArgumentException(
        s"unsupported fgb property type $other")
    }
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      out.write(Magic)
      // header buffer
      val hb = new FlatBuffers.Builder
      val colOffs = props.fields.map { f =>
        val n = hb.createString(f.name)
        hb.startTable()
        hb.slotOffset(CName, n)
        hb.slotScalar(CType, colType(f.dataType).toLong, 1)
        hb.endTable()
      }
      val colsVec = hb.createOffsetVector(colOffs.toSeq)
      val orgOff = hb.createString("EPSG")
      hb.startTable()
      hb.slotOffset(CrsOrg, orgOff)
      hb.slotScalar(CrsCode, epsg.toLong, 4)
      val crsOff = hb.endTable()
      val nameOff = hb.createString(layerName)
      hb.startTable()
      hb.slotOffset(HName, nameOff)
      hb.slotScalar(HGeometryType, GeomPoint.toLong, 1)
      hb.slotOffset(HColumns, colsVec)
      hb.slotScalar(HFeaturesCount, rows.length.toLong, 8)
      // default is 16 — 0 must be written explicitly to disable the index
      hb.slotScalar(HIndexNodeSize, 0L, 2)
      hb.slotOffset(HCrs, crsOff)
      val header = hb.finish(hb.endTable())
      writeSizePrefixed(out, header)
      // features
      rows.foreach { case (row, (x, y)) =>
        val fb = new FlatBuffers.Builder
        val propBytes = encodeProps(props, row)
        val propOff =
          if (propBytes.isEmpty) -1 else fb.createByteVector(propBytes)
        val xyOff = fb.createDoubleVector(Seq(x, y))
        fb.startTable()
        fb.slotOffset(GXy, xyOff)
        fb.slotScalar(GType, GeomPoint.toLong, 1)
        val geomOff = fb.endTable()
        fb.startTable()
        fb.slotOffset(FGeometry, geomOff)
        if (propOff >= 0) fb.slotOffset(FProperties, propOff)
        writeSizePrefixed(out, fb.finish(fb.endTable()))
      }
    } finally out.close()
  }

  private def writeSizePrefixed(out: DataOutputStream, buf: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(buf.length).array()
    out.write(len); out.write(buf)
  }

  /** Properties wire format (spec §Feature): per present column, u16 LE
    * column index then the raw value; strings are u32 length + UTF-8. */
  private def encodeProps(props: StructType, row: Row): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le(n: Int, bytes: Int): Unit =
      (0 until bytes).foreach(i => bos.write((n >> (8 * i)) & 0xff))
    def le64(n: Long): Unit =
      (0 until 8).foreach(i => bos.write(((n >> (8 * i)) & 0xff).toInt))
    props.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        le(i, 2)
        f.dataType match {
          case LongType => le64(row.getLong(i))
          case DoubleType => le64(java.lang.Double.doubleToLongBits(row.getDouble(i)))
          case StringType =>
            val b = row.getString(i).getBytes("UTF-8")
            le(b.length, 4); bos.write(b)
          case other => throw new IllegalArgumentException(s"unsupported $other")
        }
      }
    }
    bos.toByteArray
  }

  // ---------------------------------------------------------------- read

  /** Driver-side header sniff: (layer name, property schema + geom
    * column with CRS metadata, epsg). Reads magic + header only. */
  def sparkSchema(path: String): (String, StructType, Int) = {
    val in = new java.io.DataInputStream(new java.io.FileInputStream(path))
    try {
      val magic = new Array[Byte](8); in.readFully(magic)
      require(magic.sameElements(Magic), s"'$path' is not FlatGeobuf 3")
      val header = readSizePrefixed(in)
      val (name, schema, epsg, _, _) = parseHeader(header)
      (name, schema, epsg)
    } finally in.close()
  }

  /** Distributed read, the ArrowIpc stance: binaryFile ships each
    * container to a scan task; feature decode happens executor-side. */
  def read(s: SparkSession, path: String): DataFrame = {
    val (_, schema, _) = sparkSchema(headFile(path))
    val expected = schema
    val bin = s.read.format("binaryFile").load(path).select(col("content"))
    val rows = bin.rdd.mapPartitions { parts =>
      parts.flatMap { r =>
        val (_, fileSchema, _, props, feats) =
          parseAll(r.getAs[Array[Byte]](0))
        require(fileSchema == expected,
          s"fgb container schema $fileSchema != landing-zone schema $expected")
        feats.map { case (xy, propBytes) =>
          Row.fromSeq(decodeProps(props, propBytes) :+ pointWkb(xy(0), xy(1)))
        }
      }
    }
    s.createDataFrame(rows, schema)
  }

  private def headFile(path: String): String = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(_.isFile).map(_.getPath).sorted.headOption
        .getOrElse(throw new IllegalArgumentException(s"empty fgb dir $path"))
    else path
  }

  private def readSizePrefixed(in: java.io.DataInputStream): Array[Byte] = {
    val lenB = new Array[Byte](4); in.readFully(lenB)
    val len = ByteBuffer.wrap(lenB).order(ByteOrder.LITTLE_ENDIAN).getInt
    require(len > 0 && len < (1 << 30), s"implausible fgb buffer size $len")
    val buf = new Array[Byte](len); in.readFully(buf)
    buf
  }

  /** (name, schema, epsg, propTypes, featureCount/indexNodeSize). */
  private def parseHeader(
      header: Array[Byte]): (String, StructType, Int, Array[(String, Int)], (Long, Int)) = {
    val h = FlatBuffers.root(header)
    val gt = h.getByte(HGeometryType)
    require(gt == GeomPoint, s"unsupported fgb geometry type $gt (Point only)")
    val name = h.getString(HName).getOrElse("layer")
    val epsg = h.getTable(HCrs).map(_.getInt(CrsCode, 4326)).getOrElse(4326)
    val colsVp = h.vectorPos(HColumns)
    val cols: Array[(String, Int)] =
      if (colsVp < 0) Array.empty
      else Array.tabulate(h.vectorLen(colsVp)) { i =>
        val c = h.tableAt(colsVp, i)
        (c.getString(CName).getOrElse(s"col$i"), c.getByte(CType))
      }
    val fields = cols.map { case (n, t) =>
      val dt = t match {
        case ColLong => LongType
        case ColDouble => DoubleType
        case ColString => StringType
        case other => throw new IllegalArgumentException(
          s"unsupported fgb column type $other for '$n'")
      }
      StructField(n, dt, nullable = true)
    }
    val meta = new MetadataBuilder().putString(CrsTag, epsg.toString).build()
    val schema = StructType(
      fields :+ StructField("geom", BinaryType, nullable = false, meta))
    (name, schema, epsg,
      cols, (h.getLong(HFeaturesCount), h.getShort(HIndexNodeSize, 16)))
  }

  /** Full container parse: header + (skipped index) + features. */
  private def parseAll(bytes: Array[Byte])
      : (String, StructType, Int, Array[(String, Int)],
         Iterator[(Array[Double], Array[Byte])]) = {
    require(bytes.length > 8 && bytes.take(8).sameElements(Magic),
      "not a FlatGeobuf 3 container")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(8)
    def sized(): Array[Byte] = {
      val len = bb.getInt
      require(len > 0 && len <= bb.remaining(), s"implausible fgb buffer size $len")
      val out = new Array[Byte](len); bb.get(out); out
    }
    val (name, schema, epsg, props, (featCount, nodeSize)) = parseHeader(sized())
    if (nodeSize > 0 && featCount > 0)
      bb.position(bb.position() + packedIndexSize(featCount, nodeSize))
    val feats = new Iterator[(Array[Double], Array[Byte])] {
      def hasNext: Boolean = bb.remaining() >= 4
      def next(): (Array[Double], Array[Byte]) = {
        val f = FlatBuffers.root(sized())
        val geom = f.getTable(FGeometry).getOrElse(
          throw new IllegalArgumentException("fgb feature without geometry"))
        require(geom.getByte(GType, GeomPoint) == GeomPoint, "non-Point feature")
        val xyVp = geom.vectorPos(GXy)
        require(xyVp >= 0 && geom.vectorLen(xyVp) >= 2, "fgb point without xy")
        val xy = geom.doublesAt(xyVp)
        val pvp = f.vectorPos(FProperties)
        val pb = if (pvp < 0) Array.empty[Byte] else f.bytesAt(pvp)
        (xy, pb)
      }
    }
    (name, schema, epsg, props, feats)
  }

  /** Packed Hilbert R-tree byte size (spec's level recurrence): every
    * node entry is 40 bytes (4 × f64 bbox + u64 offset). */
  private[sources] def packedIndexSize(numItems: Long, nodeSize: Int): Int = {
    val ns = math.max(2, math.min(nodeSize, 65535)).toLong
    var n = numItems
    var total = n
    while (n != 1) { n = (n + ns - 1) / ns; total += n }
    math.toIntExact(total * 40)
  }

  private def decodeProps(cols: Array[(String, Int)], bytes: Array[Byte]): Seq[Any] = {
    val out = Array.fill[Any](cols.length)(null)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    while (bb.remaining() >= 2) {
      val i = bb.getShort & 0xffff
      require(i < cols.length, s"fgb property index $i out of range")
      out(i) = cols(i)._2 match {
        case ColLong => bb.getLong
        case ColDouble => bb.getDouble
        case ColString =>
          val len = bb.getInt
          val b = new Array[Byte](len); bb.get(b)
          new String(b, "UTF-8")
        case other => throw new IllegalArgumentException(s"unsupported $other")
      }
    }
    out.toSeq
  }

  /** Little-endian WKB point — the geometry contract the geo kernel's
    * `stAsTextFromWkb` consumes. */
  private def pointWkb(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte); bb.putInt(1); bb.putDouble(x); bb.putDouble(y)
    bb.array()
  }
}
