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
  * Feature flatbuffer per feature. The writer can emit the index
  * (features Hilbert-ordered, envelope leaf bboxes — [[readBbox]]
  * prunes on it) or `index_node_size = 0` for plain scans; the reader
  * handles both, skipping or walking a present index as asked.
  *
  * Scope: all SEVEN OGC simple-feature types — Point / LineString /
  * Polygon (holes) / MultiPoint / MultiLineString / MultiPolygon /
  * GeometryCollection (the last two as nested `parts` Geometry tables)
  * — with Long/Double/String property columns; anything else fails
  * loudly. Read path mirrors ArrowIpc: driver-side
  * header sniff for the schema, the feature decode runs INSIDE scan
  * tasks (binaryFile + mapPartitions, one task per container). Geometry
  * lands as a WKB column with the CRS stamped into field metadata (the
  * GeoPackage schema-borne contract).
  */
object FlatGeobuf {

  val Magic: Array[Byte] =
    Array(0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x00).map(_.toByte)

  /** Field metadata key carrying the layer CRS (EPSG code as string). */
  val CrsTag = "graft.fgb.crs"

  // Header.fbs field ids
  private val HName = 0
  private val HGeometryType = 2
  private val HHasZ = 3
  private val HHasM = 4
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
  private val GEnds = 0
  private val GXy = 1
  private val GZ = 2   // per-point z values (feature.fbs: Geometry.z)
  private val GM = 3   // per-point m measures (validated, dropped — see decodeGeom)
  private val GType = 6
  // GeometryType / ColumnType enum values (spec — GeometryType follows
  // the ISO WKB codes: LineString = 2, Polygon = 3, so an
  // externally-written container's types map 1:1)
  private val GeomUnknown = 0
  private val GeomPoint = 1
  private val GeomLineString = 2
  private val GeomPolygon = 3
  private val GeomMultiPoint = 4
  private val GeomMultiLineString = 5
  private val GeomMultiPolygon = 6
  private val GeomCollection = 7
  private val GParts = 7
  private val ColLong = 7
  private val ColDouble = 10
  private val ColString = 11

  /** Decoded FGB geometry: flat xy coords + the spec's `ends` vector
    * (exclusive end index PER COORDINATE PAIR of each ring/part; empty =
    * single ring/part). Point / LineString / Polygon — the OGC simple
    * shapes the engine's other geo readers compose. */
  private[sources] final case class FgbGeom(
      gtype: Int, xy: Array[Double], ends: Array[Int],
      parts: Seq[FgbGeom] = Seq.empty,
      z: Array[Double] = Array.empty) {
    /** XYZ anywhere in the tree (drives header has_z + WKB dimension). */
    def hasZ: Boolean = z.nonEmpty || parts.exists(_.hasZ)
    def envelope: (Double, Double, Double, Double) = {
      var mnx = Double.PositiveInfinity; var mny = Double.PositiveInfinity
      var mxx = Double.NegativeInfinity; var mxy = Double.NegativeInfinity
      var i = 0
      while (i + 1 < xy.length) {
        mnx = math.min(mnx, xy(i)); mxx = math.max(mxx, xy(i))
        mny = math.min(mny, xy(i + 1)); mxy = math.max(mxy, xy(i + 1))
        i += 2
      }
      parts.foreach { p =>
        val (a, b, c, d) = p.envelope
        mnx = math.min(mnx, a); mny = math.min(mny, b)
        mxx = math.max(mxx, c); mxy = math.max(mxy, d)
      }
      (mnx, mny, mxx, mxy)
    }
  }

  private[sources] object FgbGeom {
    /** Driver/fixture-side WKT → FgbGeom via JTS (the library the geo
      * kernel already ships). */
    def fromWkt(wkt: String): FgbGeom =
      fromJts(new org.locationtech.jts.io.WKTReader().read(wkt))

    private def fromJts(g: org.locationtech.jts.geom.Geometry): FgbGeom = {
      require(!g.isEmpty,
        s"empty ${g.getGeometryType} — fgb features carry real geometry")
      import org.locationtech.jts.geom.{LineString, MultiLineString, MultiPoint, MultiPolygon, Point, Polygon}
      def flat(cs: Array[org.locationtech.jts.geom.Coordinate]): Array[Double] =
        cs.flatMap(c => Array(c.x, c.y))
      // XYZ coordinates (e.g. "POINT Z (1 2 3)") carry z into the
      // container's per-point z vector; all-or-none per geometry — a
      // mixed 2D/3D coordinate list has no defined z vector
      def zOf(cs: Array[org.locationtech.jts.geom.Coordinate]): Array[Double] = {
        val have = cs.count(c => !c.getZ.isNaN)
        if (have == 0) Array.empty[Double]
        else if (have == cs.length) cs.map(_.getZ)
        else throw new IllegalArgumentException(
          "mixed XY/XYZ coordinates in one geometry")
      }
      g match {
        case p: Point =>
          FgbGeom(GeomPoint, Array(p.getX, p.getY), Array.empty,
            Seq.empty, zOf(p.getCoordinates))
        case l: LineString =>
          FgbGeom(GeomLineString, flat(l.getCoordinates), Array.empty,
            Seq.empty, zOf(l.getCoordinates))
        case pg: Polygon =>
          val rings = pg.getExteriorRing +:
            (0 until pg.getNumInteriorRing).map(pg.getInteriorRingN)
          val xy = rings.toArray.flatMap(r => flat(r.getCoordinates))
          var acc = 0
          val ends = rings.map { r => acc += r.getNumPoints; acc }.toArray
          val z = zOf(rings.toArray.flatMap(_.getCoordinates))
          FgbGeom(GeomPolygon, xy, ends, Seq.empty, z)
        case mp: MultiPoint =>
          FgbGeom(GeomMultiPoint, flat(mp.getCoordinates), Array.empty,
            Seq.empty, zOf(mp.getCoordinates))
        case ml: MultiLineString =>
          val lines = (0 until ml.getNumGeometries)
            .map(ml.getGeometryN(_).asInstanceOf[LineString])
          val xy = lines.toArray.flatMap(l => flat(l.getCoordinates))
          var acc = 0
          val ends = lines.map { l => acc += l.getNumPoints; acc }.toArray
          val z = zOf(lines.toArray.flatMap(_.getCoordinates))
          FgbGeom(GeomMultiLineString, xy, ends, Seq.empty, z)
        case mpg: MultiPolygon =>
          // the spec nests polygons as child Geometry tables (`parts`)
          val polys = (0 until mpg.getNumGeometries)
            .map(i => fromJts(mpg.getGeometryN(i)))
          FgbGeom(GeomMultiPolygon, Array.empty, Array.empty, polys)
        case gc: org.locationtech.jts.geom.GeometryCollection =>
          // heterogeneous children nest exactly like multipolygon parts
          val kids = (0 until gc.getNumGeometries)
            .map(i => fromJts(gc.getGeometryN(i)))
          FgbGeom(GeomCollection, Array.empty, Array.empty, kids)
        case other => throw new IllegalArgumentException(
          s"unsupported fgb geometry ${other.getGeometryType}")
      }
    }
  }

  /** FgbGeom → little-endian WKB (the geometry contract the geo kernel's
    * stAsTextFromWkb consumes). XYZ geometries emit the ISO Z codes
    * (base + 1000, three doubles per point) — JTS parses them and the
    * kernel's toWkt2D/force2D normalize downstream, matching the
    * reference's ST_Force2D transport stance (geo_strategy.rs:283-289). */
  private[sources] def geomWkb(g: FgbGeom): Array[Byte] = {
    val dim = if (g.hasZ) 3 else 2
    def code(base: Int): Int = if (dim == 3) base + 1000 else base
    // point i (pair index into xy / index into z)
    def putPt(bb: ByteBuffer, i: Int): Unit = {
      bb.putDouble(g.xy(2 * i)); bb.putDouble(g.xy(2 * i + 1))
      if (dim == 3) bb.putDouble(g.z(i))
    }
    def slice(gt: Int, from: Int, to: Int): FgbGeom =
      FgbGeom(gt, g.xy.slice(from * 2, to * 2), Array.empty, Seq.empty,
        if (g.z.isEmpty) Array.empty else g.z.slice(from, to))
    g.gtype match {
      case GeomPoint =>
        require(g.xy.length >= 2, "fgb point without xy")
        val bb = ByteBuffer.allocate(5 + 8 * dim).order(ByteOrder.LITTLE_ENDIAN)
        bb.put(1.toByte); bb.putInt(code(1)); putPt(bb, 0)
        bb.array()
      case GeomLineString =>
        val n = g.xy.length / 2
        val bb = ByteBuffer.allocate(9 + 8 * dim * n).order(ByteOrder.LITTLE_ENDIAN)
        bb.put(1.toByte); bb.putInt(code(2)); bb.putInt(n)
        (0 until n).foreach(putPt(bb, _))
        bb.array()
      case GeomPolygon =>
        val ends = if (g.ends.isEmpty) Array(g.xy.length / 2) else g.ends
        val bb = ByteBuffer.allocate(9 + 4 * ends.length + 8 * dim * (g.xy.length / 2))
          .order(ByteOrder.LITTLE_ENDIAN)
        bb.put(1.toByte); bb.putInt(code(3)); bb.putInt(ends.length)
        var start = 0
        ends.foreach { end =>
          bb.putInt(end - start)
          (start until end).foreach(putPt(bb, _))
          start = end
        }
        bb.array()
      case GeomMultiPoint =>
        val n = g.xy.length / 2
        val out = new java.io.ByteArrayOutputStream()
        val hdr = ByteBuffer.allocate(9).order(ByteOrder.LITTLE_ENDIAN)
        hdr.put(1.toByte); hdr.putInt(code(4)); hdr.putInt(n)
        out.write(hdr.array())
        (0 until n).foreach(i => out.write(geomWkb(slice(GeomPoint, i, i + 1))))
        out.toByteArray
      case GeomMultiLineString =>
        val ends = if (g.ends.isEmpty) Array(g.xy.length / 2) else g.ends
        val out = new java.io.ByteArrayOutputStream()
        val hdr = ByteBuffer.allocate(9).order(ByteOrder.LITTLE_ENDIAN)
        hdr.put(1.toByte); hdr.putInt(code(5)); hdr.putInt(ends.length)
        out.write(hdr.array())
        var start = 0
        ends.foreach { end =>
          out.write(geomWkb(slice(GeomLineString, start, end)))
          start = end
        }
        out.toByteArray
      case GeomMultiPolygon | GeomCollection =>
        val out = new java.io.ByteArrayOutputStream()
        val hdr = ByteBuffer.allocate(9).order(ByteOrder.LITTLE_ENDIAN)
        hdr.put(1.toByte); hdr.putInt(code(g.gtype)); hdr.putInt(g.parts.length)
        out.write(hdr.array())
        g.parts.foreach(p => out.write(geomWkb(p)))
        out.toByteArray
      case other => throw new IllegalArgumentException(
        s"unsupported fgb geometry type $other")
    }
  }

  // --------------------------------------------------------------- write

  /** One .fgb layer: Point features with Long/Double/String properties.
    * `rows` pairs each property Row (matching `props`) with its (x, y).
    *
    * `indexNodeSize` > 0 writes the spec's packed Hilbert R-tree between
    * header and features (features reordered along the Hilbert curve of
    * the layer extent, leaf offsets = feature byte offsets, internal
    * offsets = first-child node index) — the layout GDAL's bbox reads
    * ride; 0 (the default) writes no index, the full-scan engine's
    * historical stance. */
  def write(path: String, layerName: String, props: StructType,
      rows: Seq[(Row, (Double, Double))], epsg: Int = 4326,
      indexNodeSize: Int = 0): Unit =
    writeGeoms(path, layerName, props,
      rows.map { case (r, (x, y)) =>
        (r, FgbGeom(GeomPoint, Array(x, y), Array.empty[Int]))
      }, epsg, indexNodeSize)

  /** General-geometry layer: each row pairs its properties with a WKT
    * geometry of any of the seven OGC simple-feature types (empties
    * rejected loudly). Mixed-type layers write header geometry type
    * Unknown(0) with per-feature types — the spec's mixed-layer
    * convention. */
  def writeGeo(path: String, layerName: String, props: StructType,
      rows: Seq[(Row, String)], epsg: Int = 4326,
      indexNodeSize: Int = 0): Unit =
    writeGeoms(path, layerName, props,
      rows.map { case (r, wkt) => (r, FgbGeom.fromWkt(wkt)) },
      epsg, indexNodeSize)

  private def writeGeoms(path: String, layerName: String, props: StructType,
      rows: Seq[(Row, FgbGeom)], epsg: Int,
      indexNodeSize: Int): Unit = {
    def colType(dt: DataType): Int = dt match {
      case LongType => ColLong
      case DoubleType => ColDouble
      case StringType => ColString
      case other => throw new IllegalArgumentException(
        s"unsupported fgb property type $other")
    }
    val indexed = indexNodeSize > 0 && rows.nonEmpty
    val gtypes = rows.map(_._2.gtype).distinct
    val headerGeomType = if (gtypes.length == 1) gtypes.head else GeomUnknown
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
      hb.slotScalar(HGeometryType, headerGeomType.toLong, 1)
      // spec bool flag: set when any feature carries a z vector
      if (rows.exists(_._2.hasZ)) hb.slotScalar(HHasZ, 1L, 1)
      hb.slotOffset(HColumns, colsVec)
      hb.slotScalar(HFeaturesCount, rows.length.toLong, 8)
      // default is 16 — 0 must be written explicitly to disable the index
      hb.slotScalar(HIndexNodeSize, (if (indexed) indexNodeSize else 0).toLong, 2)
      hb.slotOffset(HCrs, crsOff)
      val header = hb.finish(hb.endTable())
      writeSizePrefixed(out, header)
      // features, Hilbert-ordered when indexed (the index's leaf order
      // IS the feature order — offsets are computed over this layout)
      val ordered = if (indexed) hilbertOrder(rows) else rows
      val featBufs = ordered.map { case (row, g) =>
        (featureBytes(props, row, g), g)
      }
      if (indexed) {
        var off = 0L
        val items = featBufs.map { case (buf, g) =>
          val o = off; off += 4L + buf.length
          val (mnx, mny, mxx, mxy) = g.envelope
          (mnx, mny, mxx, mxy, o)
        }
        out.write(packIndex(items, indexNodeSize))
      }
      featBufs.foreach { case (buf, _) => writeSizePrefixed(out, buf) }
    } finally out.close()
  }

  /** One Feature flatbuffer (unprefixed). `ends` emitted only for
    * multi-ring geometries (the spec omits it for single parts). */
  private def featureBytes(props: StructType, row: Row,
      g: FgbGeom): Array[Byte] = {
    val fb = new FlatBuffers.Builder
    val propBytes = encodeProps(props, row)
    val propOff =
      if (propBytes.isEmpty) -1 else fb.createByteVector(propBytes)
    val geomOff = geomTable(fb, g)
    fb.startTable()
    fb.slotOffset(FGeometry, geomOff)
    if (propOff >= 0) fb.slotOffset(FProperties, propOff)
    fb.finish(fb.endTable())
  }

  /** One Geometry flatbuffer table — recursive for multipolygons, whose
    * polygons nest as child Geometry tables in the `parts` vector (each
    * child finishes before the parent starts: canonical construction
    * order). */
  private def geomTable(fb: FlatBuffers.Builder, g: FgbGeom): Int = {
    val partOffs = g.parts.map(p => geomTable(fb, p))
    val partsVec =
      if (partOffs.nonEmpty) fb.createOffsetVector(partOffs) else -1
    val endsOff =
      if (g.ends.length > 1) fb.createUIntVector(g.ends.toSeq) else -1
    val xyOff =
      if (g.xy.nonEmpty) fb.createDoubleVector(g.xy.toSeq) else -1
    val zOff =
      if (g.z.nonEmpty) fb.createDoubleVector(g.z.toSeq) else -1
    fb.startTable()
    if (endsOff >= 0) fb.slotOffset(GEnds, endsOff)
    if (xyOff >= 0) fb.slotOffset(GXy, xyOff)
    if (zOff >= 0) fb.slotOffset(GZ, zOff)
    fb.slotScalar(GType, g.gtype.toLong, 1)
    if (partsVec >= 0) fb.slotOffset(GParts, partsVec)
    fb.endTable()
  }

  /** Features sorted by Hilbert position of their envelope center on the
    * 2^16 grid over the layer extent (the spec's sort; ties keep input
    * order). */
  private def hilbertOrder(rows: Seq[(Row, FgbGeom)]): Seq[(Row, FgbGeom)] = {
    val centers = rows.map { case (_, g) =>
      val (mnx, mny, mxx, mxy) = g.envelope
      ((mnx + mxx) / 2, (mny + mxy) / 2)
    }
    val (minX, maxX) = (centers.map(_._1).min, centers.map(_._1).max)
    val (minY, maxY) = (centers.map(_._2).min, centers.map(_._2).max)
    val w = math.max(maxX - minX, java.lang.Double.MIN_NORMAL)
    val h = math.max(maxY - minY, java.lang.Double.MIN_NORMAL)
    def grid(v: Double, lo: Double, span: Double): Long =
      math.min(65535L, math.floor((v - lo) / span * 65536.0).toLong)
    rows.zip(centers).sortBy { case (_, (cx, cy)) =>
      graft.functions.HilbertIndex.xy2d(grid(cx, minX, w), grid(cy, minY, h))
    }.map(_._1)
  }

  /** Serialized packed R-tree over `items` = (minX, minY, maxX, maxY,
    * featureByteOffset) in leaf (Hilbert) order. Storage is root-first,
    * leaves last; every node is 40 LE bytes: f64 bbox + u64 offset
    * (leaf: feature byte offset; internal: index of its first child
    * node). */
  private[sources] def packIndex(
      items: Seq[(Double, Double, Double, Double, Long)],
      nodeSize: Int): Array[Byte] = {
    val ns = math.max(2, math.min(nodeSize, 65535))
    val bounds = levelBounds(items.length.toLong, ns)
    val numNodes = bounds.head._2 // leaves end = total node count
    val minXs = new Array[Double](numNodes)
    val minYs = new Array[Double](numNodes)
    val maxXs = new Array[Double](numNodes)
    val maxYs = new Array[Double](numNodes)
    val offs = new Array[Long](numNodes)
    val leafStart = bounds.head._1
    items.zipWithIndex.foreach { case ((mnx, mny, mxx, mxy, o), i) =>
      minXs(leafStart + i) = mnx; minYs(leafStart + i) = mny
      maxXs(leafStart + i) = mxx; maxYs(leafStart + i) = mxy
      offs(leafStart + i) = o
    }
    // build parents bottom-up: parent bbox = union of its ≤ns children,
    // parent offset = first child's NODE INDEX
    var lvl = 0
    while (lvl < bounds.length - 1) {
      val (cs, ce) = bounds(lvl)
      var pos = cs
      var parent = bounds(lvl + 1)._1
      while (pos < ce) {
        val first = pos
        var mnx = Double.PositiveInfinity; var mny = Double.PositiveInfinity
        var mxx = Double.NegativeInfinity; var mxy = Double.NegativeInfinity
        var j = 0
        while (j < ns && pos < ce) {
          mnx = math.min(mnx, minXs(pos)); mny = math.min(mny, minYs(pos))
          mxx = math.max(mxx, maxXs(pos)); mxy = math.max(mxy, maxYs(pos))
          pos += 1; j += 1
        }
        minXs(parent) = mnx; minYs(parent) = mny
        maxXs(parent) = mxx; maxYs(parent) = mxy
        offs(parent) = first.toLong
        parent += 1
      }
      lvl += 1
    }
    val bb = ByteBuffer.allocate(numNodes * 40).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < numNodes) {
      bb.putDouble(minXs(i)); bb.putDouble(minYs(i))
      bb.putDouble(maxXs(i)); bb.putDouble(maxYs(i))
      bb.putLong(offs(i))
      i += 1
    }
    bb.array()
  }

  /** Per-level [start, end) node-index bounds, LEAF LEVEL FIRST in the
    * returned seq; storage order in the file is root-first, so the leaf
    * level occupies the LAST numItems slots. Same do-while reduction as
    * [[packedIndexSize]] (a 1-item tree still has a root). */
  private[sources] def levelBounds(numItems: Long, nodeSize: Int): Seq[(Int, Int)] = {
    val ns = math.max(2, math.min(nodeSize, 65535)).toLong
    var n = numItems
    val perLevel = scala.collection.mutable.ArrayBuffer(n)
    var done = false
    while (!done) { n = (n + ns - 1) / ns; perLevel += n; done = n == 1 }
    val numNodes = perLevel.sum
    var end = numNodes
    perLevel.map { size =>
      val b = (math.toIntExact(end - size), math.toIntExact(end))
      end -= size
      b
    }.toSeq
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
        feats.map { case (g, propBytes) =>
          Row.fromSeq(decodeProps(props, propBytes) :+ geomWkb(g))
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

  /** Whole-container parse in external types — the [[ContainerSource]]
    * DSv2 contract (`spark.read.format("fgb")`): geometry as WKB bytes,
    * properties as Long/Double/String. */
  def parsed(path: String): (StructType, Seq[Seq[Any]]) = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val (_, schema, _, props, feats) = parseAll(bytes)
    val rows = feats.map { case (g, pb) =>
      decodeProps(props, pb) :+ geomWkb(g)
    }.toSeq
    (schema, rows)
  }

  /** [[parsed]] with a bbox spatial filter — the [[ContainerSource]]
    * options hook behind `spark.read.format("fgb").option("bbox", ...)`:
    * indexed containers decode ONLY R-tree candidate features (the
    * readBbox pruning, now reachable through the connector), index-free
    * containers fall back to decode-all + envelope filter. */
  def parsedBbox(path: String, minX: Double, minY: Double,
      maxX: Double, maxY: Double): (StructType, Seq[Seq[Any]]) = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val (schema, props, feats) = parseBbox(bytes, minX, minY, maxX, maxY)
    val rows = feats.map { case (g, pb) =>
      decodeProps(props, pb) :+ geomWkb(g)
    }.toSeq
    (schema, rows)
  }

  private def readSizePrefixed(in: java.io.DataInputStream): Array[Byte] = {
    val lenB = new Array[Byte](4); in.readFully(lenB)
    val len = ByteBuffer.wrap(lenB).order(ByteOrder.LITTLE_ENDIAN).getInt
    require(len > 0 && len < (1 << 30), s"implausible fgb buffer size $len")
    val buf = new Array[Byte](len); in.readFully(buf)
    buf
  }

  /** (name, schema, epsg, propTypes, (featureCount, indexNodeSize,
    * headerGeometryType)). */
  private def parseHeader(
      header: Array[Byte]): (String, StructType, Int, Array[(String, Int)], (Long, Int, Int)) = {
    val h = FlatBuffers.root(header)
    val gt = h.getByte(HGeometryType)
    require(gt >= GeomUnknown && gt <= GeomCollection,
      s"unsupported fgb geometry type $gt " +
        "(the 7 OGC simple-feature types + mixed)")
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
      cols, (h.getLong(HFeaturesCount), h.getShort(HIndexNodeSize, 16), gt))
  }

  /** Decode one Feature flatbuffer into (geometry, property bytes). The
    * geometry type comes from the feature, falling back to the header's
    * (the spec's homogeneous-layer convention); Unknown on both fails
    * loudly. */
  private def decodeFeature(buf: Array[Byte], headerGt: Int): (FgbGeom, Array[Byte]) = {
    val f = FlatBuffers.root(buf)
    val geom = f.getTable(FGeometry).getOrElse(
      throw new IllegalArgumentException("fgb feature without geometry"))
    val g = decodeGeom(geom, headerGt)
    val pvp = f.vectorPos(FProperties)
    val pb = if (pvp < 0) Array.empty[Byte] else f.bytesAt(pvp)
    (g, pb)
  }

  /** Geometry table → FgbGeom — recursive for multipolygon `parts`
    * (children default to Polygon, the spec's nesting). */
  private def decodeGeom(geom: FlatBuffers.Table, defaultGt: Int): FgbGeom = {
    val gt = geom.getByte(GType, defaultGt) match {
      case GeomUnknown => defaultGt
      case t => t
    }
    require(gt >= GeomPoint && gt <= GeomCollection,
      s"unsupported fgb feature geometry type $gt")
    if (gt == GeomMultiPolygon || gt == GeomCollection) {
      // a missing parts vector is an externally-written EMPTY geometry:
      // zero parts compose a valid empty WKB (our own writer refuses to
      // emit empties, but a reader must not reject a legal file)
      val pvp = geom.vectorPos(GParts)
      // multipolygon children default to Polygon; collection children
      // must declare their own types (Unknown default fails loudly)
      val childDefault = if (gt == GeomMultiPolygon) GeomPolygon else GeomUnknown
      val parts =
        if (pvp < 0) Seq.empty[FgbGeom]
        else (0 until geom.vectorLen(pvp))
          .map(i => decodeGeom(geom.tableAt(pvp, i), childDefault))
      FgbGeom(gt, Array.empty, Array.empty, parts)
    } else {
      val xyVp = geom.vectorPos(GXy)
      require(xyVp >= 0 && geom.vectorLen(xyVp) >= 2, "fgb geometry without xy")
      val xy = geom.doublesAt(xyVp)
      val endsVp = geom.vectorPos(GEnds)
      val ends = if (endsVp < 0) Array.empty[Int] else geom.uintsAt(endsVp)
      // per-point z vector (3D containers — GDAL writes these for any
      // XYZ source); must partition exactly like xy. m measures are
      // linear-reference values, not geometry: validated for shape,
      // then dropped (the engine's kernel is 2D+Z, matching the
      // reference's ST_Force2D transport).
      val zVp = geom.vectorPos(GZ)
      val z = if (zVp < 0) Array.empty[Double] else geom.doublesAt(zVp)
      require(z.isEmpty || z.length == xy.length / 2,
        s"fgb z vector length ${z.length} != ${xy.length / 2} points")
      val mVp = geom.vectorPos(GM)
      if (mVp >= 0)
        require(geom.vectorLen(mVp) == xy.length / 2,
          s"fgb m vector length ${geom.vectorLen(mVp)} != ${xy.length / 2} points")
      // the WKB emitter sizes its buffer assuming `ends` exactly
      // partitions xy — an externally-written container whose ends
      // vector is non-monotonic or doesn't land on the point count
      // would otherwise produce silent trailing zeros or an
      // out-of-bounds read instead of a loud reject
      if (ends.nonEmpty) {
        require(ends.head > 0 &&
            ends.iterator.sliding(2).withPartial(false).forall(p => p(0) < p(1)),
          s"fgb geometry ends vector not strictly increasing: [${ends.mkString(",")}]")
        require(ends.last == xy.length / 2,
          s"fgb geometry ends vector last=${ends.last} does not partition " +
            s"the ${xy.length / 2} points")
      }
      FgbGeom(gt, xy, ends, Seq.empty, z)
    }
  }

  /** Validated container prologue shared by every parse path: magic
    * check + size-prefixed header read; returns the buffer positioned
    * AFTER the header (at the index or first feature) plus the parsed
    * header tuple. */
  private def openContainer(bytes: Array[Byte])
      : (ByteBuffer, (String, StructType, Int, Array[(String, Int)], (Long, Int, Int))) = {
    require(bytes.length > 8 && bytes.take(8).sameElements(Magic),
      "not a FlatGeobuf 3 container")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(8)
    val len = bb.getInt
    require(len > 0 && len <= bb.remaining(), s"implausible fgb buffer size $len")
    val header = new Array[Byte](len); bb.get(header)
    (bb, parseHeader(header))
  }

  /** Full container parse: header + (skipped index) + features. */
  private def parseAll(bytes: Array[Byte])
      : (String, StructType, Int, Array[(String, Int)],
         Iterator[(FgbGeom, Array[Byte])]) = {
    val (bb, (name, schema, epsg, props, (featCount, nodeSize, gt))) =
      openContainer(bytes)
    def sized(): Array[Byte] = {
      val len = bb.getInt
      require(len > 0 && len <= bb.remaining(), s"implausible fgb buffer size $len")
      val out = new Array[Byte](len); bb.get(out); out
    }
    if (nodeSize > 0 && featCount > 0)
      bb.position(bb.position() + packedIndexSize(featCount, nodeSize))
    val feats = new Iterator[(FgbGeom, Array[Byte])] {
      def hasNext: Boolean = bb.remaining() >= 4
      def next(): (FgbGeom, Array[Byte]) = decodeFeature(sized(), gt)
    }
    (name, schema, epsg, props, feats)
  }

  /** Bbox-pruned distributed read: when a container carries the packed
    * Hilbert R-tree, ONLY features whose index nodes intersect the bbox
    * are decoded — the index walk touches 40-byte node records, never
    * feature flatbuffers, so a selective read of a 100 TB landing zone
    * decodes a bbox-proportional sliver instead of every feature (the
    * format's reason to exist; GDAL does the same). Index-free
    * containers fall back to decode-all + filter. `decoded` (optional)
    * counts feature DECODES — the pruning proof: on an indexed container
    * it ends ≪ featuresCount for a selective bbox. */
  def readBbox(s: SparkSession, path: String,
      minX: Double, minY: Double, maxX: Double, maxY: Double,
      decoded: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val (_, schema, _) = sparkSchema(headFile(path))
    val expected = schema
    val bin = s.read.format("binaryFile").load(path).select(col("content"))
    val rows = bin.rdd.mapPartitions { parts =>
      parts.flatMap { r =>
        val (fileSchema, props, feats) =
          parseBbox(r.getAs[Array[Byte]](0), minX, minY, maxX, maxY, decoded)
        require(fileSchema == expected,
          s"fgb container schema $fileSchema != landing-zone schema $expected")
        feats.map { case (g, propBytes) =>
          Row.fromSeq(decodeProps(props, propBytes) :+ geomWkb(g))
        }
      }
    }
    s.createDataFrame(rows, schema)
  }

  /** Container-level bbox scan: index-driven candidate decode when the
    * packed R-tree is present, full-scan + filter when not. Returns only
    * features whose point lies inside the bbox (the residual check —
    * index candidates are node-bbox intersections). */
  private[sources] def parseBbox(bytes: Array[Byte],
      minX: Double, minY: Double, maxX: Double, maxY: Double,
      decoded: Option[org.apache.spark.util.LongAccumulator] = None)
      : (StructType, Array[(String, Int)], Iterator[(FgbGeom, Array[Byte])]) = {
    val (bb, (_, schema, _, props, (featCount, nodeSize, gt))) =
      openContainer(bytes)
    def decodeAt(pos: Int): (FgbGeom, Array[Byte]) = {
      decoded.foreach(_.add(1L))
      bb.position(pos)
      val len = bb.getInt
      require(len > 0 && len <= bb.remaining(), s"implausible fgb buffer size $len")
      val buf = new Array[Byte](len); bb.get(buf)
      decodeFeature(buf, gt)
    }
    // envelope-intersection residual (GDAL's fgb spatial filter is
    // bbox-level too; exact geometry predicates run downstream) — for
    // points the envelope IS the point, so the filter stays exact there
    def hits(g: FgbGeom): Boolean = {
      val (mnx, mny, mxx, mxy) = g.envelope
      mnx <= maxX && mxx >= minX && mny <= maxY && mxy >= minY
    }
    if (nodeSize > 0 && featCount > 0) {
      val indexPos = bb.position()
      val featuresPos = indexPos + packedIndexSize(featCount, nodeSize)
      val candidates =
        searchIndex(bb, indexPos, featCount, nodeSize, minX, minY, maxX, maxY)
      val feats = candidates.iterator
        .map(off => decodeAt(featuresPos + math.toIntExact(off)))
        .filter { case (g, _) => hits(g) }
      (schema, props, feats)
    } else {
      // no index: sequential decode-all + filter (every decode counted)
      var pos = bb.position()
      val feats = new Iterator[(FgbGeom, Array[Byte])] {
        def hasNext: Boolean = bytes.length - pos >= 4
        def next(): (FgbGeom, Array[Byte]) = {
          val out = decodeAt(pos)
          pos = bb.position()
          out
        }
      }.filter { case (g, _) => hits(g) }
      (schema, props, feats)
    }
  }

  /** Packed R-tree walk: depth-first from the root (node 0), visiting
    * only subtrees whose node bbox intersects the query bbox; returns
    * feature byte offsets of intersecting LEAF nodes in index order.
    * Reads 40-byte node records straight off the container buffer. */
  private[sources] def searchIndex(bb: ByteBuffer, indexPos: Int,
      numItems: Long, nodeSize: Int,
      minX: Double, minY: Double, maxX: Double, maxY: Double): Seq[Long] = {
    val ns = math.max(2, math.min(nodeSize, 65535))
    val bounds = levelBounds(numItems, ns) // leaf level first
    val topLevel = bounds.length - 1
    val results = scala.collection.mutable.ArrayBuffer.empty[Long]
    // (firstNodeIndex, level) work stack — the root group is node 0
    val stack = scala.collection.mutable.Stack((0, topLevel))
    while (stack.nonEmpty) {
      val (first, level) = stack.pop()
      val levelEnd = bounds(level)._2
      val end = math.min(first + ns, levelEnd)
      var pos = first
      while (pos < end) {
        val base = indexPos + pos * 40
        val nMinX = bb.getDouble(base)
        val nMinY = bb.getDouble(base + 8)
        val nMaxX = bb.getDouble(base + 16)
        val nMaxY = bb.getDouble(base + 24)
        val off = bb.getLong(base + 32)
        if (nMinX <= maxX && nMaxX >= minX && nMinY <= maxY && nMaxY >= minY) {
          if (level == 0) results += off
          else stack.push((math.toIntExact(off), level - 1))
        }
        pos += 1
      }
    }
    results.toSeq
  }

  /** Packed Hilbert R-tree byte size (spec's level recurrence): every
    * node entry is 40 bytes (4 × f64 bbox + u64 offset). The reduction
    * runs AT LEAST once (do-while semantics): a single-item tree still
    * has a root ABOVE its leaf — 2 nodes, 80 bytes — so an
    * externally-written indexed single-feature file skips correctly. */
  private[sources] def packedIndexSize(numItems: Long, nodeSize: Int): Int = {
    val ns = math.max(2, math.min(nodeSize, 65535)).toLong
    var n = numItems
    var total = n
    var done = false
    while (!done) { n = (n + ns - 1) / ns; total += n; done = n == 1 }
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
