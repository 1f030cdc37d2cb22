package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

import java.io.File

/** Distributed WRITE half of the container connector tier
  * (`df.write.format("fgb"|"arrow"|"gpkg").save(dir)`, and
  * `df.writeStream` for continuous landing — [[ContainerStreamingWrite]]).
  *
  * The reference's whole job is a write (geo_strategy.rs:350-421 hands a
  * final CTAS to PostGIS); its Spark re-expression must not funnel the
  * dataset through the driver. Here each write TASK emits one container
  * file for its partition, executor-side — a 1000-partition DataFrame
  * lands as 1000 containers written by 1000 parallel tasks, the layout a
  * landing-zone consumer (this repo's own `format("fgb"|"arrow")` read
  * tier, one scan task per container) wants anyway. The driver never
  * sees a row.
  *
  * Commit protocol is the classic two-phase v1 algorithm: tasks write to
  * dot-prefixed `.part-*.inprogress` temps (invisible to the read tier,
  * which skips hidden files), task commit reports the temp, and JOB
  * commit renames all temps to their final `part-NNNNN-task.ext` names —
  * so a failed or partially-executed write leaves no visible container,
  * and speculative duplicate attempts die at the job-commit boundary
  * (only the committed task's message is renamed). On a cluster the
  * target is shared storage (the same premise every Hadoop committer
  * rests on); renames are metadata-only there.
  *
  * Container formats are single-file units: the per-partition sink may
  * buffer ITS OWN partition when the format needs whole-layer knowledge
  * (FlatGeobuf's header feature count + packed Hilbert index), which is
  * bounded by partition sizing — the executor-memory contract every
  * Spark shuffle already holds — never by corpus size. The Arrow sink
  * streams record batches and holds only `batchRows` rows at a time.
  */
trait ContainerSink {
  /** Append one row (external types, matching the write schema). */
  def append(row: Row): Unit
  /** Finalize the container (flush, trailer, close). */
  def finish(): Unit
  /** Best-effort cleanup on task failure. */
  def abort(): Unit
}

/** Per-format factory for executor-side single-container sinks; a
  * serializable object shipped inside the writer factory. */
trait ContainerWriteSupport extends Serializable {
  /** Container file extension (also the truncate-scope suffix). */
  def extension: String
  def newSink(path: String, schema: StructType,
      options: Map[String, String]): ContainerSink
  /** Driver-side schema/options check, run at plan-build time — sinks
    * only open on the first ROW, so without this an invalid schema over
    * empty data commits silently and over real data fails late as an
    * executor task error instead of before the job launches. */
  def validate(schema: StructType, options: Map[String, String]): Unit = ()
}

final class ContainerWriteBuilder(format: String, schema: StructType,
    dir: String, ws: ContainerWriteSupport, options: Map[String, String])
    extends WriteBuilder with SupportsTruncate {
  private var truncateAll = false
  // mode("overwrite") arrives as a truncate of the whole target
  override def truncate(): WriteBuilder = { truncateAll = true; this }
  override def build(): Write = {
    ws.validate(schema, options) // fail at plan time, not first-row time
    new Write {
      override def toBatch: BatchWrite =
        new ContainerBatchWrite(format, schema, dir, ws, options, truncateAll)
      override def toStreaming
          : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
        new ContainerStreamingWrite(format, schema, dir, ws, options)
    }
  }
}

final class ContainerBatchWrite(format: String, schema: StructType,
    dir: String, ws: ContainerWriteSupport, options: Map[String, String],
    truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val d = new File(dir)
    require(d.isDirectory || d.mkdirs(),
      s"cannot create $format write target directory $dir")
    if (truncate)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith("." + ws.extension))
        .foreach(f => require(f.delete(), s"cannot truncate ${f.getPath}"))
    new ContainerDataWriterFactory(schema, dir, ws, options)
  }

  /** Job commit: rename every committed task's temp to its final name.
    * Until this point no visible container exists, so readers of the
    * zone never observe a half-written job. */
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case ContainerCommit(tmp, dst) if tmp.nonEmpty =>
        val src = new File(tmp)
        require(src.renameTo(new File(dst)),
          s"container commit rename failed: $tmp -> $dst")
      case _ => ()
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case ContainerCommit(tmp, _) if tmp.nonEmpty => new File(tmp).delete(): Unit
      case _ => ()
    }
}

/** Streaming half of the write tier (`df.writeStream.format("fgb"|
  * "arrow"|"gpkg")`): each micro-batch epoch lands one container per
  * non-empty partition, named `part-<epoch>-<partition>.<ext>` —
  * DETERMINISTIC per (epoch, partition), so a replayed epoch after a
  * crash re-commits the same final names (delete + rename = idempotent,
  * the exactly-once contract checkpointed streams need). Epoch-prefixed
  * names are also monotonically increasing, which is exactly the
  * landing-zone order the streaming READ half's name-anchored offset
  * demands — a graft stream can land a zone another graft stream
  * tails. */
final class ContainerStreamingWrite(format: String, schema: StructType,
    dir: String, ws: ContainerWriteSupport, options: Map[String, String])
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val d = new File(dir)
    require(d.isDirectory || d.mkdirs(),
      s"cannot create $format streaming write target directory $dir")
    new ContainerStreamingWriterFactory(schema, dir, ws, options)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case ContainerCommit(tmp, dst) if tmp.nonEmpty =>
        val d = new File(dst)
        // a replayed epoch overwrites its own previous containers
        if (d.exists()) require(d.delete(), s"cannot replace $dst")
        require(new File(tmp).renameTo(d),
          s"epoch $epochId commit rename failed: $tmp -> $dst")
      case _ => ()
    }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case ContainerCommit(tmp, _) if tmp.nonEmpty => new File(tmp).delete(): Unit
      case _ => ()
    }
}

final class ContainerStreamingWriterFactory(schema: StructType, dir: String,
    ws: ContainerWriteSupport, options: Map[String, String])
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new ContainerDataWriter(schema, dir, ws, options, partitionId, taskId,
      epoch = Some(epochId))
}

/** @param tmp in-progress path ("" = empty partition, nothing written)
  * @param dst final container path the job commit renames to */
final case class ContainerCommit(tmp: String, dst: String)
    extends WriterCommitMessage

final class ContainerDataWriterFactory(schema: StructType, dir: String,
    ws: ContainerWriteSupport, options: Map[String, String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ContainerDataWriter(schema, dir, ws, options, partitionId, taskId)
}

final class ContainerDataWriter(schema: StructType, dir: String,
    ws: ContainerWriteSupport, options: Map[String, String],
    partitionId: Int, taskId: Long,
    epoch: Option[Long] = None) extends DataWriter[InternalRow] {

  // batch: taskId in the final name (uniqueness across jobs into one
  // zone). streaming: DETERMINISTIC (epoch, partition) final name so a
  // replayed epoch re-commits idempotently. The temp always carries the
  // taskId — concurrent speculative attempts must not collide — and its
  // dot prefix keeps it invisible to the read tier until commit.
  // epoch is padded to the full Long width: the name-anchored reader
  // depends on lexicographic order matching commit order, and a 5-digit
  // pad would sort epoch 100000 BEFORE 99999 — a crash-loop on a zone
  // the sink itself produced, ~70 days into a 1/min stream. The r10
  // widening from %05d is safe precisely because no zone written by the
  // narrow format persists (every zone in this repo's lifetime is
  // rebuilt per run); a deployment carrying legacy 5-digit zones would
  // instead need the reader to unify part-<e>%05d / %019d stems before
  // adopting the wide pad — restated here so the constraint travels
  // with the code
  private val stem = epoch match {
    case Some(e) => f"part-$e%019d-$partitionId%05d.${ws.extension}"
    case None => f"part-$partitionId%05d-$taskId.${ws.extension}"
  }
  private val tmpFile = new File(dir, s".$stem.$taskId.inprogress")
  private val dstFile = new File(dir, stem)
  private val toScala = CatalystTypeConverters.createToScalaConverter(schema)
  // opened on first row: an empty partition writes no container at all
  // (a zero-feature container would be legal but useless, and skipping
  // it keeps zone listings proportional to data, not to partition count)
  private var sink: ContainerSink = null

  override def write(record: InternalRow): Unit = {
    if (sink == null) sink = ws.newSink(tmpFile.getPath, schema, options)
    sink.append(toScala(record).asInstanceOf[Row])
  }

  override def commit(): WriterCommitMessage =
    if (sink == null) ContainerCommit("", "")
    else { sink.finish(); ContainerCommit(tmpFile.getPath, dstFile.getPath) }

  override def abort(): Unit = if (sink != null) sink.abort()
  override def close(): Unit = ()
}

/** FlatGeobuf write support: schema = one StringType `wkt` geometry
  * column + Long/Double/String property columns. Options: `layer`
  * (header layer name), `epsg`, `indexNodeSize` (>0 writes the packed
  * Hilbert R-tree; features reordered along the curve per container).
  * The sink buffers its own partition — the header's feature count and
  * the index's layout need the whole layer — which is the partition-
  * sized memory contract, never the corpus. */
object FgbWriteSupport extends ContainerWriteSupport {
  override def extension: String = "fgb"
  override def validate(schema: StructType, options: Map[String, String]): Unit = {
    val i = schema.fieldNames.indexOf("wkt")
    require(i >= 0 &&
        schema.fields(i).dataType == org.apache.spark.sql.types.StringType,
      s"fgb write needs a string geometry column named 'wkt'; " +
        s"schema is ${schema.simpleString}")
  }
  override def newSink(path: String, schema: StructType,
      options: Map[String, String]): ContainerSink = new ContainerSink {
    private val wktIdx = {
      val i = schema.fieldNames.indexOf("wkt")
      require(i >= 0 &&
          schema.fields(i).dataType == org.apache.spark.sql.types.StringType,
        s"fgb write needs a string geometry column named 'wkt'; " +
          s"schema is ${schema.simpleString}")
      i
    }
    // materialized once: append runs per ROW, and a per-call
    // toIndexedSeq would allocate a fresh wrapper for every record
    private val propFields =
      schema.fields.zipWithIndex.filter(_._2 != wktIdx).toIndexedSeq
    private val props = StructType(propFields.map(_._1).toArray)
    private val buf = scala.collection.mutable.ArrayBuffer.empty[(Row, String)]
    override def append(row: Row): Unit = {
      require(!row.isNullAt(wktIdx), "fgb write: null wkt geometry")
      buf += ((Row.fromSeq(propFields.map { case (_, i) => row.get(i) }),
        row.getString(wktIdx)))
    }
    override def finish(): Unit =
      FlatGeobuf.writeGeo(path, options.getOrElse("layer", "layer"),
        props, buf.toSeq,
        epsg = options.getOrElse("epsg", "4326").toInt,
        indexNodeSize = options.getOrElse("indexnodesize", "0").toInt)
    override def abort(): Unit = new File(path).delete(): Unit
  }
}

/** GeoPackage write support: schema = an optional StringType `wkt`
  * geometry column (any OGC simple-feature WKT → GPB blob) +
  * Long/Double/String/Binary attribute columns; without `wkt` the
  * container is attributes-only (data_type "attributes"). Options:
  * `table` (layer name), `epsg`. The sink buffers its partition —
  * the SQLite B-tree needs the whole table to lay out pages — the
  * same partition-sized contract as fgb. */
object GpkgWriteSupport extends ContainerWriteSupport {
  override def extension: String = "gpkg"
  override def validate(schema: StructType, options: Map[String, String]): Unit = {
    val i = schema.fieldNames.indexOf("wkt")
    if (i >= 0)
      require(schema.fields(i).dataType == org.apache.spark.sql.types.StringType,
        s"gpkg write: 'wkt' must be a string column, got " +
          schema.fields(i).dataType)
  }
  override def newSink(path: String, schema: StructType,
      options: Map[String, String]): ContainerSink = new ContainerSink {
    import org.apache.spark.sql.types._
    private val wktIdx = schema.fieldNames.indexOf("wkt")
    if (wktIdx >= 0)
      require(schema.fields(wktIdx).dataType == StringType,
        s"gpkg write: 'wkt' must be a string column, got " +
          schema.fields(wktIdx).dataType)
    private val srs = options.getOrElse("epsg", "4326").toInt
    // materialized once — append() runs per row (cf. FgbWriteSupport)
    private val attrFields =
      schema.fields.zipWithIndex.filter(_._2 != wktIdx).toIndexedSeq
    private def declType(dt: DataType): String = dt match {
      case LongType | IntegerType => "INTEGER"
      case DoubleType | FloatType => "REAL"
      case StringType => "TEXT"
      case BinaryType => "BLOB"
      case other => throw new IllegalArgumentException(
        s"unsupported gpkg attribute type $other")
    }
    private val columns = attrFields.map { case (f, _) =>
      f.name -> declType(f.dataType)
    }.toSeq ++ (if (wktIdx >= 0) Seq("geom" -> "BLOB") else Nil)
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    override def append(row: Row): Unit = {
      val attrs = attrFields.map { case (f, i) =>
        if (row.isNullAt(i)) null
        else f.dataType match {
          case IntegerType => row.getInt(i).toLong
          case FloatType => row.getFloat(i).toDouble
          case _ => row.get(i)
        }
      }
      val geom =
        if (wktIdx < 0) Nil
        else {
          require(!row.isNullAt(wktIdx), "gpkg write: null wkt geometry")
          val g = graft.functions.GeoFunctions.parseWkt(row.getString(wktIdx))
            .getOrElse(throw new IllegalArgumentException(
              s"gpkg write: unparseable wkt '${row.getString(wktIdx)}'"))
          Seq(FormatWriters.gpbWrap(srs, graft.functions.GeoFunctions.toWkb(g)))
        }
      buf += (attrs ++ geom)
    }
    override def finish(): Unit =
      FormatWriters.writeGeoPackageTable(path,
        options.getOrElse("table", "layer"), columns, srs,
        if (wktIdx >= 0) Some("geom") else None, buf.iterator)
    override def abort(): Unit = new File(path).delete(): Unit
  }
}

/** Zipped-shapefile write support — completes the read/write story for
  * all four container connectors. The ESRI format writer is Point-only
  * with dBASE III attributes, so the accepted schema is exactly one
  * LongType column, one StringType column, and a StringType `wkt`
  * column of POINTs — anything else refuses loudly (shapefile is the
  * legacy interchange leg; rich layers belong in fgb/gpkg). Options:
  * `basename` (the zip's inner file stem). */
object ShpZipWriteSupport extends ContainerWriteSupport {
  override def extension: String = "zip"
  override def validate(schema: StructType, options: Map[String, String]): Unit = {
    import org.apache.spark.sql.types._
    val wktIdx = schema.fieldNames.indexOf("wkt")
    require(wktIdx >= 0 && schema.fields(wktIdx).dataType == StringType,
      s"shpzip write needs a string geometry column named 'wkt'; " +
        s"schema is ${schema.simpleString}")
    val attrs = schema.fields.zipWithIndex.filter(_._2 != wktIdx)
    require(attrs.length == 2 &&
        attrs.count(_._1.dataType == LongType) == 1 &&
        attrs.count(_._1.dataType == StringType) == 1,
      "shpzip write takes exactly one bigint attribute, one string " +
        s"attribute and the wkt point column; schema is ${schema.simpleString}")
  }
  override def newSink(path: String, schema: StructType,
      options: Map[String, String]): ContainerSink = new ContainerSink {
    import org.apache.spark.sql.types._
    private val wktIdx = schema.fieldNames.indexOf("wkt")
    require(wktIdx >= 0 && schema.fields(wktIdx).dataType == StringType,
      s"shpzip write needs a string geometry column named 'wkt'; " +
        s"schema is ${schema.simpleString}")
    private val attrs = schema.fields.zipWithIndex.filter(_._2 != wktIdx)
    require(attrs.length == 2 &&
        attrs.count(_._1.dataType == LongType) == 1 &&
        attrs.count(_._1.dataType == StringType) == 1,
      "shpzip write takes exactly one bigint attribute, one string " +
        s"attribute and the wkt point column; schema is ${schema.simpleString}")
    private val (keyF, keyIdx) = { val a = attrs.find(_._1.dataType == LongType).get; (a._1.name, a._2) }
    private val (nameF, nameIdx) = { val a = attrs.find(_._1.dataType == StringType).get; (a._1.name, a._2) }
    private val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double, Double)]
    override def append(row: Row): Unit = {
      require(!row.isNullAt(wktIdx) && !row.isNullAt(keyIdx) && !row.isNullAt(nameIdx),
        "shpzip write: null cell (the dBASE fixed-width records have no null encoding)")
      val g = graft.functions.GeoFunctions.parseWkt(row.getString(wktIdx))
        .getOrElse(throw new IllegalArgumentException(
          s"shpzip write: unparseable wkt '${row.getString(wktIdx)}'"))
      require(g.getGeometryType == "Point",
        s"shpzip write is Point-only, got ${g.getGeometryType}")
      val c = g.getCoordinate
      buf += ((row.getLong(keyIdx), row.getString(nameIdx), c.x, c.y))
    }
    override def finish(): Unit =
      FormatWriters.writeShapefileZip(path,
        options.getOrElse("basename", "layer"), keyF, nameF, buf.toSeq)
    override def abort(): Unit = new File(path).delete(): Unit
  }
}

/** Arrow IPC stream write support: streaming record batches of
  * `batchRows` (default 1024) rows — per-task peak memory is one batch.
  * Type coverage is [[ArrowIpc]]'s interchange set. Option `codec`
  * (`lz4` | `zstd`) compresses record-batch bodies — the wire shape
  * default pyarrow writers produce. */
object ArrowWriteSupport extends ContainerWriteSupport {
  override def extension: String = "arrows"
  override def validate(schema: StructType, options: Map[String, String]): Unit =
    options.get("dict").foreach { cols =>
      require(!options.contains("codec"),
        "dict and codec options are mutually exclusive " +
          "(the dictionary sink hand-serializes its batches)")
      val missing = cols.split(",").map(_.trim).filter(_.nonEmpty)
        .filterNot(schema.fieldNames.contains)
      require(missing.isEmpty,
        s"dict option names absent columns: ${missing.mkString(", ")}; " +
          s"schema is ${schema.simpleString}")
    }
  override def newSink(path: String, schema: StructType,
      options: Map[String, String]): ContainerSink =
    options.get("dict") match {
      // dictionary-encode the named string columns: values ship once
      // (+ per-batch deltas), rows ship as int32 indices
      case Some(cols) =>
        require(!options.contains("codec"),
          "dict and codec options are mutually exclusive " +
            "(the dictionary sink hand-serializes its batches)")
        ArrowIpc.dictSink(path, schema,
          cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          options.getOrElse("batchrows", "1024").toInt)
      case None =>
        ArrowIpc.sink(path, schema,
          options.getOrElse("batchrows", "1024").toInt,
          options.get("codec"))
    }
}
