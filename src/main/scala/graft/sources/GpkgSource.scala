package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Single-file ingest containers as first-class DataSourceV2 connectors.
  *
  * Where the driver-side readers ([[GeoPackageReader.read]],
  * [[ShapefileReader.read]]) match the reference's single-file `st_read`
  * (core_processor.rs:393-406), these connectors plan one input
  * partition per container and run the WHOLE binary walk inside the
  * scan task — so ingesting ten thousand containers from an object
  * store parallelizes across every executor, with the driver touching
  * only the first container (schema inference). Column pruning is
  * pushed (SupportsPushDownRequiredColumns): a two-column projection
  * decodes every row but materializes only those fields into the scan
  * output — visible in the scan description, asserted by GpkgSourceSpec.
  *
  * The scaffold is format-agnostic: a concrete source supplies its
  * short name and a `parse(path) => (schema, rows)` function (a
  * serializable object-method reference, shipped to executors inside
  * the reader factory). Registered via the DataSourceRegister service
  * file, so `spark.read.format("gpkg")` / `format("shpzip")` resolve.
  */
abstract class ContainerSource extends TableProvider with DataSourceRegister {

  /** Full container parse: (inferred schema, rows in external types). */
  def parse: String => (StructType, Seq[Seq[Any]])

  /** Write half, when the format has one ([[ContainerWriteSupport]]):
    * enables `df.write.format(shortName).save(dir)` — one container per
    * partition, written executor-side. None = read-only connector. */
  def writeSupport: Option[ContainerWriteSupport] = None

  /** Options-aware parse hook: a format may specialize the container
    * walk from READ options (fgb: `bbox` → index-driven candidate
    * decode). Default ignores options. The specialized parse flows into
    * batch scans AND the streaming micro-batch tier — an option-scoped
    * stream tails the zone with the same filter applied per container. */
  def parseFor(options: Map[String, String])
      : String => (StructType, Seq[Seq[Any]]) = parse

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val paths = ContainerSource.paths(options).flatMap(ContainerSource.containerFiles)
    require(paths.nonEmpty,
      s"${shortName()} source needs at least one path (a container file, " +
        "or a directory already holding one for schema inference)")
    // inference must honor the SAME options the scan will (an xlsx
    // `sheet` selection changes the schema; the options-blind `parse`
    // would infer the cover sheet and fail every later batch)
    val opts = {
      import scala.jdk.CollectionConverters._
      options.asCaseSensitiveMap().asScala
        .map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }.toMap
    }
    parseFor(opts)(paths.head)._1
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = {
      import scala.jdk.CollectionConverters._
      properties.asScala
        .map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }.toMap
    }
    new ContainerTable(shortName(), schema,
      ContainerSource.paths(new CaseInsensitiveStringMap(properties)),
      parseFor(opts), writeSupport)
  }

  override def supportsExternalMetadata(): Boolean = true
}

/** GeoPackage connector: `spark.read.format("gpkg").load(paths: _*)`. */
final class GpkgSource extends ContainerSource {
  override def shortName(): String = "gpkg"
  override def parse: String => (StructType, Seq[Seq[Any]]) =
    GeoPackageReader.parsed _
  override def writeSupport: Option[ContainerWriteSupport] =
    Some(GpkgWriteSupport)
}

/** Zipped-shapefile connector: `spark.read.format("shpzip").load(...)`. */
final class ShpZipSource extends ContainerSource {
  override def shortName(): String = "shpzip"
  override def parse: String => (StructType, Seq[Seq[Any]]) =
    ShapefileReader.parsed _
  override def writeSupport: Option[ContainerWriteSupport] =
    Some(ShpZipWriteSupport)
}

/** FlatGeobuf connector: `spark.read.format("fgb").load(...)` — the
  * same pruning / pushed limit+filter / statistics / streaming
  * micro-batch tier as gpkg, over the from-scratch FlatBuffers walk. */
final class FgbSource extends ContainerSource {
  override def shortName(): String = "fgb"
  override def parse: String => (StructType, Seq[Seq[Any]]) =
    FlatGeobuf.parsed _
  override def writeSupport: Option[ContainerWriteSupport] =
    Some(FgbWriteSupport)
  /** `option("bbox", "minX,minY,maxX,maxY")` — GDAL-style spatial
    * filter: indexed containers decode only packed-Hilbert-tree
    * candidates inside the scan task. */
  override def parseFor(options: Map[String, String])
      : String => (StructType, Seq[Seq[Any]]) =
    options.get("bbox") match {
      case Some(b) =>
        val c = b.split(",").map(_.trim.toDouble)
        require(c.length == 4,
          s"bbox option needs 'minX,minY,maxX,maxY', got '$b'")
        FlatGeobuf.parsedBbox(_, c(0), c(1), c(2), c(3))
      case None => parse
    }
}

/** GeoJSON connector: `spark.read.format("geojson").load(...)` — a
  * landing directory of FeatureCollection/Feature/Geometry documents
  * (tile exports, API dumps) parses one scan task per file; geometry
  * lands as WKB, properties widen per document. Read-only (GeoJSON is
  * text interchange; the write side is JSONL/GeoParquet territory). */
final class GeoJsonSource extends ContainerSource {
  override def shortName(): String = "geojson"
  override def parse: String => (StructType, Seq[Seq[Any]]) =
    GeoJsonReader.parsed _
}

/** Excel connector: `spark.read.format("xlsx").load(...)` — a landing
  * directory of workbooks parses one scan task per file (the enterprise
  * spreadsheet-dump ingest shape); `option("sheet", name)` selects a
  * worksheet by workbook name through the rels graph; legacy BIFF8
  * `.xls` workbooks in the same zone dispatch to the CFBF reader
  * transparently. Read-only (spreadsheets are an ingest format). */
final class XlsxSource extends ContainerSource {
  override def shortName(): String = "xlsx"
  override def parse: String => (StructType, Seq[Seq[Any]]) =
    XlsxReader.parsed(None) _
  override def parseFor(options: Map[String, String])
      : String => (StructType, Seq[Seq[Any]]) =
    XlsxReader.parsed(options.get("sheet")) _
}

/** Arrow IPC connector: `spark.read.format("arrow").load(...)` — both
  * IPC encodings, embedding interchange types included. */
final class ArrowSource extends ContainerSource {
  override def shortName(): String = "arrow"
  override def parse: String => (StructType, Seq[Seq[Any]]) =
    ArrowIpc.parsed _
  override def writeSupport: Option[ContainerWriteSupport] =
    Some(ArrowWriteSupport)
}

object ContainerSource {
  /** Load paths from DSv2 options: `load(p)` arrives as `path`,
    * `load(p1, p2, ...)` as a JSON string array under `paths`. */
  private[sources] def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map(parseJsonStringArray).getOrElse(Nil)
    val single = Option(options.get("path")).toSeq
    (multi ++ single).distinct
  }

  /** A path argument may be a container FILE or a landing-zone
    * DIRECTORY of containers: directories expand to their regular files
    * in lexicographic order — the order the streaming offset below is
    * defined over. Hidden files (dot/underscore prefixes — the Hadoop
    * convention, and this tier's own in-progress write temps) are
    * skipped, so a zone mid-write never exposes partial containers. */
  private[sources] def containerFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty)
        .filter(c => c.isFile &&
          !c.getName.startsWith(".") && !c.getName.startsWith("_"))
        .map(_.getAbsolutePath).sorted.toSeq
    else Seq(path)
  }

  /** `["a","b"]` parser via Jackson (already on the classpath through
    * Spark): Spark's encoder for the multi-path `paths` option emits
    * `\ uXXXX` escapes for non-ASCII path characters, which a
    * quote-and-backslash-only unescape would leave encoded and so
    * resolve to a wrong filename. */
  private def parseJsonStringArray(s: String): Seq[String] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
    require(node != null && node.isArray, s"expected JSON array, got: $s")
    (0 until node.size()).map(i => node.get(i).asText())
  }
}

final class ContainerTable(format: String, tableSchema: StructType,
    paths: Seq[String], parse: String => (StructType, Seq[Seq[Any]]),
    writeSupport: Option[ContainerWriteSupport] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"$format(${paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] = {
    val caps = java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
    // overwrite mode needs TRUNCATE alongside BATCH_WRITE
    if (writeSupport.isDefined) {
      caps.add(TableCapability.BATCH_WRITE)
      caps.add(TableCapability.TRUNCATE)
      caps.add(TableCapability.STREAMING_WRITE)
    }
    caps
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ContainerScanBuilder(format, tableSchema, paths, parse,
      Option(options.get("maxfilesperbatch")).map(_.toInt))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val ws = writeSupport.getOrElse(throw new UnsupportedOperationException(
      s"$format is a read-only connector"))
    // a write targets exactly one zone directory (each partition lands
    // as one container inside it)
    require(paths.length == 1,
      s"$format write needs exactly one target directory, got $paths")
    import scala.jdk.CollectionConverters._
    val opts = info.options().asCaseSensitiveMap().asScala
      .map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }.toMap
    new ContainerWriteBuilder(format, info.schema(), paths.head, ws, opts)
  }
}

final class ContainerScanBuilder(format: String, full: StructType,
    paths: Seq[String], parse: String => (StructType, Seq[Seq[Any]]),
    maxFilesPerBatch: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = full
  private var limit: Int = Int.MaxValue
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // PARTIAL push (return false, Spark keeps its global limit): each
  // partition reader stops emitting after `limit` rows, so a limited
  // probe over a landing zone converts and ships at most limit rows per
  // container instead of every row
  override def pushLimit(l: Int): Boolean = { limit = l; false }

  // Comparison/null filters evaluate on the EXTERNAL row values before
  // conversion, so filtered rows never cross the scan boundary. All
  // pushed filters are ALSO returned as post-scan residuals (the
  // conservative DSv2 contract — Spark re-checks, so a filter the
  // evaluator under-applies can only cost, never corrupt).
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(ContainerFilters.supported)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new ContainerScan(format, required, paths, parse, limit, pushed,
      maxFilesPerBatch)
}

/** Row-level evaluation of pushed source filters over external values
  * (Long / Double / String / Array[Byte] / null) — the supported subset
  * is exact; anything else stays Spark-side. */
private[sources] object ContainerFilters {
  import org.apache.spark.sql.sources._

  def supported(f: Filter): Boolean = f match {
    case EqualTo(_, v) => comparable(v)
    case GreaterThan(_, v) => comparable(v)
    case GreaterThanOrEqual(_, v) => comparable(v)
    case LessThan(_, v) => comparable(v)
    case LessThanOrEqual(_, v) => comparable(v)
    case IsNull(_) | IsNotNull(_) => true
    case And(l, r) => supported(l) && supported(r)
    case _ => false
  }

  private def comparable(v: Any): Boolean = v match {
    case _: Long | _: Int | _: Double | _: Float | _: String => true
    case _ => false
  }

  /** Evaluates `f` over a row; a missing column or unexpected type
    * keeps the row (the residual re-check decides). */
  def eval(f: Filter, name: String => Option[Any]): Boolean = f match {
    case EqualTo(a, v) => cmp(name(a), v).contains(0)
    case GreaterThan(a, v) => cmp(name(a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(name(a), v).exists(_ >= 0)
    case LessThan(a, v) => cmp(name(a), v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(name(a), v).exists(_ <= 0)
    // missing column → keep (None.forall = true / the residual decides);
    // present non-null → IsNull is definitively false, drop is exact
    case IsNull(a) => name(a).forall(_ == null)
    case IsNotNull(a) => name(a).forall(_ != null)
    case And(l, r) => eval(l, name) && eval(r, name)
    case _ => true
  }

  /** None = incomparable (null or type mismatch) → row survives to the
    * residual; NULL comparisons are filtered like SQL (non-match).
    * Int/Float cells (the Arrow connector's int32/float32 columns)
    * normalize to Long/Double first so they actually prune at the
    * source instead of falling through to the residual. */
  private def cmp(cell: Option[Any], v: Any): Option[Int] = (cell, v) match {
    case (Some(null), _) => None // null never matches a comparison
    case (Some(x: Int), n) => cmp(Some(x.toLong), n)
    case (Some(x: Float), n) => cmp(Some(x.toDouble), n)
    case (Some(x: Long), n: Long) => Some(java.lang.Long.compare(x, n))
    case (Some(x: Long), n: Int) => Some(java.lang.Long.compare(x, n.toLong))
    case (Some(x: Double), n: Double) => Some(java.lang.Double.compare(x, n))
    case (Some(x: Double), n: Int) => Some(java.lang.Double.compare(x, n.toDouble))
    case (Some(x: Double), n: Long) => Some(java.lang.Double.compare(x, n.toDouble))
    case (Some(x: Double), n: Float) => Some(java.lang.Double.compare(x, n.toDouble))
    case (Some(x: Long), n: Double) => Some(java.lang.Double.compare(x.toDouble, n))
    case (Some(x: Long), n: Float) => Some(java.lang.Double.compare(x.toDouble, n.toDouble))
    case (Some(x: String), s: String) => Some(x.compareTo(s))
    case _ => None
  }
}

final class ContainerScan(format: String, required: StructType,
    paths: Seq[String], parse: String => (StructType, Seq[Seq[Any]]),
    limit: Int = Int.MaxValue,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    maxFilesPerBatch: Option[Int] = None)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Input-size statistics from file metadata (a free stat: container
    * length upper-bounds decoded size) — this is what lets Catalyst
    * BROADCAST a dimension read through the connector instead of
    * defaulting to the worst-case estimate and sort-merge-joining it. */
  override def estimateStatistics():
      org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val bytes = paths.flatMap(ContainerSource.containerFiles)
        .map(p => new java.io.File(p).length()).sum
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(1L, bytes))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  // one partition per CONTAINER: a single container file is inherently a
  // single-reader unit, and the many-files ingest case is where the
  // parallelism lives; landing-zone directories expand at planning time
  override def planInputPartitions(): Array[InputPartition] =
    paths.flatMap(ContainerSource.containerFiles)
      .map(p => ContainerPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ContainerReaderFactory(required, parse, limit, filters)
  override def description(): String =
    s"$format cols=[${required.fieldNames.mkString(",")}] files=${paths.length}" +
      (if (limit != Int.MaxValue) s" limit=$limit" else "") +
      (if (filters.nonEmpty) s" pushed=[${filters.mkString(",")}]" else "")
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ContainerMicroBatchStream(required, paths, parse, maxFilesPerBatch)
}

/** Streaming half of the connector tier: `spark.readStream
  * .format("gpkg").load(landingDir)` — continuous container ingest. The
  * offset is the count of containers in the landing zone's lexicographic
  * file order, ANCHORED by the name of the last committed container:
  * each micro-batch plans exactly the newly-landed files (one partition
  * each, the same executor-side parse as batch). Contract: drops land
  * under monotonically increasing names (date/sequence prefixes — the
  * convention object-store landing zones already follow) and are never
  * deleted while a stream reads. The anchor makes violations LOUD
  * instead of silent: a container landing with a name that sorts before
  * already-committed files shifts the prefix, so the committed position
  * no longer holds the committed name and `planInputPartitions` refuses
  * to plan a batch that would skip or double-read containers (deletions
  * keep tripping the count bound as before). Checkpoint/restart resumes
  * exactly where the last batch committed (GpkgStreamSpec executes the
  * restart and the misordered-landing failure). */
final class ContainerMicroBatchStream(required: StructType, roots: Seq[String],
    parse: String => (StructType, Seq[Seq[Any]]),
    maxFilesPerBatch: Option[Int] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  maxFilesPerBatch.foreach(n => require(n > 0,
    s"maxFilesPerBatch must be positive, got $n"))

  private def files(): Seq[String] =
    roots.flatMap(ContainerSource.containerFiles).distinct.sorted

  // Trigger.AvailableNow contract: pin the zone's end at prepare time,
  // then drain to exactly that point (in maxFilesPerBatch-sized epochs
  // when admission control is on) and stop — containers landing during
  // the drain belong to the NEXT run, never half-processed by this one.
  private var availableNowEnd: Option[ContainerOffset] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    val fs = files()
    availableNowEnd = Some(ContainerOffset(fs.length, fs.lastOption.getOrElse("")))
  }

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerBatch.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  /** Admission-controlled endpoint: cap this batch at `maxFiles` new
    * containers past `start`; under AvailableNow never pass the pinned
    * end. The anchor name is recomputed for the capped position so the
    * order check stays exact. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val fs = files()
    val hardEnd = availableNowEnd.map(_.n).getOrElse(fs.length)
    val startN = start.asInstanceOf[ContainerOffset].n
    val capped = limit match {
      case mf: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        math.min(hardEnd, startN + mf.maxFiles())
      case _ => hardEnd
    }
    ContainerOffset(capped,
      if (capped > 0 && capped <= fs.length) fs(capped - 1) else "")
  }

  override def initialOffset(): Offset = ContainerOffset(0, "")
  override def latestOffset(): Offset = {
    val fs = files()
    ContainerOffset(fs.length, fs.lastOption.getOrElse(""))
  }
  override def deserializeOffset(json: String): Offset =
    ContainerOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val fs = files()
    val so = start.asInstanceOf[ContainerOffset]
    val eo = end.asInstanceOf[ContainerOffset]
    require(eo.n <= fs.length,
      s"offset ${eo.n} beyond the ${fs.length} containers present — files " +
        "were deleted from the landing zone under a running stream")
    // the committed POSITION must still hold the committed NAME — an
    // out-of-order landing (or rename) shifts the lexicographic prefix
    // and would silently remap offsets to different containers
    def anchored(o: ContainerOffset, which: String): Unit =
      if (o.n > 0 && o.last.nonEmpty)
        require(fs(o.n - 1) == o.last,
          s"landing-zone order violated: the $which offset committed " +
            s"'${o.last}' at position ${o.n - 1} but that position now " +
            s"holds '${fs(o.n - 1)}' — a container landed with a name " +
            "sorting before already-committed files; refusing to plan a " +
            "batch that would skip or double-read containers")
    anchored(so, "start")
    anchored(eo, "end")
    fs.slice(so.n, eo.n).map(p => ContainerPartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ContainerReaderFactory(required, parse)
}

/** @param n    count of committed containers (lexicographic prefix length)
  * @param last name of the container at position n−1 when committed —
  *             the anchor that detects out-of-order landings ("" for the
  *             initial offset and for legacy count-only checkpoints) */
final case class ContainerOffset(n: Int, last: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createObjectNode()
    node.put("n", n)
    node.put("last", last)
    m.writeValueAsString(node)
  }
}

object ContainerOffset {
  /** Accepts both the anchored form and a legacy bare-count checkpoint
    * (pre-anchor streams restart with an empty anchor: same positions,
    * order checking resumes from the next commit). */
  def fromJson(json: String): ContainerOffset = {
    val t = json.trim
    if (t.startsWith("{")) {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(t)
      ContainerOffset(node.get("n").asInt(),
        Option(node.get("last")).map(_.asText()).getOrElse(""))
    } else ContainerOffset(t.toInt, "")
  }
}

final case class ContainerPartition(path: String) extends InputPartition

final class ContainerReaderFactory(required: StructType,
    parse: String => (StructType, Seq[Seq[Any]]),
    limit: Int = Int.MaxValue,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[ContainerPartition].path
    new PartitionReader[InternalRow] {
      // the parse runs HERE — in the scan task, on the executor; pushed
      // filters drop rows BEFORE conversion and the pushed limit caps
      // conversion + emission per partition (the container decode
      // itself is whole-file by format)
      private val (fileSchema, allRows) = parse(path)
      // name→index resolved ONCE per reader, case-insensitively,
      // first-wins on case-colliding names (indexWhere semantics) — the
      // hot loop below then costs one hash lookup per filter column, not
      // a linear scan of the schema per row
      private val colIndex: Map[String, Int] =
        fileSchema.fieldNames.zipWithIndex.reverseIterator
          .map { case (n, i) => n.toLowerCase(java.util.Locale.ROOT) -> i }
          .toMap
      private def cell(r: Seq[Any])(n: String): Option[Any] =
        colIndex.get(n.toLowerCase(java.util.Locale.ROOT)).map(r)
      private val idx: Array[Int] = required.fields.map { f =>
        val i = colIndex.getOrElse(f.name.toLowerCase(java.util.Locale.ROOT),
          throw new IllegalArgumentException(
            s"container '$path' lacks required column '${f.name}' " +
              s"(has: ${fileSchema.fieldNames.mkString(", ")})"))
        // types must match the zone schema EXACTLY — formats with
        // per-file inference (xlsx) can legally drift (a column that is
        // all-numeric in the head workbook but mixed in a later one),
        // and a silently mistyped value would corrupt the InternalRow
        require(fileSchema.fields(i).dataType == f.dataType,
          s"container '$path' column '${f.name}' is " +
            s"${fileSchema.fields(i).dataType.simpleString} but the zone " +
            s"schema says ${f.dataType.simpleString} — zones need one " +
            "schema (re-land the file or read it separately)")
        i
      }
      // stays LAZY: parse already holds the container's rows — a second
      // materialization of the filtered view would double the footprint
      private val it = allRows.iterator
        .filter(r => filters.forall(f => ContainerFilters.eval(f, cell(r))))
        .take(if (limit == Int.MaxValue) Int.MaxValue else limit)
      private var current: InternalRow = _

      override def next(): Boolean =
        if (it.hasNext) {
          val r = it.next()
          current = InternalRow.fromSeq(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(
              idx.map(i => toCatalyst(r(i)))))
          true
        } else false

      override def get(): InternalRow = current
      override def close(): Unit = ()

      private def toCatalyst(v: Any): Any = v match {
        case s: String => UTF8String.fromString(s)
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
        case d: java.time.LocalDate => d.toEpochDay.toInt
        case ins: java.time.Instant =>
          org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(ins)
        case ldt: java.time.LocalDateTime => // TimestampNTZ wall-clock
          org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(ldt)
        case ts: java.sql.Timestamp =>
          org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(ts)
        case seq: Seq[_] =>
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            seq.map(toCatalyst).toArray)
        case other => other // Long / Int / Double / Float / Array[Byte] / null map 1:1
      }
    }
  }
}
