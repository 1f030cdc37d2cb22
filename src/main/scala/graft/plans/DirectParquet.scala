package graft.plans

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.api.{Binary, RecordConsumer}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Direct per-task parquet writer for UNPARTITIONED commit data: each
  * write task streams its rows through one `ParquetWriter` and returns
  * `(file name, zone-map stats)` to the driver — the write-task stats
  * harvest a 100 TB commit needs (VERDICT r13 #1: the driver must never
  * open data-file footers on the commit path). It also retires the
  * FileOutputCommitter for these writes: there is no `_temporary`
  * staging and no rename pass, because graft-table visibility is gated
  * by the TxLog manifest entry alone (the Delta/Iceberg commit shape) —
  * a file is invisible until its name publishes in the log, so task
  * retries at worst strand an orphan file for vacuum.
  *
  * Scope is deliberately narrow: flat schemas of the primitive types the
  * zone-map/pruning machinery understands (integral, float/double,
  * string, boolean, date, timestamp). Anything else — and hive-style
  * partitioned layouts — returns None and the caller falls back to
  * `df.write.parquet` + footer harvest, so correctness never depends on
  * this fast path.
  *
  * Stats parity with the footer harvest ([[TxLog.fileStats]]), pinned by
  * DirectParquetSpec: integral columns → kind "long", float/double →
  * "double" (float endpoints rendered via Float.toString exactly like
  * parquet's typed footer statistics), string → "string" through the
  * same [[TxLog.boundString]] prefix bounding; timestamps/dates/booleans
  * carry no stats (fileStats skips them too); all-null columns drop out
  * (footer `hasNonNullValue` behavior); a float/double column containing
  * NaN drops its stats (conservative: parquet-format tells writers not
  * to trust NaN orderings — absent stats only ever mean "always scan").
  * Min/max are computed from the actual values, so they are exactly the
  * footer's min/max for these types; string comparisons use the same
  * unsigned-UTF-8-byte order parquet column order and [[TxLog.statLt]]
  * use. */
private[graft] object DirectParquet {

  /** Kill switch for single-JVM A/B probes (and emergencies): false
    * routes every caller to its classic `df.write.parquet` fallback.
    * Not env-driven — production behavior is the direct path. */
  @volatile private[graft] var enabled: Boolean = true

  /** Parquet message type for `schema`, None when any field falls
    * outside the supported flat-primitive set. Mirrors Spark's own
    * non-legacy converter for these types (all fields optional, standard
    * logical annotations, UTC-adjusted MICROS timestamps) so schema
    * inference over the written files resolves identically to a
    * `df.write.parquet` of the same frame. */
  private def messageType(schema: StructType): Option[MessageType] = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t = f.dataType match {
        case LongType    => Types.optional(INT64).named(f.name)
        case IntegerType => Types.optional(INT32).named(f.name)
        case ShortType   => Types.optional(INT32)
          .as(LogicalTypeAnnotation.intType(16, true)).named(f.name)
        case ByteType    => Types.optional(INT32)
          .as(LogicalTypeAnnotation.intType(8, true)).named(f.name)
        case DoubleType  => Types.optional(DOUBLE).named(f.name)
        case FloatType   => Types.optional(FLOAT).named(f.name)
        case StringType  => Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case BooleanType => Types.optional(BOOLEAN).named(f.name)
        case DateType    => Types.optional(INT32)
          .as(LogicalTypeAnnotation.dateType()).named(f.name)
        case TimestampType => Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name)
        case TimestampNTZType => Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(false,
            LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name)
        case _ => return None
      }
      b.addField(t): Unit
    }
    Some(b.named("spark_schema"))
  }

  /** Write `df` under `outDir` (one file per task, exactly like Spark's
    * SingleDirectoryDataWriter — empty tasks still emit a schema-only
    * file so file counts match the classic path), returning each file's
    * (name, stats). None = unsupported schema or a zero-partition plan;
    * caller falls back to `df.write.parquet`. */
  def write(df: DataFrame, outDir: String)
      : Option[Seq[(String, Map[String, TxLog.ColStats])]] = {
    if (!enabled) return None
    messageType(df.schema).flatMap { _ =>
      val rdd = df.queryExecution.toRdd
      if (rdd.getNumPartitions == 0) None
      else {
        val schema = df.schema
        val codec = df.sparkSession.conf
          .get("spark.sql.parquet.compression.codec", "snappy")
        val uuid = java.util.UUID.randomUUID().toString
        val dirStr = outDir
        Some(rdd.mapPartitionsWithIndex { (pid, rows) =>
          val name = f"part-$pid%05d-$uuid.c000.parquet"
          Iterator.single(name -> writeOne(
            schema, s"$dirStr/$name", codec, rows))
        }.collect().toSeq.sortBy(_._1))
      }
    }
  }

  /** Thrown (inside a write task) when one task would hold more open
    * partition writers than [[MaxOpenWriters]] — the unsorted writer-map
    * strategy only fits low-cardinality layouts. Callers catch it,
    * remove the half-written commit dir, and fall back to the classic
    * sorted `df.write.partitionBy` path. */
  private[graft] final class TooManyOpenPartitions(n: Int) extends RuntimeException(
    s"direct partitioned write exceeded $n open writers in one task")

  /** Unsorted per-task writer cap. Spark's own dynamic-partition writer
    * sorts rows by partition key to keep ONE file open at a time; this
    * path instead keeps a writer per distinct partition value seen by
    * the task, which is only sane for low-cardinality layouts (COW
    * classification's 2 classes, status-partitioned fixtures). */
  private val MaxOpenWriters = 64

  /** Hive-layout variant of [[write]]: partition columns leave the data
    * file and become `col=value/` path segments (escaped exactly as
    * Spark escapes them, via ExternalCatalogUtils), one file per (task,
    * partition value) — the same file set the classic sorted writer
    * produces. Returns (outDir-relative path, data-column stats) per
    * file; the caller synthesizes the partition-value zone maps from the
    * returned paths exactly as the footer-harvest path does. None when
    * the schema or a partition-column type is unsupported; throws
    * [[TooManyOpenPartitions]] mid-job on high-cardinality layouts
    * (caller cleans up and falls back). Null partition values refuse
    * loudly with the same contract harvestStats enforces. */
  def writePartitioned(df: DataFrame, outDir: String, partitionBy: Seq[String])
      : Option[Seq[(String, Map[String, TxLog.ColStats])]] = {
    if (!enabled || partitionBy.isEmpty) return None
    val schema = df.schema
    if (!partitionBy.forall(c => schema.fieldNames.contains(c))) return None
    val partIdx = partitionBy.map(schema.fieldIndex).toArray
    // value rendering below covers these; DateType is excluded because
    // its path rendering is a formatted cast this writer does not
    // replicate — those layouts keep the classic path
    val partOk = partIdx.forall(i => schema(i).dataType match {
      case StringType | ByteType | ShortType | IntegerType | LongType
         | BooleanType => true
      case _ => false
    })
    if (!partOk) return None
    val dataIdx = schema.fields.indices.filterNot(partIdx.contains).toArray
    if (dataIdx.isEmpty) return None
    val dataSchema = StructType(dataIdx.map(schema.fields(_)))
    if (messageType(dataSchema).isEmpty) return None
    val rdd = df.queryExecution.toRdd
    if (rdd.getNumPartitions == 0) return None
    val codec = df.sparkSession.conf
      .get("spark.sql.parquet.compression.codec", "snappy")
    val uuid = java.util.UUID.randomUUID().toString
    val dirStr = outDir
    val partNames = partitionBy.toArray
    Some(rdd.mapPartitionsWithIndex { (pid, rows) =>
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      val fileName = f"part-$pid%05d-$uuid.c000.parquet"
      val writers = new java.util.LinkedHashMap[String, OneFile]()
      val out = Seq.newBuilder[(String, Map[String, TxLog.ColStats])]
      try {
        while (rows.hasNext) {
          val row = rows.next()
          val sb = new java.lang.StringBuilder()
          var k = 0
          while (k < partIdx.length) {
            val i = partIdx(k)
            require(!row.isNullAt(i),
              s"partition column(s) ${partNames.mkString(", ")} carry NULL " +
                "values — a graft partition value must be non-null")
            val v = schema(i).dataType match {
              case StringType  => row.getUTF8String(i).toString
              case ByteType    => row.getByte(i).toString
              case ShortType   => row.getShort(i).toString
              case IntegerType => row.getInt(i).toString
              case LongType    => row.getLong(i).toString
              case BooleanType => row.getBoolean(i).toString
              case other => throw new IllegalStateException(
                s"unsupported partition type $other") // unreachable: gated above
            }
            if (k > 0) sb.append('/')
            sb.append(partNames(k)).append('=')
              .append(ExternalCatalogUtils.escapePathName(v))
            k += 1
          }
          val rel = sb.toString
          var w = writers.get(rel)
          if (w == null) {
            if (writers.size() >= MaxOpenWriters)
              throw new TooManyOpenPartitions(MaxOpenWriters)
            w = new OneFile(dataSchema, dataIdx,
              s"$dirStr/$rel/$fileName", codec)
            writers.put(rel, w)
          }
          w.write(row)
        }
        val it = writers.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          e.getValue.close()
          out += (s"${e.getKey}/$fileName" -> e.getValue.stats())
        }
        out.result().iterator
      } catch {
        case t: Throwable =>
          // close everything so the caller can delete the commit dir
          val it = writers.values().iterator()
          while (it.hasNext) { try it.next().close() catch { case _: Throwable => () } }
          throw t
      }
    }.collect().toSeq.sortBy(_._1))
  }

  /** One task's file: stream rows through a ParquetWriter, tracking
    * min/max/rowcount inline. Runs inside the write task, never on the
    * driver. */
  private def writeOne(
      schema: StructType, path: String, codecName: String,
      rows: Iterator[InternalRow]): Map[String, TxLog.ColStats] = {
    val f = new OneFile(schema, schema.fields.indices.toArray, path, codecName)
    try while (rows.hasNext) f.write(rows.next())
    finally f.close()
    f.stats()
  }

  /** One open output file: ParquetWriter + inline stats over the source
    * row ordinals in `idx` (so partitioned writes can project partition
    * columns out of the data file without materializing a new row). */
  private final class OneFile(
      schema: StructType, idx: Array[Int], path: String, codecName: String) {
    private val mt = messageType(schema).get
    private val conf = new Configuration()
    private val codec = codecName.toLowerCase match {
      case "zstd" => CompressionCodecName.ZSTD
      case "gzip" => CompressionCodecName.GZIP
      case "lz4" | "lz4raw" | "lz4_raw" => CompressionCodecName.LZ4_RAW
      case "none" | "uncompressed" => CompressionCodecName.UNCOMPRESSED
      case _ => CompressionCodecName.SNAPPY
    }
    private val writer = new RowParquetBuilder(
      HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), conf),
      new InternalRowWriteSupport(schema, mt, idx))
      .withCompressionCodec(codec)
      .withConf(conf)
      .build()
    private val collector = new StatsCollector(schema, idx)
    private var n = 0L

    def write(row: InternalRow): Unit = {
      collector.update(row)
      writer.write(row)
      n += 1
    }
    def close(): Unit = writer.close()
    def stats(): Map[String, TxLog.ColStats] =
      collector.result() + (TxLog.RowCountKey ->
        TxLog.ColStats("rows", n.toString, n.toString))
  }

  private final class RowParquetBuilder(
      file: org.apache.parquet.io.OutputFile,
      support: InternalRowWriteSupport)
      extends ParquetWriter.Builder[InternalRow, RowParquetBuilder](file) {
    override def self(): RowParquetBuilder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      support
  }

  private final class InternalRowWriteSupport(
      schema: StructType, mt: MessageType, idx: Array[Int])
      extends WriteSupport[InternalRow] {
    private var rc: RecordConsumer = _
    private val names = schema.fields.map(_.name)
    private val types = schema.fields.map(_.dataType)

    override def init(conf: Configuration): WriteSupport.WriteContext =
      new WriteSupport.WriteContext(mt, java.util.Collections.singletonMap(
        // the footer key Spark itself writes, so schema inference over
        // these files resolves nullability/types exactly as it would
        // over a classic write
        "org.apache.spark.sql.parquet.row.metadata", schema.json))

    override def prepareForWrite(r: RecordConsumer): Unit = rc = r

    override def write(row: InternalRow): Unit = {
      rc.startMessage()
      var i = 0
      while (i < types.length) {
        val j = idx(i)
        if (!row.isNullAt(j)) {
          rc.startField(names(i), i)
          types(i) match {
            case LongType | TimestampType | TimestampNTZType =>
              rc.addLong(row.getLong(j))
            case IntegerType | DateType   => rc.addInteger(row.getInt(j))
            case ShortType   => rc.addInteger(row.getShort(j).toInt)
            case ByteType    => rc.addInteger(row.getByte(j).toInt)
            case DoubleType  => rc.addDouble(row.getDouble(j))
            case FloatType   => rc.addFloat(row.getFloat(j))
            case BooleanType => rc.addBoolean(row.getBoolean(j))
            case StringType  =>
              // getBytes copies out of the (reused) row buffer; the
              // "reused" variant additionally tells parquet to copy
              // before buffering, so no reference to task-local state
              // can leak into the dictionary encoder
              rc.addBinary(Binary.fromReusedByteArray(row.getUTF8String(j).getBytes))
            case other => throw new IllegalStateException(
              s"unsupported direct-write type $other") // unreachable: messageType gated
          }
          rc.endField(names(i), i)
        }
        i += 1
      }
      rc.endMessage()
    }
  }

  /** Per-column min/max tracker with [[TxLog.fileStats]] parity (see
    * object doc). One instance per task, updated per row. */
  private final class StatsCollector(schema: StructType, idx: Array[Int]) {
    private val n = schema.length
    private val kinds: Array[Int] = schema.fields.map(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType => 1 // long
      case FloatType  => 2
      case DoubleType => 3
      case StringType => 4
      case _ => 0 // no stats (timestamp/date/boolean — fileStats skips too)
    })
    private val dts = schema.fields.map(_.dataType)
    private val seen = new Array[Boolean](n)
    private val nan = new Array[Boolean](n)
    private val minL = new Array[Long](n); private val maxL = new Array[Long](n)
    private val minD = new Array[Double](n); private val maxD = new Array[Double](n)
    private val minF = new Array[Float](n); private val maxF = new Array[Float](n)
    private val minS = new Array[UTF8String](n); private val maxS = new Array[UTF8String](n)

    def update(row: InternalRow): Unit = {
      var i = 0
      while (i < n) {
        val j = idx(i)
        if (kinds(i) != 0 && !row.isNullAt(j)) {
          kinds(i) match {
            case 1 =>
              val v: Long = dts(i) match {
                case ByteType => row.getByte(j).toLong
                case ShortType => row.getShort(j).toLong
                case IntegerType => row.getInt(j).toLong
                case _ => row.getLong(j)
              }
              if (!seen(i)) { minL(i) = v; maxL(i) = v }
              else {
                if (v < minL(i)) minL(i) = v
                if (v > maxL(i)) maxL(i) = v
              }
            case 2 =>
              // a single NaN poisons the column's stats (dropped in
              // result()), so no min/max tracking is needed past it
              val v = row.getFloat(j)
              if (java.lang.Float.isNaN(v)) nan(i) = true
              else if (!nan(i)) {
                if (!seen(i)) { minF(i) = v; maxF(i) = v }
                else {
                  if (v < minF(i)) minF(i) = v
                  if (v > maxF(i)) maxF(i) = v
                }
              }
            case 3 =>
              val v = row.getDouble(j)
              if (java.lang.Double.isNaN(v)) nan(i) = true
              else if (!nan(i)) {
                if (!seen(i)) { minD(i) = v; maxD(i) = v }
                else {
                  if (v < minD(i)) minD(i) = v
                  if (v > maxD(i)) maxD(i) = v
                }
              }
            case 4 =>
              val v = row.getUTF8String(j)
              if (!seen(i)) { minS(i) = v.clone(); maxS(i) = v.clone() }
              else {
                if (v.binaryCompare(minS(i)) < 0) minS(i) = v.clone()
                if (v.binaryCompare(maxS(i)) > 0) maxS(i) = v.clone()
              }
          }
          seen(i) = true
        }
        i += 1
      }
    }

    def result(): Map[String, TxLog.ColStats] = {
      val b = Map.newBuilder[String, TxLog.ColStats]
      var i = 0
      while (i < n) {
        if (seen(i)) kinds(i) match {
          case 1 => b += schema(i).name ->
            TxLog.ColStats("long", minL(i).toString, maxL(i).toString)
          case 2 => if (!nan(i)) b += schema(i).name ->
            TxLog.ColStats("double", minF(i).toString, maxF(i).toString)
          case 3 => if (!nan(i)) b += schema(i).name ->
            TxLog.ColStats("double", minD(i).toString, maxD(i).toString)
          case 4 => TxLog.boundString(minS(i).toString, maxS(i).toString)
            .foreach(cs => b += schema(i).name -> cs)
          case _ => ()
        }
        i += 1
      }
      b.result()
    }
  }
}
