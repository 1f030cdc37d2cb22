package graft.sources

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, BitVector, DateDayVector, Float4Vector, Float8Vector, IntVector, TimeStampMicroTZVector, TimeStampMicroVector, VarBinaryVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowReader, ArrowStreamReader, ArrowStreamWriter, SeekableReadChannel}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, FileInputStream, FileOutputStream}
import scala.jdk.CollectionConverters._

/** Arrow IPC STREAM format reader/writer (the official columnar
  * interchange spec, arrow.apache.org/docs/format/Columnar.html) — the
  * format training pipelines hand batches around in (every dataloader
  * and feature store speaks it), read here with the arrow-vector
  * classes Spark itself bundles for its pandas-UDF transport, so no new
  * dependency exists.
  *
  * Read path: one driver-side SCHEMA sniff (the stream's first message
  * — metadata-sized, the GeoParquet-footer precedent), then the actual
  * batch decode runs INSIDE scan tasks via `binaryFile` + mapPartitions
  * — one task per container, the gpkg-connector stance, so a
  * ten-thousand-file landing zone decodes executor-parallel. Batches
  * stream through the allocator one at a time; per-task peak memory is
  * one record batch, not the file.
  *
  * Type coverage: Int64 ↔ long, Utf8 ↔ string, Float64 ↔ double,
  * Int32 ↔ int (the four types every Arrow producer emits), plus the
  * embedding-interchange trio an LLM feature store actually hands
  * around — Float32 ↔ float, list&lt;float32&gt; ↔ array&lt;float&gt;,
  * timestamp[µs, UTC] ↔ timestamp, tz-naive timestamp[µs] ↔
  * timestamp_ntz (the default shape pandas/pyarrow writers emit).
  * Anything else fails loudly (no silent coercion).
  */
object ArrowIpc {

  private val FileMagic = "ARROW1".getBytes("US-ASCII")

  /** Body-decompression factory for every reader this object constructs:
    * real pyarrow/pandas zones routinely ship LZ4_FRAME- or
    * ZSTD-compressed record-batch bodies (pyarrow compresses by default
    * in several write paths), and a reader built without a factory
    * throws an opaque arrow-internal error on the first such batch.
    * CommonsCompressionFactory handles both codecs via jars Spark
    * already bundles (commons-compress, zstd-jni) — uncompressed
    * batches pass through untouched. */
  private val Decompress =
    org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE

  private def codecType(name: String)
      : org.apache.arrow.vector.compression.CompressionUtil.CodecType =
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "lz4" | "lz4_frame" =>
        org.apache.arrow.vector.compression.CompressionUtil.CodecType.LZ4_FRAME
      case "zstd" =>
        org.apache.arrow.vector.compression.CompressionUtil.CodecType.ZSTD
      case other => throw new IllegalArgumentException(
        s"unsupported arrow codec '$other' (lz4 | zstd)")
    }

  private def isFileFormat(head: Array[Byte]): Boolean =
    head.length >= 6 && head.take(6).sameElements(FileMagic)

  /** Spark schema from the container's schema message — driver-side,
    * metadata-sized (stream: the first message; file: the footer via a
    * seekable channel). Both IPC encodings are handled, matching the
    * detector's two magic branches. */
  def sparkSchema(path: String): StructType = {
    val alloc = new RootAllocator()
    try {
      // readNBytes, not read: a single read() may legally return fewer
      // than 6 bytes (network/overlay filesystems), and stale zeros in
      // the tail would misclassify an ARROW1 file container as stream
      // format and fail the schema probe
      val head = {
        val in = new FileInputStream(path)
        try in.readNBytes(6) finally in.close()
      }
      def schemaOf(reader: ArrowReader): StructType =
        try {
          // dictionary value types live in dictionary BATCHES — a
          // dict-declaring schema costs one batch load at probe time
          if (hasDictFields(reader)) reader.loadNextBatch(): Unit
          toSpark(reader.getVectorSchemaRoot.getSchema, dictResolver(reader))
        } finally reader.close()
      if (isFileFormat(head)) {
        val ch = java.nio.channels.FileChannel.open(java.nio.file.Paths.get(path))
        try schemaOf(new ArrowFileReader(new SeekableReadChannel(ch), alloc,
          Decompress))
        finally ch.close()
      } else {
        val in = new FileInputStream(path)
        try schemaOf(new ArrowStreamReader(in, alloc, Decompress))
        finally in.close()
      }
    } finally alloc.close()
  }

  /** Distributed read: `binaryFile` lists + ships each container to a
    * scan task; the Arrow decode happens executor-side. `path` may be a
    * file or a directory (a landing zone of .arrows containers with one
    * shared schema — asserted per file, lying files fail loudly). */
  def read(s: SparkSession, path: String): DataFrame = {
    val schema = sparkSchema(headFile(path))
    val bin = s.read.format("binaryFile").load(path).select(col("content"))
    val rows = bin.rdd.mapPartitions { parts =>
      parts.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](0)
        val alloc = new RootAllocator()
        // per-container encoding dispatch — a zone may mix the two IPC
        // encodings of one schema
        val reader: ArrowReader =
          if (isFileFormat(bytes))
            new ArrowFileReader(new SeekableReadChannel(
              new ByteArrayReadableSeekableByteChannel(bytes)), alloc,
              Decompress)
          else new ArrowStreamReader(new ByteArrayInputStream(bytes), alloc,
            Decompress)
        // idempotent cleanup shared by the drain path, the failure path,
        // and early task termination: a partially-consumed iterator
        // (pushed limit / take() / task abort) must not leak the reader
        // or the allocator per container
        var open = true
        def closeAll(): Unit = if (open) {
          open = false
          try reader.close() finally alloc.close()
        }
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null)
          tc.addTaskCompletionListener[Unit](_ => closeAll())
        val (fileSchemaOpt, preloaded) =
          try {
            val pre = hasDictFields(reader) && reader.loadNextBatch()
            val sch =
              try Some(toSpark(reader.getVectorSchemaRoot.getSchema,
                dictResolver(reader)))
              catch {
                // a legal empty dict container: no batches → no value
                // type → also no rows, so it cannot corrupt the zone
                case _: MissingDictionary if !pre => None
              }
            (sch, pre)
          } catch { case e: Throwable => closeAll(); throw e }
        if (fileSchemaOpt.isEmpty) closeAll()
        fileSchemaOpt.filter(_ != schema).foreach { fs =>
          closeAll()
          throw new IllegalArgumentException(
            s"arrow container schema $fs != landing-zone schema $schema")
        }
        // LAZY per-batch walk — only one decoded batch's Rows live at a
        // time (the reader reuses its VectorSchemaRoot, so each batch is
        // copied out before the next loads); the allocator closes when
        // the last batch drains. No whole-container row materialization.
        new Iterator[Row] {
          private var batch: Array[Row] = Array.empty
          private var i = 0
          private var pending = preloaded // dict probe already loaded one
          private def advance(): Unit = {
            while (open && i >= batch.length) {
              // a decode failure inside loadNextBatch or cell() must
              // close before propagating — the exception may be caught
              // upstream with the task still running
              try {
                val loaded =
                  if (pending) { pending = false; true }
                  else reader.loadNextBatch()
                if (loaded) {
                  batch = copyBatch(reader).map(Row.fromSeq)
                  i = 0
                } else closeAll()
              } catch { case e: Throwable => closeAll(); throw e }
            }
          }
          def hasNext: Boolean = { advance(); open && i < batch.length }
          def next(): Row = {
            advance()
            if (!hasNext) throw new NoSuchElementException
            val out = batch(i); i += 1; out
          }
        }
      }
    }
    s.createDataFrame(rows, schema)
  }

  /** Fixture/dev writer — the independent encoder half that proves the
    * reader parses real Arrow bytes, not its own invention. `batchRows`
    * splits the stream into multiple record batches (the shape real
    * producers emit, and what exercises the reader's lazy batch walk). */
  def write(path: String, rows: Seq[Row], schema: StructType,
      batchRows: Int = Int.MaxValue, fileFormat: Boolean = false,
      codec: Option[String] = None): Unit = {
    val alloc = new RootAllocator()
    try {
      val root = VectorSchemaRoot.create(toArrow(schema), alloc)
      try {
        val f = new java.io.File(path)
        f.delete() // rewrite-idempotent like the other fixture writers
        val out = new FileOutputStream(f)
        try {
          val ct = codec.map(codecType)
          val w =
            if (fileFormat) ct match {
              case Some(c) => new org.apache.arrow.vector.ipc.ArrowFileWriter(
                root, null, out.getChannel, null,
                org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
                Decompress, c)
              case None => new org.apache.arrow.vector.ipc.ArrowFileWriter(
                root, null, out.getChannel)
            } else ct match {
              case Some(c) => new ArrowStreamWriter(root, null, out.getChannel,
                org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
                Decompress, c)
              case None => new ArrowStreamWriter(root, null, out.getChannel)
            }
          try {
            w.start()
            rows.grouped(math.max(1, batchRows)).foreach { group =>
              root.allocateNew()
              group.zipWithIndex.foreach { case (row, i) =>
                setRow(root, schema, row, i)
              }
              root.setRowCount(group.length)
              w.writeBatch()
            }
            w.end()
          } finally w.close()
        } finally out.close()
      } finally root.close()
    } finally alloc.close()
  }

  /** One row into the root's vectors at slot `i` — the cell-encoding
    * core shared by the fixture writer above and the streaming DSv2
    * sink below. An unset slot stays null (fresh validity bits after
    * allocateNew), so null cells just skip the write. */
  private def setRow(root: VectorSchemaRoot, schema: StructType,
      row: Row, i: Int): Unit =
    schema.fields.zipWithIndex.foreach { case (fd, j) =>
      setCell(fd, root.getVector(j), row, i, j)
    }

  /** One cell into `vec` at slot `i` from `row(j)` — the per-column body
    * of [[setRow]], also used by the dictionary sink for its non-encoded
    * columns. */
  private def setCell(fd: StructField,
      vec: org.apache.arrow.vector.FieldVector, row: Row, i: Int, j: Int): Unit = {
      if (!row.isNullAt(j))
        (fd.dataType, vec) match {
          case (LongType, v: BigIntVector) => v.setSafe(i, row.getLong(j))
          case (IntegerType, v: IntVector) => v.setSafe(i, row.getInt(j))
          case (DoubleType, v: Float8Vector) => v.setSafe(i, row.getDouble(j))
          case (FloatType, v: Float4Vector) => v.setSafe(i, row.getFloat(j))
          case (StringType, v: VarCharVector) =>
            v.setSafe(i, row.getString(j).getBytes("UTF-8"))
          case (BooleanType, v: BitVector) =>
            v.setSafe(i, if (row.getBoolean(j)) 1 else 0)
          case (BinaryType, v: VarBinaryVector) =>
            v.setSafe(i, row.getAs[Array[Byte]](j))
          case (DateType, v: DateDayVector) =>
            val days = row.get(j) match {
              case d: java.time.LocalDate => d.toEpochDay
              case d: java.sql.Date => d.toLocalDate.toEpochDay
              case o => throw new IllegalArgumentException(
                s"date cell expects Date/LocalDate, got ${o.getClass}")
            }
            v.setSafe(i, math.toIntExact(days))
          case (TimestampType, v: TimeStampMicroTZVector) =>
            val ins = row.get(j) match {
              case t: java.sql.Timestamp => t.toInstant
              case t: java.time.Instant => t
              case o => throw new IllegalArgumentException(
                s"timestamp cell expects Timestamp/Instant, got ${o.getClass}")
            }
            v.setSafe(i, Math.addExact(
              Math.multiplyExact(ins.getEpochSecond, 1000000L),
              (ins.getNano / 1000).toLong))
          case (TimestampNTZType, v: TimeStampMicroVector) =>
            val ldt = row.get(j) match {
              case t: java.time.LocalDateTime => t
              case o => throw new IllegalArgumentException(
                s"ntz timestamp cell expects LocalDateTime, got ${o.getClass}")
            }
            v.setSafe(i, Math.addExact(
              Math.multiplyExact(ldt.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
              (ldt.getNano / 1000).toLong))
          case (ArrayType(el, _), v: ListVector) =>
            val w = v.getWriter
            w.setPosition(i)
            w.startList()
            row.getSeq[Any](j).foreach { x =>
              // null.asInstanceOf[Float] would silently write
              // 0.0 — uphold the no-silent-coercion contract
              require(x != null, s"null list element in " +
                s"'${fd.name}' — the arrow writer takes " +
                "non-null elements only")
              el match {
                case FloatType => w.float4().writeFloat4(x.asInstanceOf[Float])
                case DoubleType => w.float8().writeFloat8(x.asInstanceOf[Double])
                case LongType => w.bigInt().writeBigInt(x.asInstanceOf[Long])
                case IntegerType => w.integer().writeInt(x.asInstanceOf[Int])
                case other => throw new IllegalArgumentException(
                  s"unsupported list element type $other")
              }
            }
            w.endList()
          case (t, v) => throw new IllegalArgumentException(
            s"unsupported arrow write type $t -> ${v.getClass.getSimpleName}")
        }
  }

  /** Executor-side streaming sink — the [[ContainerWriteSupport]] leg of
    * `df.write.format("arrow")`: record batches of `batchRows` flushed
    * as rows arrive, so per-task peak memory is one batch regardless of
    * partition size. */
  def sink(path: String, schema: StructType, batchRows: Int,
      codec: Option[String] = None): ContainerSink = {
    require(batchRows > 0, s"batchRows must be positive, got $batchRows")
    new ContainerSink {
      private val alloc = new RootAllocator()
      private val root = VectorSchemaRoot.create(toArrow(schema), alloc)
      private val out = new FileOutputStream(path)
      private val w = codec.map(codecType) match {
        case Some(c) => new ArrowStreamWriter(root, null, out.getChannel,
          org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT, Decompress, c)
        case None => new ArrowStreamWriter(root, null, out.getChannel)
      }
      w.start()
      root.allocateNew()
      private var i = 0
      override def append(row: Row): Unit = {
        setRow(root, schema, row, i)
        i += 1
        if (i >= batchRows) flushBatch()
      }
      private def flushBatch(): Unit = if (i > 0) {
        root.setRowCount(i)
        w.writeBatch()
        root.allocateNew()
        i = 0
      }
      override def finish(): Unit = {
        flushBatch()
        try { w.end(); w.close() }
        finally { try out.close() finally { root.close(); alloc.close() } }
      }
      override def abort(): Unit = {
        def quiet(f: => Unit): Unit = try f catch { case _: Throwable => () }
        quiet(w.close()); quiet(out.close())
        quiet(root.close()); quiet(alloc.close())
        new java.io.File(path).delete(): Unit
      }
    }
  }

  /** DICTIONARY-encoding sink — the producer half of the categorical
    * story: selected string columns ship as int32 indices into a stream
    * dictionary that GROWS BY DELTA BATCHES, so each distinct value
    * crosses the wire exactly once no matter how many rows repeat it —
    * at 100 TB a low-cardinality `source`/`lang` column shrinks 10-100×.
    * Wire bytes are hand-serialized (MessageSerializer): schema in
    * message format (value-typed dict fields + DictionaryEncoding), a
    * FULL dictionary before the first record batch, `isDelta=true`
    * appends whenever a later batch introduces new values, EOS trailer.
    * The reader half replays exactly this shape (delta support proven in
    * ArrowIpcSpec against hand-built fixtures; this sink's output reads
    * back through the same code). Per-sink memory: `batchRows` rows plus
    * the value→id map (cardinality-sized — the point of the encoding). */
  def dictSink(path: String, schema: StructType, dictCols: Seq[String],
      batchRows: Int): ContainerSink = {
    require(batchRows > 0, s"batchRows must be positive, got $batchRows")
    val unknown = dictCols.filterNot(schema.fieldNames.contains)
    require(unknown.isEmpty, s"dict columns not in schema: $unknown")
    dictCols.foreach(c => require(schema(c).dataType == StringType,
      s"dict column '$c' must be string, is ${schema(c).dataType}"))
    new ContainerSink {
      import org.apache.arrow.vector.ipc.WriteChannel
      import org.apache.arrow.vector.ipc.message.{ArrowDictionaryBatch, MessageSerializer}
      import org.apache.arrow.vector.types.pojo.DictionaryEncoding
      import org.apache.arrow.vector.VectorUnloader

      private val alloc = new RootAllocator()
      private val dictId: Map[String, Long] =
        dictCols.zipWithIndex.map { case (c, i) => c -> (100L + i) }.toMap
      private def enc(c: String) =
        new DictionaryEncoding(dictId(c), false, new ArrowType.Int(32, true))
      // schema MESSAGE carries the VALUE type; record-batch bodies carry
      // the int32 index vectors (the toMessageFormat convention)
      private val msgSchema = new ArrowSchema(schema.fields.map { f =>
        if (dictId.contains(f.name))
          new Field(f.name, new FieldType(f.nullable, ArrowType.Utf8.INSTANCE,
            enc(f.name)), null)
        else fieldOf(f)
      }.toList.asJava)
      private val memFields: Array[Field] = schema.fields.map { f =>
        if (dictId.contains(f.name))
          new Field(f.name, new FieldType(f.nullable,
            new ArrowType.Int(32, true), enc(f.name)), null)
        else fieldOf(f)
      }
      private val valueField = new Field("values",
        new FieldType(true, ArrowType.Utf8.INSTANCE, null), null)

      new java.io.File(path).delete()
      private val out = new FileOutputStream(path)
      private val ch = new WriteChannel(out.getChannel)
      MessageSerializer.serialize(ch, msgSchema)

      // insertion-ordered value→id maps; ids are GLOBAL across batches
      // (deltas append), so LinkedHashMap order IS the wire order
      private val ids = dictCols.map(c =>
        c -> scala.collection.mutable.LinkedHashMap.empty[String, Int]).toMap
      private val sent = scala.collection.mutable.Map(dictCols.map(_ -> 0): _*)
      // the spec requires SOME dictionary batch on the wire before any
      // record batch that references the dictionary id — even when the
      // column is all-null so far (an absent dictionary makes the whole
      // container unreadable); track the initial send separately from
      // the value count so an EMPTY initial dictionary still ships
      private val initialSent = scala.collection.mutable.Set.empty[String]
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Row]

      override def append(row: Row): Unit = {
        buf += row
        if (buf.length >= batchRows) flushBatch()
      }

      private def flushBatch(): Unit = if (buf.nonEmpty) {
        // 1. dictionary growth first — the spec requires a value's
        // dictionary entry on the wire before any batch references it
        dictCols.foreach { c =>
          val j = schema.fieldIndex(c)
          val m = ids(c)
          buf.foreach { r =>
            if (!r.isNullAt(j)) {
              val v = r.getString(j)
              if (!m.contains(v)) m(v) = m.size
            }
          }
          // an all-null-so-far column still needs its initial dictionary
          // on the wire, but arrow-java's reader rejects a ZERO-entry
          // dictionary batch (degenerate offsets buffer) — seed one
          // unreferenced sentinel value instead (legal: dictionary
          // entries need not be referenced; a later real "" reuses id 0)
          if (m.isEmpty && !initialSent(c)) m("") = 0
          if (m.size > sent(c) || !initialSent(c)) {
            val newVals = m.keysIterator.drop(sent(c)).toSeq // may be empty
            val vv = valueField.createVector(alloc).asInstanceOf[VarCharVector]
            vv.allocateNew()
            newVals.zipWithIndex.foreach { case (v, i) =>
              vv.setSafe(i, v.getBytes("UTF-8")) }
            vv.setValueCount(newVals.length)
            val root = new VectorSchemaRoot(java.util.List.of(valueField),
              java.util.List.of[org.apache.arrow.vector.FieldVector](vv))
            try {
              // first send = the full (possibly empty) dictionary;
              // later sends = deltas
              val db = new ArrowDictionaryBatch(dictId(c),
                new VectorUnloader(root).getRecordBatch, initialSent(c))
              try MessageSerializer.serialize(ch, db): Unit finally db.close()
            } finally root.close()
            sent(c) = m.size
            initialSent += c
          }
        }
        // 2. the record batch: index vectors for dict columns, regular
        // cells elsewhere
        val vecs = memFields.map(_.createVector(alloc))
        val root = new VectorSchemaRoot(
          java.util.List.of(memFields.toSeq: _*),
          java.util.List.of(vecs.toSeq: _*))
        try {
          root.allocateNew()
          buf.zipWithIndex.foreach { case (r, i) =>
            schema.fields.zipWithIndex.foreach { case (fd, j) =>
              if (dictId.contains(fd.name)) {
                if (!r.isNullAt(j))
                  vecs(j).asInstanceOf[IntVector]
                    .setSafe(i, ids(fd.name)(r.getString(j)))
              } else setCell(fd, vecs(j), r, i, j)
            }
          }
          root.setRowCount(buf.length)
          val rb = new VectorUnloader(root).getRecordBatch
          try MessageSerializer.serialize(ch, rb): Unit finally rb.close()
        } finally root.close()
        buf.clear()
      }

      override def finish(): Unit = {
        flushBatch()
        try ArrowStreamWriter.writeEndOfStream(ch,
          org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT): Unit
        finally { try out.close() finally alloc.close() }
      }

      override def abort(): Unit = {
        def quiet(f: => Unit): Unit = try f catch { case _: Throwable => () }
        quiet(out.close()); quiet(alloc.close())
        new java.io.File(path).delete(): Unit
      }
    }
  }

  /** Fixture writer for DICTIONARY-ENCODED containers — the shape every
    * pandas/pyarrow categorical column ships as: a bigint key beside a
    * utf8 column encoded as int32 indices into a dictionary batch
    * (DictionaryProvider + DictionaryEncoder, real IPC dictionary
    * messages on the wire). Proves the reader's decode against genuine
    * encoded bytes, not its own invention. */
  def writeDictFixture(path: String, rows: Seq[(Long, String)]): Unit = {
    import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryEncoder, DictionaryProvider}
    import org.apache.arrow.vector.types.pojo.DictionaryEncoding
    val alloc = new RootAllocator()
    try {
      val dictVals = rows.map(_._2).distinct.sorted
      val dictVec = new VarCharVector("cat_dict", alloc)
      dictVec.allocateNew()
      dictVals.zipWithIndex.foreach { case (v, i) =>
        dictVec.setSafe(i, v.getBytes("UTF-8")) }
      dictVec.setValueCount(dictVals.length)
      try {
        val dict = new Dictionary(dictVec,
          new DictionaryEncoding(7L, false, new ArrowType.Int(32, true)))
        val dataVec = new VarCharVector("cat", alloc)
        dataVec.allocateNew()
        rows.zipWithIndex.foreach { case ((_, v), i) =>
          dataVec.setSafe(i, v.getBytes("UTF-8")) }
        dataVec.setValueCount(rows.length)
        val encoded =
          try DictionaryEncoder.encode(dataVec, dict)
            .asInstanceOf[org.apache.arrow.vector.FieldVector]
          finally dataVec.close()
        val keyVec = new BigIntVector("nkey", alloc)
        keyVec.allocateNew()
        rows.zipWithIndex.foreach { case ((k, _), i) => keyVec.setSafe(i, k) }
        keyVec.setValueCount(rows.length)
        val root = new VectorSchemaRoot(
          java.util.List.of[org.apache.arrow.vector.FieldVector](keyVec, encoded))
        try {
          val provider = new DictionaryProvider.MapDictionaryProvider(dict)
          new java.io.File(path).delete()
          val out = new FileOutputStream(path)
          try {
            val w = new ArrowStreamWriter(root, provider, out.getChannel)
            try { w.start(); w.writeBatch(); w.end() } finally w.close()
          } finally out.close()
        } finally root.close()
      } finally dictVec.close()
    } finally alloc.close()
  }

  /** Fixture writer for DELTA dictionary batches — the IPC spec's
    * `isDelta=true` mid-stream dictionary APPEND (a producer streaming a
    * growing categorical emits new values as deltas instead of
    * re-shipping the dictionary). ArrowStreamWriter never emits deltas,
    * so the messages are serialized by hand: schema, initial dictionary
    * (ids into `firstVals`), record batch 1, a delta batch carrying
    * `deltaVals` (dictionary becomes firstVals ++ deltaVals), record
    * batch 2 whose indices may reference the appended region, EOS.
    * `rows` are (nkey, cat) with cat indexed into the COMBINED value
    * list; `split` = row count of batch 1 (its cats must index into
    * firstVals only — enforced loudly). */
  def writeDictDeltaFixture(path: String, firstVals: Seq[String],
      deltaVals: Seq[String], rows: Seq[(Long, String)], split: Int): Unit = {
    import org.apache.arrow.vector.ipc.WriteChannel
    import org.apache.arrow.vector.ipc.message.{ArrowDictionaryBatch, MessageSerializer}
    import org.apache.arrow.vector.types.pojo.DictionaryEncoding
    import org.apache.arrow.vector.VectorUnloader
    val all = firstVals ++ deltaVals
    require(all.distinct == all, "dictionary values must be unique")
    val idx = all.zipWithIndex.toMap
    rows.take(split).foreach { case (_, c) =>
      require(idx(c) < firstVals.length,
        s"batch-1 value '$c' not in the initial dictionary")
    }
    val encoding = new DictionaryEncoding(7L, false, new ArrowType.Int(32, true))
    val alloc = new RootAllocator()
    try {
      val keyField = new Field("nkey",
        new FieldType(true, new ArrowType.Int(64, true), null), null)
      // the IPC SCHEMA MESSAGE declares a dict-encoded field with its
      // VALUE type (utf8) — the int32 index type travels inside the
      // DictionaryEncoding; the record-batch BODY carries the index
      // vector, so the in-memory field is int32 (this is exactly the
      // toMessageFormat conversion ArrowStreamWriter does internally)
      val catMsgField = new Field("cat",
        new FieldType(true, ArrowType.Utf8.INSTANCE, encoding), null)
      val catField = new Field("cat",
        new FieldType(true, new ArrowType.Int(32, true), encoding), null)
      val schema = new ArrowSchema(java.util.List.of(keyField, catMsgField))
      // nullable: the reader reconstructs the dictionary vector from the
      // schema's value type with the standard 3-buffer varchar layout —
      // a non-nullable field here would serialize a layout the loader
      // can't consume
      val valueField = new Field("cat_values",
        new FieldType(true, ArrowType.Utf8.INSTANCE, null), null)

      def dictBatch(vals: Seq[String], isDelta: Boolean): ArrowDictionaryBatch = {
        val v = valueField.createVector(alloc).asInstanceOf[VarCharVector]
        v.allocateNew()
        vals.zipWithIndex.foreach { case (s, i) => v.setSafe(i, s.getBytes("UTF-8")) }
        v.setValueCount(vals.length)
        val root = new VectorSchemaRoot(java.util.List.of(valueField),
          java.util.List.of[org.apache.arrow.vector.FieldVector](v))
        try new ArrowDictionaryBatch(7L, new VectorUnloader(root).getRecordBatch, isDelta)
        finally root.close()
      }
      def recBatch(part: Seq[(Long, String)]) = {
        val kv = keyField.createVector(alloc).asInstanceOf[BigIntVector]
        val cv = catField.createVector(alloc).asInstanceOf[IntVector]
        kv.allocateNew(); cv.allocateNew()
        part.zipWithIndex.foreach { case ((k, c), i) =>
          kv.setSafe(i, k); cv.setSafe(i, idx(c))
        }
        kv.setValueCount(part.length); cv.setValueCount(part.length)
        val root = new VectorSchemaRoot(java.util.List.of(keyField, catField),
          java.util.List.of[org.apache.arrow.vector.FieldVector](kv, cv))
        try new VectorUnloader(root).getRecordBatch finally root.close()
      }

      new java.io.File(path).delete()
      val out = new FileOutputStream(path)
      try {
        val ch = new WriteChannel(out.getChannel)
        MessageSerializer.serialize(ch, schema)
        val d1 = dictBatch(firstVals, isDelta = false)
        try MessageSerializer.serialize(ch, d1) finally d1.close()
        val b1 = recBatch(rows.take(split))
        try MessageSerializer.serialize(ch, b1) finally b1.close()
        val d2 = dictBatch(deltaVals, isDelta = true)
        try MessageSerializer.serialize(ch, d2) finally d2.close()
        val b2 = recBatch(rows.drop(split))
        try MessageSerializer.serialize(ch, b2) finally b2.close()
        org.apache.arrow.vector.ipc.ArrowStreamWriter.writeEndOfStream(ch,
          org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT)
      } finally out.close()
    } finally alloc.close()
  }

  private def headFile(path: String): String = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(_.isFile).map(_.getPath).sorted.headOption
        .getOrElse(throw new IllegalArgumentException(s"empty arrow dir $path"))
    else path
  }

  /** Whole-container parse in external types (Long/Int/Double/Float/
    * String/Seq[Float]/Instant) — the [[ContainerSource]] DSv2 contract
    * (`spark.read.format("arrow")`). Both IPC encodings accepted. */
  def parsed(path: String): (StructType, Seq[Seq[Any]]) = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val alloc = new RootAllocator()
    val reader: ArrowReader =
      if (isFileFormat(bytes))
        new ArrowFileReader(new SeekableReadChannel(
          new ByteArrayReadableSeekableByteChannel(bytes)), alloc, Decompress)
      else new ArrowStreamReader(new ByteArrayInputStream(bytes), alloc,
        Decompress)
    try {
      val pending = hasDictFields(reader) && reader.loadNextBatch()
      val schema = toSpark(reader.getVectorSchemaRoot.getSchema,
        dictResolver(reader))
      val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      var loaded = pending || reader.loadNextBatch()
      while (loaded) {
        rows ++= copyBatch(reader)
        loaded = reader.loadNextBatch()
      }
      (schema, rows.toSeq)
    } finally {
      try reader.close() finally alloc.close()
    }
  }

  private def cell(v: org.apache.arrow.vector.FieldVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case b: BigIntVector => b.get(i)
      case n: IntVector => n.get(i)
      case d: Float8Vector => d.get(i)
      case f: Float4Vector => f.get(i)
      case s: VarCharVector => new String(s.get(i), "UTF-8")
      case b: BitVector => b.get(i) == 1
      case b: VarBinaryVector => b.get(i)
      case d: DateDayVector => java.time.LocalDate.ofEpochDay(d.get(i).toLong)
      case t: TimeStampMicroTZVector =>
        val micros = t.get(i)
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L)
      case t: TimeStampMicroVector => // tz-naive: wall-clock LocalDateTime
        val micros = t.get(i)
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case l: ListVector =>
        // copy the slice out element-wise off the CHILD vector — the
        // row must outlive the reused VectorSchemaRoot
        val child = l.getDataVector
        val from = l.getElementStartIndex(i)
        val to = l.getElementEndIndex(i)
        scala.collection.immutable.ArraySeq.unsafeWrapArray(
          Array.tabulate(to - from)(j => cell(child, from + j)))
      case other => throw new IllegalArgumentException(
        s"unsupported arrow vector ${other.getClass.getSimpleName}")
    }

  /** Atomic arrow→spark type mapping; list handled one level up. The
    * accepted set must match what [[cell]] can decode EXACTLY — a type
    * accepted here but unhandled there would pass the driver-side schema
    * probe and then crash every scan task (so: SIGNED ints only — the
    * unsigned vectors are different classes — and timestamps must carry
    * a timezone: a tz-naive timestamp[µs] is NTZ semantics, not an
    * instant, and arrives as TimeStampMicroVector, not the TZ variant). */
  private def atomicToSpark(t: ArrowType, name: String): DataType = t match {
    case i: ArrowType.Int if i.getBitWidth == 64 && i.getIsSigned => LongType
    case i: ArrowType.Int if i.getBitWidth == 32 && i.getIsSigned => IntegerType
    case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Bool => BooleanType
    case _: ArrowType.Binary => BinaryType
    case d: ArrowType.Date if d.getUnit ==
        org.apache.arrow.vector.types.DateUnit.DAY => DateType
    case ts: ArrowType.Timestamp
        if ts.getUnit == TimeUnit.MICROSECOND &&
          ts.getTimezone != null && ts.getTimezone.nonEmpty =>
      TimestampType
    // tz-NAIVE micros are wall-clock semantics — Spark's TimestampNTZ,
    // the shape most real pyarrow/pandas writers emit by default
    case ts: ArrowType.Timestamp
        if ts.getUnit == TimeUnit.MICROSECOND &&
          (ts.getTimezone == null || ts.getTimezone.isEmpty) =>
      TimestampNTZType
    case other => throw new IllegalArgumentException(
      s"unsupported arrow type $other for field $name")
  }

  private def noDicts(id: Long): ArrowType = throw new IllegalArgumentException(
    s"dictionary-encoded field (id $id) in a context without a dictionary provider")

  private def toSpark(a: ArrowSchema,
      dictValueType: Long => ArrowType = noDicts): StructType = StructType(
    a.getFields.asScala.toSeq.map { f =>
      val t = f.getType match {
        case _: ArrowType.List =>
          val el = f.getChildren.get(0)
          ArrayType(atomicToSpark(el.getType, s"${f.getName}.element"),
            containsNull = el.isNullable)
        // a dictionary-encoded field's in-memory type is the INDEX type;
        // the Spark type is the dictionary's VALUE type
        case _ if f.getDictionary != null =>
          atomicToSpark(dictValueType(f.getDictionary.getId), f.getName)
        case other => atomicToSpark(other, f.getName)
      }
      StructField(f.getName, t, f.isNullable)
    })

  private def hasDictFields(reader: ArrowReader): Boolean =
    reader.getVectorSchemaRoot.getSchema.getFields.asScala
      .exists(_.getDictionary != null)

  /** Value-type resolver over a reader's dictionary provider. Stream
    * containers deliver dictionary batches with the FIRST record batch,
    * so callers preload one batch (keeping it pending for the row walk)
    * before resolving. */
  /** Raised when a dictionary-encoded container carries no dictionary
    * batch (a legal EMPTY stream): the value type is unknowable, so the
    * schema probe fails loudly — but a zone read treats the container
    * as zero rows (see read()). */
  private final class MissingDictionary(id: Long)
      extends IllegalArgumentException(
        s"dictionary $id never arrived — an empty dictionary-encoded " +
          "container has no value type to infer")

  private def dictResolver(reader: ArrowReader): Long => ArrowType =
    id => {
      val d = reader.lookup(id)
      if (d == null) throw new MissingDictionary(id)
      d.getVector.getField.getType
    }

  /** Copy the CURRENT batch out of the reader's reused root — raw cell
    * values per row, dictionary columns decoded, decoded vectors closed
    * — the ONE implementation both the lazy read() walk and the eager
    * DSv2 parsed() drain share. */
  private def copyBatch(reader: ArrowReader): Array[Seq[Any]] = {
    val root = reader.getVectorSchemaRoot
    val (vs, toClose) = decodedView(reader)
    try Array.tabulate(root.getRowCount)(j => vs.map(cell(_, j)))
    finally toClose.foreach(_.close())
  }

  /** Per-batch vector view with dictionary columns DECODED to their
    * value vectors; second element = decoded vectors to close after the
    * batch is copied out. */
  private def decodedView(reader: ArrowReader)
      : (Seq[org.apache.arrow.vector.FieldVector],
         Seq[org.apache.arrow.vector.ValueVector]) = {
    val vs = reader.getVectorSchemaRoot.getFieldVectors.asScala.toSeq
    val pairs = vs.map { fv =>
      val enc = fv.getField.getDictionary
      if (enc == null) (fv, None)
      else {
        val dec = org.apache.arrow.vector.dictionary.DictionaryEncoder
          .decode(fv, reader.lookup(enc.getId))
          .asInstanceOf[org.apache.arrow.vector.FieldVector]
        (dec, Some(dec: org.apache.arrow.vector.ValueVector))
      }
    }
    (pairs.map(_._1), pairs.flatMap(_._2))
  }

  private def atomicToArrow(dt: DataType, name: String): ArrowType = dt match {
    case LongType => new ArrowType.Int(64, true)
    case IntegerType => new ArrowType.Int(32, true)
    case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case StringType => ArrowType.Utf8.INSTANCE
    case BooleanType => ArrowType.Bool.INSTANCE
    case BinaryType => ArrowType.Binary.INSTANCE
    case DateType => new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)
    case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
    case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
    case other => throw new IllegalArgumentException(
      s"unsupported spark type $other for field $name")
  }

  private def fieldOf(f: StructField): Field = f.dataType match {
    case ArrayType(el, containsNull) =>
      val child = new Field("element",
        new FieldType(containsNull, atomicToArrow(el, s"${f.name}.element"), null),
        null)
      new Field(f.name, new FieldType(f.nullable, ArrowType.List.INSTANCE, null),
        java.util.List.of(child))
    case other =>
      new Field(f.name,
        new FieldType(f.nullable, atomicToArrow(other, f.name), null), null)
  }

  private def toArrow(s: StructType): ArrowSchema =
    new ArrowSchema(s.fields.map(fieldOf).toList.asJava)
}
