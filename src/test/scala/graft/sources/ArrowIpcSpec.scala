package graft.sources

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ArrowIpcSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("s", StringType, nullable = false)))

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("arrowspec").toFile
    d.deleteOnExit()
    new java.io.File(d, name).getPath
  }

  test("round-trips rows through real Arrow stream bytes") {
    val p = tmp("t.arrows")
    val rows = (0L until 40L).map(i => Row(i, s"v$i"))
    ArrowIpc.write(p, rows, schema)
    // the file is genuine Arrow: continuation marker prefixes the schema message
    val head = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)).take(4)
    assert(head.sameElements(Array(0xff, 0xff, 0xff, 0xff).map(_.toByte)),
      "missing IPC continuation marker — not an Arrow stream")
    val back = ArrowIpc.read(spark, p).orderBy("k").collect()
    assert(back.length == 40)
    assert(back(7) == Row(7L, "v7"))
    assert(ArrowIpc.sparkSchema(p) == schema)
  }

  test("multi-batch streams decode lazily across batch boundaries") {
    val p = tmp("mb.arrows")
    val rows = (0L until 100L).map(i => Row(i, s"r$i"))
    ArrowIpc.write(p, rows, schema, batchRows = 7) // 15 batches
    val back = ArrowIpc.read(spark, p).orderBy("k").collect()
    assert(back.length == 100)
    assert(back.map(_.getLong(0)).toSeq == (0L until 100L))
    assert(back(41) == Row(41L, "r41"))
  }

  test("ARROW1 file-format containers read too, and zones may mix encodings") {
    val d = java.nio.file.Files.createTempDirectory("arrowmix").toFile
    d.deleteOnExit()
    ArrowIpc.write(new java.io.File(d, "a.arrows").getPath,
      (0L until 10L).map(i => Row(i, s"s$i")), schema)
    ArrowIpc.write(new java.io.File(d, "b.arrow").getPath,
      (10L until 20L).map(i => Row(i, s"s$i")), schema, fileFormat = true)
    // the file-format container carries the ARROW1 magic the detector keys on
    val head = java.nio.file.Files.readAllBytes(
      new java.io.File(d, "b.arrow").toPath).take(6)
    assert(new String(head, "US-ASCII") == "ARROW1")
    assert(FileTypeDetector.detect(new java.io.File(d, "b.arrow").getPath) ==
      Right(FileType.Arrow))
    assert(ArrowIpc.sparkSchema(new java.io.File(d, "b.arrow").getPath) == schema)
    val back = ArrowIpc.read(spark, d.getPath).orderBy("k").collect()
    assert(back.length == 20)
    assert(back.map(_.getLong(0)).toSeq == (0L until 20L))
  }

  test("a landing zone decodes one task per container") {
    val d = java.nio.file.Files.createTempDirectory("arrowzone").toFile
    d.deleteOnExit()
    Seq(0, 1, 2).foreach { i =>
      ArrowIpc.write(new java.io.File(d, s"c$i.arrows").getPath,
        (0L until 5L).map(j => Row(i * 100L + j, s"c$i-$j")), schema)
    }
    val df = ArrowIpc.read(spark, d.getPath)
    assert(df.count() == 15)
    // binaryFile lists one row per container; the decode flatMap runs
    // where the row lands — no driver-side parse exists on this path
    assert(df.select("k").distinct().count() == 15)
  }

  test("embedding interchange types: float32, list<float32>, timestamp") {
    val p = tmp("emb.arrows")
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true),
        nullable = true),
      StructField("score", FloatType, nullable = true),
      StructField("ts", TimestampType, nullable = true)))
    val t0 = java.time.Instant.parse("2024-03-01T12:34:56.123456Z")
    val rows = Seq(
      Row(1L, Seq(0.5f, -1.25f, 3.0f), 0.75f, t0),
      Row(2L, Seq.empty[Float], -2.5f, java.time.Instant.EPOCH),
      Row(3L, null, null, null))
    ArrowIpc.write(p, rows, embSchema, batchRows = 2)
    assert(ArrowIpc.sparkSchema(p) == embSchema)
    val back = ArrowIpc.read(spark, p).orderBy("vec_id").collect()
    assert(back.length == 3)
    assert(back(0).getSeq[Float](1) == Seq(0.5f, -1.25f, 3.0f))
    assert(back(0).getFloat(2) == 0.75f)
    // µs precision survives the round-trip exactly
    assert(back(0).getTimestamp(3).toInstant == t0)
    assert(back(1).getSeq[Float](1).isEmpty)
    assert(back(2).isNullAt(1) && back(2).isNullAt(2) && back(2).isNullAt(3))
  }

  test("bool, binary, and date32 round-trip exactly") {
    val p = tmp("mixed.arrows")
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("flag", BooleanType, nullable = true),
      StructField("blob", BinaryType, nullable = true),
      StructField("d", DateType, nullable = true)))
    val rows = Seq(
      Row(1L, true, Array[Byte](0, 1, -1, 127), java.time.LocalDate.of(2024, 2, 29)),
      Row(2L, false, Array.empty[Byte], java.time.LocalDate.ofEpochDay(0)),
      Row(3L, null, null, null))
    ArrowIpc.write(p, rows, sch)
    assert(ArrowIpc.sparkSchema(p) == sch)
    val back = ArrowIpc.read(spark, p).orderBy("k").collect()
    assert(back(0).getBoolean(1) && !back(1).getBoolean(1))
    assert(back(0).getAs[Array[Byte]](2).toSeq == Seq[Byte](0, 1, -1, 127))
    assert(back(1).getAs[Array[Byte]](2).isEmpty)
    assert(back(0).getDate(3).toLocalDate == java.time.LocalDate.of(2024, 2, 29))
    assert(back(2).isNullAt(1) && back(2).isNullAt(2) && back(2).isNullAt(3))
  }

  test("list<double> and list<bigint> round-trip beside list<float32>") {
    val p = tmp("lists.arrows")
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("d", ArrayType(DoubleType, containsNull = false), nullable = true),
      StructField("l", ArrayType(LongType, containsNull = false), nullable = true)))
    val rows = Seq(
      Row(1L, Seq(0.25, -1e100, 3.5), Seq(Long.MaxValue, 0L)),
      Row(2L, Seq.empty[Double], null))
    ArrowIpc.write(p, rows, sch)
    val back = ArrowIpc.read(spark, p).orderBy("k").collect()
    assert(back(0).getSeq[Double](1) == Seq(0.25, -1e100, 3.5))
    assert(back(0).getSeq[Long](2) == Seq(Long.MaxValue, 0L))
    assert(back(1).getSeq[Double](1).isEmpty && back(1).isNullAt(2))
  }

  test("dictionary-encoded categoricals decode to their value strings") {
    val p = tmp("dict.arrows")
    val rows = (0L until 30L).map(i => (i, s"cat${i % 4}"))
    ArrowIpc.writeDictFixture(p, rows)
    // the probe resolves the VALUE type (string), not the int32 index
    val sch = ArrowIpc.sparkSchema(p)
    assert(sch("cat").dataType == StringType, s"got ${sch("cat").dataType}")
    val back = ArrowIpc.read(spark, p).orderBy("nkey").collect()
    assert(back.length == 30)
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq == rows)
    // the DSv2 connector rides the same decode
    val dsv2 = spark.read.format("arrow").load(p).orderBy("nkey").collect()
    assert(dsv2.map(r => (r.getLong(0), r.getString(1))).toSeq == rows)
  }

  test("lz4/zstd body-compressed batches decode — stream, file, and zones") {
    val rows = (0L until 500L).map(i => Row(i, s"some-reasonably-long-value-$i"))
    // stream format, both codecs, multi-batch
    for (codec <- Seq("lz4", "zstd")) {
      val pc = tmp(s"c-$codec.arrows")
      val pu = tmp(s"u-$codec.arrows")
      ArrowIpc.write(pc, rows, schema, batchRows = 64, codec = Some(codec))
      ArrowIpc.write(pu, rows, schema, batchRows = 64)
      val cb = java.nio.file.Files.size(java.nio.file.Paths.get(pc))
      val ub = java.nio.file.Files.size(java.nio.file.Paths.get(pu))
      assert(cb < ub, s"$codec container ($cb B) not smaller than plain ($ub B)")
      val back = ArrowIpc.read(spark, pc).orderBy("k").collect()
      assert(back.length == 500)
      assert(back(123) == Row(123L, "some-reasonably-long-value-123"))
    }
    // ARROW1 file format compressed
    val pf = tmp("c.arrow")
    ArrowIpc.write(pf, rows, schema, batchRows = 64, fileFormat = true,
      codec = Some("zstd"))
    assert(ArrowIpc.read(spark, pf).count() == 500)
    // mixed zone: lz4 + zstd + plain containers, one schema
    val dir = java.nio.file.Files.createTempDirectory("arrowmix").toFile
    dir.deleteOnExit()
    ArrowIpc.write(new java.io.File(dir, "a.arrows").getPath,
      rows.take(100), schema, codec = Some("lz4"))
    ArrowIpc.write(new java.io.File(dir, "b.arrows").getPath,
      rows.slice(100, 200), schema, codec = Some("zstd"))
    ArrowIpc.write(new java.io.File(dir, "c.arrows").getPath,
      rows.drop(200), schema)
    assert(ArrowIpc.read(spark, dir.getPath).count() == 500)
    // the DSv2 parse path decompresses too
    val (sch, parsedRows) = ArrowIpc.parsed(new java.io.File(dir, "a.arrows").getPath)
    assert(sch == schema && parsedRows.length == 100)
  }

  test("ntz timestamps (tz-naive micros) round-trip as TimestampNTZ") {
    val ntzSchema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("t", TimestampNTZType, nullable = true)))
    val rows = (0L until 10L).map(i =>
      Row(i, java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusSeconds(i)))
    val p = tmp("ntz.arrows")
    ArrowIpc.write(p, rows, ntzSchema)
    assert(ArrowIpc.sparkSchema(p) == ntzSchema)
    val back = ArrowIpc.read(spark, p).orderBy("k").collect()
    assert(back.length == 10)
    assert(back(3).getAs[java.time.LocalDateTime](1) ==
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 3))
  }

  test("delta dictionary batches append mid-stream (isDelta=true)") {
    // batch 1 references the initial dictionary {ALPHA, BETA}; the delta
    // adds GAMMA; batch 2 references the appended region. Per-batch
    // decode must see the dictionary state AS OF its batch.
    val p = tmp("delta.arrows")
    val rows = Seq((1L, "ALPHA"), (2L, "BETA"), (3L, "ALPHA"),
      (4L, "GAMMA"), (5L, "BETA"), (6L, "GAMMA"))
    ArrowIpc.writeDictDeltaFixture(p, Seq("ALPHA", "BETA"), Seq("GAMMA"),
      rows, split = 3)
    val sch = ArrowIpc.sparkSchema(p)
    assert(sch == StructType(Seq(
      StructField("nkey", LongType, nullable = true),
      StructField("cat", StringType, nullable = true))))
    val back = ArrowIpc.read(spark, p).orderBy("nkey").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq == rows)
    // the DSv2 parse path replays the same delta
    val (s2, parsed) = ArrowIpc.parsed(p)
    assert(s2 == sch)
    assert(parsed.map(r => (r(0), r(1))) == rows)
    // and a zone mixing a delta container beside a plain dict container
    val dir = java.nio.file.Files.createTempDirectory("deltazone").toFile
    dir.deleteOnExit()
    java.nio.file.Files.copy(java.nio.file.Paths.get(p),
      java.nio.file.Paths.get(dir.getPath, "a.arrows"))
    ArrowIpc.writeDictFixture(new java.io.File(dir, "b.arrows").getPath,
      Seq((7L, "ALPHA"), (8L, "GAMMA")))
    val zone = ArrowIpc.read(spark, dir.getPath).orderBy("nkey").collect()
    assert(zone.length == 8)
    assert(zone.map(_.getString(1)).toSeq ==
      Seq("ALPHA", "BETA", "ALPHA", "GAMMA", "BETA", "GAMMA", "ALPHA", "GAMMA"))
  }

  test("truncated compressed containers fail loudly, not silently short") {
    val rows = (0L until 300L).map(i => Row(i, s"padding-padding-padding-$i"))
    val p = tmp("trunc.arrows")
    ArrowIpc.write(p, rows, schema, batchRows = 50, codec = Some("zstd"))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val cut = tmp("cut.arrows")
    // cut inside the compressed body of a middle batch
    java.nio.file.Files.write(java.nio.file.Paths.get(cut),
      bytes.take(bytes.length / 2))
    val e = intercept[Exception] { ArrowIpc.parsed(cut) }
    assert(e != null)
    // distributed path too — the task must throw, not return fewer rows
    intercept[Exception] { ArrowIpc.read(spark, cut).count() }
  }

  test("unsupported types still fail loudly (no silent coercion)") {
    // list<utf8> is outside the declared coverage — both directions throw
    intercept[IllegalArgumentException] {
      ArrowIpc.write(tmp("ls.arrows"), Seq(Row(Seq("a"))),
        StructType(Seq(StructField("xs",
          ArrayType(StringType, containsNull = false), nullable = false))))
    }
  }

  test("pushed limit / partial consumption leaves no stranded allocator") {
    val p = tmp("lim.arrows")
    ArrowIpc.write(p, (0L until 50L).map(i => Row(i, s"x$i")), schema,
      batchRows = 5)
    // limit(1) abandons the batch iterator mid-container — the task
    // completion listener must close reader+allocator, and subsequent
    // full reads of the same container must still work
    assert(ArrowIpc.read(spark, p).limit(1).collect().length == 1)
    assert(ArrowIpc.read(spark, p).count() == 50)
  }

  test("garbage bytes and schema-skewed zones fail loudly") {
    val p = tmp("bad.arrows")
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      "not arrow at all".getBytes("UTF-8"))
    intercept[Exception] { ArrowIpc.sparkSchema(p) }
    val d = java.nio.file.Files.createTempDirectory("arrowskew").toFile
    d.deleteOnExit()
    ArrowIpc.write(new java.io.File(d, "a.arrows").getPath,
      Seq(Row(1L, "x")), schema)
    ArrowIpc.write(new java.io.File(d, "b.arrows").getPath,
      Seq(Row(1.5)), StructType(Seq(StructField("d", DoubleType, nullable = false))))
    val e = intercept[Exception] { ArrowIpc.read(spark, d.getPath).collect() }
    assert(e.getMessage != null)
  }
}
