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
