package graft.sources

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class FlatGeobufSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val props = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("m", DoubleType, nullable = true)))

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("fgbspec").toFile
    d.deleteOnExit()
    new java.io.File(d, name).getPath
  }

  test("flatbuffers kernel: table/vtable round-trip incl. absent fields") {
    val b = new FlatBuffers.Builder
    val s = b.createString("héllo")
    val v = b.createDoubleVector(Seq(1.5, -2.25, 1e300))
    b.startTable()
    b.slotScalar(0, 42L, 8)
    b.slotOffset(2, s) // field 1 deliberately absent
    b.slotOffset(3, v)
    b.slotScalar(5, 7L, 1)
    val bytes = b.finish(b.endTable())
    val t = FlatBuffers.root(bytes)
    assert(t.getLong(0) == 42L)
    assert(t.fieldPos(1) == -1 && t.getString(1).isEmpty)
    assert(t.getString(2).contains("héllo"))
    assert(t.doublesAt(t.vectorPos(3)).toSeq == Seq(1.5, -2.25, 1e300))
    assert(t.fieldPos(4) == -1)
    assert(t.getByte(5) == 7)
    assert(t.getLong(9, -1L) == -1L, "id beyond vtable must fall to default")
  }

  test("fgb round-trips points + typed properties incl. nulls") {
    val p = tmp("t.fgb")
    val rows = Seq(
      (Row(1L, "alpha", 0.5), (10.0, 20.0)),
      (Row(2L, null, 1.5), (11.0, 21.0)),
      (Row(3L, "gamma", null), (12.0, 22.0)))
    FlatGeobuf.write(p, "layer1", props, rows, epsg = 27700)
    val (name, schema, epsg) = FlatGeobuf.sparkSchema(p)
    assert(name == "layer1" && epsg == 27700)
    assert(schema.fieldNames.toSeq == Seq("k", "name", "m", "geom"))
    assert(schema("geom").metadata.getString(FlatGeobuf.CrsTag) == "27700")
    val back = FlatGeobuf.read(spark, p).orderBy("k").collect()
    assert(back.length == 3)
    assert(back(0).getLong(0) == 1L && back(0).getString(1) == "alpha"
      && back(0).getDouble(2) == 0.5)
    assert(back(1).isNullAt(1) && back(2).isNullAt(2))
    import org.apache.spark.sql.functions.{col, lit}
    val wkt = FlatGeobuf.read(spark, p).filter(col("k") === lit(1L))
      .select(graft.functions.GeoFunctions.stAsTextFromWkb(col("geom")))
      .collect()(0).getString(0)
    assert(wkt == "POINT (10 20)", s"got $wkt")
  }

  test("packed-index skip: the spec recurrence matches hand counts") {
    // 1 leaf level of 3 + root of 1 = 4 nodes
    assert(FlatGeobuf.packedIndexSize(3, 16) == 4 * 40)
    // 100 items @16: 100 + 7 + 1 = 108 nodes
    assert(FlatGeobuf.packedIndexSize(100, 16) == 108 * 40)
    assert(FlatGeobuf.packedIndexSize(1, 16) == 40)
  }

  test("garbage magic and truncated buffers fail loudly") {
    val p = tmp("bad.fgb")
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      "definitely not fgb".getBytes("UTF-8"))
    intercept[Exception] { FlatGeobuf.sparkSchema(p) }
    val q = tmp("trunc.fgb")
    FlatGeobuf.write(q, "l", props, Seq((Row(1L, "x", 2.0), (0.0, 0.0))))
    val whole = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(q))
    java.nio.file.Files.write(java.nio.file.Paths.get(q),
      whole.take(whole.length - 5))
    intercept[Exception] { FlatGeobuf.read(spark, q).collect() }
  }
}
