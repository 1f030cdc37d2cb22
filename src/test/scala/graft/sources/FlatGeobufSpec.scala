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
    // the spec's size reduction is a DO-while: a single item still has a
    // root above its leaf — 2 nodes, 80 bytes (40 was the r7 latent bug:
    // an externally-indexed single-feature file mis-skipped its index)
    assert(FlatGeobuf.packedIndexSize(1, 16) == 2 * 40)
    // 17 items @16: 17 + 2 + 1 = 20 nodes
    assert(FlatGeobuf.packedIndexSize(17, 16) == 20 * 40)
  }

  test("packIndex 1-item layout is hand-verifiable: root then leaf") {
    val bytes = FlatGeobuf.packIndex(Seq((3.0, 4.0, 3.0, 4.0, 123L)), 16)
    assert(bytes.length == 80)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // root: bbox = the single point, offset = first-child node index 1
    assert(bb.getDouble(0) == 3.0 && bb.getDouble(8) == 4.0 &&
      bb.getDouble(16) == 3.0 && bb.getDouble(24) == 4.0)
    assert(bb.getLong(32) == 1L)
    // leaf: same bbox, offset = feature byte offset
    assert(bb.getDouble(40) == 3.0 && bb.getLong(72) == 123L)
  }

  test("single-feature INDEXED file round-trips (the r7 mis-skip case)") {
    val p = tmp("one_idx.fgb")
    FlatGeobuf.write(p, "one", props,
      Seq((Row(9L, "solo", 2.5), (7.0, 8.0))), indexNodeSize = 16)
    val back = FlatGeobuf.read(spark, p).collect()
    assert(back.length == 1 && back(0).getLong(0) == 9L)
  }

  test("indexed write round-trips through the full-scan read path") {
    val p = tmp("idx.fgb")
    val rows = (0L until 25L).map(i =>
      (Row(i, s"n$i", i * 0.5), (i.toDouble, (i % 5).toDouble * 10)))
    FlatGeobuf.write(p, "grid", props, rows, indexNodeSize = 4)
    val back = FlatGeobuf.read(spark, p).orderBy("k").collect()
    assert(back.length == 25)
    assert(back.map(_.getLong(0)).toSeq == (0L until 25L))
  }

  test("bbox read uses the index: outside-bbox features are NEVER decoded") {
    val p = tmp("bbox.fgb")
    val rows = (0L until 25L).map(i =>
      (Row(i, s"n$i", i * 0.5), (i.toDouble, (i % 5).toDouble * 10)))
    FlatGeobuf.write(p, "grid", props, rows, indexNodeSize = 4)
    // collect WITHOUT orderBy: a sort's range-partitioner sampling pass
    // recomputes the scan RDD and would double every accumulator count
    val acc = spark.sparkContext.longAccumulator("fgb_decoded")
    val got = FlatGeobuf.readBbox(spark, p, 3.0, 0.0, 9.0, 45.0, Some(acc))
      .collect()
    assert(got.map(_.getLong(0)).sorted.toSeq == (3L to 9L))
    // pruning proof: the index walk decoded only candidate leaves, a
    // strict subset of the 25 features (candidates ARE exact for points)
    assert(acc.value == 7, s"decoded ${acc.value} features, want 7")
    // index-free files fall back to decode-all + filter: same answer,
    // every feature decoded
    val p2 = tmp("noidx.fgb")
    FlatGeobuf.write(p2, "grid", props, rows)
    val acc2 = spark.sparkContext.longAccumulator("fgb_decoded_all")
    val got2 = FlatGeobuf.readBbox(spark, p2, 3.0, 0.0, 9.0, 45.0, Some(acc2))
      .collect()
    assert(got2.map(_.getLong(0)).sorted.toSeq == (3L to 9L))
    assert(acc2.value == 25)
  }

  test("bbox search on a handcrafted EXTERNAL index (not this writer's)") {
    // two points far apart, nodeSize 16 → 3 nodes (2 leaves + root);
    // bytes laid out by hand from the published PackedRTree layout, so
    // the reader is proven against the spec, not against packIndex
    val bb = java.nio.ByteBuffer.allocate(3 * 40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // root covers both, first child at node index 1
    bb.putDouble(0.0); bb.putDouble(0.0); bb.putDouble(100.0); bb.putDouble(100.0)
    bb.putLong(1L)
    // leaf A at (10,10), feature offset 0
    bb.putDouble(10.0); bb.putDouble(10.0); bb.putDouble(10.0); bb.putDouble(10.0)
    bb.putLong(0L)
    // leaf B at (90,90), feature offset 555
    bb.putDouble(90.0); bb.putDouble(90.0); bb.putDouble(90.0); bb.putDouble(90.0)
    bb.putLong(555L)
    val buf = java.nio.ByteBuffer.wrap(bb.array())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val hitA = FlatGeobuf.searchIndex(buf, 0, 2, 16, 0.0, 0.0, 50.0, 50.0)
    assert(hitA == Seq(0L))
    val hitB = FlatGeobuf.searchIndex(buf, 0, 2, 16, 80.0, 80.0, 95.0, 95.0)
    assert(hitB == Seq(555L))
    val none = FlatGeobuf.searchIndex(buf, 0, 2, 16, 40.0, 40.0, 60.0, 60.0)
    assert(none.isEmpty)
  }

  test("mixed Point/LineString/Polygon layer round-trips through WKT") {
    import org.apache.spark.sql.functions.col
    val p = tmp("mixed.fgb")
    val wkts = Seq(
      "POINT (3 4)",
      "LINESTRING (0 0, 5 5, 10 0)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
      // polygon with a hole: two rings exercise the `ends` vector
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      // the multi family: ends as part offsets, and multipolygon's
      // nested child Geometry tables (`parts`)
      "MULTIPOINT ((1 1), (2 2), (3 3))",
      "MULTILINESTRING ((0 0, 1 1), (5 5, 6 6, 7 7))",
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), " +
        "((5 5, 8 5, 8 8, 5 8, 5 5), (6 6, 7 6, 7 7, 6 7, 6 6)))",
      // heterogeneous collection: children carry their OWN types
      "GEOMETRYCOLLECTION (POINT (9 9), LINESTRING (0 0, 3 3), " +
        "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1)))")
    val rows = wkts.zipWithIndex.map { case (w, i) =>
      (Row(i.toLong, s"g$i", null), w)
    }
    FlatGeobuf.writeGeo(p, "mixed", props, rows)
    val back = FlatGeobuf.read(spark, p)
      .select(col("k"),
        graft.functions.GeoFunctions.stAsTextFromWkb(col("geom")).as("wkt"))
      .orderBy("k").collect()
    assert(back.map(_.getString(1)).toSeq == wkts,
      s"WKT round-trip drifted: ${back.map(_.getString(1)).mkString(" | ")}")
  }

  test("indexed mixed-geometry bbox read prunes on envelopes") {
    val p = tmp("mixedidx.fgb")
    val rows = (0L until 20L).map { i =>
      val x = i.toDouble * 10
      val wkt =
        if (i % 2 == 0) s"POINT ($x 5)"
        else s"LINESTRING ($x 0, ${x + 2} 4)"
      (Row(i, s"g$i", null), wkt)
    }
    FlatGeobuf.writeGeo(p, "mixedidx", props, rows, indexNodeSize = 4)
    val acc = spark.sparkContext.longAccumulator("fgb_mixed_decoded")
    // bbox x ∈ [38, 63] overlaps features at x ∈ {40,50,60} (+ the line
    // starting at 30 reaches 32 < 38 — outside): ids 4..6 → 38..62
    val got = FlatGeobuf.readBbox(spark, p, 38.0, 0.0, 63.0, 10.0, Some(acc))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(4L, 5L, 6L), s"got $got")
    assert(acc.value < 20, s"no pruning: decoded ${acc.value} of 20")
  }

  test("property: seeded random mixed layers round-trip, indexed and plain") {
    val rnd = new scala.util.Random(41)
    def square(x: Int, y: Int, s: Int): String =
      s"($x $y, ${x + s} $y, ${x + s} ${y + s}, $x ${y + s}, $x $y)"
    def randWkt(): String = rnd.nextInt(7) match {
      case 0 => s"POINT (${rnd.nextInt(100)} ${rnd.nextInt(100)})"
      case 1 =>
        val pts = (0 to 1 + rnd.nextInt(3))
          .map(_ => s"${rnd.nextInt(100)} ${rnd.nextInt(100)}").mkString(", ")
        s"LINESTRING ($pts)"
      case 2 =>
        val (x, y) = (rnd.nextInt(80), rnd.nextInt(80))
        if (rnd.nextBoolean()) s"POLYGON (${square(x, y, 10)})"
        else s"POLYGON (${square(x, y, 10)}, ${square(x + 2, y + 2, 3)})"
      case 3 =>
        val pts = (0 to rnd.nextInt(3))
          .map(_ => s"(${rnd.nextInt(100)} ${rnd.nextInt(100)})").mkString(", ")
        s"MULTIPOINT ($pts)"
      case 4 =>
        val ls = (0 to rnd.nextInt(2)).map { _ =>
          s"(${rnd.nextInt(100)} ${rnd.nextInt(100)}, ${rnd.nextInt(100)} ${rnd.nextInt(100)})"
        }.mkString(", ")
        s"MULTILINESTRING ($ls)"
      case 5 =>
        val polys = (0 to rnd.nextInt(2)).map { _ =>
          s"(${square(rnd.nextInt(80), rnd.nextInt(80), 5 + rnd.nextInt(5))})"
        }.mkString(", ")
        s"MULTIPOLYGON ($polys)"
      case _ =>
        s"GEOMETRYCOLLECTION (POINT (${rnd.nextInt(100)} ${rnd.nextInt(100)}), " +
          s"LINESTRING (${rnd.nextInt(100)} ${rnd.nextInt(100)}, " +
          s"${rnd.nextInt(100)} ${rnd.nextInt(100)}))"
    }
    val reader = new org.locationtech.jts.io.WKTReader()
    import org.apache.spark.sql.functions.col
    for (iter <- 1 to 4) {
      val rows = (0 until (5 + rnd.nextInt(15))).map { i =>
        (Row(i.toLong, s"f$i", rnd.nextInt(100).toDouble), randWkt())
      }
      val p = tmp(s"prop$iter.fgb")
      FlatGeobuf.writeGeo(p, "prop", props, rows,
        indexNodeSize = if (iter % 2 == 0) 3 else 0)
      val back = FlatGeobuf.read(spark, p)
        .select(col("k"),
          graft.functions.GeoFunctions.stAsTextFromWkb(col("geom")).as("wkt"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(back.length == rows.length)
      rows.zip(back).foreach { case ((row, wkt), (k, got)) =>
        assert(row.getLong(0) == k)
        // geometry EQUALITY, not string equality — formatting is JTS's
        assert(reader.read(wkt).equalsExact(reader.read(got)),
          s"iter $iter k=$k: wrote '$wkt', read '$got'")
      }
    }
  }

  test("XYZ geometries round-trip: z vectors, has_z header, ISO Z WKB") {
    val zprops = StructType(Seq(StructField("k", LongType, nullable = true)))
    val p = tmp("z.fgb")
    val wkts = Seq(
      "POINT Z (1 2 5)",
      "LINESTRING Z (0 0 1, 3 4 2, 6 0 3)",
      "POLYGON Z ((0 0 9, 4 0 9, 4 4 9, 0 0 9))",
      "MULTIPOINT Z ((1 1 7), (2 2 8))",
      "MULTILINESTRING Z ((0 0 1, 1 1 2), (2 2 3, 3 3 4))",
      "MULTIPOLYGON Z (((0 0 5, 1 0 5, 1 1 5, 0 0 5)), ((9 9 6, 10 9 6, 10 10 6, 9 9 6)))")
    FlatGeobuf.writeGeo(p, "z", zprops,
      wkts.zipWithIndex.map { case (w, i) => (Row(i.toLong), w) })
    val (_, rows) = FlatGeobuf.parsed(p)
    assert(rows.length == wkts.length)
    val rdr = new org.locationtech.jts.io.WKBReader()
    val byK = rows.map(r => r(0).asInstanceOf[Long] ->
      rdr.read(r(1).asInstanceOf[Array[Byte]])).toMap
    // z survives the container + WKB round trip on every shape
    assert(byK(0L).getCoordinate.getZ == 5.0)
    assert(byK(1L).getCoordinates.map(_.getZ).toSeq == Seq(1.0, 2.0, 3.0))
    assert(byK(2L).getCoordinates.map(_.getZ).forall(_ == 9.0))
    assert(byK(3L).getCoordinates.map(_.getZ).toSeq == Seq(7.0, 8.0))
    assert(byK(4L).getCoordinates.map(_.getZ).toSeq == Seq(1.0, 2.0, 3.0, 4.0))
    assert(byK(5L).getGeometryN(1).getCoordinates.map(_.getZ).forall(_ == 6.0))
    // forced-2D transport drops z without disturbing xy or type
    assert(graft.functions.GeoFunctions.toWkt2D(
      rdr.read(FlatGeobuf.geomWkb(FlatGeobuf.FgbGeom.fromWkt("POINT Z (1 2 5)"))))
      == "POINT (1 2)")
    // mixed 2D/3D layers: each feature keeps its own dimension
    val p2 = tmp("zmix.fgb")
    FlatGeobuf.writeGeo(p2, "zmix", zprops,
      Seq((Row(0L), "POINT (1 1)"), (Row(1L), "POINT Z (2 2 2)")))
    val (_, rows2) = FlatGeobuf.parsed(p2)
    val g0 = rdr.read(rows2.find(_(0) == 0L).get(1).asInstanceOf[Array[Byte]])
    val g1 = rdr.read(rows2.find(_(0) == 1L).get(1).asInstanceOf[Array[Byte]])
    assert(g0.getCoordinate.getZ.isNaN && g1.getCoordinate.getZ == 2.0)
  }

  test("indexed XYZ layer: bbox read works on 2D envelopes of 3D features") {
    val zprops = StructType(Seq(StructField("k", LongType, nullable = true)))
    val p = tmp("zidx.fgb")
    val rows = (0 until 50).map { i =>
      (Row(i.toLong), s"POINT Z (${i % 10} ${i / 10} ${i * 2})")
    }
    FlatGeobuf.writeGeo(p, "zidx", zprops, rows, indexNodeSize = 4)
    val hits = FlatGeobuf.readBbox(spark, p, 2.0, 1.0, 4.0, 3.0).collect()
    val want = (0 until 50).count(i =>
      i % 10 >= 2 && i % 10 <= 4 && i / 10 >= 1 && i / 10 <= 3)
    assert(hits.length == want)
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
