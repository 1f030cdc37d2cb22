package graft.sources

import graft.TestSpark
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The connector's STREAMING half executed end-to-end: a landing zone of
  * gpkg containers drained by micro-batches, then a stop, two more
  * containers landing, and a restart from the same checkpoint — the
  * restarted stream must pick up exactly the new containers (offset =
  * container count over the lexicographic order), never re-reading or
  * skipping.
  */
class GpkgStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def land(dir: java.nio.file.Path, name: String, base: Long): Unit =
    FormatWriters.writeGeoPackage(dir.resolve(name).toString, "pts", "k", "name",
      4326, (1L to 3L).map(j => (base + j, s"$name-$j", j * 1.0, j * 1.0)))

  test("landing-zone stream drains new containers exactly once across a restart") {
    val zone = Files.createTempDirectory("graft-gpkg-zone")
    zone.toFile.deleteOnExit()
    land(zone, "a01.gpkg", 100)
    land(zone, "a02.gpkg", 200)
    val schema = spark.read.format("gpkg")
      .load(zone.resolve("a01.gpkg").toString).schema
    val out = Files.createTempDirectory("graft-gpkg-zone-out").toString
    val ckpt = Files.createTempDirectory("graft-gpkg-zone-ckpt").toString
    def drain(): Unit = {
      val q = spark.readStream.format("gpkg").schema(schema)
        .load(zone.toString)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000): Unit
    }
    drain()
    val first = spark.read.parquet(out).select("k").collect().map(_.getLong(0)).toSet
    assert(first == Set(101L, 102L, 103L, 201L, 202L, 203L))
    // two more containers land while the stream is down (names sort after)
    land(zone, "b01.gpkg", 300)
    land(zone, "b02.gpkg", 400)
    drain()
    val all = spark.read.parquet(out).select("k").collect().map(_.getLong(0))
    assert(all.length == 12, s"exactly-once violated: ${all.length} rows (dup or loss)")
    assert(all.toSet == Set(101L, 102L, 103L, 201L, 202L, 203L,
      301L, 302L, 303L, 401L, 402L, 403L))
  }
}
