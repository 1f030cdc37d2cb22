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

  test("a container landing out of lexicographic order fails the stream loudly") {
    val zone = Files.createTempDirectory("graft-gpkg-zone-ooo")
    zone.toFile.deleteOnExit()
    land(zone, "a01.gpkg", 100)
    land(zone, "a02.gpkg", 200)
    val schema = spark.read.format("gpkg")
      .load(zone.resolve("a01.gpkg").toString).schema
    val out = Files.createTempDirectory("graft-gpkg-ooo-out").toString
    val ckpt = Files.createTempDirectory("graft-gpkg-ooo-ckpt").toString
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
    assert(spark.read.parquet(out).count() == 6)
    // a name sorting BEFORE the committed prefix shifts every offset —
    // the committed (position, name) anchor must refuse to plan, not
    // silently skip a01/a02's successor and re-read a shifted prefix
    land(zone, "0a.gpkg", 900)
    val e = intercept[Exception](drain())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("landing-zone order violated")),
      s"misordered landing did not fail loudly: ${messages(e).mkString(" | ")}")
  }

  test("offset json round-trips the (count, anchor-name) pair and accepts legacy bare counts") {
    val o = ContainerOffset(7, "/zone/a \"quoted\" \\ päth.gpkg")
    assert(ContainerOffset.fromJson(o.json()) == o)
    assert(ContainerOffset.fromJson("3") == ContainerOffset(3, ""))
  }
}
