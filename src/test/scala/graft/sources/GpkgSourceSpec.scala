package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The DSv2 GeoPackage connector's architectural claims: executor-side
  * parallelism (one input partition per container) and pushed column
  * pruning — the oracle (scan_gpkg_dsv2) vouches for the rows.
  */
class GpkgSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeFixture(dirName: String, n: Int): Seq[String] = {
    val dir = Files.createTempDirectory(dirName)
    dir.toFile.deleteOnExit()
    (1 to n).map { i =>
      val p = dir.resolve(s"part$i.gpkg").toString
      FormatWriters.writeGeoPackage(p, "pts", "k", "name", 4326,
        (1L to 5L).map(j => (i * 100L + j, s"f$i-$j", j * 1.0, -j * 1.0)))
      p
    }
  }

  test("multi-container load plans one scan partition per file and unions all rows") {
    val paths = writeFixture("graft-dsv2-multi", 4)
    val df = spark.read.format("gpkg").load(paths: _*)
    assert(df.rdd.getNumPartitions == 4,
      s"expected one partition per container, got ${df.rdd.getNumPartitions}")
    assert(df.count() == 20)
    val keys = df.select("k").collect().map(_.getLong(0)).toSet
    assert(keys == (1 to 4).flatMap(i => (1 to 5).map(j => i * 100L + j)).toSet)
  }

  test("column pruning is pushed into the scan (ReadSchema excludes unselected columns)") {
    val paths = writeFixture("graft-dsv2-prune", 1)
    val df = spark.read.format("gpkg").load(paths.head).select("k")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=[k]"),
      s"scan description does not show the pruned column set:\n$plan")
    assert(!plan.contains("cols=[k,name,geom]"), s"no pruning happened:\n$plan")
    assert(df.collect().map(_.getLong(0)).toSet == (1L to 5L).map(101L + _ - 1).toSet)
  }

  test("short name 'gpkg' resolves through DataSourceRegister") {
    // the service-loader registration: format("gpkg") must resolve to
    // the connector without a fully-qualified class name
    val paths = writeFixture("graft-dsv2-short", 1)
    val viaShort = spark.read.format("gpkg").load(paths.head).count()
    val viaClass = spark.read.format("graft.sources.GpkgSource").load(paths.head).count()
    assert(viaShort == 5 && viaClass == 5)
  }

  test("connector rows equal the driver-side reader's rows exactly") {
    val paths = writeFixture("graft-dsv2-parity", 2)
    val dsv2 = spark.read.format("gpkg").load(paths: _*)
      .orderBy("k").collect().map(_.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case x => x
      })
    val driver = paths.map(GeoPackageReader.read(spark, _))
      .reduce(_.unionAll(_))
      .orderBy("k").collect().map(_.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case x => x
      })
    assert(dsv2.toSeq == driver.toSeq)
  }

  test("shpzip connector matches the driver-side shapefile reader, one partition per archive") {
    val dir = Files.createTempDirectory("graft-dsv2-shp")
    dir.toFile.deleteOnExit()
    val paths = (1 to 3).map { i =>
      val p = dir.resolve(s"a$i.zip").toString
      FormatWriters.writeShapefileZip(p, "pts", "k", "name",
        (1L to 4L).map(j => (i * 10L + j, s"s$i-$j", j * 2.0, j * 3.0)))
      p
    }
    val dsv2 = spark.read.format("shpzip").load(paths: _*)
    assert(dsv2.rdd.getNumPartitions == 3)
    val got = dsv2.orderBy("k").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    })
    val driver = paths.map(ShapefileReader.read(spark, _)).reduce(_.unionAll(_))
      .orderBy("k").collect().map(_.toSeq.map {
        case b: Array[Byte] => b.toSeq; case x => x
      })
    assert(got.toSeq == driver.toSeq && got.length == 12)
  }

  test("reported statistics let Catalyst BROADCAST a connector-read dimension") {
    // without SupportsReportStatistics the connector relation defaults to
    // the worst-case size estimate and every join against it goes SMJ —
    // the stat is what makes a 4 KB dimension broadcastable
    val paths = writeFixture("graft-dsv2-stats", 1)
    val dim = spark.read.format("gpkg").load(paths.head).select("k", "name")
    val fact = spark.range(10000).select(
      (col("id") % 5 + 101).as("k"), (col("id") * 2).as("v"))
    val joined = fact.join(dim, "k").groupBy("name")
      .agg(sum("v").as("sv")).orderBy("name")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"connector dim not broadcast — statistics not reaching the optimizer:\n$plan")
  }

  test("a pushed limit caps per-partition emission") {
    val paths = writeFixture("graft-dsv2-limit", 3)
    val df = spark.read.format("gpkg").load(paths: _*).limit(2)
    assert(df.collect().length == 2)
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("limit=2"),
      s"limit did not reach the scan:\n$scanDesc")
  }

  test("pushed filters drop rows before conversion and stay exact under the residual") {
    val paths = writeFixture("graft-dsv2-filter", 2)
    val df = spark.read.format("gpkg").load(paths: _*)
      .filter(col("k") > 103L && col("name").isNotNull)
    val rows = df.collect().map(_.getLong(0)).toSet
    // file i=1 has keys 101..105, i=2 has 201..205 → k > 103 keeps 104,105,201..205
    assert(rows == Set(104L, 105L, 201L, 202L, 203L, 204L, 205L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[") && plan.contains("GreaterThan(k,103"),
      s"filter did not reach the scan:\n$plan")
  }

  test("partition reader is lazy and resolves filter columns case-insensitively in O(1)") {
    import org.apache.spark.sql.types._
    val fileSchema = StructType(Seq(
      StructField("K", LongType), StructField("txt", StringType)))
    // poison tail: any row past index 1 throws — proves (a) reader
    // construction materializes nothing (the old .toSeq would force it)
    // and (b) the pushed limit stops the pull, no second copy
    val rows: Seq[Seq[Any]] = LazyList.from(0).map {
      case 0 => Seq[Any](1L, "a")
      case 1 => Seq[Any](5L, "b")
      case _ => throw new IllegalStateException("reader forced rows beyond the pushed limit")
    }
    val factory = new ContainerReaderFactory(
      StructType(Seq(StructField("K", LongType))),
      (_: String) => (fileSchema, rows),
      limit = 1,
      // lowercase "k" vs schema "K": the precomputed index must match
      filters = Array(org.apache.spark.sql.sources.GreaterThan("k", 0L)))
    val reader = factory.createReader(ContainerPartition("mem"))
    assert(reader.next(), "filter dropped a matching row")
    assert(reader.get().getLong(0) == 1L)
    assert(!reader.next(), "pushed limit not applied") // never touches the poison tail
  }

  test("a container missing a required column fails with a readable error") {
    val paths = writeFixture("graft-dsv2-err", 1)
    val df = spark.read.format("gpkg").schema(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("nope",
          org.apache.spark.sql.types.LongType))))
      .load(paths.head)
    val e = intercept[Exception](df.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("lacks required column")),
      s"unreadable failure: ${messages(e).mkString(" | ")}")
  }
}
