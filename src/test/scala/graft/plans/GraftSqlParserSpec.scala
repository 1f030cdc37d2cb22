package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL maintenance statements (VACUUM / OPTIMIZE / DESCRIBE HISTORY
  * graft '<path>') through the injected delegating parser. */
class GraftSqlParserSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graftsql_$name").toString

  test("DESCRIBE HISTORY returns the commit log newest first") {
    val t = freshTable("hist")
    TxLog.append((0 until 10).toDF("k").withColumn("tag", lit("a")).repartition(2), t)
    TxLog.overwrite((0 until 5).toDF("k").withColumn("tag", lit("b")), t)
    val h = spark.sql(s"DESCRIBE HISTORY graft '$t'").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    assert(h.map(_.getString(1)).toSeq == Seq("overwrite", "append"))
    assert(h(0).getInt(3) == 2, "the overwrite removed v1's two files")
    assert(h.forall(_.getBoolean(4)))
  }

  test("OPTIMIZE compacts (optionally clustered) and reports the layout change") {
    val t = freshTable("opt")
    TxLog.append(
      (0 until 400).toDF("k").withColumn("v", ($"k" * 37L) % 400).repartition(8), t)
    val r = spark.sql(s"OPTIMIZE graft '$t' FILES 2").head
    assert(r.getLong(0) == 2L && r.getInt(1) == 8 && r.getInt(2) <= 2)
    assert(spark.read.format("graft").load(t).count() == 400)
    // clustered form drives the k-D path
    val r2 = spark.sql(s"OPTIMIZE graft '$t' FILES 4 CLUSTER BY (k, v)").head
    assert(r2.getLong(0) == 3L && r2.getInt(2) <= 4)
    assert(spark.read.format("graft").load(t).count() == 400)
    // compaction commits are layout-only
    val ops = spark.sql(s"DESCRIBE HISTORY graft '$t'")
      .select("op", "data_change").collect()
    assert(ops.count(r => r.getString(0) == "compact" && !r.getBoolean(1)) == 2)
  }

  test("VACUUM respects retention by default and reclaims with RETAIN 0 HOURS") {
    val t = freshTable("vac")
    TxLog.append((0 until 10).toDF("k").withColumn("tag", lit("a")), t)
    TxLog.overwrite((0 until 3).toDF("k").withColumn("tag", lit("b")), t)
    assert(spark.sql(s"VACUUM graft '$t'").head.getLong(0) == 0L,
      "fresh orphans sit inside the default retention window")
    assert(spark.sql(s"VACUUM graft '$t' RETAIN 0 HOURS").head.getLong(0) >= 1L)
    assert(spark.read.format("graft").load(t).count() == 3)
  }

  test("RESTORE rolls back by version or timestamp, metadata-only") {
    val t = freshTable("restore")
    TxLog.append((0 until 10).toDF("k").withColumn("tag", lit("a")), t)
    Thread.sleep(15)
    TxLog.overwrite((100 until 103).toDF("k").withColumn("tag", lit("b")), t)
    val r = spark.sql(s"RESTORE graft '$t' TO VERSION 1").head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L)
    assert(spark.read.format("graft").load(t).count() == 10)
    // timestamp form: the v2 instant resolves to v2's content
    val v2ts = TxLog.history(t)(1).ts
    val r2 = spark.sql(s"RESTORE graft '$t' TO TIMESTAMP $v2ts").head
    assert(r2.getLong(0) == 4L && r2.getLong(1) == 2L)
    assert(spark.read.format("graft").load(t).count() == 3)
  }

  test("everything else still parses through Spark's own grammar") {
    assert(spark.sql("SELECT 1 + 1 AS two").head.getInt(0) == 2)
    // a non-graft DESCRIBE still behaves as Spark's statement
    (0 until 3).toDF("k").createOrReplaceTempView("parser_plain")
    assert(spark.sql("DESCRIBE parser_plain").count() >= 1)
    intercept[Exception](spark.sql("VACUUM graft"))
  }
}
