package graft.sources

import graft.TestSpark
import graft.plans.TxLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 TableCatalog: CREATE/CTAS/INSERT/SELECT/time-travel/DML/
  * ALTER/DROP through catalog identifiers, executing on the proven v1
  * relation + COW kernels via the resolution-time swap. */
class GraftCatalogSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    s.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
    s
  }
  import spark.implicits._

  test("CREATE TABLE + INSERT + SELECT round-trip through catalog identifiers") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.corpus")
    spark.sql("CREATE TABLE gcat.corpus.docs (id BIGINT, text STRING) USING graft")
    spark.sql("INSERT INTO gcat.corpus.docs VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gcat.corpus.docs SELECT id, 'r' FROM range(3, 6)")
    assert(spark.sql("SELECT COUNT(*) FROM gcat.corpus.docs").head.getLong(0) == 5)
    assert(spark.table("gcat.corpus.docs").filter($"text" === "r").count() == 3)
    // SHOW TABLES sees it; DESCRIBE serves the declared schema
    assert(spark.sql("SHOW TABLES IN gcat.corpus").collect()
      .map(_.getString(1)).contains("docs"))
    val described = spark.sql("DESCRIBE TABLE gcat.corpus.docs").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(described("id") == "bigint" && described("text") == "string")
  }

  test("catalog reads execute on the v1 relation (zone-map pruning intact)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.prune")
    spark.sql("CREATE TABLE gcat.prune.t (k BIGINT, tag STRING) USING graft")
    // range-disjoint files through the path API — the SAME log
    val path = spark.sql("DESCRIBE EXTENDED gcat.prune.t").collect()
      .find(_.getString(0) == "Location").map(_.getString(1))
    val df = spark.table("gcat.prune.t").filter($"k" >= 30 && $"k" <= 45)
    // plan must be a FileSourceScanExec (v1 swap), not a v2 BatchScan
    val k = (0L until 100L).toDF("k").withColumn("tag", lit("x"))
      .repartitionByRange(4, $"k").sortWithinPartitions("k")
    val tbl = path.getOrElse(fail("no Location in DESCRIBE EXTENDED"))
    TxLog.append(k, tbl)
    val band = spark.table("gcat.prune.t").filter($"k" >= 30 && $"k" <= 45)
    val scans = band.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles
    }
    assert(scans.nonEmpty, "catalog read must execute on the v1 file scan")
    assert(scans.head == 1, s"zone maps must prune to 1 of 4 files, got ${scans.head}")
    assert(band.select("k").as[Long].collect().toSet == (30L to 45L).toSet)
  }

  test("CTAS and whole-table INSERT OVERWRITE through catalog identifiers") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ctas")
    spark.sql("CREATE TABLE gcat.ctas.t USING graft AS SELECT id AS k, 'a' AS tag FROM range(10)")
    assert(spark.sql("SELECT COUNT(*) FROM gcat.ctas.t").head.getLong(0) == 10)
    spark.sql("INSERT OVERWRITE gcat.ctas.t SELECT id AS k, 'b' AS tag FROM range(3)")
    assert(spark.sql("SELECT COUNT(*), MIN(tag) FROM gcat.ctas.t").head()
      .toSeq == Seq(3L, "b"))
  }

  test("static PARTITION (k='v') INSERT OVERWRITE replaces only that subtree") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.owst")
    spark.sql("CREATE TABLE gcat.owst.p (k BIGINT, b STRING) USING graft PARTITIONED BY (b)")
    spark.sql("INSERT INTO gcat.owst.p SELECT id, CONCAT('b', id % 2) FROM range(8)")
    spark.sql("INSERT OVERWRITE gcat.owst.p PARTITION (b='b1') SELECT id + 100 FROM range(2)")
    assert(spark.table("gcat.owst.p").filter($"b" === "b0").count() == 4,
      "b0 must survive a b1-scoped overwrite")
    assert(spark.table("gcat.owst.p").filter($"b" === "b1")
      .select("k").as[Long].collect().toSet == Set(100L, 101L))
    // fully-static spec keeps static semantics: an EMPTY source still
    // empties the named partition
    spark.sql("INSERT OVERWRITE gcat.owst.p PARTITION (b='b1') SELECT id FROM range(0)")
    assert(spark.table("gcat.owst.p").filter($"b" === "b1").count() == 0)
    assert(spark.table("gcat.owst.p").count() == 4)
    // a non-partition filter shape refuses loudly (DataFrameWriterV2)
    val e = intercept[Exception] {
      spark.table("gcat.owst.p").limit(1)
        .writeTo("gcat.owst.p").overwrite($"k" > lit(0L))
    }
    assert(e.getMessage.contains("not a partition column") ||
      e.getMessage.contains("static PARTITION"))
  }

  test("dynamic-mode INSERT OVERWRITE replaces exactly the written partitions") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.owdyn")
    spark.sql("CREATE TABLE gcat.owdyn.p (k BIGINT, b STRING) USING graft PARTITIONED BY (b)")
    spark.sql("INSERT INTO gcat.owdyn.p SELECT id, CONCAT('b', id % 3) FROM range(9)")
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("INSERT OVERWRITE gcat.owdyn.p SELECT id + 50, 'b1' FROM range(2)")
      assert(spark.table("gcat.owdyn.p").filter($"b" =!= "b1").count() == 6,
        "untouched partitions must survive a dynamic overwrite")
      assert(spark.table("gcat.owdyn.p").filter($"b" === "b1")
        .select("k").as[Long].collect().toSet == Set(50L, 51L))
      // DataFrameWriterV2.overwritePartitions takes the same path
      Seq((70L, "b2")).toDF("k", "b").writeTo("gcat.owdyn.p").overwritePartitions()
      assert(spark.table("gcat.owdyn.p").filter($"b" === "b2")
        .select("k").as[Long].collect().toSet == Set(70L))
      assert(spark.table("gcat.owdyn.p").count() == 6)
      // one atomic commit per overwrite, on the SAME log the path API sees
      val path = spark.sql("DESCRIBE EXTENDED gcat.owdyn.p").collect()
        .find(_.getString(0) == "Location").map(_.getString(1)).get
      assert(TxLog.history(path).last.op == "overwrite")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("VERSION AS OF / TIMESTAMP AS OF through Spark's own time-travel syntax") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.tt")
    spark.sql("CREATE TABLE gcat.tt.t (k BIGINT) USING graft")          // v1
    spark.sql("INSERT INTO gcat.tt.t SELECT id FROM range(5)")          // v2
    spark.sql("INSERT INTO gcat.tt.t SELECT id FROM range(5, 8)")       // v3
    assert(spark.sql("SELECT COUNT(*) FROM gcat.tt.t VERSION AS OF 2").head.getLong(0) == 5)
    assert(spark.sql("SELECT COUNT(*) FROM gcat.tt.t VERSION AS OF 3").head.getLong(0) == 8)
    // a time-travel view refuses writes
    intercept[Exception](spark.sql(
      "INSERT INTO gcat.tt.t VERSION AS OF 2 VALUES (99)"))
    // TIMESTAMP AS OF now() resolves to the head version
    assert(spark.sql(
      "SELECT COUNT(*) FROM gcat.tt.t TIMESTAMP AS OF current_timestamp()")
      .head.getLong(0) == 8)
  }

  test("DELETE / UPDATE / MERGE on catalog identifiers route to the COW kernels") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.dml")
    spark.sql("CREATE TABLE gcat.dml.t (k BIGINT, tag STRING) USING graft")
    spark.sql("INSERT INTO gcat.dml.t SELECT id, 'old' FROM range(20)")
    spark.sql("DELETE FROM gcat.dml.t WHERE k >= 15")
    spark.sql("UPDATE gcat.dml.t SET tag = 'new' WHERE k < 3")
    assert(spark.sql("SELECT COUNT(*) FROM gcat.dml.t").head.getLong(0) == 15)
    assert(spark.sql("SELECT COUNT(*) FROM gcat.dml.t WHERE tag = 'new'")
      .head.getLong(0) == 3)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW dml_updates AS " +
      "SELECT CAST(id AS BIGINT) AS k, 'merged' AS tag FROM range(13, 17)")
    spark.sql("""MERGE INTO gcat.dml.t USING dml_updates ON gcat.dml.t.k = dml_updates.k
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT COUNT(*) FROM gcat.dml.t").head.getLong(0) == 17)
    assert(spark.sql("SELECT COUNT(*) FROM gcat.dml.t WHERE tag = 'merged'")
      .head.getLong(0) == 4)
    // the ops hit the log as audited COW commits
    val loc = spark.sql("DESCRIBE EXTENDED gcat.dml.t").collect()
      .find(_.getString(0) == "Location").get.getString(1)
    assert(TxLog.history(loc).map(_.op)
      .containsSlice(Seq("delete", "update")))
  }

  test("ALTER TABLE ADD COLUMNS is a metadata-only commit; DROP TABLE drops") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.alter")
    spark.sql("CREATE TABLE gcat.alter.t (k BIGINT) USING graft")
    spark.sql("INSERT INTO gcat.alter.t SELECT id FROM range(4)")
    spark.sql("ALTER TABLE gcat.alter.t ADD COLUMNS (score DOUBLE)")
    assert(spark.table("gcat.alter.t").schema.fieldNames.toSeq == Seq("k", "score"))
    assert(spark.sql("SELECT COUNT(*) FROM gcat.alter.t WHERE score IS NULL")
      .head.getLong(0) == 4, "old rows null-backfill")
    spark.sql("INSERT INTO gcat.alter.t VALUES (9, 1.5)")
    assert(spark.sql("SELECT SUM(score) FROM gcat.alter.t").head.getDouble(0) == 1.5)
    // unsupported alters refuse loudly
    intercept[Exception](spark.sql("ALTER TABLE gcat.alter.t DROP COLUMN score"))
    spark.sql("DROP TABLE gcat.alter.t")
    assert(!spark.catalog.tableExists("gcat.alter.t"))
  }

  test("maintenance SQL accepts catalog identifiers") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.maint")
    spark.sql("CREATE TABLE gcat.maint.t USING graft AS SELECT id AS k FROM range(20)")
    spark.sql("INSERT INTO gcat.maint.t SELECT id FROM range(20, 40)")
    // DESCRIBE HISTORY on the identifier reads the same log
    val hist = spark.sql("DESCRIBE HISTORY gcat.maint.t").collect()
    assert(hist.map(_.getString(1)).toSeq == Seq("append", "overwrite", "create") ||
      hist.map(_.getString(1)).toSeq == Seq("append", "append", "create"),
      s"got ${hist.map(_.getString(1)).toSeq}")
    // OPTIMIZE compacts; VACUUM with retention 0 reclaims the dead files
    val opt = spark.sql("OPTIMIZE gcat.maint.t FILES 1").head()
    assert(opt.getInt(2) == 1, s"files_after = ${opt.getInt(2)}")
    assert(spark.sql("VACUUM gcat.maint.t RETAIN 0 HOURS").head.getLong(0) >= 1)
    assert(spark.sql("SELECT COUNT(*) FROM gcat.maint.t").head.getLong(0) == 40)
    // RESTORE by identifier
    spark.sql("DELETE FROM gcat.maint.t WHERE k < 5")
    val head0 = spark.sql("DESCRIBE HISTORY gcat.maint.t").head.getLong(0)
    spark.sql(s"RESTORE gcat.maint.t TO VERSION ${head0 - 1}")
    assert(spark.sql("SELECT COUNT(*) FROM gcat.maint.t").head.getLong(0) == 40)
    // dotted names whose head is NOT a graft catalog are never hijacked:
    // they delegate to Spark's own grammar (which has no VACUUM → parse
    // error), so another extension's tables keep working
    val e = intercept[Exception](spark.sql("VACUUM nosuchcat.ns.t"))
    assert(!e.getMessage.contains("graft maintenance"),
      s"non-graft dotted targets must delegate, got: ${e.getMessage}")
  }

  test("SHOW PARTITIONS lists materialized partitions; spec'd subsets filter") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.parts")
    spark.sql("CREATE TABLE gcat.parts.p (k BIGINT, b STRING, d BIGINT) " +
      "USING graft PARTITIONED BY (b, d)")
    spark.sql("INSERT INTO gcat.parts.p SELECT id, CONCAT('b', id % 2), id % 3 FROM range(12)")
    val all = spark.sql("SHOW PARTITIONS gcat.parts.p")
      .collect().map(_.getString(0)).toSet
    assert(all == Set("b=b0/d=0", "b=b0/d=1", "b=b0/d=2",
      "b=b1/d=0", "b=b1/d=1", "b=b1/d=2"), s"got $all")
    val filtered = spark.sql("SHOW PARTITIONS gcat.parts.p PARTITION (b='b1')")
      .collect().map(_.getString(0)).toSet
    assert(filtered == Set("b=b1/d=0", "b=b1/d=1", "b=b1/d=2"), s"got $filtered")
    // a replaced partition disappears from the listing (derived, not cached)
    spark.sql("DELETE FROM gcat.parts.p WHERE b = 'b0' AND d = 2")
    val after = spark.sql("SHOW PARTITIONS gcat.parts.p")
      .collect().map(_.getString(0)).toSet
    assert(!after.contains("b=b0/d=2"), s"emptied partition must drop: $after")
    // partition MUTATION statements refuse by name
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE gcat.parts.p DROP PARTITION (b='b1', d=0)"))
    assert(e.getMessage.contains("DROP PARTITION") ||
      e.getMessage.contains("INSERT OVERWRITE"), e.getMessage)
  }

  test("DESCRIBE DETAIL returns the Delta-parity one-row summary") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.detail")
    spark.sql("CREATE TABLE gcat.detail.t (k BIGINT, b STRING) " +
      "USING graft PARTITIONED BY (b)")
    spark.sql("INSERT INTO gcat.detail.t SELECT id, CONCAT('b', id % 2) FROM range(10)")
    val row = spark.sql("DESCRIBE DETAIL gcat.detail.t").head()
    assert(row.getAs[String]("format") == "graft")
    assert(row.getAs[Long]("version") == 2L) // create + insert
    assert(row.getAs[Long]("num_files") >= 2L)
    assert(row.getAs[Long]("size_bytes") > 0L)
    assert(row.getAs[String]("partition_columns") == "b")
    assert(!row.getAs[java.sql.Timestamp]("last_modified")
      .before(row.getAs[java.sql.Timestamp]("created_at")))
    // the path-addressed form serves the same row
    val loc = row.getAs[String]("location")
    val byPath = spark.sql(s"DESCRIBE DETAIL graft '$loc'").head()
    assert(byPath.getAs[Long]("version") == 2L)
  }

  test("ALTER TABLE RENAME/DROP COLUMN and type changes refuse by NAME") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.alter2")
    spark.sql("CREATE TABLE gcat.alter2.t (k INT, s STRING) USING graft")
    val e1 = intercept[Exception](spark.sql(
      "ALTER TABLE gcat.alter2.t RENAME COLUMN s TO s2"))
    assert(e1.getMessage.contains("RENAME COLUMN") &&
      e1.getMessage.contains("ADD COLUMNS"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE gcat.alter2.t DROP COLUMN s"))
    assert(e2.getMessage.contains("DROP COLUMN") &&
      e2.getMessage.contains("INSERT OVERWRITE"), e2.getMessage)
    // a WIDENING type change passes Spark's own analysis (narrowing is
    // refused upstream with NOT_SUPPORTED_CHANGE_COLUMN) — OUR refusal
    // must catch it with the named rewrite hint
    val e3 = intercept[Exception](spark.sql(
      "ALTER TABLE gcat.alter2.t ALTER COLUMN k TYPE BIGINT"))
    assert(e3.getMessage.contains("TYPE is not supported") &&
      e3.getMessage.contains("CAST"), e3.getMessage)
  }

  test("unsupported CREATE/ALTER shapes refuse instead of silently deviating") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.refuse")
    // LOCATION would be silently ignored (table lives at the identifier
    // path) — refuse
    val e1 = intercept[Exception](spark.sql(
      "CREATE TABLE gcat.refuse.ext (k BIGINT) USING graft LOCATION '/tmp/elsewhere'"))
    assert(e1.getMessage.contains("LOCATION"))
    // NOT NULL column adds cannot be honored on existing rows — refuse
    spark.sql("CREATE TABLE gcat.refuse.t (k BIGINT) USING graft")
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE gcat.refuse.t ADD COLUMNS (s STRING NOT NULL)"))
    assert(e2.getMessage.contains("null-backfill"))
  }
}
