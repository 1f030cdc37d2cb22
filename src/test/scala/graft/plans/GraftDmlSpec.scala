package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL DML (DELETE / UPDATE / MERGE) on `USING graft` views — the
  * GraftDml resolution rule routing the v2-only logical plans to the
  * TxLog copy-on-write kernels. */
class GraftDmlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graftdml_$name").toString

  private def view(t: String, name: String): String = {
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name USING graft OPTIONS (path '$t')")
    name
  }

  private def rangeTable(name: String): String = {
    val t = freshTable(name)
    TxLog.append(
      (0 until 100).toDF("k").withColumn("tag", lit("old"))
        .repartitionByRange(4, $"k").sortWithinPartitions("k"), t)
    t
  }

  test("DELETE FROM routes through the COW kernel and rewrites only matching files") {
    val t = rangeTable("del")
    val v = view(t, "graft_dml_del")
    spark.sql(s"DELETE FROM $v WHERE k >= 30 AND k <= 45")
    val last = TxLog.history(t).last
    assert(last.op == "delete" && last.remove.length == 1,
      s"SQL DELETE must rewrite exactly the [25,50) file, removed ${last.remove.length}")
    assert(spark.sql(s"SELECT COUNT(*) FROM $v").head.getLong(0) == 84)
    // NULL-condition rows keep SQL DELETE semantics (no crash, no rows)
    spark.sql(s"DELETE FROM $v WHERE IF(tag = 'never', true, NULL)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $v").head.getLong(0) == 84)
  }

  test("UPDATE SET routes through the COW kernel, casting back to column types") {
    val t = rangeTable("upd")
    val v = view(t, "graft_dml_upd")
    spark.sql(s"UPDATE $v SET tag = 'new', k = k + 1000 WHERE k >= 30 AND k <= 32")
    val last = TxLog.history(t).last
    assert(last.op == "update" && last.remove.length == 1,
      s"SQL UPDATE must rewrite exactly one file, removed ${last.remove.length}")
    assert(spark.sql(s"SELECT COUNT(*) FROM $v WHERE tag = 'new'").head.getLong(0) == 3)
    assert(spark.sql(s"SELECT SUM(k) FROM $v WHERE tag = 'new'").head.getLong(0) == 3093)
    assert(spark.sql(s"SELECT COUNT(*) FROM $v").head.getLong(0) == 100)
    // unknown assignment column refuses loudly
    val e = intercept[Exception](spark.sql(s"UPDATE $v SET nope = 1 WHERE k = 0"))
    assert(e.getMessage.contains("unknown column") || e.getMessage.contains("nope"))
  }

  test("MERGE INTO upserts by key through the COW kernel") {
    val t = rangeTable("merge")
    val v = view(t, "graft_dml_merge")
    Seq((30, "upd"), (31, "upd"), (900, "ins")).toDF("k", "tag")
      .createOrReplaceTempView("graft_dml_merge_src")
    spark.sql(
      s"""MERGE INTO $v t USING graft_dml_merge_src s ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
    val last = TxLog.history(t).last
    assert(last.op == "merge" && last.remove.length == 1,
      s"SQL MERGE must rewrite exactly one file, removed ${last.remove.length}")
    assert(spark.sql(s"SELECT COUNT(*) FROM $v").head.getLong(0) == 101)
    assert(spark.sql(s"SELECT COLLECT_SET(k) FROM $v WHERE tag IN ('upd','ins')")
      .head.getSeq[Int](0).toSet == Set(30, 31, 900))
    // unsupported shapes refuse loudly rather than half-merging
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO $v t USING graft_dml_merge_src s ON t.k = s.k + 1
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *"""))
    assert(e.getMessage.contains("ON target.key = source.key"))
  }

  test("MERGE with conditional UPDATE, DELETE, and multiple WHEN clauses") {
    val t = rangeTable("mgen")
    val v = view(t, "graft_dml_mgen")
    Seq((30, "hot"), (31, "cold"), (900, "ins")).toDF("k", "ttl")
      .createOrReplaceTempView("graft_dml_mgen_src")
    spark.sql(
      s"""MERGE INTO $v t USING graft_dml_mgen_src s ON t.k = s.k
          WHEN MATCHED AND s.ttl = 'cold' THEN DELETE
          WHEN MATCHED THEN UPDATE SET tag = s.ttl
          WHEN NOT MATCHED AND s.ttl = 'ins' THEN INSERT (k, tag) VALUES (s.k, s.ttl)""")
    assert(TxLog.history(t).last.op == "merge")
    assert(spark.sql(s"SELECT COUNT(*) FROM $v").head.getLong(0) == 100,
      "one delete (31) + one insert (900) nets to 100")
    assert(spark.sql(s"SELECT COUNT(*) FROM $v WHERE k = 31").head.getLong(0) == 0)
    assert(spark.sql(s"SELECT tag FROM $v WHERE k = 30").head.getString(0) == "hot")
    assert(spark.sql(s"SELECT tag FROM $v WHERE k = 900").head.getString(0) == "ins")
  }

  test("MERGE WHEN MATCHED THEN DELETE alone (the Delta daily-driver shape)") {
    val t = rangeTable("mdel")
    val v = view(t, "graft_dml_mdel")
    Seq(10, 11, 12).toDF("k").createOrReplaceTempView("graft_dml_mdel_src")
    spark.sql(
      s"""MERGE INTO $v t USING graft_dml_mdel_src s ON t.k = s.k
          WHEN MATCHED THEN DELETE""")
    assert(spark.sql(s"SELECT COUNT(*) FROM $v").head.getLong(0) == 97)
    assert(spark.sql(s"SELECT COUNT(*) FROM $v WHERE k IN (10,11,12)")
      .head.getLong(0) == 0)
    val last = TxLog.history(t).last
    assert(last.op == "merge" && last.remove.length == 1,
      s"a 3-key matched-delete must rewrite 1 of 4 files, removed ${last.remove.length}")
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE deletes and updates unreferenced rows") {
    val t = freshTable("mbys")
    TxLog.append(Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("k", "tag"), t)
    val v = view(t, "graft_dml_mbys")
    Seq((1, "A"), (2, "B")).toDF("k", "tag")
      .createOrReplaceTempView("graft_dml_mbys_src")
    spark.sql(
      s"""MERGE INTO $v t USING graft_dml_mbys_src s ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET tag = s.tag
          WHEN NOT MATCHED BY SOURCE AND t.k = 3 THEN UPDATE SET tag = 'stale'
          WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val rows = spark.sql(s"SELECT k, tag FROM $v ORDER BY k").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows == Map(1 -> "A", 2 -> "B", 3 -> "stale"),
      s"k=4 must delete, k=3 must flag; got $rows")
  }

  test("DML on a versionAsOf view refuses — a pinned past is not a write target") {
    val t = rangeTable("ttdml")
    TxLog.append((200 until 210).toDF("k").withColumn("tag", lit("v2")), t)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_dml_tt " +
      s"USING graft OPTIONS (path '$t', versionAsOf '1')")
    Seq((30, "x")).toDF("k", "tag").createOrReplaceTempView("graft_dml_tt_src")
    for (stmt <- Seq(
      s"DELETE FROM graft_dml_tt WHERE k = 1",
      s"UPDATE graft_dml_tt SET tag = 'z' WHERE k = 1",
      s"""MERGE INTO graft_dml_tt t USING graft_dml_tt_src s ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")) {
      val e = intercept[Exception](spark.sql(stmt))
      assert(e.getMessage.contains("time-travel"), s"statement escaped: $stmt")
    }
    // head unchanged by the refused statements
    assert(TxLog.latestVersion(t) == 2L)
    assert(spark.read.format("graft").load(t).count() == 110)
  }

  test("UPDATE assigning the same column twice refuses") {
    val t = rangeTable("dupset")
    val v = view(t, "graft_dml_dup")
    val e = intercept[Exception](
      spark.sql(s"UPDATE $v SET tag = 'a', tag = 'b' WHERE k = 1"))
    assert(e.getMessage.contains("twice") || e.getMessage.toLowerCase.contains("duplicate"))
  }

  test("DML on non-graft relations is untouched by the rule") {
    // a DELETE against a plain parquet view must still fail with Spark's
    // own v1 error, proving the rule scopes to graft relations only
    val dir = java.nio.file.Files.createTempDirectory("plainpq").toString
    (0 until 5).toDF("k").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("graft_dml_plain")
    val e = intercept[Exception](spark.sql("DELETE FROM graft_dml_plain WHERE k = 1"))
    assert(!e.getMessage.contains("graft"),
      s"plain parquet DML must fail with Spark's own error, got: ${e.getMessage}")
  }
}
