package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The general MERGE kernel: conditional matched UPDATE/DELETE, multiple
  * WHEN clauses with first-wins order, NOT MATCHED inserts with partial
  * column lists, NOT MATCHED BY SOURCE, exact CDF images from the single
  * committed classification, and the COW/conflict contracts. */
class MergeGeneralSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graftmg_$name").toString

  private def state(t: String): Map[Int, (String, Double)] =
    TxLog.snapshot(spark, t).collect()
      .map(r => r.getAs[Int]("k") -> (r.getAs[String]("tag"), r.getAs[Double]("price")))
      .toMap

  test("conditional UPDATE, conditional DELETE, and INSERT compose; first clause wins") {
    val t = fresh("clauses")
    TxLog.append(Seq(
      (1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)
    ).toDF("k", "tag", "price"), t)
    val src = Seq(
      (1, "A", 99.0),  // matched, src price higher -> update fires
      (2, "B", 5.0),   // matched, src price lower -> falls to DELETE
      (9, "I", 1.0)    // not matched -> insert
    ).toDF("k", "tag", "price")
    TxLog.mergeGeneral(spark, t, src, "k",
      matched = Seq(
        (Some($"__src_price" > $"price"),
          Some(Seq("tag" -> $"__src_tag", "price" -> $"__src_price"))),
        (None, None)), // unconditional DELETE for the rest
      notMatched = Seq(
        (None, Seq("k" -> $"__src_k", "tag" -> $"__src_tag", "price" -> $"__src_price"))))
    assert(state(t) == Map(
      1 -> ("A", 99.0),   // updated by the first clause
      3 -> ("c", 30.0),   // untouched (no source row)
      4 -> ("d", 40.0),
      9 -> ("I", 1.0)))   // inserted; k=2 deleted by the second clause
    assert(TxLog.history(t).last.op == "merge")
  }

  test("unassigned columns: UPDATE carries the target value, INSERT nulls") {
    val t = fresh("partial")
    TxLog.append(Seq((1, "a", 10.0)).toDF("k", "tag", "price"), t)
    val src = Seq((1, "X", 77.0), (2, "Y", 88.0)).toDF("k", "tag", "price")
    TxLog.mergeGeneral(spark, t, src, "k",
      matched = Seq((None, Some(Seq("price" -> $"__src_price")))), // tag unassigned
      notMatched = Seq((None, Seq("k" -> $"__src_k", "tag" -> $"__src_tag"))))
    val rows = TxLog.snapshot(spark, t).collect()
      .map(r => r.getAs[Int]("k") ->
        (r.getAs[String]("tag"), Option(r.get(r.fieldIndex("price"))))).toMap
    assert(rows(1) == ("a", Some(10.0)) || rows(1) == ("a", Some(77.0)))
    assert(rows(1)._1 == "a" && rows(1)._2.contains(77.0),
      "UPDATE must keep unassigned tag and set price")
    assert(rows(2)._1 == "Y" && rows(2)._2.isEmpty,
      "INSERT must null unassigned price")
  }

  test("NOT MATCHED BY SOURCE: retention delete + flagging update") {
    val t = fresh("bysource")
    TxLog.append(Seq(
      (1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0)
    ).toDF("k", "tag", "price"), t)
    // source names the rows to KEEP; everything else deletes unless cheap
    val src = Seq((1, "-", 0.0), (2, "-", 0.0)).toDF("k", "tag", "price")
    TxLog.mergeGeneral(spark, t, src, "k",
      matched = Nil,
      notMatched = Nil,
      notMatchedBySource = Seq(
        (Some($"price" > 3.5), None),                       // delete expensive strays
        (None, Some(Seq("tag" -> lit("stale"))))))          // flag the rest
    assert(state(t) == Map(
      1 -> ("a", 1.0), 2 -> ("b", 2.0),    // matched: kept verbatim (no matched clause)
      3 -> ("stale", 3.0)))                 // 4 deleted, 3 flagged
  }

  test("CDF images classify every clause exactly; feed derives from committed bytes") {
    val t = fresh("cdf")
    TxLog.append(Seq(
      (1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)
    ).toDF("k", "tag", "price"), t)
    val src = Seq((1, "A", 99.0), (2, "B", 0.0), (9, "I", 1.0)).toDF("k", "tag", "price")
    TxLog.mergeGeneral(spark, t, src, "k",
      matched = Seq(
        (Some($"__src_price" > $"price"), Some(Seq("price" -> $"__src_price"))),
        (None, None)),
      notMatched = Seq((None, Seq(
        "k" -> $"__src_k", "tag" -> $"__src_tag", "price" -> $"__src_price"))),
      notMatchedBySource = Seq((Some($"k" === 3), None)))
    val feed = TxLog.changeFeed(spark, t, 1, 2)
    val byType = feed.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map(
      "update_preimage" -> 1L, "update_postimage" -> 1L,
      "delete" -> 2L, "insert" -> 1L), s"got $byType")
    assert(feed.filter($"_change_type" === "delete")
      .select("k").as[Int].collect().toSet == Set(2, 3))
    assert(feed.filter($"_change_type" === "update_postimage")
      .head().getAs[Double]("price") == 99.0)
    assert(feed.filter($"_change_type" === "insert").head().getAs[Int]("k") == 9)
  }

  test("COW boundedness: without BY SOURCE only key-holding files rewrite") {
    val t = fresh("cow")
    TxLog.append((0 until 80).map(i => (i, "x", i.toDouble)).toDF("k", "tag", "price")
      .repartitionByRange(8, $"k").sortWithinPartitions("k"), t)
    TxLog.mergeGeneral(spark, t,
      Seq((5, "u", 0.0)).toDF("k", "tag", "price"), "k",
      matched = Seq((None, Some(Seq("tag" -> lit("u"))))),
      notMatched = Nil)
    val last = TxLog.history(t).last
    assert(last.op == "merge" && last.remove.length == 1,
      s"a one-key merge must rewrite 1 of 8 files, removed ${last.remove.length}")
    assert(state(t)(5)._1 == "u" && state(t)(4)._1 == "x")
  }

  test("refusals: duplicate source keys, nondeterministic source, unknown column") {
    val t = fresh("refuse")
    TxLog.append(Seq((1, "a", 1.0)).toDF("k", "tag", "price"), t)
    val dup = Seq((1, "x", 1.0), (1, "y", 2.0)).toDF("k", "tag", "price")
    val e1 = intercept[IllegalArgumentException](TxLog.mergeGeneral(spark, t, dup, "k",
      matched = Seq((None, None)), notMatched = Nil))
    assert(e1.getMessage.contains("duplicate"))
    val rnd = Seq((2, "r", 0.0)).toDF("k", "tag", "price").withColumn("price", rand())
    val e2 = intercept[IllegalArgumentException](TxLog.mergeGeneral(spark, t, rnd, "k",
      matched = Seq((None, None)), notMatched = Nil))
    assert(e2.getMessage.contains("deterministic"))
    val e3 = intercept[IllegalArgumentException](TxLog.mergeGeneral(spark, t,
      Seq((1, "x", 1.0)).toDF("k", "tag", "price"), "k",
      matched = Seq((None, Some(Seq("nope" -> lit(1))))), notMatched = Nil))
    assert(e3.getMessage.contains("unknown column"))
  }

  test("a source column literally named 'present' is data, not the join marker") {
    val t = fresh("present")
    TxLog.append(Seq((1, "a", 1.0), (2, "b", 2.0)).toDF("k", "tag", "price"), t)
    // renames to __src_present — must NOT collide with the kernel's own
    // src-side marker, which would make the condition true for every row
    val src = Seq((1, true), (2, false)).toDF("k", "present")
    TxLog.mergeGeneral(spark, t, src, "k",
      matched = Seq((Some($"__src_present"), None)), // delete only where present
      notMatched = Nil)
    assert(state(t) == Map(2 -> ("b", 2.0)),
      "only k=1 (present=true) may delete; a marker collision deletes both")
  }

  test("NULL source keys never match: they insert, and two of them are not a dup") {
    val t = fresh("nullkey")
    TxLog.append(Seq((Some(1), "a", 1.0)).toDF("k", "tag", "price"), t)
    val src = Seq(
      (Option.empty[Int], "n1", 10.0),
      (Option.empty[Int], "n2", 20.0),
      (Some(1), "A", 99.0)
    ).toDF("k", "tag", "price")
    TxLog.mergeGeneral(spark, t, src, "k",
      matched = Seq((None, Some(Seq("tag" -> $"__src_tag")))),
      notMatched = Seq((None, Seq(
        "k" -> $"__src_k", "tag" -> $"__src_tag", "price" -> $"__src_price"))))
    val rows = TxLog.snapshot(spark, t).collect()
      .map(r => (Option(r.get(r.fieldIndex("k"))), r.getAs[String]("tag"))).toSet
    assert(rows == Set((Some(1), "A"), (None, "n1"), (None, "n2")),
      s"NULL-key rows are legitimate inserts, got $rows")
    // all-NULL-key source with only NOT MATCHED still fires (not 'empty')
    val t2 = fresh("nullonly")
    TxLog.append(Seq((Some(1), "a", 1.0)).toDF("k", "tag", "price"), t2)
    TxLog.mergeGeneral(spark, t2,
      Seq((Option.empty[Int], "x", 0.0)).toDF("k", "tag", "price"), "k",
      matched = Seq((None, None)),
      notMatched = Seq((None, Seq("k" -> $"__src_k", "tag" -> $"__src_tag"))))
    assert(TxLog.snapshot(spark, t2).count() == 2)
  }

  test("duplicate SET targets in one clause and __-prefixed source columns refuse") {
    val t = fresh("dupset")
    TxLog.append(Seq((1, "a", 1.0)).toDF("k", "tag", "price"), t)
    val e1 = intercept[IllegalArgumentException](TxLog.mergeGeneral(spark, t,
      Seq((1, "x", 0.0)).toDF("k", "tag", "price"), "k",
      matched = Seq((None, Some(Seq("tag" -> lit("A"), "TAG" -> lit("B"))))),
      notMatched = Nil))
    assert(e1.getMessage.contains("twice"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](TxLog.mergeGeneral(spark, t,
      Seq((1, "x")).toDF("k", "__shady"), "k",
      matched = Seq((None, None)), notMatched = Nil))
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
    // per-execution time expressions desynchronize the probe actions
    val e3 = intercept[IllegalArgumentException](TxLog.mergeGeneral(spark, t,
      Seq((1, "x", 0.0)).toDF("k", "tag", "price")
        .filter(current_timestamp().isNotNull), "k",
      matched = Seq((None, None)), notMatched = Nil))
    assert(e3.getMessage.contains("deterministic"), e3.getMessage)
  }

  test("no clause fires -> no-op commit-free merge") {
    val t = fresh("noop")
    TxLog.append(Seq((1, "a", 1.0)).toDF("k", "tag", "price"), t)
    val v = TxLog.mergeGeneral(spark, t,
      Seq((1, "x", 0.0)).toDF("k", "tag", "price"), "k",
      matched = Seq((Some(lit(false)), Some(Seq("tag" -> lit("never"))))),
      notMatched = Seq((Some(lit(false)), Seq("k" -> $"__src_k"))))
    assert(v == 1L && TxLog.latestVersion(t) == 1L,
      "a merge where no clause fires must not commit")
    assert(state(t) == Map(1 -> ("a", 1.0)))
  }
}
