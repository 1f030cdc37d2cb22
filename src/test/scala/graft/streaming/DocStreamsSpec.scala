package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming MinHash-LSH near-dup: single-batch equivalence with the
  * exact batch rule, and cross-micro-batch state persistence (the
  * property the memory-bound design exists for — a bucket's minimum
  * doc_id survives between batches, so a later landing that collides
  * with history is flagged WITHOUT re-reading the corpus). */
class DocStreamsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("one-batch streaming flags equal the exact batch rule") {
    val streamed = DocStreams.neardupEffect(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // batch rule over the SAME stateless band kernel: flagged iff a
    // smaller doc_id shares any (b, key) bucket
    val bands = DocStreams.bandKeys(graft.Tables(spark, dir, "documents"))
    val flagged = bands.as("a").join(bands.as("b"),
        col("a.b") === col("b.b") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("b.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val all = graft.Tables(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    assert(streamed.keySet == all.toSet)
    all.foreach { d =>
      assert(streamed(d) == !flagged(d), s"doc $d: streamed=${streamed(d)}")
    }
    assert(flagged.nonEmpty, "fixture corpus should contain near-dups")
  }

  test("passage stream flags a doc repeating an earlier doc's passage only") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta" // K+W-1 = 7 tokens
    val docs = Seq(
      (10L, s"one two three four five $shared six seven eight nine ten"),
      (20L, s"red orange yellow green blue $shared indigo violet pink gray white"),
      (30L, "entirely different words with no copied passage anywhere in sight at all")
    ).toDF("doc_id", "text")
    // flatMapGroupsWithState requires a streaming Dataset — write a tiny
    // zone and stream it
    val zone = java.nio.file.Files.createTempDirectory("graft-passage-zone").toString
    docs.coalesce(1).write.mode("overwrite").parquet(zone)
    val flags = DocStreams.passageFlags(
      DocStreams.readDocuments(spark, zone, glob = "*.parquet"))
      .toDF("doc_id", "flagged")
    val sink = "graft_passage_spec"
    val q = flags.writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-passage-ckpt").toString)
      .start()
    assert(q.awaitTermination(120000))
    val perDoc = spark.table(sink).groupBy("doc_id")
      .agg(max("flagged").as("f")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!perDoc(10L), "first carrier of the passage keeps")
    assert(perDoc(20L), "the doc repeating the 7-token passage is flagged")
    assert(!perDoc.getOrElse(30L, false), "unrelated doc never flagged")
  }

  test("bucket state persists across micro-batches: a later-landing copy is flagged") {
    import java.nio.file.Files
    val zone = Files.createTempDirectory("graft-neardup-zone").toString
    val ckpt = Files.createTempDirectory("graft-neardup-ckpt").toString
    val docs = graft.Tables(spark, dir, "documents")

    // batch 1: a 20-doc slice of the corpus lands. The sink is a parquet
    // FILE sink (the memory sink cannot recover a checkpoint, and
    // checkpoint recovery IS the property under test).
    val base = docs.orderBy("doc_id").limit(20).localCheckpoint()
    base.coalesce(1).write.mode("append").parquet(zone)
    val out = Files.createTempDirectory("graft-neardup-out").toString
    def drain(): Unit = {
      val q = DocStreams.neardupFlags(
          DocStreams.readDocuments(spark, zone, glob = "*.parquet"))
        .toDF("doc_id", "flagged")
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      assert(q.awaitTermination(120000))
    }
    drain()
    val afterB1 = spark.read.parquet(out).groupBy("doc_id")
      .agg(max("flagged").as("f")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap

    // batch 2: an exact text copy of the smallest doc lands under a NEW
    // larger doc_id — identical signature, so every bucket collides with
    // batch-1 state
    val src = base.orderBy("doc_id").limit(1)
    val copyId = 9000000L
    src.withColumn("doc_id", lit(copyId))
      .coalesce(1).write.mode("append").parquet(zone)
    drain()
    val afterB2 = spark.read.parquet(out).groupBy("doc_id")
      .agg(max("flagged").as("f")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap

    assert(afterB2(copyId), "the later-landing copy must be flagged from state")
    // first-wins: batch-1 verdicts are unchanged by the later landing
    afterB1.foreach { case (d, f) => assert(afterB2(d) == f) }
  }
}
