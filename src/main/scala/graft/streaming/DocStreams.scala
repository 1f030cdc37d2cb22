package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming near-duplicate detection over the `documents`
  * corpus — the streaming half of the MinHash-LSH dedup tier
  * (`DedupQueries.minhashPairs` is its batch twin): documents arriving on
  * an unbounded source are flagged as near-duplicates of PREVIOUSLY seen
  * documents, continuously, without ever re-scanning the corpus.
  *
  * Streaming-first design points:
  *  - The signature is computed STATELESS, per row (split → shingle →
  *    md5-bridge hash → 16 min-folds as higher-order functions), because
  *    a streaming plan can carry at most one stateful operator cheaply
  *    and the one that matters is the bucket state. Exactly the same
  *    permutation family as the MinHashSig UDAF — `(2i+1)·h + 7919i
  *    mod P` — so batch and stream agree bit-for-bit.
  *  - State is ONE long (the minimum doc_id ever seen) per occupied LSH
  *    band bucket, via flatMapGroupsWithState. That is the minimal
  *    possible near-dup memory: 8 bytes per distinct (band, key), and
  *    buckets an adversarial corpus cannot grow faster than the corpus
  *    itself. No signatures, no texts, no pair lists are retained.
  *  - The only shuffle carries (bucket, doc_id) pairs — compact strings +
  *    longs, never document text.
  *
  * Dedup semantics: a document is FLAGGED iff some band bucket it lands
  * in already holds (or concurrently receives) a document with a smaller
  * doc_id. Within one micro-batch this is exactly the batch rule
  * "∃ d' < d sharing a band"; across micro-batches it degrades to
  * first-wins (an earlier-arriving larger doc_id keeps its `kept` verdict
  * — streaming cannot retract emitted rows), with the deterministic
  * min-doc_id tiebreak inside each batch. The AvailableNow drain the
  * oracle checks processes the corpus as one batch, so the oracle is the
  * exact batch rule.
  */
object DocStreams {

  /** Streaming read of the documents parquet (schema from the batch
    * loader; `glob` widens to `*.parquet` for landing-zone tests). */
  def readDocuments(spark: SparkSession, dir: String,
      glob: String = "documents.parquet"): DataFrame = {
    val batchSchema =
      spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", glob)
      .parquet(dir)
  }

  /** Stateless per-row LSH band keys `(doc_id, b, key)`: 3-shingle md5
    * hashes (the HashBridge form, so DuckDB reproduces them), 16
    * min-fold signature rows, 8 bands of 2 signature rows each — all in
    * ONE compiled pass via the native [[graft.functions.MinHashBandKeys]]
    * expression (the composed HOF form ran 16 interpreted array passes
    * per row and measured ~9 s of the query's 10 s at sf0.1). Documents
    * with fewer than 3 tokens produce no shingles and explode away here —
    * they cannot near-duplicate anything and are `kept` by definition
    * downstream. */
  def bandKeys(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        graft.functions.MinHashBandKeys(split(trim(col("text")), "\\s+")).as("keys"))
      .select(col("doc_id"), posexplode(col("keys")).as(Seq("b", "key")))

  /** Per-bucket first-wins flagging: state is the minimum doc_id ever
    * seen in the bucket; each arriving doc emits `(doc_id, flagged)` with
    * flagged ⇔ a smaller doc_id exists in state or in the same batch. */
  private def flagGroup(bucket: String, rows: Iterator[(String, Long)],
      state: GroupState[Long]): Iterator[(Long, Boolean)] = {
    val ds = rows.map(_._2).toArray.sorted
    if (ds.isEmpty) Iterator.empty
    else {
      val prior = if (state.exists) Some(state.get) else None
      state.update(math.min(prior.getOrElse(Long.MaxValue), ds.head))
      ds.iterator.map(d => (d, prior.exists(_ < d) || d > ds.head))
    }
  }

  /** The streaming flag relation `(doc_id, flagged)` over a streaming
    * documents source — one stateful operator keyed by band bucket. */
  def neardupFlags(docs: DataFrame): Dataset[(Long, Boolean)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandKeys(docs)
      .select(concat_ws(":", col("b"), col("key")).as("_1"),
        col("doc_id").as("_2"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(flagGroup)
  }

  /** Streaming PASSAGE-level flags `(doc_id, flagged)` — the winnowing
    * twin of [[neardupFlags]]: stateless per-row winnow fingerprints
    * (the same native WinnowFingerprint kernel the batch queries run),
    * the same single min-doc_id-per-bucket stateful operator keyed by
    * fingerprint hash. A document is flagged iff it repeats ANY
    * passage fingerprint an earlier document already carried — the
    * streaming boilerplate filter: 8 bytes of state per distinct
    * passage, no texts retained. */
  def passageFlags(docs: DataFrame): Dataset[(Long, Boolean)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"),
        graft.functions.WinnowFingerprint(split(trim(col("text")), "\\s+")).as("fp"))
      .select(col("doc_id"), explode(col("fp")).as("f"))
      .select(col("f.h").cast("string").as("_1"), col("doc_id").as("_2"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(flagGroup)
  }

  /** `stream_passage_dedup`: [[passageFlags]] executed with the same
    * AvailableNow drain + batch-corpus re-join contract as
    * [[neardupEffect]] — the single-batch drain makes streaming
    * first-wins coincide with the exact batch rule "flagged ⇔ ∃ smaller
    * doc_id sharing a winnow fingerprint", which DuckDB recomputes from
    * the shared WinnowCtes chain. */
  def passageDedupEffect(spark: SparkSession, dir: String): DataFrame =
    drainFlags(spark, dir, passageFlags(readDocuments(spark, dir)), "passage")

  /** `stream_neardup_minhash`: the streaming dedup EXECUTED (readStream →
    * flatMapGroupsWithState → AvailableNow drain into a memory sink) and
    * made oracle-visible: survivors are re-joined to the batch corpus so
    * shingle-less docs surface as kept, and DuckDB recomputes the exact
    * batch rule from the same generated band CTEs. The memory sink is
    * the verification surface only — production writes [[neardupFlags]]
    * to a real sink and filters on it. */
  def neardupEffect(spark: SparkSession, dir: String): DataFrame =
    drainFlags(spark, dir, neardupFlags(readDocuments(spark, dir)), "neardup")

  /** Shared drain: AvailableNow into a memory sink (the verification
    * surface — production writes the flag relation to a real sink),
    * per-doc OR over bucket verdicts, survivors re-joined to the batch
    * corpus so fingerprint-less docs surface as kept. */
  private def drainFlags(spark: SparkSession, dir: String,
      flagDs: Dataset[(Long, Boolean)], tag: String): DataFrame = {
    val flags = flagDs.toDF("doc_id", "flagged")
    val sink = s"graft_${tag}_${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"
    val q = flags.writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"graft-ckpt-$tag").toString)
      .start()
    require(q.awaitTermination(120000),
      "streaming drain timed out - partial sink contents would masquerade as results")
    val perDoc = spark.table(sink)
      .groupBy("doc_id")
      .agg(max(col("flagged")).as("flagged"))
    graft.Tables(spark, dir, "documents")
      .select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(!col("flagged"), lit(true)).as("kept"))
      .orderBy("doc_id")
  }
}
