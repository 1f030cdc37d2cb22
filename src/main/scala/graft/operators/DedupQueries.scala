package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (SURVEY.md §2.12, extension
  * surface for LLM training-data pipelines).
  *
  * Scale design: every variant shuffles compact keys (md5 digests / minhash
  * signatures), never full document text. Exact dedup groups by content hash;
  * near-dup variants generate bounded candidate pairs (LSH band buckets)
  * before any pairwise verification, so work is O(candidates), not O(n²).
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Tokens of the trimmed text, whitespace-split (matches DuckDB
    * string_split_regex(trim(text), '\s+')). */
  private val toks = split(trim(col("text")), "\\s+")

  def specs: Seq[QuerySpec] = Seq(

    // Exact dedup: group by content digest, keep the smallest doc_id.
    // Shuffles 16-byte md5 keys, not document bodies — the 100 TB shape.
    QuerySpec(
      "dedup_exact",
      (s, dir) =>
        docs(s, dir)
          .groupBy(md5(col("text")).as("content_hash"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .select("keep_id", "n_copies")
          .orderBy("keep_id"),
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
              FROM documents GROUP BY MD5(text) ORDER BY keep_id"""))
  )
}
