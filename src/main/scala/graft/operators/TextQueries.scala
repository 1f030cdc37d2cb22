package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis over `documents` (SURVEY.md §2.12): quality stats, token
  * counting (whitespace + BPE-ish regex), tf-idf, fingerprinting, language
  * heuristic. All per-row work is codegen'd built-ins (no UDFs); the only
  * shuffles are the tf-idf groupBys, keyed on compact (term) / (doc_id)
  * columns — linear at 100 TB.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  private val toks = split(trim(col("text")), "\\s+")

  /** BPE-ish word/number/punct tokenizer, shared Spark + DuckDB regex. */
  private val BpeRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "text_stats", // quality-score signals: lengths / ratios / token counts
      (s, dir) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            length(col("text")).as("n_chars_computed"),
            size(toks).as("n_ws_tokens"),
            size(regexp_extract_all(col("text"), lit(BpeRe), lit(0))).as("n_bpe_tokens"),
            round(
              length(regexp_replace(col("text"), "[^\\p{Punct}]", "")).cast("double") /
                length(col("text")), 6).as("punct_ratio"),
            round(
              size(expr("filter(split(trim(text), '\\\\s+'), t -> t IN ('the','a','of','and','to','in'))"))
                .cast("double") / size(toks), 6).as("stopword_ratio"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
                      CAST(LENGTH(text) AS INT) AS n_chars_computed,
                      CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS INT) AS n_ws_tokens,
                      CAST(LEN(REGEXP_EXTRACT_ALL(text, '$BpeRe')) AS INT) AS n_bpe_tokens,
                      ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
                            / LENGTH(text), 6) AS punct_ratio,
                      ROUND(CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                                                 t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
                            / LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')), 6) AS stopword_ratio
               FROM documents ORDER BY doc_id""")),

    // Document fingerprint: digest of whitespace-normalized lowercased text.
    // Identical md5 on both engines → exact hash-match oracle.
    QuerySpec(
      "text_fingerprint",
      (s, dir) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fingerprint"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS fingerprint
              FROM documents ORDER BY doc_id""")),

    // tf-idf: explode → tf per (doc, term); df per term over a broadcastable
    // term dictionary; idf = ln((N+1)/(df+1)). Rounded before output.
    QuerySpec(
      "text_tfidf",
      (s, dir) => {
        val d = docs(s, dir)
        val n = d.count() // table-size scalar; at scale: computed once, broadcast
        val terms = d
          .select(col("doc_id"), explode(toks).as("term"))
        val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = terms.select("doc_id", "term").distinct()
          .groupBy("term").agg(count(lit(1)).as("df"))
        tf.join(broadcast(df), "term")
          .select(
            col("doc_id"), col("term"), col("tf"),
            round(col("tf") * log((lit(n) + 1.0) / (col("df") + 1.0)), 6).as("tfidf"))
          .orderBy("doc_id", "term")
      },
      Some("""WITH terms AS (
                SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS term
                FROM documents),
              tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
              df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY term),
              n AS (SELECT COUNT(*) AS n FROM documents)
              SELECT doc_id, term, tf,
                     ROUND(tf * LN((n.n + 1.0) / (df.df + 1.0)), 6) AS tfidf
              FROM tf JOIN df USING (term) CROSS JOIN n
              ORDER BY doc_id, term"""))
  )
}
