package graft.functions

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** From-scratch byte-pair encoding (Sennrich et al. 2016, public
  * algorithm): learn merge rules from corpus word frequencies, apply
  * them in rank order with left-greedy pairing.
  *
  * Scale design: the corpus-sized work is ONE word-frequency aggregation
  * (groupBy + count — partial-agg shuffle of lowercased words); the
  * merge loop runs driver-side over a BOUNDED top-[[VocabSize]] vocabulary
  * (deterministic under the (count desc, word asc) total order), the
  * same constant-size-model pattern as the unigram-LM/DSIR tier. The
  * learned ruleset is [[NumMerges]] pairs — a broadcast-sized model.
  * Application tokenizes the DISTINCT-words relation (kernel work ∝
  * vocabulary, not corpus) and broadcast-joins counts back.
  *
  * Cross-engine determinism: the DuckDB oracle re-derives the merges
  * with the SAME algorithm expressed relationally — [[trainOracle]]
  * unrolls one CTE block per merge iteration (generated here, like
  * simhashPairCtes, so constants cannot drift). Left-greedy application
  * is exact in SQL: for pair (x,y) with x ≠ y matches are disjoint by
  * construction, and for x = y greedy pairing aligns to even offsets
  * within each maximal run — a run-start parity computable with window
  * functions. Ties in pair counts break on (count desc, left asc,
  * right asc) in both engines.
  */
object Bpe {

  val NumMerges = 8
  val VocabSize = 200
  val WordPattern = "^[a-z]+$"

  final case class Merge(rank: Int, lft: String, rgt: String, count: Long)

  /** One left-greedy merge pass: scan left to right, pairing (l, r)
    * and continuing AFTER each merged token — the canonical semantics. */
  def mergeLeftGreedy(syms: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        b += l + r; i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** Learn `n` merges from a (word, freq) vocabulary. Adjacent pairs are
    * counted at every position (overlaps included) weighted by word
    * frequency; the argmax under (count desc, left asc, right asc) is
    * merged everywhere (left-greedy) before the next round — the
    * published training loop. */
  def learn(vocab: Seq[(String, Long)], n: Int): Seq[Merge] = {
    var segs = vocab.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= n && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      segs.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += Merge(rank, l, r, c)
        segs = segs.map { case (syms, f) => (mergeLeftGreedy(syms, l, r), f) }
        rank += 1
      }
    }
    out.result()
  }

  /** Apply learned merges in rank order, each exhaustively (one
    * left-greedy pass per rule — exhaustive for self-consistent learned
    * rule sequences, where a rule's constituents only exist once all
    * earlier rules have fired). */
  def tokenize(word: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector) {
      case (syms, (l, r)) => mergeLeftGreedy(syms, l, r)
    }

  /** Distributed word count → bounded top-[[VocabSize]] collect (200
    * rows, the nationRows class of bounded driver materialization) →
    * driver-side merge loop. */
  def trainOnCorpus(s: SparkSession, dir: String): Seq[Merge] = {
    val vocab = eligibleWords(s, dir)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w"))
      .limit(VocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    learn(vocab, NumMerges)
  }

  /** (doc_id, w): every eligible word occurrence — lowercased pure-ASCII
    * letter words of 2..20 chars, the same shape [[wordCtes]] mirrors. */
  def eligibleWords(s: SparkSession, dir: String) =
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .select(col("doc_id"), lower(col("t")).as("w"))
      .filter(col("w").rlike(WordPattern) && length(col("w")).between(2, 20))

  // --------------------------------------------------------- oracle SQL

  /** Character segmentation of a `w` column into list `l`. */
  private def charSeg(from: String, extra: String): String =
    s"SELECT w$extra, list_transform(generate_series(1, LENGTH(w)), i -> SUBSTR(w, i, 1)) AS l FROM $from"

  /** The eligible-word CTEs: `wall` (doc_id, w — every occurrence) and
    * `w0` (top-VocabSize vocabulary with frequencies). */
  private def wordCtes: String =
    s"""wall AS MATERIALIZED (
       |  SELECT doc_id, LOWER(t) AS w FROM (
       |    SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS t
       |    FROM documents)
       |  WHERE regexp_matches(LOWER(t), '$WordPattern')
       |    AND LENGTH(LOWER(t)) BETWEEN 2 AND 20),
       |w0 AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM wall
       |  GROUP BY w ORDER BY f DESC, w LIMIT $VocabSize),
       |seg0 AS MATERIALIZED (${charSeg("w0", ", f")})""".stripMargin

  /** One merge-application block over `<p>seg{k-1}` → `<p>seg{k}`,
    * applying the pair in `m{k}`. Left-greedy exactness: x ≠ y matches
    * are disjoint (a match consumes both positions and y ≠ x blocks
    * chaining); x = y runs pair greedily from the run start, i.e. a
    * position merges iff its offset in the maximal run is even — the
    * run-start parity below. A position following a merge start is the
    * consumed right half and drops out. */
  private def applyStep(p: String, k: Int, carryF: Boolean): String = {
    val f = if (carryF) ", f" else ""
    val fAgg = if (carryF) ", MAX(f) AS f" else ""
    s"""${p}pos$k AS MATERIALIZED (
       |  SELECT w$f, l, UNNEST(generate_series(1, len(l))) AS i FROM ${p}seg${k - 1}),
       |${p}sym$k AS (
       |  SELECT w$f, l, i, l[i] AS s,
       |         (SELECT lft FROM m$k) AS mx, (SELECT rgt FROM m$k) AS my
       |  FROM ${p}pos$k),
       |${p}run$k AS (
       |  SELECT *, CASE WHEN s = mx
       |    THEN i - ROW_NUMBER() OVER (PARTITION BY w, (s = mx) ORDER BY i) END AS grp
       |  FROM ${p}sym$k),
       |${p}mk$k AS (
       |  SELECT *, (s = mx AND i < len(l) AND l[i+1] = my AND
       |             (mx != my OR ROW_NUMBER() OVER (PARTITION BY w, grp ORDER BY i) % 2 = 1)) AS mstart
       |  FROM ${p}run$k),
       |${p}nb$k AS (
       |  SELECT w$f, i,
       |         CASE WHEN mstart THEN s || my
       |              WHEN COALESCE(LAG(mstart) OVER (PARTITION BY w ORDER BY i), FALSE) THEN NULL
       |              ELSE s END AS ns
       |  FROM ${p}mk$k),
       |${p}seg$k AS MATERIALIZED (
       |  SELECT w$fAgg, LIST(ns ORDER BY i) FILTER (WHERE ns IS NOT NULL) AS l
       |  FROM ${p}nb$k GROUP BY w)""".stripMargin
  }

  /** Training iteration k: count pairs over `seg{k-1}`, pick the argmax
    * into `m{k}`, apply it into `seg{k}`. */
  private def trainStep(k: Int): String =
    s"""pr$k AS MATERIALIZED (
       |  SELECT s1, s2, CAST(SUM(f) AS BIGINT) AS c FROM (
       |    SELECT f, l[i] AS s1, l[i+1] AS s2 FROM (
       |      SELECT f, l, UNNEST(generate_series(1, len(l) - 1)) AS i FROM seg${k - 1}))
       |  GROUP BY s1, s2),
       |m$k AS MATERIALIZED (SELECT $k AS rank, s1 AS lft, s2 AS rgt, c FROM pr$k
       |        ORDER BY c DESC, s1, s2 LIMIT 1),
       |${applyStep("", k, carryF = true)}""".stripMargin

  private def trainCtes: String =
    (wordCtes +: (1 to NumMerges).map(trainStep)).mkString(",\n")

  /** Oracle for `text_bpe_train`: the full unrolled training chain. */
  def trainOracle: String =
    s"""WITH $trainCtes
       |SELECT rank, lft, rgt, lft || rgt AS merged, c AS pair_count
       |FROM (${(1 to NumMerges).map(k => s"SELECT * FROM m$k").mkString(" UNION ALL ")})
       |ORDER BY rank""".stripMargin

  /** Training chain + application over the DISTINCT eligible words,
    * ending in `tok(w, n_tok)` — the shared prefix of every
    * application-side oracle. */
  private def fullChainCtes: String = {
    val applyChain = (s"""aw AS MATERIALIZED (SELECT DISTINCT w FROM wall),
       |aseg0 AS MATERIALIZED (${charSeg("aw", "")})""".stripMargin +:
      (1 to NumMerges).map(k => applyStep("a", k, carryF = false))).mkString(",\n")
    s"""$trainCtes,
       |$applyChain,
       |tok AS (SELECT w, CAST(len(l) AS BIGINT) AS n_tok FROM aseg$NumMerges)""".stripMargin
  }

  /** Oracle for `text_bpe_apply`: the training chain (to re-derive the
    * rules) + application over the DISTINCT eligible words + the per-doc
    * rollup. */
  def applyOracle: String =
    s"""WITH $fullChainCtes
       |SELECT doc_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_words,
       |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |       CAST(SUM(LENGTH(w)) AS BIGINT) AS n_chars
       |FROM wall JOIN tok USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Oracle for `text_bpe_fertility`: tokens-per-word by language — the
    * standard multilingual tokenizer-evaluation metric (a language whose
    * words fragment into many subwords pays more sequence length per
    * word of content). */
  def fertilityOracle: String =
    s"""WITH $fullChainCtes,
       |wl AS (
       |  SELECT wall.w, d.lang FROM wall JOIN documents d USING (doc_id))
       |SELECT lang,
       |       CAST(COUNT(*) AS BIGINT) AS n_words,
       |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |       ROUND(CAST(SUM(n_tok) AS DOUBLE) / COUNT(*), 6) AS fertility
       |FROM wl JOIN tok USING (w)
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** Oracle for `text_pack_bpe`: per-doc BPE token counts feeding the
    * text_pack greedy 512-token binning (docs with no eligible words
    * pack at zero length, hence the LEFT JOIN). */
  def packOracle: String =
    s"""WITH $fullChainCtes,
       |perdoc AS (
       |  SELECT doc_id, CAST(SUM(n_tok) AS BIGINT) AS bpe_tok
       |  FROM wall JOIN tok USING (w) GROUP BY doc_id),
       |d AS (
       |  SELECT d0.doc_id, d0.source, COALESCE(p.bpe_tok, 0) AS n_tok
       |  FROM documents d0 LEFT JOIN perdoc p ON d0.doc_id = p.doc_id),
       |c AS (
       |  SELECT doc_id, source, n_tok,
       |         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
       |  FROM d)
       |SELECT source,
       |       CAST(FLOOR((cum - n_tok) / 512.0) AS BIGINT) AS bin,
       |       COUNT(*) AS n_docs,
       |       CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
       |       MIN(doc_id) AS first_doc,
       |       MAX(doc_id) AS last_doc
       |FROM c GROUP BY source, bin ORDER BY source, bin""".stripMargin
}
