package graft.functions

import org.apache.spark.sql.SparkSession

/** From-scratch unigram-LM subword tokenizer (Kudo 2018, the
  * SentencePiece unigram model — the other published tokenizer family a
  * data pipeline meets beside BPE): score candidate pieces by
  * occurrence-weighted frequency, turn scores into integer Viterbi
  * costs, and segment every word with the minimum-cost decomposition.
  *
  * Scale design mirrors [[Bpe]]: the corpus-sized work is the ONE
  * word-frequency aggregation (shared — [[Bpe.eligibleWords]]); piece
  * scoring and Viterbi run driver-side over the bounded
  * top-[[Bpe.VocabSize]] vocabulary, and the result is a
  * broadcast-sized (≤ [[CandSize]] + alphabet) piece table. Application
  * tokenizes the distinct-words relation and broadcast-joins back —
  * kernel work ∝ vocabulary, never corpus.
  *
  * Cross-engine determinism: costs live on the integer grid
  * round(round(−ln(score/total), 6) · 1e6) (the proven unigram_logprob
  * bridge, [[DuckRound]] replicating DuckDB's ROUND); the Viterbi
  * tie-break is the total order (cost asc, piece-count asc,
  * space-joined-path asc) — pieces are pure ASCII `[a-z]+`, so Scala
  * UTF-16 and DuckDB UTF-8 byte comparisons agree. The DuckDB oracle
  * replays candidate scoring relationally and unrolls the Viterbi DP as
  * one generated CTE block per prefix length (the Bpe.trainOracle
  * stance: generated here so constants cannot drift).
  */
object UnigramTokenizer {

  /** Max piece length — SentencePiece seeds substrings up to a cap. */
  val MaxPiece = 4

  /** Multi-char candidate pieces kept (plus every single char for
    * coverage — the published model never drops the alphabet). */
  val CandSize = 64

  private val MaxWord = 20 // eligibleWords' upper length bound

  /** Candidate pieces over the bounded vocabulary: every substring of
    * length 1..MaxPiece of every vocab word, score = Σ word-freq per
    * occurrence position; all single chars kept, top-CandSize
    * multi-char by (score desc, piece asc). */
  def candidates(vocab: Seq[(String, Long)]): Seq[(String, Long)] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    vocab.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(i + MaxPiece, w.length)) {
          val p = w.substring(i, j)
          counts(p) = counts.getOrElse(p, 0L) + f
          j += 1
        }
        i += 1
      }
    }
    val singles = counts.toSeq.filter(_._1.length == 1)
    val multis = counts.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }.take(CandSize)
    (singles ++ multis).sortBy(_._1)
  }

  /** Integer Viterbi costs: round(round(−ln(score/total), 6) · 1e6),
    * total = Σ over ALL kept pieces — the decimal-grid bridge both
    * engines replay exactly. */
  def costs(cands: Seq[(String, Long)]): Map[String, Long] = {
    val total = cands.map(_._2).sum.toDouble
    cands.map { case (p, c) =>
      p -> math.round(DuckRound.round6(-math.log(c / total)) * 1e6)
    }.toMap
  }

  /** Minimum-cost segmentation; ties break (piece-count asc, then
    * space-joined path asc). Returns None when some prefix has no
    * decomposition (a char outside the piece table). */
  def viterbi(w: String, cost: Map[String, Long]): Option[Vector[String]] =
    viterbiWith(w, cost.get _)

  /** [[viterbi]] with a single-char UNK fallback cost, so EVERY word
    * segments (the SentencePiece byte-fallback stance at char
    * granularity): unknown single chars cost `unkCost`; unknown
    * multi-char pieces stay unusable. */
  def viterbiAll(w: String, cost: Map[String, Long], unkCost: Long): Vector[String] =
    viterbiWith(w, p => cost.get(p)
      .orElse(if (p.length == 1) Some(unkCost) else None))
      .getOrElse(throw new IllegalStateException(s"unsegmentable '$w'"))

  private def viterbiWith(w: String,
      costOf: String => Option[Long]): Option[Vector[String]] = {
    final case class St(cost: Long, n: Int, path: String, pieces: List[String])
    def better(a: St, b: St): Boolean =
      a.cost < b.cost || (a.cost == b.cost &&
        (a.n < b.n || (a.n == b.n && a.path < b.path)))
    val dp = new Array[St](w.length + 1)
    dp(0) = St(0L, 0, "", Nil)
    var i = 1
    while (i <= w.length) {
      var best: St = null
      var j = math.max(0, i - MaxPiece)
      while (j < i) {
        if (dp(j) != null) {
          val piece = w.substring(j, i)
          costOf(piece) match {
            case Some(c) =>
              val cand = St(dp(j).cost + c, dp(j).n + 1,
                if (dp(j).path.isEmpty) piece else dp(j).path + " " + piece,
                piece :: dp(j).pieces)
              if (best == null || better(cand, best)) best = cand
            case None => ()
          }
        }
        j += 1
      }
      dp(i) = best
      i += 1
    }
    Option(dp(w.length)).map(_.pieces.reverse.toVector)
  }

  /** Bounded model from the corpus: ONE distributed word-frequency
    * aggregation → top-VocabSize collect (the Bpe.trainOnCorpus class of
    * bounded driver materialization) → candidate scoring. Returns
    * (vocabulary with freqs, piece → integer cost, candidate score
    * total — the denominator the UNK fallback cost derives from). */
  def model(s: SparkSession, dir: String)
      : (Seq[(String, Long)], Map[String, Long], Long) = {
    import org.apache.spark.sql.functions._
    val vocab = Bpe.eligibleWords(s, dir)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w"))
      .limit(Bpe.VocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val cands = candidates(vocab)
    (vocab, costs(cands), cands.map(_._2).sum)
  }

  /** UNK fallback = the cost of a score-1 piece under the model total —
    * deterministic and SQL-replayable like every other cost. */
  def unkCost(total: Long): Long =
    math.round(DuckRound.round6(-math.log(1.0 / total.toDouble)) * 1e6)

  /** Viterbi-segment the vocabulary and count occurrence-weighted piece
    * usage — the trained model relation (piece, usage, cost). */
  def trainOnCorpus(s: SparkSession, dir: String): Seq[(String, Long, Long)] = {
    val (vocab, cost, _) = model(s, dir)
    val usage = scala.collection.mutable.Map.empty[String, Long]
    vocab.foreach { case (w, f) =>
      viterbi(w, cost).getOrElse(
        throw new IllegalStateException(s"vocab word '$w' unsegmentable"))
        .foreach(p => usage(p) = usage.getOrElse(p, 0L) + f)
    }
    usage.toSeq.map { case (p, u) => (p, u, cost(p)) }
      .sortBy { case (p, u, _) => (-u, p) }
  }

  // --------------------------------------------------------- oracle SQL

  /** Shared CTEs: eligible words (`wall`), bounded vocab (`w0`),
    * candidate pieces (`kept`), integer costs (`pc`), and the unrolled
    * Viterbi DP `dp1..dp20` whose level-k rows hold THE best
    * decomposition of each word's k-prefix. */
  private def modelCtes: String =
    s"""wall AS MATERIALIZED (
       |  SELECT doc_id, LOWER(t) AS w FROM (
       |    SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS t
       |    FROM documents)
       |  WHERE regexp_matches(LOWER(t), '${Bpe.WordPattern}')
       |    AND LENGTH(LOWER(t)) BETWEEN 2 AND 20),
       |w0 AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM wall
       |  GROUP BY w ORDER BY f DESC, w LIMIT ${Bpe.VocabSize}),
       |sub AS MATERIALIZED (
       |  SELECT SUBSTR(w, i, l) AS p, CAST(SUM(f) AS BIGINT) AS c
       |  FROM w0,
       |       (SELECT UNNEST(GENERATE_SERIES(1, $MaxWord)) AS i),
       |       (SELECT UNNEST(GENERATE_SERIES(1, $MaxPiece)) AS l)
       |  WHERE i + l - 1 <= LENGTH(w)
       |  GROUP BY 1),
       |kept AS MATERIALIZED (
       |  SELECT p, c FROM sub WHERE LENGTH(p) = 1
       |  UNION ALL
       |  SELECT p, c FROM (
       |    SELECT p, c, ROW_NUMBER() OVER (ORDER BY c DESC, p) AS rn
       |    FROM sub WHERE LENGTH(p) > 1) WHERE rn <= $CandSize),
       |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM kept),
       |pc AS MATERIALIZED (
       |  SELECT p,
       |         CAST(ROUND(ROUND(-LN(c / t), 6) * 1e6, 0) AS BIGINT) AS cost
       |  FROM kept, tot)""".stripMargin

  /** Unrolled Viterbi DP over `rel(w, f)` against piece table
    * `pieces(p, cost)`: levels `<pre>dp1..dp20`, final `<pre>seg`. Level
    * k holds THE best decomposition of each word's k-prefix;
    * ROW_NUMBER's (cost, n, path) order IS the Scala tie-break. */
  private def dpCtes(rel: String, pieces: String, pre: String): String = {
    val dp0 = s"""${pre}dp0 AS (SELECT w, f, 0 AS pos, CAST(0 AS BIGINT) AS cost,
       |               0 AS n, '' AS path FROM $rel)""".stripMargin
    val levels = (1 to MaxWord).map { k =>
      val froms = (math.max(0, k - MaxPiece) until k)
        .map(j => s"SELECT * FROM ${pre}dp$j").mkString(" UNION ALL ")
      s"""${pre}dp$k AS MATERIALIZED (
         |  SELECT w, f, pos, cost, n, path FROM (
         |    SELECT u.w, u.f, $k AS pos,
         |           u.cost + $pieces.cost AS cost, u.n + 1 AS n,
         |           CASE WHEN u.path = '' THEN $pieces.p
         |                ELSE u.path || ' ' || $pieces.p END AS path,
         |           ROW_NUMBER() OVER (PARTITION BY u.w ORDER BY
         |             u.cost + $pieces.cost, u.n + 1,
         |             CASE WHEN u.path = '' THEN $pieces.p
         |                  ELSE u.path || ' ' || $pieces.p END) AS rn
         |    FROM ($froms) u
         |    JOIN $pieces ON $pieces.p = SUBSTR(u.w, u.pos + 1, $k - u.pos)
         |    WHERE LENGTH(u.w) >= $k) WHERE rn = 1)""".stripMargin
    }
    val seg = s"""${pre}seg AS MATERIALIZED (
       |  SELECT w, f, n, path FROM (${(1 to MaxWord)
        .map(k => s"SELECT * FROM ${pre}dp$k").mkString(" UNION ALL ")})
       |  WHERE pos = LENGTH(w))""".stripMargin
    (dp0 +: levels :+ seg).mkString(",\n")
  }

  /** Oracle for `text_sp_unigram_train`: piece usage counts over the
    * Viterbi-segmented vocabulary. */
  def trainOracle: String =
    s"""WITH $modelCtes,
       |${dpCtes("w0", "pc", "")},
       |usage AS (SELECT UNNEST(STRING_SPLIT(path, ' ')) AS piece, f FROM seg)
       |SELECT piece, CAST(SUM(f) AS BIGINT) AS cnt
       |FROM usage GROUP BY piece
       |ORDER BY cnt DESC, piece""".stripMargin

  /** Distinct corpus words + UNK-extended piece table + the apply DP —
    * the total-coverage segmentation chain applyOracle and
    * fertilityOracle share. */
  private def applyChainCtes: String =
    s"""dw AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM wall GROUP BY w),
       |unkpc AS (
       |  SELECT p, CAST(ROUND(ROUND(-LN(1.0 / t), 6) * 1e6, 0) AS BIGINT) AS cost
       |  FROM (SELECT DISTINCT SUBSTR(w, i, 1) AS p
       |        FROM (SELECT w, UNNEST(GENERATE_SERIES(1, LENGTH(w))) AS i FROM dw)
       |        WHERE SUBSTR(w, i, 1) NOT IN (SELECT p FROM pc)), tot),
       |pcall AS MATERIALIZED (
       |  SELECT p, cost FROM pc UNION ALL SELECT p, cost FROM unkpc),
       |${dpCtes("dw", "pcall", "a")}""".stripMargin

  /** Oracle for `text_sp_unigram_apply`: per-document token accounting
    * over EVERY eligible word — corpus chars outside the piece table
    * fall back to score-1 single-char UNK pieces (the byte-fallback
    * stance at char granularity), so coverage is total on both sides. */
  def applyOracle: String =
    s"""WITH $modelCtes,
       |$applyChainCtes
       |SELECT doc_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_words,
       |       CAST(SUM(n) AS BIGINT) AS n_tokens,
       |       CAST(SUM(LENGTH(w)) AS BIGINT) AS n_chars
       |FROM wall JOIN aseg USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Oracle for `text_sp_unigram_fertility`: tokens-per-word by
    * LANGUAGE over the same total-coverage segmentation — the
    * multilingual tokenizer-evaluation metric, unigram twin of
    * Bpe.fertilityOracle. */
  def fertilityOracle: String =
    s"""WITH $modelCtes,
       |$applyChainCtes,
       |wl AS (
       |  SELECT wall.w, d.lang FROM wall JOIN documents d USING (doc_id))
       |SELECT lang,
       |       CAST(COUNT(*) AS BIGINT) AS n_words,
       |       CAST(SUM(n) AS BIGINT) AS n_tokens,
       |       ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6) AS fertility
       |FROM wl JOIN aseg USING (w)
       |GROUP BY lang ORDER BY lang""".stripMargin
}
