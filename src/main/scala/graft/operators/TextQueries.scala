package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  // ---- text_classifier_gate fixture model: 64 hashed-feature weights in
  // [-500, 500], derived from the md5 grid so every build regenerates the
  // identical "trained" parameters. Both engines receive them as the SAME
  // literal array — exactly how real trained weights would ship (a
  // broadcast constant), so swapping in a real model changes no plan.
  private val ClfDim = 64
  private[operators] val ClfW: IndexedSeq[Long] = (0 until ClfDim).map { i =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"w#$i".getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 1001L - 500L
  }

  /** Contamination kernel behind `text_decontaminate`, parameterized on
    * the eval-set membership predicate so the spec can plant a synthetic
    * benchmark. Returns (doc_id, n_shared) for every non-eval doc sharing
    * ≥1 4-token shingle with the eval slice. */
  private[operators] def contamination(d: DataFrame, isEval: Column): DataFrame = {
    // ONE pass over the corpus builds the hashed 4-gram relation with an
    // eval flag; localCheckpoint because it feeds both join sides and
    // Spark physical plans never share subtrees — without the barrier the
    // tokenize+explode+md5 pipeline (the dominant cost) runs twice, once
    // per side. At 100 TB the eval slice is the tiny side by construction
    // (benchmark suites are ~10⁴ docs), so its distinct gram set
    // broadcasts and the corpus side never shuffles at all.
    val grams = d
      .select(col("doc_id"), isEval.as("ev"), toks.as("t"))
      .filter(size(col("t")) >= 4)
      .select(col("doc_id"), col("ev"),
        explode(expr(
          "transform(sequence(0, size(t)-4), i -> concat(t[i],' ',t[i+1],' ',t[i+2],' ',t[i+3]))")).as("g"))
      .select(col("doc_id"), col("ev"), graft.functions.HashBridge.h32(col("g")).as("h"))
      .localCheckpoint()
    val ev = grams.filter(col("ev")).select("h").distinct()
    grams.filter(!col("ev"))
      .join(broadcast(ev), "h")
      .groupBy("doc_id")
      .agg(countDistinct(col("h")).as("n_shared"))
      .orderBy("doc_id")
  }

  /** Bloom-pruned twin of [[contamination]] (`q:text_decontaminate_bloom`):
    * same gram relation, but the corpus side is prefiltered by a
    * constant-size Bloom filter over the eval grams before the exact
    * join removes the filter's false positives — identical output, no
    * dependence on the eval set fitting a broadcast hash relation. */
  private[operators] def contaminationBloom(d: DataFrame, isEval: Column): DataFrame = {
    import graft.functions.{BloomAgg, BloomFilter}
    val s = d.sparkSession
    import s.implicits._
    val grams = d
      .select(col("doc_id"), isEval.as("ev"), toks.as("t"))
      .filter(size(col("t")) >= 4)
      .select(col("doc_id"), col("ev"),
        explode(expr(
          "transform(sequence(0, size(t)-4), i -> concat(t[i],' ',t[i+1],' ',t[i+2],' ',t[i+3]))")).as("g"))
      .select(col("doc_id"), col("ev"), graft.functions.HashBridge.h32(col("g")).as("h"))
      .localCheckpoint()
    val ev = grams.filter(col("ev")).select("h").distinct()
    val (h1, h2) = BloomFilter.hashPair(col("h"))
    val bloom = ev.select(h1.as("h1"), h2.as("h2")).as[(Long, Long)]
      .select(BloomAgg.toColumn.name("bloom")).toDF("bloom")
    grams.filter(!col("ev"))
      .crossJoin(broadcast(bloom))
      .filter(BloomFilter.mightContain(col("bloom"), col("h")))
      .drop("bloom")
      .join(broadcast(ev), "h") // exact: Bloom false positives die here
      .groupBy("doc_id")
      .agg(countDistinct(col("h")).as("n_shared"))
      .orderBy("doc_id")
  }

  // ---- language-ID decision chain, shared by text_langid (classifier
  // output) and text_quality_filter (en-gate) so the two can never drift —
  // each mirrors the same CTE in its own oracle.
  private def markers(ws: Seq[String]): Column =
    size(expr(s"filter(split(trim(lower(text)), '\\\\s+'), t -> t IN (${ws.map(w => s"'$w'").mkString(",")}))"))
  private def cjk: Column =
    length(regexp_replace(col("text"), "[^\\x{4e00}-\\x{9fff}]", "")) > 0
  private def enMarkers: Column = markers(Seq("the", "a", "of", "and", "to", "in"))
  private def langPred: Column = {
    val en = enMarkers
    val es = markers(Seq("el", "la", "de", "que", "y", "los"))
    val de = markers(Seq("der", "die", "und", "das", "ist"))
    val fr = markers(Seq("le", "les", "et", "des", "un"))
    when(cjk, "zh")
      .when(es > en && es >= de && es >= fr, "es")
      .when(de > en && de >= fr, "de")
      .when(fr > en, "fr")
      .otherwise("en")
  }

  def specs: Seq[QuerySpec] = Seq(

    // Distribution-drift monitor (PSI — the Population Stability Index
    // every production data pipeline tracks before a new batch trains):
    // each source's document-length distribution vs the corpus-wide
    // reference over 8 fixed buckets, add-half smoothed so empty buckets
    // contribute, PSI = Σ (q−p)·ln(q/p), flagged at the standard 0.2
    // threshold. Per-bucket terms round to the 6-decimal grid and sum as
    // exact DECIMAL, so partial-agg order can't move the flag. Scale:
    // two partial-agg count shuffles + an 8-row-per-source dense grid —
    // cost tracks source count, never corpus size.
    QuerySpec(
      "text_drift_psi",
      (s, dir) => {
        val d = docs(s, dir)
        val row = d.agg(max(col("n_chars")), count(lit(1))).head()
        val (mx, n) = (row.getLong(0), row.getLong(1))
        val bucketed = d.select(col("source"),
          expr(s"CAST(n_chars * 8 DIV ${mx + 1} AS INT)").as("b"))
        val corpus = bucketed.groupBy("b").agg(count(lit(1)).as("cb"))
        val srcTot = bucketed.groupBy("source").agg(count(lit(1)).as("ns"))
        val srcCnt = bucketed.groupBy("source", "b").agg(count(lit(1)).as("csb"))
        val grid = srcTot.select(col("source"), col("ns"),
          explode(expr("sequence(0, 7)")).as("b"))
        val q = (col("csb") + 0.5) / (col("ns") + 4)
        val p = (col("cb") + 0.5) / (lit(n) + lit(4))
        grid
          .join(srcCnt, Seq("source", "b"), "left")
          .join(corpus, Seq("b"), "left")
          .select(col("source"), col("ns"), col("b"),
            coalesce(col("csb"), lit(0L)).as("csb"),
            coalesce(col("cb"), lit(0L)).as("cb"))
          .withColumn("term",
            round((q - p) * log(q / p), 6).cast("decimal(18,6)"))
          .groupBy("source")
          .agg(sum(col("term")).as("psi_dec"))
          .select(col("source"),
            col("psi_dec").cast("double").as("psi"),
            (col("psi_dec") > 0.2).as("drifted"))
          .orderBy("source")
      },
      Some("""WITH m AS (SELECT MAX(n_chars) AS mx, COUNT(*) AS n FROM documents),
           |bk AS (SELECT source, CAST(n_chars * 8 // (m.mx + 1) AS INT) AS b
           |       FROM documents, m),
           |corpus AS (SELECT b, COUNT(*) AS cb FROM bk GROUP BY b),
           |st AS (SELECT source, COUNT(*) AS ns FROM bk GROUP BY source),
           |sc AS (SELECT source, b, COUNT(*) AS csb FROM bk GROUP BY source, b),
           |grid AS (SELECT st.source, st.ns, g.b
           |         FROM st, (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS b) g),
           |dense AS (
           |  SELECT grid.source, grid.ns, grid.b,
           |         COALESCE(sc.csb, 0) AS csb, COALESCE(corpus.cb, 0) AS cb
           |  FROM grid
           |  LEFT JOIN sc ON sc.source = grid.source AND sc.b = grid.b
           |  LEFT JOIN corpus ON corpus.b = grid.b),
           |terms AS (
           |  SELECT source,
           |         CAST(ROUND(((csb + 0.5) / (ns + 4)
           |                     - (cb + 0.5) / ((SELECT n FROM m) + 4))
           |                    * LN(((csb + 0.5) / (ns + 4))
           |                         / ((cb + 0.5) / ((SELECT n FROM m) + 4))), 6)
           |              AS DECIMAL(18,6)) AS term
           |  FROM dense),
           |psi AS (SELECT source, SUM(term) AS psi_dec FROM terms GROUP BY source)
           |SELECT source, CAST(psi_dec AS DOUBLE) AS psi, psi_dec > 0.2 AS drifted
           |FROM psi ORDER BY source""".stripMargin)),

    // The native shingle GENERATOR (functions/ShingleExplode — the UDTF
    // extension tier) driven through its SQL LATERAL VIEW surface: most
    // frequent 3-token shingles corpus-wide with a deterministic
    // (count DESC, shingle ASC) order. Unlike the
    // explode(transform(sequence(...))) composition the dedup family
    // uses, the generator streams shingles from a lazy iterator — peak
    // per-row memory is ONE shingle, not a document-sized array, the
    // bound that matters on web-scale documents. The aggregate is a
    // plain partial-agg groupBy ending in TakeOrderedAndProject.
    QuerySpec(
      "text_shingles",
      (s, dir) => {
        docs(s, dir).createOrReplaceTempView("graft_docs_shingle")
        s.sql("""SELECT shingle, COUNT(*) AS cnt
                 FROM graft_docs_shingle
                 LATERAL VIEW shingle_explode(text, 3) sh AS shingle
                 GROUP BY shingle
                 ORDER BY cnt DESC, shingle LIMIT 10""")
      },
      Some("""WITH t AS (
                SELECT STRING_SPLIT_REGEX(TRIM(text), '\s+') AS t FROM documents),
              g AS (
                SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
                FROM (SELECT t, UNNEST(GENERATE_SERIES(1, LEN(t) - 2)) AS i
                      FROM t WHERE LEN(t) >= 3))
              SELECT shingle, COUNT(*) AS cnt
              FROM g GROUP BY shingle
              ORDER BY cnt DESC, shingle LIMIT 10""")),

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

    // Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — MOSS):
    // per window of W=4 consecutive K=4-token-gram hashes, select the
    // minimum (rightmost on ties); the distinct selections are the doc's
    // fingerprint set, guaranteed to expose any shared run ≥ K+W−1 = 7
    // tokens at ~0.4 gram density. The whole shingle→hash→winnow pipeline
    // is ONE compiled pass per row (native WinnowFingerprint expression —
    // same promote-on-evidence rationale as MinHashBandKeys), so the query
    // is a zero-shuffle scan→project at any corpus size; the oracle
    // re-derives the selection with window-frame MINs over an encoded
    // (h, rightmost-pos) key. Consumer: dedup_winnow (DedupQueries).
    QuerySpec(
      "text_winnow_fingerprint",
      (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"), graft.functions.WinnowFingerprint(toks).as("fp"))
          .select(col("doc_id"), explode(col("fp")).as("f"))
          .select(col("doc_id"), col("f.pos").as("pos"), col("f.h").as("h"))
          .orderBy("doc_id", "pos"),
      Some(s"""WITH ${DedupQueries.WinnowCtes}
              |SELECT doc_id, pos, h FROM winnow
              |ORDER BY doc_id, pos""".stripMargin)),

    // Canonical text normalization (the pre-tokenization cleanup stage of
    // a training pipeline): lowercase, strip non-alphanumerics to spaces,
    // collapse runs of whitespace, trim. Pure per-row codegen kernel —
    // linear at any scale, no shuffle.
    QuerySpec(
      "text_normalize",
      (s, dir) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            trim(regexp_replace(
              regexp_replace(lower(trim(col("text"))), "[^a-z0-9\\s]", " "),
              "\\s+", " ")).as("normalized"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     TRIM(REGEXP_REPLACE(
                       REGEXP_REPLACE(LOWER(TRIM(text)), '[^a-z0-9\s]', ' ', 'g'),
                       '\s+', ' ', 'g')) AS normalized
              FROM documents ORDER BY doc_id""")),

    // Language-ID heuristic (SURVEY.md §2.12): CJK charset detection, then
    // per-language stopword marker counts with a fixed decision chain. A
    // pure per-row kernel — linear scan at any scale, no shuffle.
    QuerySpec(
      "text_langid",
      (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"), col("lang"), langPred.as("lang_pred"))
          .orderBy("doc_id"),
      Some("""WITH m AS (
                SELECT doc_id, lang,
                       LENGTH(REGEXP_REPLACE(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) > 0 AS cjk,
                       LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)),'\s+'),
                           t -> t IN ('the','a','of','and','to','in'))) AS en,
                       LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)),'\s+'),
                           t -> t IN ('el','la','de','que','y','los'))) AS es,
                       LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)),'\s+'),
                           t -> t IN ('der','die','und','das','ist'))) AS de,
                       LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)),'\s+'),
                           t -> t IN ('le','les','et','des','un'))) AS fr
                FROM documents)
              SELECT doc_id, lang,
                     CASE WHEN cjk THEN 'zh'
                          WHEN es > en AND es >= de AND es >= fr THEN 'es'
                          WHEN de > en AND de >= fr THEN 'de'
                          WHEN fr > en THEN 'fr'
                          ELSE 'en' END AS lang_pred
              FROM m ORDER BY doc_id""")),

    // Rolling polynomial fingerprint over tokens (base 31 mod 2^31-1):
    // order-sensitive unlike the md5 fingerprint; same arithmetic on both
    // engines via left-fold.
    QuerySpec(
      "text_rollhash",
      (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"),
            expr("""aggregate(
                      split(trim(text), '\\s+'),
                      CAST(0 AS BIGINT),
                      (acc, t) -> (acc * 31 + CAST(CONV(SUBSTRING(MD5(t),1,8),16,10) AS BIGINT)) % 2147483647
                    )""").as("fingerprint"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     LIST_REDUCE(
                       LIST_PREPEND(CAST(0 AS BIGINT),
                         LIST_TRANSFORM(STRING_SPLIT_REGEX(TRIM(text),'\s+'),
                           t -> ('0x'||SUBSTR(MD5(t),1,8))::BIGINT)),
                       (acc, h) -> (acc * 31 + h) % 2147483647) AS fingerprint
              FROM documents ORDER BY doc_id""")),

    // Composed corpus-cleaning gate — the keep/drop decision a pretraining
    // pipeline applies before dedup: token-count window AND stopword-density
    // floor AND language gate (the text_langid decision chain = 'en').
    // Pure per-row predicates over one scan: at 100 TB this is a single
    // pushdown-friendly filter pass with no shuffle at all (the orderBy is
    // presentation-only for the oracle hash).
    QuerySpec(
      "text_quality_filter",
      (s, dir) =>
        docs(s, dir)
          .withColumn("n_tokens", size(toks))
          .withColumn("sw_ratio",
            round(enMarkers.cast("double") / col("n_tokens"), 6))
          .filter(col("n_tokens").between(30, 1000) &&
            col("sw_ratio") >= 0.04 && langPred === "en")
          .select("doc_id", "n_tokens", "sw_ratio")
          .orderBy("doc_id"),
      Some("""WITH m AS (
                SELECT doc_id,
                       CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS INT) AS n_tokens,
                       LENGTH(REGEXP_REPLACE(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) > 0 AS cjk,
                       LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)),'\s+'),
                           t -> t IN ('the','a','of','and','to','in'))) AS en,
                       LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)),'\s+'),
                           t -> t IN ('el','la','de','que','y','los'))) AS es,
                       LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)),'\s+'),
                           t -> t IN ('der','die','und','das','ist'))) AS de,
                       LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)),'\s+'),
                           t -> t IN ('le','les','et','des','un'))) AS fr
                FROM documents)
              SELECT doc_id, n_tokens,
                     ROUND(CAST(en AS DOUBLE) / n_tokens, 6) AS sw_ratio
              FROM m
              WHERE n_tokens BETWEEN 30 AND 1000
                AND ROUND(CAST(en AS DOUBLE) / n_tokens, 6) >= 0.04
                AND NOT cjk
                AND NOT (es > en AND es >= de AND es >= fr)
                AND NOT (de > en AND de >= fr)
                AND NOT (fr > en)
              ORDER BY doc_id""")),

    // Model-based quality gate — the FineWeb-Edu-style curation stage: a
    // linear classifier scores every document and only high-scoring docs
    // survive. The OPERATOR is the inference plan — hashed token features
    // (the fasttext trick: no vocabulary shuffle, the feature index is a
    // pure per-row hash), a constant weight table riding the plan as a
    // 64-element literal array (a trained model would broadcast exactly
    // the same way), an all-integer partial-aggregable score, and a
    // threshold gate. One scan + one compact (doc_id) groupBy — linear at
    // 100 TB, and the model lookup is codegen'd element_at, never a UDF.
    // Weights here are a deterministic md5-grid fixture standing in for
    // trained parameters; the threshold (66/token) sits at the observed
    // corpus median so the gate provably discriminates.
    QuerySpec(
      "text_classifier_gate",
      (s, dir) => {
        val warr = array(ClfW.map(lit(_)): _*)
        docs(s, dir)
          .select(col("doc_id"),
            explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
          .select(col("doc_id"),
            element_at(warr,
              (graft.functions.HashBridge.h32(col("tok")) % ClfDim + 1).cast("int")).as("w"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score"))
          .filter(col("score") > col("n_tokens") * 66)
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (
                SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) AS tok
                FROM documents),
              w AS (
                SELECT doc_id,
                       ([${ClfW.mkString(", ")}])[CAST(('0x'||SUBSTR(MD5(tok),1,8))::BIGINT % $ClfDim AS INT) + 1] AS w
                FROM tok)
              SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(w) AS BIGINT) AS score
              FROM w GROUP BY doc_id
              HAVING SUM(w) > COUNT(*) * 66
              ORDER BY doc_id""")),

    // Character-entropy quality signal — the information-theoretic
    // gibberish/boilerplate detector (a CCNet/Gopher-family gate):
    // natural prose sits near 2.8 nats of char entropy, repeated
    // boilerplate and key-mash collapse well below it. H = ln n −
    // (Σ c·ln c)/n over per-(doc, char) counts — one explode to the
    // compact (doc_id, char) key with map-side combine (≤ |alphabet|
    // rows per doc cross the shuffle), then a per-doc fold. The ln
    // bridge is the proven unigram_logprob pattern: round(ln, 6) →
    // DECIMAL sum → double divide → round 6, so partial-agg order can
    // never move the hash. Gate at 2.7 (just under the corpus median,
    // so the boolean provably discriminates).
    QuerySpec(
      "text_entropy",
      (s, dir) => {
        val cc = docs(s, dir)
          .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
          .filter(length(col("c")) > 0)
          .groupBy("doc_id", "c").agg(count(lit(1)).as("cnt"))
        cc.groupBy("doc_id")
          .agg(sum(col("cnt")).as("n"),
            sum(col("cnt") * round(log(col("cnt")), 6).cast("decimal(18,6)"))
              .as("s"))
          .select(col("doc_id"), col("n"),
            (round(round(log(col("n")), 6) - col("s").cast("double") / col("n"), 6)
              + lit(0.0)).as("entropy_nats"))
          .withColumn("keep", col("entropy_nats") >= 2.7)
          .orderBy("doc_id")
      },
      Some("""WITH ch AS (
                SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(text, '')) AS c
                FROM documents),
              cc AS (SELECT doc_id, c, COUNT(*) AS cnt
                     FROM ch WHERE LENGTH(c) > 0 GROUP BY doc_id, c)
              SELECT doc_id,
                     CAST(SUM(cnt) AS BIGINT) AS n,
                     ROUND(ROUND(LN(CAST(SUM(cnt) AS BIGINT)), 6)
                           - CAST(SUM(cnt * CAST(ROUND(LN(cnt), 6) AS DECIMAL(18,6))) AS DOUBLE)
                             / SUM(cnt), 6) + 0.0 AS entropy_nats,
                     ROUND(ROUND(LN(CAST(SUM(cnt) AS BIGINT)), 6)
                           - CAST(SUM(cnt * CAST(ROUND(LN(cnt), 6) AS DECIMAL(18,6))) AS DOUBLE)
                             / SUM(cnt), 6) + 0.0 >= 2.7 AS keep
              FROM cc GROUP BY doc_id ORDER BY doc_id""")),

    // PII/URL scrubbing — the redaction pass a pretraining pipeline runs
    // before tokenization. The synthetic corpus is clean, so both engines
    // first INJECT identical doc-keyed dirt (an email + a URL), then the
    // scrub kernel must provably remove it for the hash to match. Pure
    // per-row regexp work in codegen: one scan, no shuffle, linear at any
    // scale. URL pattern runs first so an address inside a URL never
    // half-redacts.
    QuerySpec(
      "text_scrub",
      (s, dir) => {
        val dirty = concat(col("text"),
          lit(" contact: user"), col("doc_id"), lit("@example.com via "),
          lit("https://ex.com/d/"), col("doc_id"), lit("?ref=mail"))
        val urlRe = "https?://[^\\s]+"
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        docs(s, dir)
          .withColumn("dirty", dirty)
          .select(
            col("doc_id"),
            size(regexp_extract_all(col("dirty"), lit(urlRe), lit(0))).as("n_urls"),
            size(regexp_extract_all(col("dirty"), lit(emailRe), lit(0))).as("n_emails"),
            regexp_replace(regexp_replace(col("dirty"), urlRe, "<URL>"),
              emailRe, "<EMAIL>").as("clean"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
                SELECT doc_id,
                       text || ' contact: user' || doc_id || '@example.com via '
                            || 'https://ex.com/d/' || doc_id || '?ref=mail' AS dirty
                FROM documents)
              SELECT doc_id,
                     CAST(LEN(REGEXP_EXTRACT_ALL(dirty, 'https?://[^\s]+')) AS INT) AS n_urls,
                     CAST(LEN(REGEXP_EXTRACT_ALL(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
                     REGEXP_REPLACE(REGEXP_REPLACE(dirty, 'https?://[^\s]+', '<URL>', 'g'),
                                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS clean
              FROM d ORDER BY doc_id""")),

    // Repetition ratio (Gopher-style quality signal): share of all bigram
    // occurrences taken by the single most frequent bigram. One explode +
    // two keyed aggregations — the same shuffle profile as tf-idf's tf
    // stage, linear in corpus size.
    QuerySpec(
      "text_repetition",
      (s, dir) => {
        val grams = docs(s, dir)
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
          .filter(size(col("t")) >= 2)
          .select(col("doc_id"),
            explode(expr("transform(sequence(0, size(t)-2), i -> concat(t[i],' ',t[i+1]))")).as("g"))
        grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(max(col("c")).as("max_c"), sum(col("c")).as("total"))
          .select(col("doc_id"),
            round(col("max_c").cast("double") / col("total"), 6).as("top_bigram_ratio"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text),'\s+') AS t
                         FROM documents),
              grams AS (
                SELECT doc_id, t[i] || ' ' || t[i+1] AS g
                FROM (SELECT doc_id, t, UNNEST(GENERATE_SERIES(1, LEN(t)-1)) AS i
                      FROM t WHERE LEN(t) >= 2)),
              counts AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g)
              SELECT doc_id,
                     ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_bigram_ratio
              FROM counts GROUP BY doc_id ORDER BY doc_id""")),

    // The FULL published Gopher/MassiveText repetition battery (Rae et
    // al. 2021, Table A1) — the single top-bigram ratio above is one rung
    // of a nine-metric ladder: the fraction of characters inside the most
    // frequent n-gram for n ∈ {2,3,4}, and the fraction of characters
    // COVERED by any duplicated n-gram for n ∈ {5..10} (positional
    // coverage, so overlapping duplicates never double-count — the
    // detail that makes the published metric a fraction ≤ 1). Thresholds
    // are the paper's (0.20/0.18/0.16, 0.15/0.14/0.13/0.12/0.11/0.10).
    // The synthetic corpus has no natural ≥5-gram duplication, so — the
    // text_scrub precedent — every 3rd doc gets its own first 12 tokens
    // appended twice in BOTH engines, making the gate provably
    // discriminate. Scale shape: the metric is strictly per-document, so
    // the plan is a ZERO-SHUFFLE scan→project — one compiled
    // RepetitionStats pass per row computes all nine numerators plus the
    // shared denominator (the relational formulation — 9-way gram
    // explode, count shuffle, positional-coverage distinct, three joins
    // — measured 6.1 s at sf0.1 and lives on as the DuckDB oracle, an
    // independent restatement of the rule). Embarrassingly parallel and
    // linear at 100 TB. Docs under 12 tokens are out of scope in both
    // engines (Gopher's own min-length gate drops them first).
    QuerySpec(
      "text_repetition_full",
      (s, dir) => {
        val base = docs(s, dir)
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t0"))
          .filter(size(col("t0")) >= 12)
          .withColumn("t",
            when(col("doc_id") % 3 === 0,
              concat(col("t0"), slice(col("t0"), 1, 12), slice(col("t0"), 1, 12)))
              .otherwise(col("t0")))
          .select(col("doc_id"), graft.functions.RepetitionStats(col("t")).as("r"))
        def f(num: String) =
          round(col(s"r.$num").cast("double") / col("r.tot"), 6)
        val wide = base.select(col("doc_id"),
          f("top2").as("top_2"), f("top3").as("top_3"), f("top4").as("top_4"),
          f("cov5").as("dup_5"), f("cov6").as("dup_6"), f("cov7").as("dup_7"),
          f("cov8").as("dup_8"), f("cov9").as("dup_9"), f("cov10").as("dup_10"))
        wide.withColumn("keep",
            col("top_2") <= 0.20 && col("top_3") <= 0.18 && col("top_4") <= 0.16 &&
            col("dup_5") <= 0.15 && col("dup_6") <= 0.14 && col("dup_7") <= 0.13 &&
            col("dup_8") <= 0.12 && col("dup_9") <= 0.11 && col("dup_10") <= 0.10)
          .orderBy("doc_id")
      },
      Some("""WITH base0 AS (
                SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS t0
                FROM documents),
              base AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0 THEN t0 || t0[1:12] || t0[1:12]
                            ELSE t0 END AS t
                FROM base0 WHERE LEN(t0) >= 12),
              tot AS (
                SELECT doc_id, SUM(LEN(tok)) AS tot
                FROM (SELECT doc_id, UNNEST(t) AS tok FROM base)
                GROUP BY doc_id),
              poslen AS (
                SELECT doc_id, i - 1 AS pos, LEN(t[i]) AS toklen
                FROM (SELECT doc_id, t, UNNEST(GENERATE_SERIES(1, LEN(t))) AS i
                      FROM base)),
              withn AS (
                SELECT doc_id, t, UNNEST(GENERATE_SERIES(2, 10)) AS n FROM base),
              grams AS (
                SELECT doc_id, n, i - 1 AS s, ARRAY_TO_STRING(t[i:i+n-1], ' ') AS g
                FROM (SELECT doc_id, t, n,
                             UNNEST(GENERATE_SERIES(1, LEN(t) - n + 1)) AS i
                      FROM withn)),
              cnt AS (
                SELECT doc_id, n, g, COUNT(*) AS c,
                       LEN(REPLACE(g, ' ', '')) AS charlen
                FROM grams GROUP BY doc_id, n, g),
              top AS (
                SELECT doc_id, n, c * charlen AS topchars
                FROM cnt WHERE n <= 4
                QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id, n
                                           ORDER BY c DESC, charlen DESC) = 1),
              dupg AS (SELECT doc_id, n, g FROM cnt WHERE c >= 2 AND n >= 5),
              covpos AS (
                SELECT DISTINCT doc_id, n, pos
                FROM (SELECT gr.doc_id, gr.n,
                             UNNEST(GENERATE_SERIES(gr.s, gr.s + gr.n - 1)) AS pos
                      FROM grams gr JOIN dupg USING (doc_id, n, g))),
              cov AS (
                SELECT doc_id, n, SUM(toklen) AS covchars
                FROM covpos JOIN poslen USING (doc_id, pos)
                GROUP BY doc_id, n),
              m AS (
                SELECT doc_id, n, ROUND(CAST(topchars AS DOUBLE) / tot, 6) AS f
                FROM top JOIN tot USING (doc_id)
                UNION ALL
                SELECT doc_id, n, ROUND(CAST(covchars AS DOUBLE) / tot, 6) AS f
                FROM cov JOIN tot USING (doc_id)),
              wide AS (
                SELECT tot.doc_id,
                       COALESCE(MAX(CASE WHEN n = 2 THEN f END), 0) AS top_2,
                       COALESCE(MAX(CASE WHEN n = 3 THEN f END), 0) AS top_3,
                       COALESCE(MAX(CASE WHEN n = 4 THEN f END), 0) AS top_4,
                       COALESCE(MAX(CASE WHEN n = 5 THEN f END), 0) AS dup_5,
                       COALESCE(MAX(CASE WHEN n = 6 THEN f END), 0) AS dup_6,
                       COALESCE(MAX(CASE WHEN n = 7 THEN f END), 0) AS dup_7,
                       COALESCE(MAX(CASE WHEN n = 8 THEN f END), 0) AS dup_8,
                       COALESCE(MAX(CASE WHEN n = 9 THEN f END), 0) AS dup_9,
                       COALESCE(MAX(CASE WHEN n = 10 THEN f END), 0) AS dup_10
                FROM tot LEFT JOIN m USING (doc_id)
                GROUP BY tot.doc_id)
              SELECT doc_id, top_2, top_3, top_4,
                     dup_5, dup_6, dup_7, dup_8, dup_9, dup_10,
                     (top_2 <= 0.20 AND top_3 <= 0.18 AND top_4 <= 0.16 AND
                      dup_5 <= 0.15 AND dup_6 <= 0.14 AND dup_7 <= 0.13 AND
                      dup_8 <= 0.12 AND dup_9 <= 0.11 AND dup_10 <= 0.10) AS keep
              FROM wide ORDER BY doc_id""")),

    // Sequence-length histogram — the distribution every training
    // pipeline computes before batch packing (how many docs land in each
    // 16-token bucket, and what share of the corpus that is). One scan +
    // a tiny bucket aggregation; the global share window runs over the
    // ~dozens-of-buckets relation, not the corpus.
    QuerySpec(
      "text_token_histogram",
      (s, dir) =>
        docs(s, dir)
          .select(floor(size(toks) / 16).cast("long").as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("share", round(
            col("n_docs").cast("double") /
              sum(col("n_docs")).over(org.apache.spark.sql.expressions.Window
                .partitionBy()), 6))
          .orderBy("bucket"),
      Some("""WITH b AS (SELECT CAST(FLOOR(LEN(STRING_SPLIT_REGEX(TRIM(text),'\s+')) / 16) AS BIGINT) AS bucket
                         FROM documents),
              c AS (SELECT bucket, COUNT(*) AS n_docs FROM b GROUP BY bucket)
              SELECT bucket, n_docs,
                     ROUND(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 6) AS share
              FROM c ORDER BY bucket""")),

    // From-scratch BPE TRAINING (Sennrich et al. 2016 — the public
    // byte-pair merge learner; graft.functions.Bpe): the corpus-sized
    // work is one word-frequency aggregation, the merge loop runs
    // driver-side over the bounded top-200 vocabulary (deterministic
    // (count desc, word asc) order — the constant-size-model pattern of
    // the unigram-LM tier), and the output is the 8-rule merge table.
    // The oracle re-derives the SAME rules relationally: one unrolled
    // CTE block per merge iteration (generated by Bpe.trainOracle from
    // the same constants, the simhashPairCtes pattern), with left-greedy
    // application exact in SQL via run-start parity. Equality of the
    // two independently-expressed trainers IS the determinism proof.
    QuerySpec(
      "text_bpe_train",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        graft.functions.Bpe.trainOnCorpus(s, dir)
          .map(m => (m.rank, m.lft, m.rgt, m.lft + m.rgt, m.count))
          .toDF("rank", "lft", "rgt", "merged", "pair_count")
          .orderBy("rank")
      },
      Some(graft.functions.Bpe.trainOracle)),

    // BPE APPLICATION at corpus scale: the learned 8-rule model
    // tokenizes the DISTINCT eligible words (kernel work ∝ vocabulary,
    // not corpus — a mapPartitions over the deduplicated words), then
    // broadcast-joins token counts back to every word occurrence for
    // the per-doc rollup the packing/chunking tier consumes. The oracle
    // replays training AND application end-to-end in SQL — the whole
    // path from raw text to per-doc BPE token counts is hash-checked.
    QuerySpec(
      "text_bpe_apply",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val merges = graft.functions.Bpe.trainOnCorpus(s, dir)
          .map(m => (m.lft, m.rgt))
        val words = graft.functions.Bpe.eligibleWords(s, dir)
        val tokenized = words.select("w").distinct().as[String]
          .mapPartitions { it =>
            it.map(w => (w, graft.functions.Bpe.tokenize(w, merges).length.toLong))
          }.toDF("w", "n_tok")
        words.join(broadcast(tokenized), "w")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"),
            sum(col("n_tok")).as("n_tokens"),
            sum(length(col("w")).cast("long")).as("n_chars"))
          .orderBy("doc_id")
      },
      Some(graft.functions.Bpe.applyOracle)),

    // Tokenizer FERTILITY by language — tokens-per-word, the standard
    // multilingual tokenizer-evaluation metric (a language whose words
    // fragment into many subwords pays more sequence length per word of
    // content, skewing its effective training mix). Same distinct-word
    // kernel + broadcast join as text_bpe_apply; the rollup is by the
    // document's language instead of its id — one extra broadcast-sized
    // dimension join, nothing corpus-shaped moves.
    QuerySpec(
      "text_bpe_fertility",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val merges = graft.functions.Bpe.trainOnCorpus(s, dir)
          .map(m => (m.lft, m.rgt))
        val words = graft.functions.Bpe.eligibleWords(s, dir)
        val tokenized = words.select("w").distinct().as[String]
          .mapPartitions { it =>
            it.map(w => (w, graft.functions.Bpe.tokenize(w, merges).length.toLong))
          }.toDF("w", "w_tok")
        words
          .join(docs(s, dir).select(col("doc_id"), col("lang")), "doc_id")
          .join(broadcast(tokenized), "w")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_words"),
            sum(col("w_tok")).as("n_tokens"),
            round(sum(col("w_tok")).cast("double") / count(lit(1)), 6)
              .as("fertility"))
          .orderBy("lang")
      },
      Some(graft.functions.Bpe.fertilityOracle)),

    // The OTHER published tokenizer family beside BPE: the unigram-LM
    // (SentencePiece, Kudo 2018) subword model — candidate pieces scored
    // by occurrence-weighted frequency over the bounded vocabulary,
    // integer Viterbi costs on the round(ln,6)·1e6 grid, minimum-cost
    // segmentation with a (cost, piece-count, path) total order. Output
    // is the trained model relation: used pieces with usage counts. The
    // oracle replays candidate scoring relationally and unrolls the
    // Viterbi DP as one generated CTE block per prefix length
    // (UnigramTokenizer.trainOracle — the Bpe.trainOracle stance).
    QuerySpec(
      "text_sp_unigram_train",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        graft.functions.UnigramTokenizer.trainOnCorpus(s, dir)
          .map { case (p, u, _) => (p, u) }
          .toDF("piece", "cnt")
          .orderBy(col("cnt").desc, col("piece"))
      },
      Some(graft.functions.UnigramTokenizer.trainOracle)),

    // Unigram-LM tokenizer APPLIED over EVERY eligible word: the
    // distinct-words relation Viterbi-segments in executor tasks against
    // the broadcast piece-cost map (the text_bpe_apply kernel stance —
    // work ∝ vocabulary, never corpus), with corpus chars outside the
    // piece table falling back to deterministic score-1 single-char UNK
    // pieces (the SentencePiece byte-fallback stance at char
    // granularity) so coverage is total. Token counts broadcast-join
    // back for the per-doc rollup.
    QuerySpec(
      "text_sp_unigram_apply",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val (words, tokenized) = unigramTokenized(s, dir)
        words.join(broadcast(tokenized), "w")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"),
            sum(col("n_tok")).as("n_tokens"),
            sum(length(col("w")).cast("long")).as("n_chars"))
          .orderBy("doc_id")
      },
      Some(graft.functions.UnigramTokenizer.applyOracle)),

    // Unigram-tokenizer FERTILITY by language — the multilingual
    // evaluation metric (tokens-per-word decides each language's
    // effective share of a fixed token budget), over the SAME
    // total-coverage UNK-fallback segmentation as the apply query, so
    // the two tokenizer families (BPE / unigram) carry the same
    // first-class evaluation surface. One broadcast join beyond apply.
    QuerySpec(
      "text_sp_unigram_fertility",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val (words, tokenized) = unigramTokenized(s, dir)
        words
          .join(docs(s, dir).select(col("doc_id"), col("lang")), "doc_id")
          .join(broadcast(tokenized), "w")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_words"),
            sum(col("n_tok")).as("n_tokens"),
            round(sum(col("n_tok")).cast("double") / count(lit(1)), 6)
              .as("fertility"))
          .orderBy("lang")
      },
      Some(graft.functions.UnigramTokenizer.fertilityOracle)),

    // Sequence packing over BPE TOKENS — text_pack's 512-token greedy
    // binning re-expressed over what a real training pipeline measures
    // (learned-subword counts, not whitespace splits): the per-doc BPE
    // token count from the text_bpe_apply path (distinct-word kernel +
    // broadcast join) feeds the same per-source cumulative window; docs
    // with no eligible words pack at zero length (LEFT JOIN + 0). The
    // packing plan's scale shape is unchanged — the tokenizer swap cost
    // one broadcast join.
    QuerySpec(
      "text_pack_bpe",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val merges = graft.functions.Bpe.trainOnCorpus(s, dir)
          .map(m => (m.lft, m.rgt))
        val words = graft.functions.Bpe.eligibleWords(s, dir)
        val tokenized = words.select("w").distinct().as[String]
          .mapPartitions { it =>
            it.map(w => (w, graft.functions.Bpe.tokenize(w, merges).length.toLong))
          }.toDF("w", "w_tok")
        val perDoc = words.join(broadcast(tokenized), "w")
          .groupBy("doc_id").agg(sum(col("w_tok")).as("bpe_tok"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")
        docs(s, dir).select(col("doc_id"), col("source"))
          .join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"), col("source"),
            coalesce(col("bpe_tok"), lit(0L)).as("n_tok"))
          .withColumn("cum", sum(col("n_tok")).over(w))
          .withColumn("bin", floor((col("cum") - col("n_tok")) / lit(512)))
          .groupBy("source", "bin")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("bin_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy("source", "bin")
      },
      Some(graft.functions.Bpe.packOracle)),

    // Benchmark decontamination — the eval-overlap gate every pretraining
    // pipeline runs before training: a document is contaminated if it
    // shares any 4-token shingle with the held-out benchmark set (here the
    // deterministic doc_id % 97 == 0 slice, so the oracle can rebuild it).
    // Scale shape: the benchmark side is a real-world CONSTANT (eval
    // suites are a few MB of text regardless of corpus size), so its
    // distinct gram set broadcasts; the corpus side then streams past the
    // broadcast hash set with NO shuffle of its own grams — only the
    // matching (doc_id, h) rows ever reach the final groupBy. Gram
    // duplicates are left in (no corpus-wide distinct shuffle) and
    // collapsed by the countDistinct in that last bounded aggregation.
    QuerySpec(
      "text_decontaminate",
      (s, dir) => contamination(docs(s, dir), col("doc_id") % 97 === 0),
      Some("""WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text),'\s+') AS t FROM documents),
              grams AS (
                SELECT doc_id,
                       ('0x'||SUBSTR(MD5(t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]),1,8))::BIGINT AS h
                FROM (SELECT doc_id, t, UNNEST(GENERATE_SERIES(1, LEN(t)-3)) AS i
                      FROM t WHERE LEN(t) >= 4)),
              ev AS (SELECT DISTINCT h FROM grams WHERE doc_id % 97 = 0)
              SELECT g.doc_id, COUNT(DISTINCT g.h) AS n_shared
              FROM grams g JOIN ev USING (h)
              WHERE g.doc_id % 97 <> 0
              GROUP BY g.doc_id ORDER BY doc_id""")),

    // Bloom-pruned decontamination — the same contamination result
    // through the CONSTANT-SIZE path: when the eval gram set outgrows a
    // broadcast hash relation (a full benchmark battery is 10⁷⁺ grams),
    // a 16 KiB Bloom bit set (functions/BloomFilter.scala) still rides
    // to every corpus-scan task, and non-matching grams — the
    // overwhelming majority — die at the scan. The exact gram join then
    // removes Bloom false positives, so the output (and oracle) is
    // identical to text_decontaminate's.
    QuerySpec(
      "text_decontaminate_bloom",
      (s, dir) => contaminationBloom(docs(s, dir), col("doc_id") % 97 === 0),
      Some("""WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text),'\s+') AS t FROM documents),
              grams AS (
                SELECT doc_id,
                       ('0x'||SUBSTR(MD5(t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]),1,8))::BIGINT AS h
                FROM (SELECT doc_id, t, UNNEST(GENERATE_SERIES(1, LEN(t)-3)) AS i
                      FROM t WHERE LEN(t) >= 4)),
              ev AS (SELECT DISTINCT h FROM grams WHERE doc_id % 97 = 0)
              SELECT g.doc_id, COUNT(DISTINCT g.h) AS n_shared
              FROM grams g JOIN ev USING (h)
              WHERE g.doc_id % 97 <> 0
              GROUP BY g.doc_id ORDER BY doc_id""")),

    // tf-idf: explode → tf per (doc, term); df per term; join on term;
    // idf = ln((N+1)/(df+1)). Rounded before output.
    QuerySpec(
      "text_tfidf",
      (s, dir) => {
        val d = docs(s, dir)
        // corpus size as a LAZY 1-row aggregate cross-joined in (the same
        // shape the oracle uses) — an eager d.count() here would launch a
        // full extra scan job every time the plan is merely constructed
        val n = d.agg(count(lit(1)).as("n_docs"))
        val terms = d
          .select(col("doc_id"), explode(toks).as("term"))
        val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = terms.select("doc_id", "term").distinct()
          .groupBy("term").agg(count(lit(1)).as("df"))
        // no broadcast hint: the term dictionary scales with the corpus;
        // tf and df are both keyed by term, so this is a clean shuffle
        // equi-join at any scale (AQE still broadcasts small vocabularies)
        tf.join(df, "term")
          .crossJoin(broadcast(n)) // 1 row, always broadcastable
          .select(
            col("doc_id"), col("term"), col("tf"),
            round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 6).as("tfidf"))
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
              ORDER BY doc_id, term""")),

    // BM25 ranked retrieval (Okapi, k1=1.2 b=0.75) for a fixed 3-term
    // query — the relevance scoring a corpus-curation stack uses to FIND
    // data (targeted subset mining, eval-neighbor retrieval), one step
    // past tf-idf: per-term saturation + length normalization. The query
    // terms filter the exploded token stream FIRST, so the per-(doc,term)
    // tf relation is tiny (≤ |query| rows per doc) while dl/avgdl come
    // from one partial-aggregating pass over the full stream — at 100 TB
    // the heavy relation never joins anything bigger than itself.
    // Determinism: every score input (tf, df, dl, N) is an exact integer;
    // avgdl and idf are rounded to 6; per-term scores are rounded to 6
    // THEN decimal-summed; ties break on doc_id.
    QuerySpec(
      "text_bm25",
      (s, dir) => {
        val (k1, b) = (1.2, 0.75)
        val terms = docs(s, dir).select(col("doc_id"), explode(toks).as("term"))
        val dl = terms.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"),
          round(sum(col("dl")).cast("double") / count(lit(1)), 6).as("avgdl"))
        val tf = terms.filter(col("term").isin("table", "scan", "fast"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        // double arithmetic mirrored operation-for-operation in the
        // oracle (same literals, same parenthesization) so each
        // IEEE-754 step is bit-identical before the round(…, 6)
        val idf = round(log(
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)), 6)
        val comp = round(
          (idf * (col("tf") * lit(k1 + 1.0))) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))), 6)
        tf.join(df, "term")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats)) // 1 row, always broadcastable
          .select(col("doc_id"), comp.cast("decimal(18,6)").as("c"))
          .groupBy("doc_id")
          .agg(round(sum(col("c")).cast("double"), 6).as("score"),
            count(lit(1)).as("n_matched"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH terms AS (
                SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS term
                FROM documents),
              dl AS (SELECT doc_id, COUNT(*) AS dl FROM terms GROUP BY doc_id),
              stats AS (SELECT COUNT(*) AS n_docs,
                               ROUND(CAST(SUM(dl) AS DOUBLE) / COUNT(*), 6) AS avgdl
                        FROM dl),
              tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms
                     WHERE term IN ('table', 'scan', 'fast')
                     GROUP BY doc_id, term),
              df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
              comp AS (
                SELECT tf.doc_id,
                       CAST(ROUND(
                         (ROUND(LN(CAST(n_docs - df.df + 0.5 AS DOUBLE)
                                   / CAST(df.df + 0.5 AS DOUBLE)
                                   + CAST(1.0 AS DOUBLE)), 6)
                          * (tf.tf * CAST(2.2 AS DOUBLE)))
                         / (tf.tf + CAST(1.2 AS DOUBLE)
                            * (CAST(0.25 AS DOUBLE)
                               + CAST(0.75 AS DOUBLE) * dl.dl / avgdl)), 6)
                       AS DECIMAL(18,6)) AS c
                FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
              SELECT doc_id, ROUND(CAST(SUM(c) AS DOUBLE), 6) AS score,
                     COUNT(*) AS n_matched
              FROM comp GROUP BY doc_id
              ORDER BY score DESC, doc_id LIMIT 20""")),

    // Hybrid retrieval: BM25 lexical top-100 ∪ embedding-cosine semantic
    // top-100, fused by reciprocal-rank fusion (RRF, k=60) — the standard
    // two-tower retrieval shape. RRF is the cross-engine-safe fusion: it
    // consumes RANKS, not scores, so no score normalization (whose
    // float arithmetic would be fragile) ever happens; the only doubles
    // are 1/(60+rank) with integer ranks — IEEE-exact on both engines.
    // Scale shape: each leg ends in TakeOrderedAndProject (distributed
    // top-100, no global sort); the rank windows then run over ≤100
    // bounded rows, and the fusion join moves ≤200 rows total.
    QuerySpec(
      "rank_hybrid",
      (s, dir) => {
        val (k1, b) = (1.2, 0.75)
        // lexical leg — the text_bm25 scoring chain, full score list
        val terms = docs(s, dir).select(col("doc_id"), explode(toks).as("term"))
        val dl = terms.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"),
          round(sum(col("dl")).cast("double") / count(lit(1)), 6).as("avgdl"))
        val tf = terms.filter(col("term").isin("table", "scan", "fast"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val idf = round(log(
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)), 6)
        val comp = round(
          (idf * (col("tf") * lit(k1 + 1.0))) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))), 6)
        val scores = tf.join(dfr, "term").join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .select(col("doc_id"), comp.cast("decimal(18,6)").as("c"))
          .groupBy("doc_id")
          .agg(round(sum(col("c")).cast("double"), 6).as("score"))
        val lex = scores.orderBy(col("score").desc, col("doc_id")).limit(100)
          .withColumn("r_lex", row_number()
            .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
          .select("doc_id", "r_lex")
        // semantic leg — cosine to the query vector (vec_id 0); the HOF
        // dot product is promoted to the native kernel by DotProductRewrite
        def dotp(a: Column, bb: Column): Column =
          aggregate(zip_with(a, bb, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
        val ev = Tables(s, dir, "embeddings")
          .select(col("vec_id").as("doc_id"), col("embedding").cast("array<double>").as("e"))
          .withColumn("nrm", sqrt(dotp(col("e"), col("e"))))
        val qv = ev.filter(col("doc_id") === 0)
          .select(col("e").as("q_e"), col("nrm").as("q_nrm"))
        val sem = ev.filter(col("doc_id") =!= 0)
          .crossJoin(broadcast(qv))
          .withColumn("sim",
            round(dotp(col("e"), col("q_e")) / (col("nrm") * col("q_nrm")), 6) + lit(0.0))
          .orderBy(col("sim").desc, col("doc_id")).limit(100)
          .withColumn("r_sem", row_number()
            .over(Window.orderBy(col("sim").desc, col("doc_id"))).cast("long"))
          .select("doc_id", "r_sem")
        // RRF fusion — a doc missing from one leg contributes 0 for it
        lex.join(sem, Seq("doc_id"), "full_outer")
          .withColumn("rrf", round(
            coalesce(lit(1.0) / (lit(60.0) + col("r_lex")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60.0) + col("r_sem")), lit(0.0)), 6))
          .orderBy(col("rrf").desc, col("doc_id")).limit(10)
          .select(col("doc_id"), col("rrf"), col("r_lex"), col("r_sem"))
      },
      Some("""WITH terms AS (
                SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS term
                FROM documents),
              dl AS (SELECT doc_id, COUNT(*) AS dl FROM terms GROUP BY doc_id),
              stats AS (SELECT COUNT(*) AS n_docs,
                               ROUND(CAST(SUM(dl) AS DOUBLE) / COUNT(*), 6) AS avgdl
                        FROM dl),
              tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms
                     WHERE term IN ('table', 'scan', 'fast')
                     GROUP BY doc_id, term),
              df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
              comp AS (
                SELECT tf.doc_id,
                       CAST(ROUND(
                         (ROUND(LN(CAST(n_docs - df.df + 0.5 AS DOUBLE)
                                   / CAST(df.df + 0.5 AS DOUBLE)
                                   + CAST(1.0 AS DOUBLE)), 6)
                          * (tf.tf * CAST(2.2 AS DOUBLE)))
                         / (tf.tf + CAST(1.2 AS DOUBLE)
                            * (CAST(0.25 AS DOUBLE)
                               + CAST(0.75 AS DOUBLE) * dl.dl / avgdl)), 6)
                       AS DECIMAL(18,6)) AS c
                FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
              scores AS (SELECT doc_id, ROUND(CAST(SUM(c) AS DOUBLE), 6) AS score
                         FROM comp GROUP BY doc_id),
              lex AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r_lex
                      FROM (SELECT * FROM scores ORDER BY score DESC, doc_id LIMIT 100)),
              v AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              n AS (SELECT doc_id, e,
                           SQRT((SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x))) AS nrm
                    FROM v),
              q AS (SELECT e AS q_e, nrm AS q_nrm FROM n WHERE doc_id = 0),
              sims AS (
                SELECT c.doc_id,
                       ROUND((SELECT SUM(p) FROM (SELECT UNNEST(q.q_e) * UNNEST(c.e) AS p))
                             / (c.nrm * q.q_nrm), 6) + 0.0 AS sim
                FROM n c CROSS JOIN q WHERE c.doc_id <> 0),
              sem AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS r_sem
                      FROM (SELECT * FROM sims ORDER BY sim DESC, doc_id LIMIT 100))
              SELECT doc_id,
                     ROUND(COALESCE(1.0/(60.0 + r_lex), 0.0)
                           + COALESCE(1.0/(60.0 + r_sem), 0.0), 6) AS rrf,
                     r_lex, r_sem
              FROM lex FULL JOIN sem USING (doc_id)
              ORDER BY rrf DESC, doc_id LIMIT 10""")),

    // Sequence packing (the batch-assembly stage of LLM training): docs
    // are concatenated in stable (doc_id) order within their source shard
    // and split into 512-token context windows; each doc is assigned the
    // bin its FIRST token lands in (GPT-style greedy packing). The window
    // cumsum is PARTITIONED BY source — each shard packs independently,
    // which is both what real pipelines do (packing never crosses shard
    // boundaries) and the property that keeps the running sum parallel at
    // 100 TB: no global single-partition window anywhere.
    QuerySpec(
      "text_pack",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")
        docs(s, dir)
          .select(col("doc_id"), col("source"), size(toks).as("n_tok"))
          .withColumn("cum", sum(col("n_tok")).over(w))
          .withColumn("bin", floor((col("cum") - col("n_tok")) / lit(512)))
          .groupBy("source", "bin")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("bin_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy("source", "bin")
      },
      Some("""WITH d AS (
                SELECT doc_id, source,
                       CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS BIGINT) AS n_tok
                FROM documents),
              c AS (
                SELECT doc_id, source, n_tok,
                       SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
                FROM d)
              SELECT source,
                     CAST(FLOOR((cum - n_tok) / 512.0) AS BIGINT) AS bin,
                     COUNT(*) AS n_docs,
                     CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
                     MIN(doc_id) AS first_doc,
                     MAX(doc_id) AS last_doc
              FROM c GROUP BY source, bin ORDER BY source, bin""")),

    // URL parsing (the provenance-filter stage of web-corpus curation:
    // block/allow by host, strip tracking params, bucket by path). URLs
    // are synthesized deterministically from document attributes, pushed
    // through Spark's real parse_url kernel, and the oracle composes
    // what each component must be from the same attributes — so the
    // parser is checked against ground truth, not against itself. Pure
    // per-row codegen, linear at any scale.
    QuerySpec(
      "fn_url",
      (s, dir) =>
        docs(s, dir)
          .withColumn("url", concat(
            lit("https://"), col("source"), lit(".example.com/"), col("lang"),
            lit("/"), col("doc_id"), lit("?q="), col("lang"), lit("&id="), col("doc_id")))
          .select(
            col("doc_id"),
            parse_url(col("url"), lit("PROTOCOL")).as("proto"),
            parse_url(col("url"), lit("HOST")).as("host"),
            parse_url(col("url"), lit("PATH")).as("path"),
            parse_url(col("url"), lit("QUERY")).as("query"),
            parse_url(col("url"), lit("QUERY"), lit("q")).as("q_param"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     'https' AS proto,
                     source || '.example.com' AS host,
                     '/' || lang || '/' || doc_id AS path,
                     'q=' || lang || '&id=' || doc_id AS query,
                     lang AS q_param
              FROM documents ORDER BY doc_id""")),

    // URL-canonicalization dedup — the provenance-level dedup stage every
    // web corpus runs BEFORE content dedup (the same page is crawled
    // under tracking params, fragments, case-shifted hosts, and trailing
    // slashes; canonicalizing collapses them without touching content).
    // The fixture synthesizes the noise deterministically from doc
    // attributes (mixed-case host, ?utm_ tracking tail, #fragment,
    // trailing slash) over a page space smaller than the corpus, so real
    // collisions exist; canonicalization = strip fragment → strip utm
    // query → strip trailing slash → lowercase, mirrored
    // operation-for-operation in the oracle (RE2-safe patterns, one
    // regexp kernel each — per-row codegen, then one compact groupBy on
    // the canonical string: two linear passes at any scale).
    QuerySpec(
      "text_url_dedup",
      (s, dir) => {
        val noisy = docs(s, dir).select(col("doc_id"),
          concat(
            lit("https://"),
            when(col("doc_id") % 2 === 0, lit("CDN.Example.com"))
              .otherwise(lit("cdn.example.com")),
            lit("/page"), col("doc_id") % 300,
            when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")),
            when(col("doc_id") % 3 === 0,
              concat(lit("?utm_source=feed&utm_id="), col("doc_id") % 5))
              .otherwise(lit("")),
            when(col("doc_id") % 5 === 0, concat(lit("#frag"), col("doc_id") % 3))
              .otherwise(lit(""))).as("url"))
        noisy
          .select(col("doc_id"), lower(
            regexp_replace(
              regexp_replace(
                regexp_replace(col("url"), "#.*$", ""),
                "\\?utm_[^#]*", ""),
              "/$", "")).as("canonical"))
          .groupBy("canonical")
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
          .orderBy("canonical")
      },
      Some("""WITH noisy AS (
                SELECT doc_id,
                       'https://' ||
                       CASE WHEN doc_id % 2 = 0 THEN 'CDN.Example.com'
                            ELSE 'cdn.example.com' END ||
                       '/page' || (doc_id % 300) ||
                       CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
                       CASE WHEN doc_id % 3 = 0
                            THEN '?utm_source=feed&utm_id=' || (doc_id % 5)
                            ELSE '' END ||
                       CASE WHEN doc_id % 5 = 0 THEN '#frag' || (doc_id % 3)
                            ELSE '' END AS url
                FROM documents)
              SELECT LOWER(
                       REGEXP_REPLACE(
                         REGEXP_REPLACE(
                           REGEXP_REPLACE(url, '#.*$', ''),
                           '\?utm_[^#]*', ''),
                         '/$', '')) AS canonical,
                     MIN(doc_id) AS keep_id,
                     COUNT(*) AS n_dups
              FROM noisy
              GROUP BY canonical
              ORDER BY canonical""")),

    // Unigram language-model scoring (the CCNet-style perplexity gate:
    // score each doc by its average token log-probability under a model
    // fit on the corpus itself; docs dominated by rare tokens score low
    // and get filtered). Per-token ln p is rounded to 6 THEN summed as
    // DECIMAL so partial-agg order can never move the hash; the corpus
    // total rides a 1-row broadcast like tf-idf's doc count. Two shuffles
    // on compact keys (term, doc_id) — linear at 100 TB, and the "model"
    // (term → count) is itself a reusable mergeable aggregate.
    QuerySpec(
      "text_unigram_logprob",
      (s, dir) => {
        val terms = docs(s, dir).select(col("doc_id"), explode(toks).as("term"))
        val freq = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
        val tot = terms.agg(count(lit(1)).as("total"))
        terms.join(freq, "term")
          .crossJoin(broadcast(tot)) // 1 row, always broadcastable
          .select(col("doc_id"),
            round(log(col("cnt") / col("total")), 6)
              .cast("decimal(18,6)").as("logp"))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_tok"),
            // `+ 0.0` collapses IEEE -0.0 (an avg in (-5e-7, 0) rounds to
            // negative zero under DuckDB's ROUND but not Spark's)
            (round(sum(col("logp")).cast("double") / count(lit(1)), 6) + lit(0.0)).as("avg_logprob"))
          .withColumn("keep", col("avg_logprob") > -3.6)
          .orderBy("doc_id")
      },
      Some("""WITH terms AS (
                SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS term
                FROM documents),
              freq AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY term),
              tot AS (SELECT COUNT(*) AS total FROM terms)
              SELECT doc_id,
                     COUNT(*) AS n_tok,
                     ROUND(CAST(SUM(CAST(ROUND(LN(cnt / total), 6) AS DECIMAL(18,6))) AS DOUBLE)
                           / COUNT(*), 6) + 0.0 AS avg_logprob,
                     ROUND(CAST(SUM(CAST(ROUND(LN(cnt / total), 6) AS DECIMAL(18,6))) AS DOUBLE)
                           / COUNT(*), 6) + 0.0 > -3.6 AS keep
              FROM terms JOIN freq USING (term) CROSS JOIN tot
              GROUP BY doc_id ORDER BY doc_id""")),

    // Bigram language-model scoring — the unigram gate's next rung (a
    // conditional model catches scrambled/boilerplate text the unigram
    // marginal cannot): P(w2|w1) with add-0.5 smoothing over the corpus
    // vocabulary, each doc scored by its average bigram log-probability.
    // The "model" is two mergeable count relations (bigram + unigram
    // context counts) and a 1-row vocabulary size broadcast — training IS
    // aggregation, reusable and incremental like every count-based LM.
    // Same determinism bridge as the unigram: per-bigram ln p rounded to
    // 6 THEN decimal-summed. Three partial-agg shuffles on compact keys;
    // linear at 100 TB.
    QuerySpec(
      "text_bigram_logprob",
      (s, dir) => {
        val tt = docs(s, dir).select(col("doc_id"), toks.as("t"))
        val bi = tt.filter(size(col("t")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
        val v = tt.select(explode(col("t")).as("term"))
          .agg(countDistinct(col("term")).as("v"))
        bi.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
          .crossJoin(broadcast(v)) // 1 row, always broadcastable
          .select(col("doc_id"),
            round(log((col("c12") + 0.5) / (col("c1") + col("v") * 0.5)), 6)
              .cast("decimal(18,6)").as("logp"))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_bigrams"),
            (round(sum(col("logp")).cast("double") / count(lit(1)), 6) + lit(0.0))
              .as("avg_logprob"))
          .withColumn("keep", col("avg_logprob") > -3.45)
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS t FROM documents),
              bi AS (
                SELECT doc_id, t[i] AS w1, t[i+1] AS w2
                FROM (SELECT doc_id, t, UNNEST(GENERATE_SERIES(1, LEN(t)-1)) AS i
                      FROM t WHERE LEN(t) >= 2)),
              c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
              c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY w1),
              v AS (SELECT COUNT(DISTINCT term) AS v
                    FROM (SELECT UNNEST(t) AS term FROM t))
              SELECT doc_id,
                     COUNT(*) AS n_bigrams,
                     ROUND(CAST(SUM(CAST(ROUND(LN((c12 + 0.5) / (c1 + 0.5 * v)), 6)
                                         AS DECIMAL(18,6))) AS DOUBLE)
                           / COUNT(*), 6) + 0.0 AS avg_logprob,
                     ROUND(CAST(SUM(CAST(ROUND(LN((c12 + 0.5) / (c1 + 0.5 * v)), 6)
                                         AS DECIMAL(18,6))) AS DOUBLE)
                           / COUNT(*), 6) + 0.0 > -3.45 AS keep
              FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
              GROUP BY doc_id ORDER BY doc_id""")),

    // Kneser–Ney smoothing (Kneser & Ney 1995; the interpolated form of
    // Chen & Goodman 1998) — the published upgrade over the add-α bigram
    // above, and what an actual LM-based quality scorer ships: absolute
    // discounting D=0.75 with the freed mass backed off to the
    // CONTINUATION distribution P_cont(w) = N1+(·w)/N1+(··) (how many
    // distinct contexts a word follows, not how often it occurs — the
    // fix for "san francisco"-style words that are frequent but
    // unpredictive). P(w₂|w₁) = (max(c₁₂−D,0) + D·N1+(w₁·)·P_cont(w₂))
    // / c₁ — sums to exactly 1 over the vocab per context (law-checked
    // in Round7CurationSpec). Scale shape: the corpus is scanned once
    // into the c₁₂ count relation (localCheckpoint barrier — FOUR model
    // aggregates consume it); every smoothing ingredient (c₁, N1+(w₁·),
    // N1+(·w₂), N1+(··)) is a second-level aggregate OF THE MODEL, not
    // another corpus pass, and the smoothed table is assembled by
    // model-sized joins so the corpus-sized stream joins ONCE on
    // (w₁,w₂). Same determinism bridge as the add-α twin: per-bigram ln
    // rounded to 6, decimal-summed.
    QuerySpec(
      "text_lm_kneser_ney",
      (s, dir) => {
        val bi = docs(s, dir).select(col("doc_id"), toks.as("t"))
          .filter(size(col("t")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
          .localCheckpoint()
        val ctx = c12.groupBy("w1").agg(sum(col("c12")).as("c1"),
          count(lit(1)).as("n1f"))
        val cont = c12.groupBy("w2").agg(count(lit(1)).as("n1b"))
        val nall = c12.agg(count(lit(1)).as("nall"))
        val model = c12.join(ctx, "w1").join(cont, "w2")
          .crossJoin(broadcast(nall)) // 1 row, always broadcastable
          .select(col("w1"), col("w2"),
            round(log(
              (greatest(col("c12") - 0.75, lit(0.0)) +
                lit(0.75) * col("n1f") * col("n1b") / col("nall")) / col("c1")), 6)
              .cast("decimal(18,6)").as("logp"))
        bi.join(model, Seq("w1", "w2"))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_bigrams"),
            (round(sum(col("logp")).cast("double") / count(lit(1)), 6) + lit(0.0))
              .as("avg_logprob"))
          .withColumn("keep", col("avg_logprob") > -3.39)
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS t FROM documents),
              bi AS (
                SELECT doc_id, t[i] AS w1, t[i+1] AS w2
                FROM (SELECT doc_id, t, UNNEST(GENERATE_SERIES(1, LEN(t)-1)) AS i
                      FROM t WHERE LEN(t) >= 2)),
              c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
              ctx AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1f
                      FROM c12 GROUP BY w1),
              cont AS (SELECT w2, COUNT(*) AS n1b FROM c12 GROUP BY w2),
              nall AS (SELECT COUNT(*) AS nall FROM c12),
              model AS (
                SELECT w1, w2,
                       CAST(ROUND(LN((GREATEST(c12 - 0.75, 0.0) +
                                      0.75 * n1f * n1b / nall) / c1), 6)
                            AS DECIMAL(18,6)) AS logp
                FROM c12 JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN nall)
              SELECT doc_id, COUNT(*) AS n_bigrams,
                     ROUND(CAST(SUM(logp) AS DOUBLE) / COUNT(*), 6) + 0.0
                       AS avg_logprob,
                     ROUND(CAST(SUM(logp) AS DOUBLE) / COUNT(*), 6) + 0.0 > -3.39
                       AS keep
              FROM bi JOIN model USING (w1, w2)
              GROUP BY doc_id ORDER BY doc_id""")),

    // DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling" — the public
    // hashed-n-gram recipe): score every raw document by how much its
    // hashed-bigram distribution resembles a TARGET distribution (here
    // the lang='en' slice stands in for the curated target corpus). The
    // model is two bucket-count vectors over a FIXED 1024-bucket hashed
    // feature space — so unlike the exact-vocabulary LMs above, model
    // size is CONSTANT in corpus size: the per-bucket log-likelihood
    // ratio table is ≤1024 rows and broadcasts, the raw/target counts
    // are one mergeable aggregate each, and the per-doc score is one
    // more compact-key aggregate. That constant-size model is the whole
    // point of DSIR at 100 TB — a trillion-token corpus still trains
    // the same 1024-row table. Add-0.5 smoothing keeps unseen buckets
    // finite; per-bucket ln rounded to 6 THEN decimal-summed (the
    // established partial-agg determinism bridge); keep = docs whose
    // average log-likelihood ratio is positive (more target-like than
    // raw-like — importance resampling keeps exactly those with
    // probability ∝ exp(score)).
    QuerySpec(
      "text_importance_dsir",
      (s, dir) => {
        val bi = docs(s, dir).select(col("doc_id"), col("lang"), toks.as("t"))
          .filter(size(col("t")) >= 2)
          .select(col("doc_id"), col("lang"), explode(expr(
            "transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))")).as("bg"))
          .select(col("doc_id"), col("lang"),
            (conv(substring(md5(col("bg")), 1, 8), 16, 10).cast("long") % 1024).as("b"))
        // ONE pass builds the whole model: raw and target counts ride
        // the same partial aggregate (tc = conditional count), and the
        // corpus totals are a second-level aggregate of the ≤1024-row
        // bucket table itself — so the corpus-sized bigram stream is
        // scanned once for training, not three times
        // checkpointed because BOTH tot and lr consume it — without the
        // barrier each consumer re-runs the corpus aggregate
        val counts = bi.groupBy("b").agg(
          count(lit(1)).as("r"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tc"))
          .localCheckpoint()
        val tot = counts.agg(sum(col("r")).as("nr"), sum(col("tc")).as("nt"))
        val lr = counts
          .crossJoin(broadcast(tot)) // 1 row, always broadcastable
          .select(col("b"),
            round(log(
              ((col("tc") + 0.5) / (col("nt") + 0.5 * 1024)) /
                ((col("r") + 0.5) / (col("nr") + 0.5 * 1024))), 6)
              .cast("decimal(18,6)").as("lr"))
        bi.join(broadcast(lr), Seq("b")) // ≤1024 rows by construction
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_feat"),
            (round(sum(col("lr")).cast("double") / count(lit(1)), 6) + lit(0.0))
              .as("avg_loglik"))
          .withColumn("keep", col("avg_loglik") > 0.0)
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id, lang, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS t
                FROM documents),
              bi AS (
                SELECT doc_id, lang,
                       ('0x' || SUBSTR(MD5(t[i] || ' ' || t[i+1]), 1, 8))::BIGINT % 1024 AS b
                FROM (SELECT doc_id, lang, t, UNNEST(GENERATE_SERIES(1, LEN(t)-1)) AS i
                      FROM t WHERE LEN(t) >= 2)),
              raw AS (SELECT b, COUNT(*) AS r FROM bi GROUP BY b),
              tgt AS (SELECT b, COUNT(*) AS tc FROM bi WHERE lang = 'en' GROUP BY b),
              tot AS (SELECT COUNT(*) AS nr,
                             SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS nt
                      FROM bi),
              lr AS (SELECT b,
                            CAST(ROUND(LN(((COALESCE(tc, 0) + 0.5) / (nt + 0.5 * 1024)) /
                                          ((r + 0.5) / (nr + 0.5 * 1024))), 6)
                                 AS DECIMAL(18,6)) AS lr
                     FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot)
              SELECT doc_id,
                     COUNT(*) AS n_feat,
                     ROUND(CAST(SUM(lr) AS DOUBLE) / COUNT(*), 6) + 0.0 AS avg_loglik,
                     ROUND(CAST(SUM(lr) AS DOUBLE) / COUNT(*), 6) + 0.0 > 0.0 AS keep
              FROM bi JOIN lr USING (b)
              GROUP BY doc_id ORDER BY doc_id""")),

    // CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    // Extracting High Quality Monolingual Datasets from Web Crawl
    // Data"): score every document with the corpus unigram LM (the
    // text_unigram_logprob kernel — CCNet uses KenLM perplexity; the
    // bucketing logic is identical for any per-doc score), then split
    // each LANGUAGE into head/middle/tail thirds by score — the split
    // that lets a pretraining mix oversample the fluent head and drop
    // or down-weight the tail. Two-stage plan: the corpus-sized
    // tokenize/score pass is the same linear shape the LM gates use,
    // and the NTILE window then runs over the COMPACT (doc_id, lang,
    // score) relation only — ~24 bytes/doc, never the text. At extreme
    // per-language volumes the exact ntile would swap for
    // approx-quantile thresholds broadcast back (the SemDeDup
    // precedent: exactness kept here for oracle determinism; the
    // bucket-assignment semantics are unchanged). Ties broken by
    // doc_id so both engines assign identically.
    QuerySpec(
      "text_perplexity_buckets",
      (s, dir) => {
        val terms = docs(s, dir).select(col("doc_id"), col("lang"), explode(toks).as("term"))
        val freq = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
        val tot = terms.agg(count(lit(1)).as("total"))
        val scored = terms.join(freq, "term")
          .crossJoin(broadcast(tot))
          .select(col("doc_id"), col("lang"),
            round(log(col("cnt") / col("total")), 6)
              .cast("decimal(18,6)").as("logp"))
          .groupBy("doc_id", "lang")
          .agg((round(sum(col("logp")).cast("double") / count(lit(1)), 6) + lit(0.0))
            .as("score"))
        val w = Window.partitionBy("lang")
          .orderBy(col("score").desc, col("doc_id"))
        scored
          .withColumn("bucket", ntile(3).over(w).cast("long"))
          .groupBy("lang", "bucket")
          .agg(
            count(lit(1)).as("n_docs"),
            (round(sum(col("score").cast("decimal(18,6)")).cast("double")
              / count(lit(1)), 6) + lit(0.0)).as("avg_score"))
          .orderBy("lang", "bucket")
      },
      Some("""WITH terms AS (
                SELECT doc_id, lang,
                       UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS term
                FROM documents),
              freq AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY term),
              tot AS (SELECT COUNT(*) AS total FROM terms),
              scored AS (
                SELECT doc_id, lang,
                       ROUND(CAST(SUM(CAST(ROUND(LN(cnt / total), 6) AS DECIMAL(18,6))) AS DOUBLE)
                             / COUNT(*), 6) + 0.0 AS score
                FROM terms JOIN freq USING (term) CROSS JOIN tot
                GROUP BY doc_id, lang),
              b AS (
                SELECT lang, score,
                       NTILE(3) OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS bucket
                FROM scored)
              SELECT lang, bucket, COUNT(*) AS n_docs,
                     ROUND(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
                           / COUNT(*), 6) + 0.0 AS avg_score
              FROM b GROUP BY lang, bucket ORDER BY lang, bucket""")),

    // Overlapping token-window chunking — the segmentation step every
    // training-data / retrieval pipeline runs before embedding or
    // sequence assembly: 32-token windows at stride 24 (8-token overlap
    // so no boundary context is lost), one output row per chunk with a
    // content hash for downstream chunk-level dedup/lookup. Pure
    // per-row codegen (tokenize → transform/sequence → posexplode) —
    // zero shuffles before the verification orderBy, embarrassingly
    // parallel at any corpus size; chunk count per doc is
    // floor((n_tok-1)/24)+1 in both engines by construction.
    QuerySpec(
      "text_chunking",
      (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"), toks.as("t"))
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(0, int(floor((size(t)-1)/24))), k -> slice(t, k*24+1, 32))"))
            .as(Seq("chunk_idx", "ct")))
          .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
            size(col("ct")).cast("long").as("n_tokens"),
            graft.functions.HashBridge.h32(concat_ws(" ", col("ct"))).as("chunk_hash"))
          .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (
                SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS t FROM documents),
              k AS (
                SELECT doc_id, t,
                       UNNEST(GENERATE_SERIES(0, CAST(FLOOR((LEN(t)-1)/24) AS BIGINT))) AS k
                FROM t),
              c AS (
                SELECT doc_id, k AS chunk_idx, t[k*24+1 : k*24+32] AS ct FROM k)
              SELECT doc_id, chunk_idx,
                     CAST(LEN(ct) AS BIGINT) AS n_tokens,
                     ('0x'||SUBSTR(MD5(ARRAY_TO_STRING(ct, ' ')),1,8))::BIGINT AS chunk_hash
              FROM c ORDER BY doc_id, chunk_idx""")),

    // The round-6 curation ops COMPOSED as one declarative plan — the
    // modern pretraining recipe pipeline_curate predates: CCNet
    // perplexity bucketing drops each language's tail third, then
    // SoftDedup importance resampling thins the survivors by duplicate
    // commonness (deterministic hash draw < weight), and the report is
    // the per-language corpus mix a training run would sample from.
    // Composition is the point: the LM scorer, the ntile bucketing, the
    // shingle-df weights, and the resample draw all run inside ONE
    // Catalyst plan — the corpus is tokenized once per signal, every
    // shuffle carries compact keys, and no stage materializes between
    // stages. The shapes are each individually verified
    // (text_perplexity_buckets, dedup_soft_weights/resample); here the
    // oracle verifies their JOIN semantics end-to-end.
    QuerySpec(
      "pipeline_curate_soft",
      (s, dir) => {
        // stage 1: per-doc unigram LM score → per-lang head/middle kept
        val terms = docs(s, dir).select(col("doc_id"), col("lang"), explode(toks).as("term"))
        val freq = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
        val tot = terms.agg(count(lit(1)).as("total"))
        val scored = terms.join(freq, "term").crossJoin(broadcast(tot))
          .select(col("doc_id"), col("lang"),
            round(log(col("cnt") / col("total")), 6).cast("decimal(18,6)").as("logp"))
          .groupBy("doc_id", "lang")
          .agg((round(sum(col("logp")).cast("double") / count(lit(1)), 6) + lit(0.0))
            .as("score"))
        val bucketed = scored.withColumn("bucket", ntile(3).over(
          Window.partitionBy("lang").orderBy(col("score").desc, col("doc_id"))))
        // stage 2: soft-dedup weight + deterministic resample draw
        val sh = docs(s, dir).repartition(col("doc_id"))
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
          .select(col("doc_id"),
            explode(when(size(col("t")) >= 3,
              expr("transform(sequence(0, size(t)-3), i -> concat(t[i],' ',t[i+1],' ',t[i+2]))"))
              .otherwise(expr("CAST(array() AS array<string>)"))).as("g"))
          .select(col("doc_id"), graft.functions.HashBridge.h32(col("g")).as("h"))
          .distinct()
        val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
        val weights = sh.join(dfreq, "h")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("ns"), sum(col("df")).as("sdf"))
          .select(col("doc_id"),
            (round(col("ns").cast("double") / col("sdf"), 6) + lit(0.0)).as("weight"),
            (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
              .cast("double") / 16777216.0).as("u"))
        bucketed.join(weights, "doc_id")
          .withColumn("kept", col("bucket") <= 2 && col("u") < col("weight"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            round(sum(when(col("kept"), col("weight").cast("decimal(18,6)"))
              .otherwise(lit(0).cast("decimal(18,6)"))).cast("double"), 6).as("kept_weight"))
          .orderBy("lang")
      },
      Some("""WITH terms AS (
                SELECT doc_id, lang,
                       UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS term
                FROM documents),
              freq AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY term),
              tot AS (SELECT COUNT(*) AS total FROM terms),
              scored AS (
                SELECT doc_id, lang,
                       ROUND(CAST(SUM(CAST(ROUND(LN(cnt / total), 6) AS DECIMAL(18,6))) AS DOUBLE)
                             / COUNT(*), 6) + 0.0 AS score
                FROM terms JOIN freq USING (term) CROSS JOIN tot
                GROUP BY doc_id, lang),
              b AS (
                SELECT doc_id, lang,
                       NTILE(3) OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS bucket
                FROM scored),
              toks AS (
                SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS t FROM documents),
              idx AS (
                SELECT doc_id, t, UNNEST(GENERATE_SERIES(1, LEN(t)-2)) AS i
                FROM toks WHERE LEN(t) >= 3),
              sh AS (
                SELECT DISTINCT doc_id,
                       ('0x'||SUBSTR(MD5(t[i]||' '||t[i+1]||' '||t[i+2]),1,8))::BIGINT AS h
                FROM idx),
              dfq AS (SELECT h, COUNT(*) AS df FROM sh GROUP BY h),
              w AS (
                SELECT doc_id,
                       ROUND(COUNT(*) / CAST(SUM(df) AS DOUBLE), 6) + 0.0 AS weight,
                       CAST(('0x'||SUBSTR(MD5(CAST(doc_id AS VARCHAR)),1,6))::BIGINT AS DOUBLE)
                         / 16777216.0 AS u
                FROM sh JOIN dfq USING (h)
                GROUP BY doc_id),
              j AS (
                SELECT b.lang, b.bucket <= 2 AND w.u < w.weight AS kept, w.weight
                FROM b JOIN w USING (doc_id))
              SELECT lang, COUNT(*) AS n_docs,
                     CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                     ROUND(CAST(SUM(CASE WHEN kept THEN CAST(weight AS DECIMAL(18,6))
                                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE), 6)
                       AS kept_weight
              FROM j GROUP BY lang ORDER BY lang""")),

    // End-to-end curation pipeline as ONE declarative plan — the shape a
    // real pretraining data job takes: quality gate (the text_quality_
    // filter predicates, SAME Scala helpers so the stages cannot drift)
    // → exact dedup (canonical doc = lowest doc_id per md5 digest) →
    // per-source corpus-mix report. Composing in one plan is the point:
    // Catalyst pushes the gate into the scan, the dedup groupBy shuffles
    // 16-byte digests (never text), and the final rollup rides the
    // partial-agg path — three pipeline stages, ONE pass over the
    // corpus, two compact-key shuffles, linear at 100 TB.
    QuerySpec(
      "pipeline_curate",
      (s, dir) => {
        val gated = docs(s, dir)
          .withColumn("n_tokens", size(toks))
          .withColumn("sw_ratio",
            round(enMarkers.cast("double") / col("n_tokens"), 6))
          .filter(col("n_tokens").between(30, 1000) &&
            col("sw_ratio") >= 0.04 && langPred === "en")
        val canon = gated
          .groupBy(md5(col("text")).as("dg"))
          .agg(min(struct(col("doc_id"), col("source"),
            col("n_tokens"), col("sw_ratio"))).as("k"))
        canon
          .groupBy(col("k.source").as("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("k.n_tokens")).cast("long").as("total_tokens"),
            round(sum(col("k.sw_ratio").cast("decimal(18,6)")).cast("double")
              / count(lit(1)), 6).as("avg_sw_ratio"))
          .orderBy("source")
      },
      Some("""WITH m AS (
                SELECT doc_id,
                       CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS INT) AS n_tokens,
                       LENGTH(REGEXP_REPLACE(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) > 0 AS cjk,
                       LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)),'\s+'),
                           t -> t IN ('the','a','of','and','to','in'))) AS en,
                       LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)),'\s+'),
                           t -> t IN ('el','la','de','que','y','los'))) AS es,
                       LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)),'\s+'),
                           t -> t IN ('der','die','und','das','ist'))) AS de,
                       LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)),'\s+'),
                           t -> t IN ('le','les','et','des','un'))) AS fr
                FROM documents),
              g AS (
                SELECT d.doc_id, d.source, d.text, m.n_tokens,
                       ROUND(CAST(m.en AS DOUBLE) / m.n_tokens, 6) AS sw_ratio
                FROM documents d JOIN m USING (doc_id)
                WHERE m.n_tokens BETWEEN 30 AND 1000
                  AND ROUND(CAST(m.en AS DOUBLE) / m.n_tokens, 6) >= 0.04
                  AND NOT m.cjk
                  AND NOT (m.es > m.en AND m.es >= m.de AND m.es >= m.fr)
                  AND NOT (m.de > m.en AND m.de >= m.fr)
                  AND NOT (m.fr > m.en)),
              c AS (
                SELECT * FROM (
                  SELECT g.*, ROW_NUMBER() OVER (PARTITION BY MD5(text)
                                                 ORDER BY doc_id) AS rn
                  FROM g) WHERE rn = 1)
              SELECT source, COUNT(*) AS n_docs,
                     CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                     ROUND(CAST(SUM(CAST(sw_ratio AS DECIMAL(18,6))) AS DOUBLE)
                           / COUNT(*), 6) AS avg_sw_ratio
              FROM c GROUP BY source ORDER BY source""")),

    // Gopher-style repetition-free quality rules (Rae et al. 2021, the
    // public heuristic battery behind MassiveText): word-count bounds,
    // mean-word-length band, alphabetic-word ratio, and stop-word
    // presence, each emitted as a metric plus the combined keep flag.
    // Thresholds sit inside the corpus' observed distributions (word
    // counts 10–99, mean lengths 3.7–5.3 at every SF) so the gate
    // provably discriminates rather than passing everything. All four
    // signals come from ONE tokenization shared via `tk`; every lambda
    // is a codegen'd built-in, so the whole battery is a single
    // shuffle-free scan before the output sort — per-row linear at
    // 100 TB exactly like text_quality_filter.
    QuerySpec(
      "text_gopher_rules",
      (s, dir) =>
        docs(s, dir)
          .withColumn("tk", toks)
          .select(
            col("doc_id"),
            size(col("tk")).as("n_words"),
            round(
              aggregate(transform(col("tk"), x => length(x)), lit(0), (a, x) => a + x)
                .cast("double") / size(col("tk")), 4).as("mean_word_len"),
            round(
              size(filter(col("tk"), x => x.rlike("[A-Za-z]"))).cast("double")
                / size(col("tk")), 4).as("alpha_ratio"),
            size(expr("filter(tk, x -> x IN ('the','a','of','and','to'))"))
              .as("n_stopwords"))
          .withColumn("keep",
            col("n_words").between(30, 1000) &&
              col("mean_word_len").between(3.5, 5.0) &&
              col("alpha_ratio") >= 0.8 &&
              col("n_stopwords") >= 2)
          .orderBy("doc_id"),
      Some("""WITH m AS (
                SELECT doc_id,
                       CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS INT) AS n_words,
                       ROUND(CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT_REGEX(TRIM(text), '\s+'),
                                                          x -> LENGTH(x))) AS DOUBLE)
                             / LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')), 4) AS mean_word_len,
                       ROUND(CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\s+'),
                                                  x -> REGEXP_MATCHES(x, '[A-Za-z]'))) AS DOUBLE)
                             / LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')), 4) AS alpha_ratio,
                       CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\s+'),
                                            x -> x IN ('the','a','of','and','to'))) AS INT)
                         AS n_stopwords
                FROM documents)
              SELECT doc_id, n_words, mean_word_len, alpha_ratio, n_stopwords,
                     (n_words BETWEEN 30 AND 1000
                      AND mean_word_len BETWEEN 3.5 AND 5.0
                      AND alpha_ratio >= 0.8
                      AND n_stopwords >= 2) AS keep
              FROM m ORDER BY doc_id""")),

    // The published C4 cleaning heuristics (Raffel et al. 2020, §2.2 —
    // the other canonical quality battery beside Gopher's): keep only
    // lines ending in terminal punctuation, with ≥5 words, and without
    // the word "javascript"; drop whole pages with fewer than 3 retained
    // sentences, any "lorem ipsum", or a curly brace. The synthetic
    // corpus has no line structure or punctuation, so — the text_scrub /
    // repetition-battery precedent — lines are reconstructed as 10-token
    // segments and the trigger features are injected deterministically
    // in BOTH engines (arithmetic on (doc_id, line-idx), no RNG): ~70%
    // of lines get terminal '.', every 37th (doc·7+i) line a leading
    // "javascript", every 41st/43rd doc a trailing "lorem ipsum"/"{" —
    // so every rule provably discriminates AND is applied to real
    // strings (endswith/contains on the built line), not to the
    // injection flags. Scale shape: the whole battery is per-document
    // higher-order functions — a ZERO-SHUFFLE scan→project before the
    // output sort, linear at 100 TB; C4's cross-page three-sentence-span
    // dedup is the separate dedup_spans operator.
    QuerySpec(
      "text_c4_filter",
      (s, dir) =>
        docs(s, dir)
          .withColumn("t", toks)
          .filter(size(col("t")) >= 1)
          .withColumn("lines", expr(
            """transform(sequence(0, cast(ceil(size(t)/10.0) as int) - 1),
               i -> concat(
                 case when (doc_id * 7 + i) % 37 = 0 then 'javascript ' else '' end,
                 concat_ws(' ', slice(t, i*10+1, 10)),
                 case when (doc_id + i) % 10 < 7 then '.' else '' end))"""))
          .withColumn("kept", expr(
            """filter(lines, x ->
                 (endswith(x, '.') or endswith(x, '!') or endswith(x, '?')
                  or endswith(x, '"')) and
                 size(split(x, ' ')) >= 5 and not contains(x, 'javascript'))"""))
          .withColumn("page", expr(
            """concat(concat_ws(' ', lines),
                 case when doc_id % 41 = 0 then ' lorem ipsum' else '' end,
                 case when doc_id % 43 = 0 then ' {' else '' end)"""))
          .select(
            col("doc_id"),
            size(col("lines")).cast("long").as("n_lines"),
            size(col("kept")).cast("long").as("n_kept"),
            (size(col("kept")) >= 3 &&
              !expr("contains(page, 'lorem ipsum')") &&
              !expr("contains(page, '{')")).as("keep"))
          .orderBy("doc_id"),
      Some("""WITH t AS (
                SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS t
                FROM documents),
              l AS (
                SELECT doc_id,
                       [CASE WHEN (doc_id * 7 + i) % 37 = 0
                             THEN 'javascript ' ELSE '' END ||
                        ARRAY_TO_STRING(t[i*10+1 : i*10+10], ' ') ||
                        CASE WHEN (doc_id + i) % 10 < 7 THEN '.' ELSE '' END
                        FOR i IN GENERATE_SERIES(0, CAST(CEIL(LEN(t)/10.0) AS INT) - 1)]
                         AS lines
                FROM t WHERE LEN(t) >= 1),
              k AS (
                SELECT doc_id, lines,
                       LIST_FILTER(lines, x ->
                         (ENDS_WITH(x, '.') OR ENDS_WITH(x, '!') OR
                          ENDS_WITH(x, '?') OR ENDS_WITH(x, '"')) AND
                         LEN(STRING_SPLIT(x, ' ')) >= 5 AND
                         NOT CONTAINS(x, 'javascript')) AS kept,
                       ARRAY_TO_STRING(lines, ' ') ||
                         CASE WHEN doc_id % 41 = 0 THEN ' lorem ipsum' ELSE '' END ||
                         CASE WHEN doc_id % 43 = 0 THEN ' {' ELSE '' END AS page
                FROM l)
              SELECT doc_id, LEN(lines) AS n_lines, LEN(kept) AS n_kept,
                     (LEN(kept) >= 3 AND NOT CONTAINS(page, 'lorem ipsum')
                      AND NOT CONTAINS(page, '{')) AS keep
              FROM k ORDER BY doc_id""")),

    // In-engine classifier TRAINING: a multinomial Naive Bayes language
    // classifier (the fastText-langid shape) learned entirely as
    // aggregation — no gradient loop, no driver-side math. Train = one
    // partial-aggregating groupBy on (lang, token) + a per-class total +
    // the corpus vocab size; the model is add-one-smoothed token
    // log-likelihoods, |vocab|×|classes| rows — the broadcastable
    // constant every NB deployment ships. At 100 TB you train on a
    // sample (the sampling tier feeds this) and the plan is unchanged;
    // the full-corpus train here is still linear: one compact-key
    // shuffle. Engine-parity: double division + LN + ROUND(6) on both
    // sides (the text_entropy precedent).
    QuerySpec(
      "text_nb_train",
      (s, dir) => nbModel(docs(s, dir))
        .select(col("lang"), col("token"), col("cnt"), col("logp"))
        .orderBy("lang", "token"),
      Some(s"""WITH $NbModelCtes
              SELECT lang, token, cnt, logp FROM model ORDER BY lang, token""")),

    // The trained model APPLIED back over the corpus: per-doc class
    // scores with exact multinomial semantics — absent-token mass counts
    // via the smoothing floor (score_c = prior_c + n_tokens·floor_c +
    // Σ_present tf·(logp − floor_c)), so the present-token join stays
    // INNER and sparse instead of materializing |docs|×|vocab|. All
    // score arithmetic runs in integer MICROS (the 6-decimal model terms
    // ×1e6 as longs): exact like decimals — partial-agg order can't
    // shift a sum — but codegen-cheap on the tf×classes-sized scoring
    // relation. The only corpus-sized shuffles are the per-doc tf
    // groupBy and the final per-doc score agg — the 5-row class table
    // and the vocab×5 model broadcast. Self-train/self-apply keeps the
    // oracle closed over one table; in production the model side is
    // yesterday's sample train.
    QuerySpec(
      "text_nb_apply",
      (s, dir) => nbPredictions(s, dir).orderBy("doc_id"),
      Some(s"""WITH $NbApplyCtes
              SELECT doc_id, m_lang AS pred, actual, m_lang = actual AS correct, score
              FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                                 ORDER BY score DESC, m_lang ASC) AS rn
                    FROM scored)
              WHERE rn = 1 ORDER BY doc_id""")),

    // Language-ID CONFUSION MATRIX — the evaluation completing the NB
    // classifier tier (train → apply → evaluate), and the third member
    // of the audit family (dedup_recall_audit, topk_similarity_recall):
    // per (actual, predicted) doc counts, the table a curation pipeline
    // reads before trusting a language gate. One extra partial-agg
    // shuffle of ≤|langs|² compact keys over the shared prediction
    // relation — nothing corpus-sized beyond what apply already does.
    QuerySpec(
      "text_nb_confusion",
      (s, dir) =>
        nbPredictions(s, dir)
          .groupBy(col("actual"), col("pred"))
          .agg(count(lit(1)).as("n"))
          .orderBy("actual", "pred"),
      Some(s"""WITH $NbApplyCtes,
              |preds AS (
              |  SELECT actual, m_lang AS pred
              |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              |                                     ORDER BY score DESC, m_lang ASC) AS rn
              |        FROM scored)
              |  WHERE rn = 1)
              |SELECT actual, pred, COUNT(*) AS n FROM preds
              |GROUP BY actual, pred ORDER BY actual, pred""".stripMargin)),

    // Per-class PRECISION / RECALL / F1 — the summary a pipeline owner
    // actually reads off the confusion matrix before trusting a language
    // gate (macro metrics are what the published langid evaluations
    // report). Everything after the shared prediction relation runs on
    // the ≤|langs|² confusion rows: TP is the diagonal, FP/FN are the
    // column/row sums minus it — two tiny aggregates and a join, nothing
    // corpus-sized beyond what apply already does. Ratios round to the
    // 6-grid from exact integer counts so the hash oracle is trivial;
    // a class never predicted defines precision = 0 (the CASE both
    // engines spell identically).
    QuerySpec(
      "text_nb_prf",
      (s, dir) => {
        val cm = nbPredictions(s, dir)
          .groupBy(col("actual"), col("pred"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint() // ≤25 rows; feeds tp, row sums, col sums
        val tp = cm.filter(col("actual") === col("pred"))
          .select(col("actual").as("lang"), col("n").as("tp"))
        val act = cm.groupBy(col("actual").as("lang")).agg(sum("n").as("na"))
        val prd = cm.groupBy(col("pred").as("lang")).agg(sum("n").as("np"))
        val prf = act.join(prd, Seq("lang"), "left")
          .join(tp, Seq("lang"), "left")
          .select(col("lang"),
            coalesce(col("tp"), lit(0L)).as("tp"),
            (coalesce(col("np"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
            (col("na") - coalesce(col("tp"), lit(0L))).as("fn"))
          .withColumn("precision",
            when(col("tp") + col("fp") === 0, lit(0.0))
              .otherwise(round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
              + lit(0.0))
          .withColumn("recall",
            (round(col("tp").cast("double") / (col("tp") + col("fn")), 6) + lit(0.0)))
        prf.withColumn("f1",
            when(col("precision") + col("recall") === 0, lit(0.0))
              .otherwise(round(
                lit(2.0) * col("precision") * col("recall")
                  / (col("precision") + col("recall")), 6)) + lit(0.0))
          .orderBy("lang")
      },
      Some(s"""WITH $NbApplyCtes,
              |preds AS (
              |  SELECT actual, m_lang AS pred
              |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              |                                     ORDER BY score DESC, m_lang ASC) AS rn
              |        FROM scored)
              |  WHERE rn = 1),
              |cm AS MATERIALIZED (
              |  SELECT actual, pred, COUNT(*) AS n FROM preds GROUP BY actual, pred),
              |tp AS (SELECT actual AS lang, n AS tp FROM cm WHERE actual = pred),
              |act AS (SELECT actual AS lang, SUM(n) AS na FROM cm GROUP BY actual),
              |prd AS (SELECT pred AS lang, SUM(n) AS np FROM cm GROUP BY pred),
              |cnts AS (
              |  SELECT a.lang, CAST(COALESCE(t.tp, 0) AS BIGINT) AS tp,
              |         CAST(COALESCE(p.np, 0) - COALESCE(t.tp, 0) AS BIGINT) AS fp,
              |         CAST(a.na - COALESCE(t.tp, 0) AS BIGINT) AS fn
              |  FROM act a LEFT JOIN prd p USING (lang) LEFT JOIN tp t USING (lang)),
              |prf AS (
              |  SELECT lang, tp, fp, fn,
              |         CASE WHEN tp + fp = 0 THEN 0.0
              |              ELSE ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) END + 0.0
              |           AS precision,
              |         ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) + 0.0 AS recall
              |  FROM cnts)
              |SELECT lang, tp, fp, fn, precision, recall,
              |       CASE WHEN precision + recall = 0 THEN 0.0
              |            ELSE ROUND(2.0 * precision * recall
              |                       / (precision + recall), 6) END + 0.0 AS f1
              |FROM prf ORDER BY lang""".stripMargin)),

    // HELD-OUT evaluation — the honest version of the self-train
    // numbers above: NB trains on folds 1–4 of a doc_id % 5 split
    // (pure modulo, identical in both engines) and is scored ONLY on
    // the unseen fold 0, against the train-majority-class baseline on
    // that same fold. This is the generalization check a pipeline runs
    // before trusting a gate — self-apply accuracy overstates a
    // memorizing model; a holdout can't. Same plan family as apply
    // (the split is two pushdown filters over the one tokenization);
    // the summary is a 1-row aggregate of the fold's predictions.
    QuerySpec(
      "text_nb_holdout",
      (s, dir) => {
        val preds = nbPredictions(s, dir, testFold = Some(0))
        val maj = docs(s, dir).filter(col("doc_id") % 5 =!= 0)
          .groupBy("lang").agg(count(lit(1)).as("c"))
          .withColumn("rn",
            row_number().over(Window.orderBy(col("c").desc, col("lang"))))
          .filter(col("rn") === 1).select(col("lang").as("mlang"))
        preds.crossJoin(broadcast(maj))
          .agg(count(lit(1)).as("n_test"),
            sum(when(col("correct"), 1L).otherwise(0L)).as("n_correct"),
            sum(when(col("actual") === col("mlang"), 1L).otherwise(0L))
              .as("n_majority"))
          .select(col("n_test"), col("n_correct"),
            (round(col("n_correct").cast("double") / col("n_test"), 6)
              + lit(0.0)).as("accuracy"),
            (round(col("n_majority").cast("double") / col("n_test"), 6)
              + lit(0.0)).as("baseline"))
          .withColumn("beats_baseline", col("accuracy") > col("baseline"))
      },
      Some(s"""WITH ${nbApplyCtes("doc_id % 5 != 0", "doc_id % 5 = 0")},
              |preds AS (
              |  SELECT actual, m_lang = actual AS correct
              |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              |                                     ORDER BY score DESC, m_lang ASC) AS rn
              |        FROM scored)
              |  WHERE rn = 1),
              |maj AS (
              |  SELECT lang AS mlang FROM (
              |    SELECT lang, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, lang) AS rn
              |    FROM documents WHERE doc_id % 5 != 0 GROUP BY lang)
              |  WHERE rn = 1),
              |agg AS (
              |  SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
              |         CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT)
              |           AS n_correct,
              |         CAST(SUM(CASE WHEN actual = mlang THEN 1 ELSE 0 END) AS BIGINT)
              |           AS n_majority
              |  FROM preds, maj)
              |SELECT n_test, n_correct,
              |       ROUND(CAST(n_correct AS DOUBLE) / n_test, 6) + 0.0 AS accuracy,
              |       ROUND(CAST(n_majority AS DOUBLE) / n_test, 6) + 0.0 AS baseline,
              |       ROUND(CAST(n_correct AS DOUBLE) / n_test, 6)
              |         > ROUND(CAST(n_majority AS DOUBLE) / n_test, 6)
              |         AS beats_baseline
              |FROM agg""".stripMargin)),

    // In-engine LOGISTIC REGRESSION training — the fastText-style linear
    // quality/language gate every production curation stack trains (the
    // GPT-3 / LLaMA quality-filter shape), completing the classifier
    // tier beside the generative NB twin: binary target y = (lang='en'),
    // features = hashed-token bucket FRACTIONS (D=16 buckets over the
    // md5 bridge, plus a bias feature at b=-1), trained by FOUR
    // full-batch gradient-descent steps at lr=4.0. Scale shape: the
    // corpus tokenizes ONCE into the per-doc feature relation
    // (localCheckpoint — it feeds every iteration and the gate); each
    // iteration is two compact-key shuffles over it (per-doc score agg,
    // per-bucket gradient agg) against the 17-row broadcast weight
    // vector — the model is CONSTANT-size in corpus size, so at 100 TB
    // you run the same K passes (or train on a sample; plan unchanged —
    // the NB stance). FP determinism (the PowerIterate lockstep
    // precedent): features and weights live on the 6-decimal grid as
    // DECIMAL(18,6); scores and gradients are exact decimal sums of
    // scale-12 products (partial-agg order can't move them); only the
    // sigmoid runs in double (correctly-rounded IEEE ops on identical
    // input bits), re-anchored to the grid by ROUND(…,6) each
    // iteration so drift cannot accumulate. The DuckDB oracle re-runs
    // the SAME four iterations as generated MATERIALIZED CTEs.
    QuerySpec(
      "text_lr_train",
      (s, dir) => {
        val (ft, base) = lrFeatures(s, dir)
        selfTrainedLrWeights(s, dir, ft, base)
          .select(col("b").as("feature"),
            (round(col("w").cast("double"), 6) + lit(0.0)).as("weight"))
          .orderBy("feature")
      },
      Some(s"""WITH $LrCtes
              |SELECT b AS feature, ROUND(CAST(w AS DOUBLE), 6) + 0.0 AS weight
              |FROM w$LrIters ORDER BY feature""".stripMargin),
      cacheAssisted = true),

    // The trained LR model APPLIED back over the corpus: per-doc
    // sigmoid probability, the ≥0.5 keep decision, and correctness
    // against the label — the gate a pipeline actually runs (and the
    // evaluation row the lr-vs-prior audit in Round7CurationSpec
    // reads). One more score pass over the checkpointed feature
    // relation against the final 17-row broadcast — apply adds NOTHING
    // corpus-shaped beyond one compact aggregate.
    QuerySpec(
      "text_lr_gate",
      (s, dir) => {
        val (ft, base) = lrFeatures(s, dir)
        val w = selfTrainedLrWeights(s, dir, ft, base)
        ft.join(broadcast(w), "b")
          .groupBy("doc_id", "y").agg(sum(col("x") * col("w")).as("s"))
          .select(col("doc_id"), (col("y") > lit(0.5)).as("is_en"),
            (round(lit(1.0) / (lit(1.0) + exp(-col("s").cast("double"))), 6)
              + lit(0.0)).as("p"))
          .withColumn("pred", col("p") >= 0.5)
          .withColumn("correct", col("pred") === col("is_en"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $LrCtes,
              |sg AS (SELECT ft.doc_id, ft.y, SUM(ft.x * w.w) AS s
              |       FROM ft JOIN w$LrIters w USING (b)
              |       GROUP BY ft.doc_id, ft.y)
              |SELECT doc_id, y > 0.5 AS is_en,
              |       ROUND(1.0 / (1.0 + EXP(-CAST(s AS DOUBLE))), 6) + 0.0 AS p,
              |       ROUND(1.0 / (1.0 + EXP(-CAST(s AS DOUBLE))), 6) + 0.0 >= 0.5
              |         AS pred,
              |       (ROUND(1.0 / (1.0 + EXP(-CAST(s AS DOUBLE))), 6) + 0.0 >= 0.5)
              |         = (y > 0.5) AS correct
              |FROM sg ORDER BY doc_id""".stripMargin),
      cacheAssisted = true),

    // LR HELD-OUT evaluation — the loss-space generalization check (the
    // NB holdout's twin, but in the metric GD actually optimizes):
    // weights train on folds 1–4 of the doc_id % 5 split, the unseen
    // fold scores, and the held-out mean log-loss sits beside the null
    // model's ln 2. A memorizing model can ace self-apply loss; it
    // cannot beat ln 2 on unseen docs unless the learned weights
    // actually generalize. Same plan family as the gate: the split is
    // two pushdown filters over the one checkpointed feature relation,
    // the summary one 1-row aggregate of rounded per-doc losses
    // (decimal-summed so partial-agg order can't move the mean).
    QuerySpec(
      "text_lr_holdout",
      (s, dir) => {
        val (ft, base) = lrFeatures(s, dir)
        val ftt = ft.filter(col("doc_id") % 5 =!= 0)
        val nd = base.filter(col("doc_id") % 5 =!= 0).agg(count(lit(1)).as("nd"))
        val w = lrWeights(s, ftt, nd)
        val scored = ft.filter(col("doc_id") % 5 === 0)
          .join(broadcast(w), "b")
          .groupBy("doc_id", "y").agg(sum(col("x") * col("w")).as("s"))
          .select(col("y"),
            (round(lit(1.0) / (lit(1.0) + exp(-col("s").cast("double"))), 6)
              + lit(0.0)).as("p"))
        scored.select(col("y"), col("p"),
            round(-(col("y").cast("double") * log(col("p"))
              + (lit(1.0) - col("y").cast("double")) * log(lit(1.0) - col("p"))), 6)
              .cast("decimal(18,6)").as("l"),
            ((col("p") >= 0.5) === (col("y") > 0.5)).as("correct"))
          .agg(count(lit(1)).as("n_test"),
            sum(when(col("correct"), 1L).otherwise(0L)).as("n_correct"),
            sum(col("l")).as("ls"))
          .select(col("n_test"), col("n_correct"),
            (round(col("n_correct").cast("double") / col("n_test"), 6) + lit(0.0))
              .as("accuracy"),
            (round(col("ls").cast("double") / col("n_test"), 6) + lit(0.0))
              .as("holdout_loss"))
          .withColumn("null_loss", round(lit(math.log(2.0)), 6) + lit(0.0))
          .withColumn("beats_null", col("holdout_loss") < col("null_loss"))
      },
      Some(s"""WITH ${lrCtesOver("doc_id % 5 != 0")},
              |sg AS (SELECT ft.doc_id, ft.y, SUM(ft.x * w.w) AS s
              |       FROM ft JOIN w$LrIters w USING (b)
              |       WHERE ft.doc_id % 5 = 0
              |       GROUP BY ft.doc_id, ft.y),
              |pp AS (SELECT y,
              |              ROUND(1.0 / (1.0 + EXP(-CAST(s AS DOUBLE))), 6) + 0.0 AS p
              |       FROM sg),
              |pl AS (SELECT y, p,
              |              CAST(ROUND(-(CAST(y AS DOUBLE) * LN(p)
              |                           + (1.0 - CAST(y AS DOUBLE)) * LN(1.0 - p)), 6)
              |                   AS DECIMAL(18,6)) AS l,
              |              (p >= 0.5) = (y > 0.5) AS correct
              |       FROM pp),
              |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
              |               CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT)
              |                 AS n_correct,
              |               SUM(l) AS ls
              |        FROM pl)
              |SELECT n_test, n_correct,
              |       ROUND(CAST(n_correct AS DOUBLE) / n_test, 6) + 0.0 AS accuracy,
              |       ROUND(CAST(ls AS DOUBLE) / n_test, 6) + 0.0 AS holdout_loss,
              |       ROUND(LN(2.0), 6) + 0.0 AS null_loss,
              |       ROUND(CAST(ls AS DOUBLE) / n_test, 6) + 0.0
              |         < ROUND(LN(2.0), 6) + 0.0 AS beats_null
              |FROM agg""".stripMargin),
      cacheAssisted = true),

    // DoReMi-style DOMAIN REWEIGHTING (Xie et al. 2023, "DoReMi:
    // Optimizing Data Mixtures Speeds Up Language Model Pretraining" —
    // the published recipe's relational core): per-domain EXCESS LOSS =
    // mean token log-loss under a REFERENCE model trained on the whole
    // corpus minus under the domain's OWN model (the achievable loss),
    // mixture weight ∝ exp(excess) — upweight the domains the
    // generalist underfits most. The full paper trains proxy LMs with
    // Group DRO; the engine-native form uses the add-0.5 unigram LM the
    // text tier already ships (text_unigram_logprob's exact smoothing),
    // which preserves the decision structure: domains whose token
    // distribution diverges from the corpus get weight. Scale shape:
    // the corpus tokenizes ONCE into the (source, token, cnt) relation
    // (localCheckpoint — both models and both loss sums read it); the
    // reference model is one token-keyed aggregate of it, the own-model
    // log-prob is computed INLINE on the same rows (no corpus-model
    // self-join), and the softmax runs over the ≤|domains| relation.
    // Nothing after the first shuffle is corpus-sized — at 100 TB the
    // mixture table is still 20 rows. Determinism: per-token ln rounded
    // to 6 then decimal-summed (the unigram precedent); the softmax
    // numerators round to the 6-grid as DECIMAL so their sum is exact
    // and partial-agg order can't move any weight.
    QuerySpec(
      "text_domain_mixture",
      (s, dir) => {
        val st = docs(s, dir).select(col("source"), explode(toks).as("token"))
          .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        val vocab = broadcast(
          st.select("token").distinct().agg(count(lit(1)).as("v")))
        val refTot = broadcast(st.agg(sum("cnt").as("rt")))
        val refModel = st.groupBy("token").agg(sum("cnt").as("rc"))
          .crossJoin(vocab).crossJoin(refTot)
          .select(col("token"),
            round(log((col("rc") + 0.5) / (col("rt") + lit(0.5) * col("v"))), 6)
              .cast("decimal(18,6)").as("reflp"))
        val ownTot = st.groupBy("source").agg(sum("cnt").as("ot"))
        val losses = st.join(refModel, "token")
          .join(broadcast(ownTot), "source").crossJoin(vocab)
          .groupBy("source").agg(
            sum(col("cnt") * col("reflp")).as("rs"),
            sum(col("cnt") *
              round(log((col("cnt") + 0.5) / (col("ot") + lit(0.5) * col("v"))), 6)
                .cast("decimal(18,6)")).as("os"),
            sum("cnt").as("nt"))
          .select(col("source"),
            (round(-col("rs").cast("double") / col("nt"), 6) + lit(0.0)).as("ref_loss"),
            (round(-col("os").cast("double") / col("nt"), 6) + lit(0.0)).as("own_loss"))
        val ex = losses
          .withColumn("excess",
            (round(greatest(col("ref_loss") - col("own_loss"), lit(0.0)), 6)
              + lit(0.0)))
          .withColumn("eexp", round(exp(col("excess")), 6).cast("decimal(18,6)"))
          .localCheckpoint() // ≤|domains| rows; feeds the softmax total + output
        val se = ex.agg(sum(col("eexp")).as("se"))
        ex.crossJoin(broadcast(se))
          .select(col("source"), col("ref_loss"), col("own_loss"), col("excess"),
            (round(col("eexp").cast("double") / col("se").cast("double"), 6)
              + lit(0.0)).as("weight"))
          .orderBy("source")
      },
      Some("""WITH st AS MATERIALIZED (
             |  SELECT source, token, COUNT(*) AS cnt
             |  FROM (SELECT source,
             |               UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS token
             |        FROM documents)
             |  GROUP BY source, token),
             |vocab AS (SELECT COUNT(DISTINCT token) AS v FROM st),
             |reftot AS (SELECT SUM(cnt) AS rt FROM st),
             |refmodel AS (
             |  SELECT token,
             |         CAST(ROUND(LN((SUM(cnt) + 0.5) / (rt + 0.5 * v)), 6)
             |              AS DECIMAL(18,6)) AS reflp
             |  FROM st, vocab, reftot GROUP BY token, rt, v),
             |owntot AS (SELECT source, SUM(cnt) AS ot FROM st GROUP BY source),
             |losses AS (
             |  SELECT st.source,
             |         ROUND(-CAST(SUM(st.cnt * r.reflp) AS DOUBLE)
             |               / SUM(st.cnt), 6) + 0.0 AS ref_loss,
             |         ROUND(-CAST(SUM(st.cnt *
             |                 CAST(ROUND(LN((st.cnt + 0.5) / (o.ot + 0.5 * v)), 6)
             |                      AS DECIMAL(18,6))) AS DOUBLE)
             |               / SUM(st.cnt), 6) + 0.0 AS own_loss
             |  FROM st JOIN refmodel r USING (token)
             |          JOIN owntot o ON o.source = st.source, vocab
             |  GROUP BY st.source),
             |ex AS MATERIALIZED (
             |  SELECT source, ref_loss, own_loss,
             |         ROUND(GREATEST(ref_loss - own_loss, 0.0), 6) + 0.0 AS excess,
             |         CAST(ROUND(EXP(ROUND(GREATEST(ref_loss - own_loss, 0.0), 6)), 6)
             |              AS DECIMAL(18,6)) AS eexp
             |  FROM losses),
             |se AS (SELECT SUM(eexp) AS se FROM ex)
             |SELECT source, ref_loss, own_loss, excess,
             |       ROUND(CAST(eexp AS DOUBLE) / CAST(se AS DOUBLE), 6) + 0.0 AS weight
             |FROM ex, se ORDER BY source""".stripMargin))
  )

  // ---- logistic-regression kernel (text_lr_train / text_lr_gate) ----

  private val LrD = 16
  private val LrIters = 4
  private val LrEta = 4.0

  /** Published LR feature relations, keyed like DedupQueries'
    * publishedPairs (session + corpus-version): the tokenize→explode→
    * hash-bucket relation is identical across the whole LR family
    * (train/gate/holdout — the registry's slowest quiet entries at
    * 1.5-2.6 s each), so the first caller pays it once per session and
    * the family reuses the checkpoint. The consuming QuerySpecs are
    * flagged cacheAssisted so Bench reports them honestly. */
  private val publishedLrFeatures = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (DataFrame, DataFrame)]
  private val publishedLrWeights = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** Corpus-version token (DedupQueries.corpusVersion's twin): keys the
    * published LR relations so an in-session corpus rewrite invalidates
    * them instead of serving stale features. */
  private def lrCorpusVersion(dir: String): String = {
    val root = new java.io.File(dir, "documents.parquet")
    val files =
      if (root.isDirectory) Option(root.listFiles()).getOrElse(Array.empty)
      else Array(root)
    java.lang.Integer.toHexString(
      files.filter(_.isFile).sortBy(_.getName)
        .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
        .mkString("|").hashCode)
  }

  /** getOrElseUpdate under the map's lock, evicting SUPERSEDED versions
    * of the same (session, dir) first — repeated in-session corpus
    * rewrites (ScaleStress-style loops) must not accumulate pinned
    * checkpoint blocks for versions nothing will read again; the lock
    * also makes the build run-once (TrieMap.getOrElseUpdate alone can
    * build twice under a race, leaking an extra checkpoint). */
  private def publishEvicting[V](
      map: scala.collection.concurrent.TrieMap[(SparkSession, String), V],
      s: SparkSession, dir: String)(build: => V): V = map.synchronized {
    val key = (s, s"$dir@${lrCorpusVersion(dir)}")
    map.getOrElse(key, {
      map.keysIterator
        .filter(k => k._1 == s && k._2.startsWith(s"$dir@"))
        .toList.foreach(map.remove)
      val v = build
      map.put(key, v)
      v
    })
  }

  private[operators] def lrFeatures(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    publishEvicting(publishedLrFeatures, s, dir)(lrFeaturesUncached(s, dir))

  /** The SELF-TRAINED weight relation train and gate share — identical
    * inputs, identical 4-iteration GD, so one 17-row checkpoint serves
    * both (holdout trains on its own fold subset and stays separate). */
  private[operators] def selfTrainedLrWeights(s: SparkSession, dir: String,
      ft: DataFrame, base: DataFrame): DataFrame =
    publishEvicting(publishedLrWeights, s, dir) {
      val nd = base.agg(count(lit(1)).as("nd"))
      lrWeights(s, ft, nd).localCheckpoint()
    }

  /** Per-doc hashed-bucket feature relation `(doc_id, y, b, x)` — token
    * fractions on the 6-decimal grid plus a bias row per doc — and the
    * per-doc `(doc_id, y, n)` base. ONE tokenization; localCheckpoint
    * because every GD iteration and the gate consume it. */
  private def lrFeaturesUncached(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = docs(s, dir).select(col("doc_id"),
      when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0))
        .cast("decimal(18,6)").as("y"),
      toks.as("t"))
    // n computed on the per-doc scan, never after the explode (the
    // nbPredictions 7×-regex pitfall)
    val base = d.select(col("doc_id"), col("y"), size(col("t")).as("n"))
    val tf = d.select(col("doc_id"), explode(col("t")).as("tok"))
      .groupBy(col("doc_id"),
        (graft.functions.HashBridge.h32(col("tok")) % LrD).cast("int").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val ft = tf.join(base, "doc_id")
      .select(col("doc_id"), col("y"), col("b"),
        round(col("cnt") / col("n"), 6).cast("decimal(18,6)").as("x"))
      .unionAll(base.select(col("doc_id"), col("y"),
        lit(-1).cast("int").as("b"), lit(1.0).cast("decimal(18,6)").as("x")))
      .localCheckpoint()
    (ft, base)
  }

  /** [[LrIters]] lockstep full-batch GD steps from w=0; returns the
    * final 17-row `(b, w)` weight relation. Checkpointed per iteration
    * (the kmeans lockstep pattern) so the plan stays iteration-sized. */
  private[operators] def lrWeights(s: SparkSession, ft: DataFrame, nd: DataFrame): DataFrame =
    lrWeightsIters(s, ft, nd, LrIters)

  /** [[lrWeights]] stopped after `iters` steps — the spec's hook for the
    * monotone-loss law. */
  private[operators] def lrWeightsIters(
      s: SparkSession, ft: DataFrame, nd: DataFrame, iters: Int): DataFrame = {
    var w = s.range(-1, LrD).select(col("id").cast("int").as("b"),
      lit(0.0).cast("decimal(18,6)").as("w"))
    for (_ <- 1 to iters) {
      val sc = ft.join(broadcast(w), "b")
        .groupBy("doc_id", "y").agg(sum(col("x") * col("w")).as("s"))
      val r = sc.select(col("doc_id"),
        (round(lit(1.0) / (lit(1.0) + exp(-col("s").cast("double"))), 6)
          .cast("decimal(18,6)") - col("y")).cast("decimal(18,6)").as("r"))
      val g = ft.join(r, "doc_id")
        .groupBy("b").agg(sum(col("r") * col("x")).as("g"))
      w = w.join(g, Seq("b"), "left").crossJoin(broadcast(nd))
        .select(col("b"),
          round(col("w").cast("double")
            - lit(LrEta) * coalesce(col("g"), lit(0)).cast("double") / col("nd"), 6)
            .cast("decimal(18,6)").as("w"))
        .localCheckpoint()
    }
    w
  }

  /** DuckDB mirror of the LR kernel: the feature relation + the
    * [[LrIters]] GD iterations unrolled as generated MATERIALIZED CTEs
    * (the PcaCtes precedent), ending in `w$LrIters(b, w)` with `ft` and
    * `nd` in scope for the gate. */
  private lazy val LrCtes: String = lrCtesOver("TRUE")

  /** [[LrCtes]] with the GD iterations training on the `ftt` subset
    * (`trainWhere` over the feature relation) — `ft` stays in scope for
    * scoring, which is how the holdout oracle scores the unseen fold.
    * `TRUE` reproduces the self-train default exactly. */
  private def lrCtesOver(trainWhere: String): String = {
    val iters = (1 to LrIters).map { k =>
      s"""s$k AS MATERIALIZED (
         |  SELECT ft.doc_id, ft.y, SUM(ft.x * w.w) AS s
         |  FROM ftt ft JOIN w${k - 1} w USING (b) GROUP BY ft.doc_id, ft.y),
         |p$k AS MATERIALIZED (
         |  SELECT doc_id, y,
         |         CAST(ROUND(1.0 / (1.0 + EXP(-CAST(s AS DOUBLE))), 6)
         |              AS DECIMAL(18,6)) AS p
         |  FROM s$k),
         |g$k AS MATERIALIZED (
         |  SELECT ft.b, SUM(CAST(p.p - ft.y AS DECIMAL(18,6)) * ft.x) AS g
         |  FROM ftt ft JOIN p$k p USING (doc_id) GROUP BY ft.b),
         |w$k AS MATERIALIZED (
         |  SELECT w.b,
         |         CAST(ROUND(CAST(w.w AS DOUBLE)
         |                    - $LrEta * CAST(COALESCE(g.g, 0) AS DOUBLE) / nd.nd, 6)
         |              AS DECIMAL(18,6)) AS w
         |  FROM w${k - 1} w LEFT JOIN g$k g USING (b), nd)""".stripMargin
    }.mkString(",\n")
    s"""d AS (
       |  SELECT doc_id,
       |         CAST(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END
       |              AS DECIMAL(18,6)) AS y,
       |         STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS t
       |  FROM documents),
       |base AS (SELECT doc_id, y, LEN(t) AS n FROM d),
       |tf AS (
       |  SELECT doc_id,
       |         CAST(('0x'||SUBSTR(MD5(tok),1,8))::BIGINT % $LrD AS INT) AS b,
       |         COUNT(*) AS cnt
       |  FROM (SELECT doc_id, UNNEST(t) AS tok FROM d)
       |  GROUP BY doc_id, b),
       |ft AS MATERIALIZED (
       |  SELECT tf.doc_id, base.y, tf.b,
       |         CAST(ROUND(CAST(cnt AS DOUBLE) / n, 6) AS DECIMAL(18,6)) AS x
       |  FROM tf JOIN base USING (doc_id)
       |  UNION ALL
       |  SELECT doc_id, y, CAST(-1 AS INT) AS b, CAST(1.0 AS DECIMAL(18,6)) AS x
       |  FROM base),
       |ftt AS MATERIALIZED (SELECT * FROM ft WHERE $trainWhere),
       |nd AS (SELECT COUNT(*) AS nd FROM base WHERE $trainWhere),
       |w0 AS (SELECT CAST(b AS INT) AS b, CAST(0.0 AS DECIMAL(18,6)) AS w
       |       FROM (SELECT UNNEST(RANGE(-1, $LrD)) AS b)),
       |$iters""".stripMargin
  }

  /** Shared prediction relation behind `text_nb_apply` /
    * `text_nb_confusion`: argmax-scored (doc_id, pred, actual, correct,
    * score), exactly the apply query minus its final ORDER BY. */
  /** The unigram tokenize-count kernel shared by apply and fertility:
    * (every eligible word occurrence, distinct words Viterbi-segmented
    * executor-side against the broadcast UNK-extended piece table). */
  private def unigramTokenized(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val spark = s
    import spark.implicits._
    val (_, cost, total) = graft.functions.UnigramTokenizer.model(s, dir)
    val unk = graft.functions.UnigramTokenizer.unkCost(total)
    val words = graft.functions.Bpe.eligibleWords(s, dir)
    val tokenized = words.select("w").distinct().as[String]
      .mapPartitions { it =>
        it.map(w => (w,
          graft.functions.UnigramTokenizer.viterbiAll(w, cost, unk)
            .length.toLong))
      }.toDF("w", "n_tok")
    (words, tokenized)
  }

  private def nbPredictions(s: SparkSession, dir: String,
      testFold: Option[Int] = None): DataFrame = {
        val d = docs(s, dir)
        // holdout split on doc_id % 5 (pure modulo — deterministic and
        // identical in both engines): train = the other four folds,
        // score = the held-out fold; None = self-train/self-apply
        def trainSide(df: DataFrame): DataFrame =
          testFold.map(f => df.filter(col("doc_id") % 5 =!= f)).getOrElse(df)
        def scoreSide(df: DataFrame): DataFrame =
          testFold.map(f => df.filter(col("doc_id") % 5 === f)).getOrElse(df)
        // ONE tokenization serves both halves: the per-doc tf relation
        // is the scoring input AND (summed over docs) the model's
        // training counts — localCheckpoint because it feeds both sides
        // (the contamination() precedent). n_tokens deliberately does
        // NOT ride through the explode: an expression projected after a
        // Generate is evaluated per exploded ROW, so size(split(text))
        // here would re-run the regex split once per token instead of
        // once per document (measured 7× on this query) — base computes
        // it on the per-doc scan instead.
        val tf = d.select(col("doc_id"), col("lang").as("actual"),
            explode(toks).as("token"))
          .groupBy("doc_id", "actual", "token")
          .agg(count(lit(1)).as("tf"))
          .localCheckpoint()
        val modelDf = nbModelFromCounts(
          trainSide(tf).groupBy(col("actual").as("lang"), col("token"))
            .agg(sum("tf").as("cnt")))
        val model = broadcast(modelDf
          .select(col("lang").as("m_lang"), col("token"),
            round(col("logp") * 1e6).cast("long").as("lp"),
            round(col("floor_lp") * 1e6).cast("long").as("fl")))
        val classes = broadcast(
          trainSide(d).groupBy(col("lang").as("m_lang"))
            .agg(count(lit(1)).as("n_cls"))
            // doc total rides a 1-row broadcast (the tf-idf scalar
            // shape), never a driver-side count
            .crossJoin(broadcast(trainSide(d).agg(count(lit(1)).as("n_all"))))
            .join(modelDf.groupBy(col("lang").as("m_lang"))
              .agg(first(col("floor_lp")).as("floor_lp")), "m_lang")
            .select(col("m_lang"),
              round(round(log(col("n_cls").cast("double") / col("n_all")), 6) * 1e6)
                .cast("long").as("prior"),
              round(col("floor_lp") * 1e6).cast("long").as("fl")))
        val present = scoreSide(tf).join(model, "token")
          .groupBy("doc_id", "m_lang")
          .agg(sum(col("tf") * (col("lp") - col("fl"))).as("adj"))
        val base = scoreSide(d).select(col("doc_id"), col("lang").as("actual"),
            size(toks).as("n_tokens"))
          .crossJoin(classes)
        val scored = base
          .join(present, Seq("doc_id", "m_lang"), "left")
          .select(col("doc_id"), col("actual"), col("m_lang"),
            round((col("prior") + col("fl") * col("n_tokens") +
              coalesce(col("adj"), lit(0L))).cast("double") / 1e6, 6)
              .as("score"))
        // argmax as min_by over (−score, m_lang): a partial-aggregating
        // groupBy (map-side combine, no sort exchange) where the
        // row_number window needed a full per-doc sort — the agg_mode
        // pattern. Struct comparison is lexicographic, so −score desc →
        // score max, ties to the lowest m_lang, exactly the old window
        // order.
        scored.groupBy("doc_id")
          .agg(min_by(
            struct(col("m_lang"), col("actual"), col("score")),
            struct(negate(col("score")), col("m_lang"))).as("top"))
          .select(col("doc_id"), col("top.m_lang").as("pred"),
            col("top.actual").as("actual"),
            (col("top.m_lang") === col("top.actual")).as("correct"),
            col("top.score").as("score"))
  }

  /** Oracle twin of [[nbPredictions]] minus the argmax: CTEs ending in
    * `scored(doc_id, actual, m_lang, score)`, shared by the apply and
    * confusion oracles. */
  private lazy val NbApplyCtes: String = nbApplyCtes("TRUE", "TRUE")

  /** [[NbApplyCtes]] with a train/score split: the model and class
    * priors read only `trainWhere` docs, the scored relation only
    * `scoreWhere` docs — the holdout oracle's generator. */
  private def nbApplyCtes(trainWhere: String, scoreWhere: String): String =
    s"""${nbModelCtes(trainWhere)},
              nd AS (SELECT COUNT(*) AS n FROM documents WHERE $trainWhere),
              classes AS (
                SELECT lang AS m_lang,
                       CAST(ROUND(ROUND(LN(CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM nd)), 6)
                                  * 1e6) AS BIGINT) AS prior,
                       CAST(ROUND(MIN(floor_lp) * 1e6) AS BIGINT) AS fl
                FROM documents JOIN (SELECT lang AS l2, MIN(floor_lp) AS floor_lp
                                     FROM model GROUP BY 1) f ON lang = f.l2
                WHERE $trainWhere
                GROUP BY lang),
              tf AS (
                SELECT doc_id, actual, token, COUNT(*) AS tf
                FROM (SELECT doc_id, lang AS actual,
                             UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS token
                      FROM documents WHERE $scoreWhere)
                GROUP BY doc_id, actual, token),
              present AS (
                SELECT doc_id, m.lang AS m_lang,
                       SUM(tf * (CAST(ROUND(m.logp * 1e6) AS BIGINT)
                                 - CAST(ROUND(m.floor_lp * 1e6) AS BIGINT))) AS adj
                FROM tf JOIN model m USING (token)
                GROUP BY doc_id, m.lang),
              base AS (
                SELECT d.doc_id, d.lang AS actual,
                       LEN(STRING_SPLIT_REGEX(TRIM(d.text), '\\s+')) AS n_tokens,
                       c.m_lang, c.prior, c.fl
                FROM documents d CROSS JOIN classes c WHERE $scoreWhere),
              scored AS (
                SELECT b.doc_id, b.actual, b.m_lang,
                       ROUND(CAST(b.prior + b.fl * b.n_tokens
                                  + COALESCE(p.adj, 0) AS DOUBLE) / 1e6, 6) AS score
                FROM base b LEFT JOIN present p
                  ON p.doc_id = b.doc_id AND p.m_lang = b.m_lang)"""

  /** Shared multinomial-NB model kernel behind `text_nb_train` /
    * `text_nb_apply`: add-one-smoothed token log-likelihoods per class
    * plus the class smoothing floor ln(1/(tot_c+V)) — the term an
    * absent token contributes. One (lang, token) partial-agg shuffle;
    * the per-class totals and the scalar vocab size are tiny broadcast
    * relations. */
  private def nbModel(d: DataFrame): DataFrame =
    nbModelFromCounts(
      d.select(col("lang"), explode(toks).as("token"))
        .groupBy("lang", "token").agg(count(lit(1)).as("cnt")))

  /** Smoothing half of [[nbModel]] over a prebuilt `(lang, token, cnt)`
    * relation — apply feeds it the per-doc tf sums so one tokenization
    * serves both training and scoring. */
  private def nbModelFromCounts(counts: DataFrame): DataFrame = {
    val totals = counts.groupBy("lang").agg(sum("cnt").as("tot"))
    val vocab = broadcast(
      counts.select("token").distinct().agg(count(lit(1)).as("v")))
    counts.join(broadcast(totals), "lang").crossJoin(vocab)
      .select(col("lang"), col("token"), col("cnt"),
        round(log((col("cnt") + 1).cast("double") / (col("tot") + col("v"))), 6)
          .as("logp"),
        round(log(lit(1.0) / (col("tot") + col("v"))), 6).as("floor_lp"))
  }

  /** DuckDB mirror of [[nbModel]], ending in
    * `model(lang, token, cnt, logp, floor_lp)`. */
  private lazy val NbModelCtes: String = nbModelCtes("TRUE")

  /** [[NbModelCtes]] restricted to `trainWhere` docs. */
  private def nbModelCtes(trainWhere: String): String =
    s"""counts AS (
      |  SELECT lang, token, COUNT(*) AS cnt
      |  FROM (SELECT lang, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS token
      |        FROM documents WHERE $trainWhere)
      |  GROUP BY lang, token),
      |totals AS (SELECT lang, SUM(cnt) AS tot FROM counts GROUP BY lang),
      |vocab AS (SELECT COUNT(DISTINCT token) AS v FROM counts),
      |model AS (
      |  SELECT c.lang, c.token, c.cnt,
      |         ROUND(LN(CAST(c.cnt + 1 AS DOUBLE) / (t.tot + vocab.v)), 6) AS logp,
      |         ROUND(LN(1.0 / (t.tot + vocab.v)), 6) AS floor_lp
      |  FROM counts c JOIN totals t USING (lang) CROSS JOIN vocab)""".stripMargin
}
