package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (SURVEY.md §2.12, extension
  * surface for LLM training-data pipelines): exact, MinHash+LSH, SimHash,
  * and windowed n-gram Jaccard. Embedding-cosine near-dup lives in
  * SimilarityQueries (same kernel as top-k search).
  *
  * Scale design: every variant shuffles compact keys (md5 digests, 32-bit
  * token hashes, minhash signatures), never full document text; near-dup
  * candidate generation is bounded (LSH band buckets / fixed windows)
  * before any pairwise verification, so work is O(candidates), not O(n²).
  * The cross-engine hash primitive is the first 8 hex chars of md5 —
  * identical on Spark (`conv(substring(md5(x),1,8),16,10)`) and DuckDB
  * (`('0x'||substr(md5(x),1,8))::BIGINT`), making every stage
  * oracle-checkable with deterministic seeds.
  */
object DedupQueries {

  /** Convergence telemetry for [[DedupQueries.connectedComponents]]: the
    * round count of the most recent invocation in this JVM. Diagnostic
    * only (bench attribution + specs) — never part of a query result. */
  object ConnectedComponentsStats {
    @volatile var lastRounds: Int = -1
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  private def h32(c: Column): Column = graft.functions.HashBridge.h32(c)

  // ---- exact substring dedup (Lee et al. 2021 shingle-cover form) ----

  /** Guarantee length in tokens. */
  private[operators] val SubstrL = 8

  /** (doc_id, pos, tok, cov) — cov = 1 iff the token is covered by some
    * non-canonical L-shingle occurrence and must be removed. Exposed for
    * DedupSubstringSpec's guarantee law. */
  private[operators] def substringCoverage(s: SparkSession, dir: String): DataFrame =
    substringCoverageOf(docs(s, dir))

  private[operators] def substringCoverageOf(d: DataFrame): DataFrame = {
    val L = SubstrL
    val spl = d
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("l"))
    val tk = spl.select(col("doc_id"), posexplode(col("l")).as(Seq("pos", "tok")))
    // one L-shingle per start position, keyed by its md5 digest — the
    // digest (not the text) is what shuffles
    val sh = spl.filter(size(col("l")) >= L)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(l) - ${L - 1}),
           |          i -> struct(i - 1 AS pos,
           |                      md5(array_join(slice(l, i, $L), ' ')) AS d))"""
          .stripMargin)).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.d").as("d"))
    // canonical occurrence per shingle = min (doc_id, pos): a partial-
    // aggregating min(struct), never a per-shingle sort
    val canon = sh.groupBy("d")
      .agg(min(struct(col("doc_id"), col("pos"))).as("c"))
    val dups = sh.join(canon, "d")
      .filter(col("doc_id") =!= col("c.doc_id") || col("pos") =!= col("c.pos"))
      .select(col("doc_id"), col("pos"), lit(1).as("isdup"))
    // a dup START at p covers tokens p..p+L-1 → token i is covered iff a
    // dup start exists in [i-L+1, i]: one per-doc window over the dense
    // posexplode positions (rows == range here)
    val wcov = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos").rowsBetween(-(L - 1), 0)
    tk.join(dups, Seq("doc_id", "pos"), "left")
      .withColumn("cov", max(coalesce(col("isdup"), lit(0))).over(wcov))
      .select(col("doc_id"), col("pos"), col("tok"), col("cov"))
  }

  private def dedupExactSubstring(s: SparkSession, dir: String): DataFrame =
    substringCoverage(s, dir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(col("cov")).cast("long").as("n_removed"),
        array_join(expr(
          "transform(filter(array_sort(collect_list(struct(pos, tok, cov))), " +
            "x -> x.cov = 0), x -> x.tok)"), " ").as("kept_text"))
      .orderBy("doc_id")

  private val DedupSubstringOracle: String =
    s"""WITH spl AS (
       |  SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS l FROM documents),
       |tk AS (
       |  SELECT doc_id, UNNEST(generate_series(1, len(l))) - 1 AS pos,
       |         UNNEST(l) AS tok FROM spl),
       |sh AS (
       |  SELECT doc_id, i - 1 AS pos, MD5(array_to_string(l[i:i+${SubstrL - 1}], ' ')) AS d
       |  FROM (SELECT doc_id, l,
       |               UNNEST(generate_series(1, len(l) - ${SubstrL - 1})) AS i
       |        FROM spl)),
       |dups AS (
       |  SELECT doc_id, pos, 1 AS isdup FROM (
       |    SELECT doc_id, pos,
       |           ROW_NUMBER() OVER (PARTITION BY d ORDER BY doc_id, pos) AS rn
       |    FROM sh) WHERE rn > 1),
       |cov AS (
       |  SELECT tk.doc_id, tk.pos, tk.tok,
       |         MAX(COALESCE(isdup, 0)) OVER (
       |           PARTITION BY tk.doc_id ORDER BY tk.pos
       |           ROWS BETWEEN ${SubstrL - 1} PRECEDING AND CURRENT ROW) AS cov
       |  FROM tk LEFT JOIN dups
       |    ON tk.doc_id = dups.doc_id AND tk.pos = dups.pos)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
       |       CAST(SUM(cov) AS BIGINT) AS n_removed,
       |       COALESCE(STRING_AGG(tok, ' ' ORDER BY pos) FILTER (WHERE cov = 0), '')
       |         AS kept_text
       |FROM cov GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // MinHash permutation family: THE single source of truth is MinHashSig
  // (the UDAF the Spark side of agg_minhash executes); the oracle strings
  // below are generated from the same constants so they cannot drift.
  private val P = graft.functions.MinHashSig.P
  private val K = graft.functions.MinHashSig.K
  private val Bands = K / 2 // bands of 2 rows each

  /** Rarest-gram blocking keys (`doc_id`, `blk`, `sub`), from the per-doc
    * distinct hashed-gram sets (`doc_id`, `gs` array<long>).
    *
    * The per-doc argmin over (df, h) is a plain `MIN` over a sortable
    * fixed-width packed key (zero-padded df ++ zero-padded h, 23 chars;
    * df padded to 13 digits because both engines' LPAD silently TRUNCATE
    * overlong values — a 10-digit field corrupts the rarest-gram ordering
    * once a hot gram's df passes 10^10, plausible at the 100 TB design
    * point; h is a 32-bit hash, 10 digits always suffice) —
    * a partial-aggregating shuffle, not a window sort over the full
    * (doc, gram) relation — and the packed min IS the block key.
    *
    * Blocks larger than 64 docs (duplicate FAMILIES — heavy dup corpora
    * produce them by construction) are split into ⌈|B|/64⌉ deterministic
    * hash sub-blocks rather than dropped: every doc still participates,
    * pair volume stays ≤ ~64·n, and within a dup family the members of
    * each sub-block still pair up (transitively marking the family)
    * while cross-sub-block pairs are the sacrificed recall.
    *
    * Exposed for the NgramBlockingSpec volume assertion. */
  private[operators] def ngramBlocks(sets: DataFrame): DataFrame = {
    val dg = sets.select(col("doc_id"), explode(col("gs")).as("h"))
    // df via groupBy + join-back (measured vs a count-over-window on h:
    // equal at sf0.1 — the window's partition sort offsets its saved
    // shuffle — and the hash aggregate avoids sorting hot grams)
    val dfreq = dg.groupBy("h").agg(count(lit(1)).as("df"))
    val keyed = dg.join(dfreq, "h")
      .groupBy("doc_id")
      .agg(min(concat(lpad(col("df").cast("string"), 13, "0"),
        lpad(col("h").cast("string"), 10, "0"))).as("blk"))
    // block sizes via an unordered window over the 1-row-per-doc keyed
    // relation — one shuffle on blk, no groupBy+join-back that would
    // re-execute the expensive (doc, gram) ⋈ df subtree a second time
    val bn = count(lit(1))
      .over(org.apache.spark.sql.expressions.Window.partitionBy("blk"))
    keyed
      .withColumn("sub",
        when(bn <= 64, lit(0L))
          .otherwise(h32(col("doc_id").cast("string")) % ceil(bn / lit(64.0)).cast("long")))
      .select(col("doc_id"), col("blk"), col("sub"))
  }

  /** Verified near-dup pairs (da < db, jaccard ≥ 0.3, rounded) from the
    * rarest-gram-blocked bigram pipeline — shared by `dedup_ngram_jaccard`
    * (reports pairs) and `dedup_editdistance` (refines them).
    *
    * Set-as-array restructure (cf. dedup_minhash): bigrams explode to
    * ROWS once (a Generate materializes the token array — crucial:
    * higher-order-function lambdas are interpreted, so an inlined
    * split() would re-run per element access), then ONE collect_set
    * shuffle builds each doc's distinct gram set. The distinct
    * (doc, gram) relation for df-counting re-explodes the SETS —
    * no second pass over raw text. Candidates come from the slim
    * blocking-key self-join; verification joins the two gram sets
    * per pair and intersects in-place (array_intersect) instead of
    * re-exploding the corpus into a 3-way join + pair groupBy.
    * localCheckpoint for the same reason as minhashPairs: three
    * consumers (blocking + both verify sides) over an unshared plan
    * subtree would re-run the explode+md5+collect_set pipeline 3×. */
  private[operators] def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val sets = bigramSets(s, dir).localCheckpoint()
    val capped = ngramBlocks(sets)
    val cand = capped.as("a").join(capped.as("b"),
        col("a.blk") === col("b.blk") && col("a.sub") === col("b.sub") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
    cand
      .join(sets.select(col("doc_id").as("da"), col("gs").as("ga"), col("c").as("ca")), "da")
      .join(sets.select(col("doc_id").as("db"), col("gs").as("gb"), col("c").as("cb")), "db")
      .withColumn("ic", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jaccard",
        col("ic").cast("double") / (col("ca") + col("cb") - col("ic")))
      .filter(col("jaccard") >= 0.3)
      .select(col("da"), col("db"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Per-doc distinct word-bigram sets, 32-bit-HASHED (`doc_id`, `gs`
    * array<long>, `c`): long shuffles and long-array intersections
    * instead of carrying bigram TEXT through every stage (the
    * shingleHashes design). md5-based h32 is engine-identical, so the
    * oracle reproduces every hash; collisions (~|grams|/2³²) are
    * deterministic and shared by both sides. */
  private[operators] def bigramSets(s: SparkSession, dir: String): DataFrame = {
    // repartition on the aggregation key BEFORE the gram explosion: the
    // groupBy(doc_id) below would shuffle anyway, so this moves that
    // exchange ahead of the heavy flatMap (shuffling ~2 KB compressed
    // docs instead of their ~200 exploded gram rows) and parallelizes
    // the explode+md5 work even when the scan is a single task
    // (single-row-group local files).
    val grams = docs(s, dir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .select(col("doc_id"),
        explode(when(size(col("t")) >= 2,
          expr("transform(sequence(0, size(t)-2), i -> concat(t[i],' ',t[i+1]))"))
          .otherwise(expr("CAST(array() AS array<string>)"))).as("g"))
    grams.select(col("doc_id"), h32(col("g")).as("h"))
      .groupBy("doc_id").agg(collect_set(col("h")).as("gs"))
      .withColumn("c", size(col("gs")))
  }

  /** Verified near-dup pairs (da < db, jaccard ≥ 0.2) from the MinHash+LSH
    * pipeline — shared by `dedup_minhash` (reports pairs) and
    * `dedup_components` (clusters them).
    *
    * One shuffle builds each doc's shingle-hash SET as an array row; the
    * 16-permutation signature folds over that array in-place via the
    * compiled MinHashSig UDAF (min-folds are duplicate-insensitive, so no
    * pre-distinct; 16 interpreted HOF folds per doc would cost ~5× more),
    * and candidate verification intersects the two arrays directly
    * (array_intersect) instead of re-exploding the corpus into a 3-way
    * join. Pre-partitioning on doc_id moves the exchange before the
    * shingle explosion — compact docs shuffle, not shingle rows — and
    * parallelizes the single-task local scan (cf. bigramSets). */
  private[operators] def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    val minhashSig = udaf(graft.functions.MinHashSig)
    // localCheckpoint: the signature+set relation feeds THREE consumers
    // (band explosion, and both sides of the candidate verify join), and
    // Spark physical plans never share subtrees — without the barrier the
    // whole shingle pipeline (explode + md5 + set-agg shuffle) executes
    // three times per query (six in dedup_components, whose edge union
    // references the pair relation twice). Materializing once costs one
    // pass plus (doc_id, 16-long sig, gram-set) rows — proportional to
    // the corpus, the same trade a cluster job makes by checkpointing a
    // reused stage — and gives AQE exact stats for the downstream joins.
    val sets = shingleHashes(docs(s, dir).repartition(col("doc_id")), "doc_id")
      .groupBy("doc_id")
      .agg(minhashSig(col("h")).as("sig"), collect_set(col("h")).as("hs"))
      .withColumn("c", size(col("hs")))
      .localCheckpoint()
    val bands = sets.select(col("doc_id"), explode(array((0 until Bands).map(j =>
      struct(lit(j).as("b"),
        concat_ws("_", col("sig")(2 * j), col("sig")(2 * j + 1)).as("key"))): _*)).as("bd"))
      .select(col("doc_id"), col("bd.b").as("b"), col("bd.key").as("key"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.b") === col("b.b") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    cand
      .join(sets.select(col("doc_id").as("da"), col("hs").as("ha"), col("c").as("ca")), "da")
      .join(sets.select(col("doc_id").as("db"), col("hs").as("hb"), col("c").as("cb")), "db")
      .withColumn("ic", size(array_intersect(col("ha"), col("hb"))))
      .withColumn("jaccard",
        col("ic").cast("double") / (col("ca") + col("cb") - col("ic")))
      .filter(col("jaccard") >= 0.2)
      .select(col("da"), col("db"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Cross-query subtree reuse for the two near-dup pair relations,
    * keyed (session, dir, signal). The ENSEMBLE consumer subscribes
    * here: in any session that computes both signals (the bench session
    * does; a production dedup pipeline does too — the pair report and
    * the clustering job read the same relation), re-running both full
    * generators inside `dedup_ensemble_components` pays twice for
    * already-materialized work, because Spark physical plans never share
    * subtrees ACROSS queries any more than within one. One
    * localCheckpoint per signal per (session, dir) makes the union pay
    * marginal cost. The STANDALONE pair queries deliberately do NOT
    * subscribe — they rebuild every call, so their bench timings keep
    * measuring the generators themselves, not a cache hit. Bounded:
    * pair/signature rows only (compact longs), two entries per dir. */
  private val publishedPairs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Cheap corpus-version token — (name, length, mtime) digest of the
    * dir's documents.parquet file set. Keying the published checkpoints
    * on it means an in-session REWRITE of the corpus invalidates them
    * (ADVICE r6: an unkeyed cache would serve stale pairs forever).
    * Superseded entries linger until session end — bounded, they hold
    * compact (long, long) pair frames whose blocks the ContextCleaner
    * reclaims once unreferenced. */
  private def corpusVersion(dir: String): String = {
    val root = new java.io.File(dir, "documents.parquet")
    val files =
      if (root.isDirectory) Option(root.listFiles()).getOrElse(Array.empty)
      else Array(root)
    java.lang.Integer.toHexString(
      files.filter(_.isFile).sortBy(_.getName)
        .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
        .mkString("|").hashCode)
  }

  /** Last-published MinHash-verified pair set (da, db) for the ensemble. */
  private def minhashPairsShared(s: SparkSession, dir: String): DataFrame =
    publishedPairs.getOrElseUpdate((s, s"$dir@${corpusVersion(dir)}", "mh"),
      minhashPairs(s, dir).select(col("da"), col("db")).localCheckpoint())

  /** Last-published SimHash band pair set (da, db) for the ensemble. */
  private def simhashPairsShared(s: SparkSession, dir: String): DataFrame =
    publishedPairs.getOrElseUpdate((s, s"$dir@${corpusVersion(dir)}", "sh"),
      simhashBandPairs(simhash64(s, dir))
        .select(col("doc_a").as("da"), col("doc_b").as("db")).localCheckpoint())

  /** Connected components over an undirected pair relation `(da, db)` →
    * `(id, lbl)` with `lbl` = the component's minimum vertex id.
    *
    * Each round propagates the min label across edges AND
    * pointer-doubles (jump to the label's own label — labels are
    * themselves vertex ids), so convergence takes O(log diameter)
    * rounds; the 25-round cap covers a 2^25-hop diameter, far beyond
    * any real dup-family graph. Every round shuffles only (vertex,
    * label) longs. The fixed point is the exact per-component minimum
    * regardless of execution schedule — deterministic, so a recursive
    * transitive-closure oracle reproduces it. Exposed for the
    * ComponentsSpec chain/empty-graph stress. */
  private[operators] def connectedComponents(pairs: DataFrame): DataFrame = {
    // undirected: propagate both ways. The pair relation is materialized
    // FIRST (localCheckpoint) because the union references it twice and a
    // lazy persist() would still execute the upstream LSH pipeline once
    // per branch on first materialization; the union of the checkpointed
    // frame is then persisted for the per-round re-reads (iterative graph
    // algorithms checkpoint their edge relation; GraphX does the same).
    val p0 = pairs.localCheckpoint()
    val edges = p0
      .union(p0.select(col("db").as("da"), col("da").as("db")))
      .persist()
    // labels only ever decrease, so an unchanged sum ⇔ a fixed point;
    // coalesce handles the empty graph (sum over zero rows is NULL),
    // which converges immediately to an empty result. DECIMAL(38,0)
    // accumulation: a long sum of 64-bit hash-derived vertex ids
    // overflows (aborting under ANSI, or wrapping so equal checksums no
    // longer prove an unchanged labeling).
    def lblSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(
        sum(col("lbl").cast(org.apache.spark.sql.types.DecimalType(38, 0))),
        lit(java.math.BigDecimal.ZERO))).collect()(0).getDecimal(0)
    // localCheckpoint (not persist): each round references the previous
    // labels several times (union + join + the doubling self-join), so
    // carrying lineage would QUADRUPLE the logical plan per round until
    // planning itself OOMs; checkpointing materializes the rows and
    // truncates the plan to a leaf, keeping every round's plan constant
    // size. Old checkpoint blocks are freed by the ContextCleaner.
    try {
      // initial labels = min over {self} ∪ direct neighbors — one
      // aggregation over the (bidirectional) edge relation that fuses
      // the old identity init WITH the first propagation round, saving a
      // full loop iteration (propagate + checkpoint + convergence probe,
      // ~3 Spark jobs) on every invocation: near-clique dup families are
      // already at their fixed point here and exit after one confirming
      // round. Label set and fixed point are unchanged — labels still
      // only ever decrease toward the per-component minimum.
      var labels = edges.groupBy(col("da").as("id"))
        .agg(min(least(col("da"), col("db"))).as("lbl"))
        .localCheckpoint()
      var prevSum = lblSum(labels)
      var converged = false
      var rounds = 0
      while (!converged && rounds < 25) {
        val prop = labels
          .union(edges.join(labels, col("db") === col("id"))
            .select(col("da").as("id"), col("lbl")))
          .groupBy("id").agg(min("lbl").as("lbl"))
          .localCheckpoint()
        // pointer doubling via a RENAMED checkpointed copy — a genuine
        // second leaf relation, so the lookup is a plain join, not a
        // self-join Catalyst has to disambiguate. Engaged from the FIRST
        // round: on a deep chain every skipped doubling costs a whole
        // extra propagate+probe round (3 Spark jobs), which is more than
        // the one (label, label) equi-join saved on near-clique inputs.
        val lookup = prop.select(col("id").as("lid"), col("lbl").as("llbl"))
        val next = prop.join(lookup, col("lbl") === col("lid"), "left")
          .select(col("id"),
            least(col("lbl"), coalesce(col("llbl"), col("lbl"))).as("lbl"))
          .localCheckpoint()
        val s2 = lblSum(next)
        labels = next
        converged = s2.compareTo(prevSum) == 0
        prevSum = s2
        rounds += 1
      }
      require(converged, s"component propagation did not converge in $rounds rounds")
      // convergence observability (VERDICT r4 #5): the rounds count makes a
      // bench-time jump attributable — graph densification shows up here,
      // machine contention doesn't. stderr so Bench's one-line-JSON stdout
      // contract stays clean; lastRounds is the test/debug hook.
      ConnectedComponentsStats.lastRounds = rounds
      System.err.println(s"[graft] connectedComponents converged in $rounds rounds")
      // Superseded round checkpoints are freed by the ContextCleaner as
      // their frames drop out of scope (label sets are (long, long) rows,
      // 2 live copies per round at worst); a reliable-checkpoint dir with
      // explicit cleanup is the cluster-scale variant of this loop.
      labels
    } finally {
      // also on the non-convergence path: never leak the edge cache into
      // a long-lived session
      edges.unpersist(): Unit
    }
  }

  /** Dev-probe hooks (graft.tools.CcProbe): the ensemble's pair relation
    * and the component loop, exposed for single-JVM A/B measurement.
    * Round-14 verdict from that probe: fused/lazy-checkpoint rounds,
    * pre-partitioned edges, and the eager shape all measure within noise
    * (the loop is bound by the per-round propagate shuffle, not job
    * count), so the proven eager round shape stays. */
  private[graft] def ensemblePairsForProbe(s: SparkSession, dir: String): DataFrame =
    minhashPairsShared(s, dir).unionAll(simhashPairsShared(s, dir)).distinct()
  private[graft] def componentsForProbe(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)

  /** (key, shingle-hash) pairs (3-token shingles), duplicates included:
    * consumers build SETs (collect_set) or min-fold, so a pre-`distinct`
    * would only add a second full shuffle of the same relation. */
  private def shingleHashes(d: DataFrame, keyCol: String): DataFrame =
    d.select(col(keyCol), split(trim(col("text")), "\\s+").as("t"))
      .select(col(keyCol),
        explode(when(size(col("t")) >= 3,
          expr("transform(sequence(0, size(t)-3), i -> concat(t[i],' ',t[i+1],' ',t[i+2]))"))
          .otherwise(expr("CAST(array() AS array<string>)"))).as("s"))
      .select(col(keyCol), h32(col("s")).as("h"))

  /** The PPJoin-family exact set-similarity join at threshold `T`
    * (Chaudhuri et al. ICDE'06 prefix lemma; Xiao et al. WWW'08 length +
    * positional filters), shared by the t=0.2 and t=0.5 declared queries.
    *
    * Candidate generation joins only PREFIX shingles (global rarity
    * order), then prunes each matched pair with two EXACT predicates
    * before the array-intersect verify:
    *  - LENGTH filter: J(a,b) <= min(|a|,|b|)/max(|a|,|b|), so
    *    min < t*max refutes the pair with no verification;
    *  - POSITIONAL filter: for a shared element at ranks (rka, rkb) in
    *    the shared total order, overlap(a,b) <= min(rka−1, rkb−1) + 1 +
    *    min(sza−rka, szb−rkb) (commons strictly before the element, the
    *    element itself, commons after). J >= t forces overlap >= α =
    *    ⌈t/(1+t)·(sza+szb)⌉, so a bound below α refutes the PAIR.
    * Both bounds hold for EVERY shared element, so when a pair truly
    * meets the threshold every one of its matched prefix rows passes —
    * recall stays 1.0 by construction; the ε=1e-9 slack only ever
    * widens a bound (never prunes more). Both predicates read columns
    * (`rk`, `sz`) the prefix computation already produced — zero extra
    * shuffles; they ride the candidate join as its residual condition.
    */
  private def prefixJoinQuery(T: Double): (SparkSession, String) => DataFrame =
    (s, dir) => {
      // one materialization feeds the df/rank/size aggregations AND
      // both verify sides (the minhashPairs checkpoint rationale)
      val sh = shingleHashes(docs(s, dir).repartition(col("doc_id")), "doc_id")
        .distinct().localCheckpoint()
      val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
      val sets = sh.groupBy("doc_id")
        .agg(collect_set(col("h")).as("hs"))
        .withColumn("c", size(col("hs")))
      val ranked = sh.join(dfreq, "h")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy(col("df"), col("h"))))
        .join(sets.select(col("doc_id"), col("c").as("sz")), "doc_id")
        .filter(col("rk") <= col("sz") - ceil(col("sz") * T) + 1)
        .select("doc_id", "h", "rk", "sz")
      // α: minimum intersection size any pair with J >= T must reach
      val alpha = ceil((lit(T) / (1.0 + T)) *
        (col("a.sz") + col("b.sz")).cast("double") - lit(1e-9))
      val cand = ranked.as("a").join(ranked.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
            // length filter
            least(col("a.sz"), col("b.sz")).cast("double") >=
              lit(T) * greatest(col("a.sz"), col("b.sz")).cast("double") - lit(1e-9) &&
            // positional filter: min(rka,rkb) = min(rka-1,rkb-1)+1
            (least(col("a.rk"), col("b.rk")) +
              least(col("a.sz") - col("a.rk"), col("b.sz") - col("b.rk")))
              .cast("double") >= alpha)
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
      cand
        .join(sets.select(col("doc_id").as("da"), col("hs").as("ha"), col("c").as("ca")), "da")
        .join(sets.select(col("doc_id").as("db"), col("hs").as("hb"), col("c").as("cb")), "db")
        .withColumn("ic", size(array_intersect(col("ha"), col("hb"))))
        .withColumn("jaccard",
          col("ic").cast("double") / (col("ca") + col("cb") - col("ic")))
        .filter(col("jaccard") >= T)
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }

  /** DuckDB twin of [[prefixJoinQuery]]: the DIRECT exact join at the
    * same threshold — the oracle deliberately skips the filters so
    * equality is the completeness proof of the pruned Spark plan. */
  private def prefixJoinOracle(T: Double): String =
    s"""WITH toks AS (
       |  SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS t FROM documents),
       |idx AS (
       |  SELECT doc_id, t, UNNEST(GENERATE_SERIES(1, LEN(t)-2)) AS i
       |  FROM toks WHERE LEN(t) >= 3),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |         ('0x'||SUBSTR(MD5(t[i]||' '||t[i+1]||' '||t[i+2]),1,8))::BIGINT AS h
       |  FROM idx),
       |c AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |p AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS ic
       |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT da AS doc_a, db AS doc_b,
       |       ROUND(CAST(ic AS DOUBLE) / (ca.n + cb.n - ic), 6) AS jaccard
       |FROM p JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db
       |WHERE CAST(ic AS DOUBLE) / (ca.n + cb.n - ic) >= $T
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Per-doc 64-bit SimHash fingerprint as two independent 32-bit halves
    * (`doc_id`, `hi`, `lo`) — md5 hex chars 1-8 and 9-16 feed two SimHash
    * aggregations in ONE partial-aggregating pass (constant shuffle bytes
    * per doc). Two longs < 2³² instead of one packed 64-bit value because
    * `hi << 32 | lo` would overflow signed BIGINT on the DuckDB side for
    * hi ≥ 2³¹; band keys and popcounts only ever need the halves. */
  private[operators] def simhash64(s: SparkSession, dir: String): DataFrame = {
    val simhash = udaf(graft.functions.SimHash)
    docs(s, dir)
      .repartition(col("doc_id")) // cf. bigramSets: exchange before the explode
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("m"))
      .select(col("doc_id"),
        conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("h_hi"),
        conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("h_lo"))
      .distinct()
      .groupBy("doc_id")
      .agg(simhash(col("h_hi")).as("hi"), simhash(col("h_lo")).as("lo"))
  }

  /** DuckDB twin of [[simhash64]] + [[simhashBandPairs]]: CTE chain ending
    * in `<p>pairs(doc_a, doc_b, hamming)` (hamming ≤ 3 already applied).
    * CTE names carry prefix `p` so the chain composes with other oracle
    * chains (the ensemble-components oracle joins it to the MinHash
    * chain, which owns the unprefixed `sig`). */
  private def simhashPairCtes(p: String): String =
    s"""${p}tk AS (
       |  SELECT DISTINCT doc_id,
       |         ('0x'||SUBSTR(m,1,8))::BIGINT AS h_hi,
       |         ('0x'||SUBSTR(m,9,8))::BIGINT AS h_lo
       |  FROM (SELECT doc_id, MD5(UNNEST(STRING_SPLIT_REGEX(TRIM(text),'\\s+'))) AS m
       |        FROM documents)),
       |${p}bits AS (
       |  SELECT doc_id, b,
       |         SUM(CASE WHEN (h_hi >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vh,
       |         SUM(CASE WHEN (h_lo >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vl
       |  FROM ${p}tk, (SELECT UNNEST(GENERATE_SERIES(0, 31)) AS b)
       |  GROUP BY doc_id, b),
       |${p}sig AS (
       |  SELECT doc_id,
       |         CAST(SUM(CASE WHEN vh > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS hi,
       |         CAST(SUM(CASE WHEN vl > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS lo
       |  FROM ${p}bits GROUP BY doc_id),
       |${p}banded AS (
       |  SELECT doc_id, hi, lo, b,
       |         CASE b WHEN 0 THEN lo & 65535
       |                WHEN 1 THEN (lo >> 16) & 65535
       |                WHEN 2 THEN hi & 65535
       |                ELSE (hi >> 16) & 65535 END AS k
       |  FROM ${p}sig, (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS b)),
       |${p}pairs AS (
       |  SELECT doc_a, doc_b, hamming FROM (
       |    SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |           CAST(BIT_COUNT(XOR(l.hi, r.hi)) + BIT_COUNT(XOR(l.lo, r.lo)) AS INTEGER) AS hamming
       |    FROM ${p}banded l JOIN ${p}banded r ON l.b = r.b AND l.k = r.k
       |    WHERE l.doc_id < r.doc_id)
       |  WHERE hamming <= 3)""".stripMargin

  /** Manku 4×16-bit-band pigeonhole pairing over the 64-bit fingerprint:
    * every pair within hamming distance ≤ 3, found by exact-matching at
    * least one band (pigeonhole: ≤ 3 flipped bits leave ≥ 1 of 4 bands
    * intact) and verified with the exact popcount. Output
    * `(doc_a, doc_b, hamming)`, totally ordered. Exposed so
    * SimhashPairsSpec can assert band-recall == brute-force recall. */
  /** The 4×16-bit band keys of the (hi, lo) fingerprint, band order
    * fixed = (lo low, lo high, hi low, hi high) — the SINGLE definition
    * of the band layout, shared by the pairing query and
    * SimhashPairsSpec's candidate-volume audit so the spec can never
    * measure a layout the query no longer uses. Mirrors the CASE ladder
    * in the dedup_simhash_pairs DuckDB oracle. */
  private[operators] def simhashBandKeys: Column = array(
    col("lo").bitwiseAND(lit(65535L)),
    shiftright(col("lo"), 16).bitwiseAND(lit(65535L)),
    col("hi").bitwiseAND(lit(65535L)),
    shiftright(col("hi"), 16).bitwiseAND(lit(65535L)))

  private[operators] def simhashBandPairs(rawSigs: DataFrame): DataFrame = {
    // localCheckpoint for the same reason as minhashPairs: both sides of
    // the band self-join consume the fingerprint relation, and without a
    // barrier each side re-runs the full tokenize+distinct+aggregate
    // pipeline (the r01 LSH recomputation trap). The checkpointed
    // relation is 3 longs per doc — negligible to pin.
    val sigs = rawSigs.localCheckpoint()
    val banded = sigs.select(col("doc_id"), col("hi"), col("lo"),
      posexplode(simhashBandKeys).as(Seq("b", "k")))
    val l = banded.select(col("b"), col("k"), col("doc_id").as("doc_a"),
      col("hi").as("ha"), col("lo").as("la"))
    val r = banded.select(col("b"), col("k"), col("doc_id").as("doc_b"),
      col("hi").as("hb"), col("lo").as("lb"))
    l.join(r, Seq("b", "k"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (bit_count(col("ha").bitwiseXOR(col("hb"))) +
          bit_count(col("la").bitwiseXOR(col("lb")))).cast("int").as("hamming"))
      .where(col("hamming") <= 3)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  def specs: Seq[QuerySpec] = Seq(

    // Exact SUBSTRING dedup with a length GUARANTEE (Lee et al. 2021,
    // "Deduplicating Training Data Makes Language Models Better" —
    // published with suffix arrays; here the equivalent shingle-cover
    // formulation): every repeated passage of ≥ L tokens contains a
    // repeated L-shingle, so removing all tokens covered by any
    // NON-CANONICAL L-shingle occurrence (canonical = min (doc_id, pos)
    // per shingle) certifies that no fully-surviving L-token window
    // occurs twice anywhere in the output — the guarantee neither fixed
    // chunks nor winnowing give (DedupSubstringSpec proves it as a law
    // over the real corpus). 100 TB shape: shingles shuffle as 32-char
    // md5 digests + (doc_id, pos) — never text; canonical selection is
    // a partial-aggregating min(struct); coverage is one per-doc window
    // over dense positions. L = 8 tokens.
    QuerySpec(
      "dedup_exact_substring",
      (s, dir) => dedupExactSubstring(s, dir),
      Some(DedupSubstringOracle)),

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
              FROM documents GROUP BY MD5(text) ORDER BY keep_id""")),

    // MinHash + LSH near-dup: shingle → 16-perm signature → 8 band buckets
    // → candidate pairs → exact-Jaccard verify ≥ 0.2. At 100 TB the band
    // self-join is the only shuffle that grows with corpus size, and it
    // carries (doc_id, 2-long band key) rows only.
    // INCREMENTAL dedup — the production shape at 100 TB: yesterday's
    // corpus is a PUBLISHED band-key catalog; today's batch never
    // re-clusters history, it probes the catalog with its own band keys
    // (an equi-join sized by the new batch, not the corpus), verifies
    // candidates by exact Jaccard, and labels each new doc dup-of-history
    // or fresh. Here the catalog is doc_id % 5 != 0 and the batch is
    // % 5 == 0, so the oracle can replay the split exactly; in
    // production the catalog is a table the previous run wrote. The
    // plan: one banded equi-join + a candidates-only verify join + a
    // batch-sized left join — nothing corpus².
    QuerySpec(
      "dedup_incremental",
      (s, dir) => {
        val minhashSig = udaf(graft.functions.MinHashSig)
        val sets = shingleHashes(docs(s, dir).repartition(col("doc_id")), "doc_id")
          .groupBy("doc_id")
          .agg(minhashSig(col("h")).as("sig"), collect_set(col("h")).as("hs"))
          .withColumn("c", size(col("hs")))
          .localCheckpoint() // feeds the band probe and both verify sides
        val bands = sets.select(col("doc_id"),
          explode(array((0 until Bands).map(j =>
            struct(lit(j).as("b"),
              concat_ws("_", col("sig")(2 * j), col("sig")(2 * j + 1)).as("key"))): _*)).as("bd"))
          .select(col("doc_id"), col("bd.b").as("b"), col("bd.key").as("key"))
        val catBands = bands.filter(col("doc_id") % 5 =!= 0)
        val newBands = bands.filter(col("doc_id") % 5 === 0)
        val cand = newBands.as("n").join(catBands.as("cat"),
            col("n.b") === col("cat.b") && col("n.key") === col("cat.key"))
          .select(col("n.doc_id").as("nd"), col("cat.doc_id").as("cd"))
          .distinct()
        val verified = cand
          .join(sets.select(col("doc_id").as("nd"), col("hs").as("hn"),
            col("c").as("cn")), "nd")
          .join(sets.select(col("doc_id").as("cd"), col("hs").as("hc"),
            col("c").as("cc")), "cd")
          .withColumn("ic", size(array_intersect(col("hn"), col("hc"))))
          .filter(col("ic").cast("double") /
            (col("cn") + col("cc") - col("ic")) >= 0.2)
        val hits = verified.groupBy("nd")
          .agg(count(lit(1)).as("nh"), min(col("cd")).as("first_match"))
        docs(s, dir).select(col("doc_id")).filter(col("doc_id") % 5 === 0)
          .join(hits, col("doc_id") === col("nd"), "left")
          .select(col("doc_id"),
            coalesce(col("nh"), lit(0L)).as("n_hits"),
            col("nh").isNotNull.as("is_dup"),
            col("first_match"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $MinHashPairsCtes,
              |hits AS (
              |  SELECT CASE WHEN da % 5 = 0 THEN da ELSE db END AS nd,
              |         CASE WHEN da % 5 = 0 THEN db ELSE da END AS cd
              |  FROM jpairs
              |  WHERE (da % 5 = 0) != (db % 5 = 0)),
              |agg AS (SELECT nd, COUNT(*) AS nh, MIN(cd) AS first_match
              |        FROM hits GROUP BY nd)
              |SELECT d.doc_id, COALESCE(a.nh, 0) AS n_hits,
              |       a.nh IS NOT NULL AS is_dup, a.first_match
              |FROM documents d LEFT JOIN agg a ON a.nd = d.doc_id
              |WHERE d.doc_id % 5 = 0
              |ORDER BY doc_id""".stripMargin)),

    QuerySpec(
      "dedup_minhash",
      (s, dir) =>
        minhashPairs(s, dir)
          .select(col("da").as("doc_a"), col("db").as("doc_b"), col("jaccard"))
          .orderBy("doc_a", "doc_b"),
      Some(MinHashOracle)),

    // Near-dup CLUSTERING — the step that makes pairwise dedup actionable
    // at 100 TB: connected components over the verified MinHash pair
    // graph, labeling every member of a duplicate family with the
    // family's minimum doc_id (`component`); keep-the-canonical is then
    // `doc_id == component`. Each round propagates the min label across
    // edges AND pointer-doubles (jump to the label's own label), so
    // convergence takes O(log diameter) rounds — a 25-round cap covers
    // any component a 2^25-diameter graph could produce, not just the
    // near-clique families LSH usually emits. Every round shuffles only
    // (vertex, label) longs. The fixed point is the exact per-component
    // minimum regardless of execution schedule, so the DuckDB
    // recursive-CTE oracle reproduces it bit-for-bit.
    QuerySpec(
      "dedup_components",
      (s, dir) =>
        connectedComponents(minhashPairs(s, dir).select("da", "db"))
          .select(col("id").as("doc_id"), col("lbl").as("component"))
          .orderBy("doc_id"),
      Some(ComponentsOracle)),

    // Per-source MinHash signature via the MinHashSig UDAF (q:agg_minhash,
    // SURVEY.md §2.4): one 16-long signature per corpus source, computed
    // with map-side combine. Output stringified so the hash-compare is
    // representation-stable across engines.
    QuerySpec(
      "agg_minhash",
      (s, dir) => {
        // Min-folds are duplicate-insensitive, so the per-doc DISTINCT the
        // oracle spells out is skipped here: shingle hashes flow straight
        // into ONE partial-aggregating groupBy(source) — map-side combine
        // reduces each partition to 5 signature buffers before the only
        // shuffle, the ideal 100 TB profile (constant bytes per partition).
        val minhashSig = udaf(graft.functions.MinHashSig)
        shingleHashes(docs(s, dir), "source")
          .groupBy("source")
          .agg(minhashSig(col("h")).as("sig"))
          .select(col("source"), concat_ws("_", col("sig")).as("signature"))
          .orderBy("source")
      },
      Some {
        val mins = (0 until K).map(i => s"MIN((${2 * i + 1}*h+${7919L * i}) % $P)").mkString(", ")
        s"""WITH toks AS (SELECT doc_id, source, STRING_SPLIT_REGEX(TRIM(text),'\\s+') AS t FROM documents),
           |idx AS (SELECT doc_id, source, t, UNNEST(GENERATE_SERIES(1, LEN(t)-2)) AS i
           |        FROM toks WHERE LEN(t) >= 3),
           |sh AS (SELECT DISTINCT doc_id, source,
           |       ('0x'||SUBSTR(MD5(t[i]||' '||t[i+1]||' '||t[i+2]),1,8))::BIGINT AS h FROM idx)
           |SELECT source, CONCAT_WS('_', $mins) AS signature
           |FROM sh GROUP BY source ORDER BY source""".stripMargin
      }),

    // SimHash fingerprints via the typed Aggregator (partial-aggregating:
    // constant shuffle bytes per doc regardless of text length).
    QuerySpec(
      "dedup_simhash",
      (s, dir) => {
        val simhash = udaf(graft.functions.SimHash)
        docs(s, dir)
          .repartition(col("doc_id")) // cf. bigramSets: exchange before the explode
          .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
          .select(col("doc_id"), h32(col("tok")).as("h"))
          .distinct()
          .groupBy("doc_id")
          .agg(simhash(col("h")).as("simhash"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (
                SELECT DISTINCT doc_id,
                       ('0x'||SUBSTR(MD5(UNNEST(STRING_SPLIT_REGEX(TRIM(text),'\s+'))),1,8))::BIGINT AS h
                FROM documents),
              bits AS (
                SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                FROM tk, (SELECT UNNEST(GENERATE_SERIES(0, 31)) AS b)
                GROUP BY doc_id, b)
              SELECT doc_id,
                     CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
              FROM bits GROUP BY doc_id ORDER BY doc_id""")),

    // SimHash near-dup PAIRING — the scale path that turns fingerprints
    // into a dedup decision (Manku/Jain/Sarma, WWW'07, the web-crawl
    // dedup algorithm). A WIDER 64-bit fingerprint (two independent
    // 32-bit md5-bridge halves, hex chars 1-8 and 9-16) split into 4
    // bands of 16 bits: any pair within hamming distance ≤ 3 flips bits
    // in at most 3 bands, so pigeonhole guarantees an EXACT match on at
    // least one — the band equi-join finds every such pair with zero
    // recall loss and never scans n². 16-bit bands give 65 536 buckets
    // per band, so random (non-dup) collisions are ~n²/65 536 per band —
    // the knob that scales: at larger n, widen the fingerprint and bands
    // again (Manku's crawl corpus used 64-bit fingerprints exactly this
    // way). Candidates are verified with exact popcounts
    // (bit_count(xor(hi))+bit_count(xor(lo))) before pairs survive; both
    // engines compute identical integer band keys and popcounts, so the
    // pair set hash-matches exactly. The 8-bit-band variant over the
    // 32-bit fingerprint was measured and rejected: dup families plus
    // 256-value band keyspaces put Σ|bucket|² above n²/2 at sf0.001.
    QuerySpec(
      "dedup_simhash_pairs",
      (s, dir) => simhashBandPairs(simhash64(s, dir)),
      Some(s"""WITH ${simhashPairCtes("")}
              SELECT doc_a, doc_b, hamming FROM pairs
              ORDER BY doc_a, doc_b""")),

    // Winnowing PARTIAL-overlap detection (Schleimer et al. 2003 — the
    // MOSS join): doc pairs sharing ≥3 winnow-selected fingerprints.
    // Where MinHash measures whole-document set resemblance, winnowing
    // GUARANTEES any shared run of ≥ K+W−1 = 7 tokens surfaces a common
    // fingerprint — the detector for copied passages inside otherwise
    // different documents. Scale shape: the winnow selection samples
    // ~2/(W+1) = 0.4 of grams BEFORE anything shuffles (the native
    // one-pass WinnowFingerprint expression, see text_winnow_fingerprint);
    // hot fingerprints in >64 docs (boilerplate) are dropped like every
    // other blocked family here, bounding the self-join at Σ|bucket|² ≤
    // 64·|fp| at any corpus size.
    QuerySpec(
      "dedup_winnow",
      (s, dir) => {
        // distinct (doc, h) — positions don't matter for overlap; one
        // compiled pass builds the fingerprints, localCheckpoint because
        // the relation feeds the df gate and both self-join sides
        val fp = Tables(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.WinnowFingerprint(split(trim(col("text")), "\\s+")).as("fp"))
          .select(col("doc_id"), explode(col("fp")).as("f"))
          .select(col("doc_id"), col("f.h").as("h"))
          .distinct()
          .localCheckpoint()
        val kept = fp.join(
          fp.groupBy("h").agg(count(lit(1)).as("df"))
            .filter(col("df").between(2, 64)).select("h"), "h")
        kept.as("a").join(kept.as("b"),
            col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= 3)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH $WinnowCtes,
              |fdoc AS (SELECT DISTINCT doc_id, h FROM winnow),
              |keep AS (SELECT h FROM fdoc GROUP BY h HAVING COUNT(*) BETWEEN 2 AND 64),
              |kept AS (SELECT f.doc_id, f.h FROM fdoc f JOIN keep k ON k.h = f.h)
              |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
              |FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
              |GROUP BY 1, 2 HAVING COUNT(*) >= 3
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // RECALL AUDIT of the banded MinHash detector against exact ground
    // truth — the evaluation a production dedup pipeline runs before
    // trusting an approximate detector at 100 TB. Ground truth is the
    // prefix-filtering exact set-similarity join at the SAME J ≥ 0.2
    // verify threshold (completeness proven in PrefixJoinSpec); detected
    // is the 8-band/2-row LSH candidate set after exact verification.
    // Precision is 1 by construction (candidates are verified), so the
    // one number that matters is recall = detected/truth — banding theory
    // puts P(detect | J=0.2) = 1−(1−0.2²)⁸ ≈ 0.28 at the threshold and
    // ≈ 0.97 at J=0.5, so corpus recall lands between, weighted by where
    // the true pairs sit. Pure composition of two already-blocked plans;
    // the audit output is ONE row.
    QuerySpec(
      "dedup_recall_audit",
      (s, dir) => {
        // both relations come from the per-(session, corpus) published
        // checkpoints (the ensemble's pattern): the audit CONSUMES the
        // detector and truth relations other queries already own, so it
        // measures audit cost, not a third run of the generators —
        // flagged cacheAssisted accordingly
        val truth = publishedPairs.getOrElseUpdate(
          (s, s"$dir@${corpusVersion(dir)}", "ppjoin0.2"),
          prefixJoinQuery(0.2)(s, dir)
            .select(col("doc_a").as("da"), col("doc_b").as("db"))
            .localCheckpoint())
        val det = minhashPairsShared(s, dir)
          .select(col("da"), col("db"), lit(1).as("hit"))
        truth.join(det, Seq("da", "db"), "left")
          .agg(count(lit(1)).as("truth_pairs"), count(col("hit")).as("detected_pairs"))
          .select(lit(0.2).as("t"), col("truth_pairs"), col("detected_pairs"),
            (round(col("detected_pairs").cast("double") / col("truth_pairs"), 6)
              + lit(0.0)).as("recall"))
      },
      Some(s"""WITH $MinHashBandCtes,
              |c AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
              |p AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS ic
              |      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
              |      GROUP BY 1, 2),
              |truth AS (SELECT da, db FROM p
              |          JOIN c ca ON ca.doc_id = da JOIN c cb ON cb.doc_id = db
              |          WHERE CAST(ic AS DOUBLE) / (ca.n + cb.n - ic) >= 0.2),
              |bcand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
              |          FROM bands a JOIN bands b
              |            ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
              |hits AS (SELECT t.da, b.da AS hit FROM truth t
              |         LEFT JOIN bcand b ON b.da = t.da AND b.db = t.db)
              |SELECT CAST(0.2 AS DOUBLE) AS t,
              |       COUNT(*) AS truth_pairs, COUNT(hit) AS detected_pairs,
              |       ROUND(CAST(COUNT(hit) AS DOUBLE) / COUNT(*), 6) + 0.0 AS recall
              |FROM hits""".stripMargin),
      cacheAssisted = true),

    // Ensemble near-dup clustering — components over the UNION of the two
    // independent pair signals (MinHash-verified Jaccard ≥ 0.2 edges and
    // SimHash hamming ≤ 3 edges), the shape production dedup takes when
    // no single signal has full recall: token-set overlap and weighted
    // bit-profile proximity fail on DIFFERENT near-dup classes, and a
    // doc pair caught by either belongs in the same discard family. Pure
    // composition of already-verified pieces — the pair relations come
    // from the per-(session, dir) published checkpoints (see
    // publishedPairs: the generators run at most once per session, like
    // a production pipeline sharing one materialized pair relation
    // between its report and clustering jobs), and the union adds one
    // distinct over (long, long) edges — so the plan stays blocked
    // end-to-end (no new quadratic surface at any corpus size).
    QuerySpec(
      "dedup_ensemble_components",
      (s, dir) => {
        val mh = minhashPairsShared(s, dir)
        val sh = simhashPairsShared(s, dir)
        connectedComponents(mh.unionAll(sh).distinct())
          .select(col("id").as("doc_id"), col("lbl").as("component"))
          .orderBy("doc_id")
      },
      Some(EnsembleComponentsOracle),
      // the published-pair checkpoints make repeat runs a cache hit —
      // declared so Bench flags the timing as marginal-cost, not
      // end-to-end (ADVICE r6)
      cacheAssisted = true),

    // Blocked word-bigram Jaccard: each doc's blocking key is its RAREST
    // bigram (globally lowest document frequency, ties broken
    // lexicographically) — near-dups share most grams, so their rarest
    // grams coincide, while natural-text mass never concentrates on
    // stopword blocks the way first-two-tokens prefix blocking does.
    // Oversized blocks split into ≤64-doc hash sub-blocks (see
    // ngramBlocks), bounding the self-join at Σ|block|² ≈ 64·n pairs at
    // any corpus size.
    QuerySpec(
      "dedup_ngram_jaccard",
      (s, dir) =>
        ngramJaccardPairs(s, dir)
          .select(col("da").as("doc_a"), col("db").as("doc_b"), col("jaccard"))
          .orderBy("doc_a", "doc_b"),
      Some(s"""WITH $NgramPairsCtes
              SELECT da AS doc_a, db AS doc_b, jaccard FROM npairs
              ORDER BY doc_a, doc_b""")),

    // SoftDeDup-style duplicate DOWN-WEIGHTING (He et al. 2024,
    // "SoftDedup: an Efficient Data Reweighting Method for Speeding Up
    // Language Model Pre-training"): instead of the binary keep/drop
    // every dedup_* query above decides, score each document's
    // "commonness" — the mean corpus document-frequency of its 3-token
    // shingles — and emit a sampling weight ∝ 1/commonness, so heavily
    // duplicated content trains with proportionally lower probability
    // and nothing is discarded outright. The 100 TB shape is two
    // compact hash shuffles, both already proven by the MinHash tier:
    // one distinct over (doc_id, shingle-hash), one groupBy(h) for the
    // df table, one groupBy(doc_id) for the means — only 8-byte hashes
    // ever cross the wire, never text, and df is mergeable so the model
    // updates incrementally as the corpus grows.
    QuerySpec(
      "dedup_soft_weights",
      (s, dir) => {
        val sh = shingleHashes(docs(s, dir).repartition(col("doc_id")), "doc_id")
          .distinct()
        val df = sh.groupBy("h").agg(count(lit(1)).as("df")) // distinct docs per h
        sh.join(df, "h")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"), sum(col("df")).as("sdf"))
          .select(col("doc_id"), col("n_shingles"),
            (round(col("sdf").cast("double") / col("n_shingles"), 6) + lit(0.0))
              .as("mean_df"),
            (round(col("n_shingles").cast("double") / col("sdf"), 6) + lit(0.0))
              .as("weight"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
                SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS t FROM documents),
              idx AS (
                SELECT doc_id, t, UNNEST(GENERATE_SERIES(1, LEN(t)-2)) AS i
                FROM toks WHERE LEN(t) >= 3),
              sh AS (
                SELECT DISTINCT doc_id,
                       ('0x'||SUBSTR(MD5(t[i]||' '||t[i+1]||' '||t[i+2]),1,8))::BIGINT AS h
                FROM idx),
              df AS (SELECT h, COUNT(*) AS df FROM sh GROUP BY h)
              SELECT doc_id, COUNT(*) AS n_shingles,
                     ROUND(CAST(SUM(df) AS DOUBLE) / COUNT(*), 6) + 0.0 AS mean_df,
                     ROUND(COUNT(*) / CAST(SUM(df) AS DOUBLE), 6) + 0.0 AS weight
              FROM sh JOIN df USING (h)
              GROUP BY doc_id ORDER BY doc_id""")),

    // EXACT set-similarity join via prefix filtering (PPJoin family —
    // Chaudhuri et al. ICDE'06, Xiao et al. WWW'08): order every doc's
    // shingle set by GLOBAL rarity (df asc, hash asc — one shared total
    // order), keep each doc's first |d| − ⌈t·|d|⌉ + 1 shingles as its
    // PREFIX, and generate candidates only from shared prefix shingles.
    // The prefix lemma guarantees any pair with Jaccard ≥ t shares a
    // prefix element, so — unlike the probabilistic MinHash/SimHash
    // banding above — recall is 1.0 BY CONSTRUCTION at the threshold.
    // Beyond the prefix lemma the candidate join carries BOTH of the
    // published family's exact pair-level filters (see prefixJoinQuery):
    // the LENGTH filter (min size ≥ t·max size, else J < t outright) and
    // the POSITIONAL filter (overlap ≤ min(rka,rkb) + min(sza−rka,
    // szb−rkb) for ANY shared element at ranks rka/rkb, so a matched
    // prefix element whose bound misses the required overlap
    // α = ⌈t/(1+t)·(sza+szb)⌉ proves the PAIR fails). Both predicates
    // use columns already in the plan — no extra shuffle. The oracle is
    // the direct exact join — equality IS the completeness proof,
    // re-asserted against in-memory brute force in PrefixJoinSpec.
    // Every shuffle carries 8-byte hashes or (id, id) pairs; candidate
    // volume is Σ|prefix-bucket|² AFTER length+positional pruning.
    // Declared at two thresholds: t=0.2 (permissive — prefixes are ~80%
    // of each set, the filters do the heavy lifting) and t=0.5 (the
    // regime where prefixes themselves shrink to ~half).
    QuerySpec("dedup_prefix_join", prefixJoinQuery(0.2),
      Some(prefixJoinOracle(0.2))),

    QuerySpec("dedup_prefix_join_t5", prefixJoinQuery(0.5),
      Some(prefixJoinOracle(0.5))),

    // The RESAMPLING EXECUTION of the soft-dedup weights: a document
    // survives iff a deterministic per-doc uniform draw (md5 of its id,
    // 24 bits → [0,1)) lands under its weight — importance sampling
    // with probability exactly ∝ 1/commonness, reproducible run-to-run
    // and engine-to-engine (no RNG state; the draw IS a hash). The
    // survivor count concentrates on Σweight. Per-row codegen on top of
    // the dedup_soft_weights relation; the only additional cost is the
    // hash — the 100 TB shape of "apply the sampling decision" is a
    // filter, never a shuffle.
    QuerySpec(
      "dedup_soft_resample",
      (s, dir) => {
        val sh = shingleHashes(docs(s, dir).repartition(col("doc_id")), "doc_id")
          .distinct()
        val df = sh.groupBy("h").agg(count(lit(1)).as("df"))
        sh.join(df, "h")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"), sum(col("df")).as("sdf"))
          .select(col("doc_id"),
            (round(col("n_shingles").cast("double") / col("sdf"), 6) + lit(0.0))
              .as("weight"),
            (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
              .cast("double") / 16777216.0).as("u"))
          .select(col("doc_id"), col("weight"),
            (col("u") < col("weight")).as("kept"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
                SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS t FROM documents),
              idx AS (
                SELECT doc_id, t, UNNEST(GENERATE_SERIES(1, LEN(t)-2)) AS i
                FROM toks WHERE LEN(t) >= 3),
              sh AS (
                SELECT DISTINCT doc_id,
                       ('0x'||SUBSTR(MD5(t[i]||' '||t[i+1]||' '||t[i+2]),1,8))::BIGINT AS h
                FROM idx),
              df AS (SELECT h, COUNT(*) AS df FROM sh GROUP BY h),
              w AS (
                SELECT doc_id,
                       ROUND(COUNT(*) / CAST(SUM(df) AS DOUBLE), 6) + 0.0 AS weight,
                       CAST(('0x'||SUBSTR(MD5(CAST(doc_id AS VARCHAR)),1,6))::BIGINT AS DOUBLE)
                         / 16777216.0 AS u
                FROM sh JOIN df USING (h)
                GROUP BY doc_id)
              SELECT doc_id, weight, u < weight AS kept
              FROM w ORDER BY doc_id""")),

    // Edit-distance near-dup refinement — the character-level verifier
    // layered on the token-level candidates: every ngram-Jaccard pair is
    // re-scored with full Levenshtein distance (both engines implement
    // the identical standard insert/delete/substitute DP) plus a
    // normalized similarity. Running edit distance ONLY on verified
    // candidates is the point at scale: Levenshtein is O(|a|·|b|) per
    // pair, affordable on the bounded near-dup pair set, never on the
    // corpus cross product. One extra equi-join per side fetches texts
    // by doc_id — wide rows move only for the candidate pairs.
    QuerySpec(
      "dedup_editdistance",
      (s, dir) => {
        val d = docs(s, dir).select(col("doc_id"), col("text"))
        ngramJaccardPairs(s, dir)
          .join(d.select(col("doc_id").as("da"), col("text").as("ta")), "da")
          .join(d.select(col("doc_id").as("db"), col("text").as("tb")), "db")
          .withColumn("lev", levenshtein(col("ta"), col("tb")))
          .select(col("da").as("doc_a"), col("db").as("doc_b"), col("lev"),
            round(lit(1.0) - col("lev") / greatest(length(col("ta")), length(col("tb"))), 6)
              .as("sim"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH $NgramPairsCtes
              SELECT p.da AS doc_a, p.db AS doc_b,
                     CAST(LEVENSHTEIN(a.text, b.text) AS INT) AS lev,
                     ROUND(CAST(1.0 AS DOUBLE)
                           - LEVENSHTEIN(a.text, b.text)
                             / GREATEST(LENGTH(a.text), LENGTH(b.text)), 6) AS sim
              FROM npairs p
              JOIN documents a ON a.doc_id = p.da
              JOIN documents b ON b.doc_id = p.db
              ORDER BY doc_a, doc_b""")),

    // PageRank over the verified near-dup graph — the numeric-propagation
    // twin of dedup_components' label propagation (centrality over a link
    // or duplicate graph is a standard corpus-quality signal). Same
    // iterative shape as embedding_kmeans: loop-carried state is
    // localCheckpoint'ed, each round is one edge join + one partial-
    // aggregating groupBy on vertex ids — O(edges) per round at any
    // scale, never O(n²). The symmetric dup graph has out-degree ≥ 1
    // everywhere, so there is no dangling-mass term. Determinism bridge:
    // per-edge contributions are rounded to 12 THEN decimal-summed; the
    // damping mix re-rounds to 12 each round (identical double ops both
    // engines); the oracle rebuilds the SAME graph via MinHashPairsCtes.
    QuerySpec(
      "graph_pagerank",
      (s, dir) => {
        val p0 = minhashPairs(s, dir).select("da", "db").localCheckpoint()
        val edges = p0.union(p0.select(col("db").as("da"), col("da").as("db")))
          .localCheckpoint()
        val deg = edges.groupBy("da").agg(count(lit(1)).as("deg")).localCheckpoint()
        val degN = deg.select(col("da").as("id"), col("deg"))
        val nn = deg.agg(count(lit(1)).as("n"))
        var pr = degN.crossJoin(broadcast(nn))
          .select(col("id"), round(lit(1.0) / col("n"), 12).as("pr"))
          .localCheckpoint()
        for (_ <- 1 to 2) {
          pr = edges
            .join(pr.join(degN, "id"), col("da") === col("id"))
            .select(col("db").as("dst"),
              round(col("pr") * 0.85 / col("deg"), 12).cast("decimal(28,12)").as("c"))
            .groupBy("dst")
            .agg(sum(col("c")).as("sc"))
            .crossJoin(broadcast(nn))
            .select(col("dst").as("id"),
              round(lit(0.15) / col("n") + col("sc").cast("double"), 12).as("pr"))
            .localCheckpoint()
        }
        pr.join(degN, "id")
          .select(col("id").as("doc_id"), col("deg"), round(col("pr"), 9).as("pagerank"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $MinHashPairsCtes,
              edges AS (SELECT da, db FROM jpairs
                        UNION ALL SELECT db AS da, da AS db FROM jpairs),
              deg AS (SELECT da AS id, COUNT(*) AS deg FROM edges GROUP BY da),
              nn AS (SELECT COUNT(*) AS n FROM deg),
              pr0 AS (SELECT id, ROUND(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn), 12) AS pr
                      FROM deg),
              c1 AS (SELECT e.db AS dst,
                            CAST(ROUND(p.pr * CAST(0.85 AS DOUBLE) / d.deg, 12)
                                 AS DECIMAL(28,12)) AS c
                     FROM edges e JOIN pr0 p ON p.id = e.da JOIN deg d ON d.id = e.da),
              pr1 AS (SELECT dst AS id,
                             ROUND(CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
                                   + CAST(SUM(c) AS DOUBLE), 12) AS pr
                      FROM c1 GROUP BY dst),
              c2 AS (SELECT e.db AS dst,
                            CAST(ROUND(p.pr * CAST(0.85 AS DOUBLE) / d.deg, 12)
                                 AS DECIMAL(28,12)) AS c
                     FROM edges e JOIN pr1 p ON p.id = e.da JOIN deg d ON d.id = e.da),
              pr2 AS (SELECT dst AS id,
                             ROUND(CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
                                   + CAST(SUM(c) AS DOUBLE), 12) AS pr
                      FROM c2 GROUP BY dst)
              SELECT p.id AS doc_id, d.deg, ROUND(p.pr, 9) AS pagerank
              FROM pr2 p JOIN deg d ON d.id = p.id
              ORDER BY doc_id""")),

    // Triangle counting over the same dup graph (the clustering-
    // coefficient ingredient: triangles distinguish a tight dup FAMILY
    // from a chain of borderline pairs). Edge-iterator enumeration with
    // the canonical a<b<c ordering so each triangle materializes exactly
    // once: two equi-joins over the canonical edge relation — Σ over
    // edges of deg(a)·deg(b) work, never O(n³) — then one explode +
    // groupBy for per-vertex participation. Edges checkpointed once,
    // referenced three times.
    QuerySpec(
      "graph_triangles",
      (s, dir) => {
        val e = minhashPairs(s, dir)
          .select(least(col("da"), col("db")).as("a"),
            greatest(col("da"), col("db")).as("b"))
          .distinct()
          .localCheckpoint()
        val tri = e.as("e1")
          .join(e.as("e2"), col("e2.a") === col("e1.b"))
          .join(e.as("e3"),
            col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
          .select(col("e1.a").as("va"), col("e1.b").as("vb"), col("e2.b").as("vc"))
        tri
          .select(explode(array(col("va"), col("vb"), col("vc"))).as("doc_id"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_triangles"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $MinHashPairsCtes,
              e AS (SELECT DISTINCT LEAST(da, db) AS a, GREATEST(da, db) AS b FROM jpairs),
              tri AS (
                SELECT e1.a AS va, e1.b AS vb, e2.b AS vc
                FROM e e1
                JOIN e e2 ON e2.a = e1.b
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
              verts AS (SELECT va AS doc_id FROM tri
                        UNION ALL SELECT vb FROM tri
                        UNION ALL SELECT vc FROM tri)
              SELECT doc_id, COUNT(*) AS n_triangles
              FROM verts GROUP BY doc_id ORDER BY doc_id""")),

    // Span-level (sub-document) dedup — the "remove repeated passages"
    // curation op (the exact-substring-dedup family, approximated at
    // fixed 10-token chunk granularity so membership is SQL-exact): a
    // chunk whose hash appears more than once ANYWHERE in the corpus is
    // removed from every document carrying it; each doc reports surviving
    // chunk counts + an order-preserving digest of its deduplicated text.
    // Boilerplate/dup families lose their repeated spans while unique
    // prose survives — doc-level dedup (dedup_exact/minhash) can't
    // express this, and it's what large corpus curation actually ships.
    //
    // Scale shape: tokenize+chunk is per-row codegen; the corpus-wide
    // occurrence count is ONE partial-aggregating shuffle of 8-byte chunk
    // hashes; the verdict joins back on the same hash (equi-join, AQE-
    // sized); reassembly is a per-doc groupBy whose state is bounded by
    // one document's chunks. Nothing driver-side, nothing all-pairs, no
    // corpus-sized broadcast — the 100 TB cost is two hash shuffles.
    QuerySpec(
      "dedup_spans",
      (s, dir) => {
        val chunked = docs(s, dir)
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(0, cast(ceil(size(t)/10.0) as int)-1), " +
              "i -> concat_ws(' ', slice(t, i*10+1, 10)))")))
          .withColumnRenamed("pos", "idx")
          .withColumnRenamed("col", "chunk")
          .withColumn("h", h32(col("chunk")))
        val counts = chunked.groupBy("h").agg(count(lit(1)).as("cnt"))
        chunked.join(counts, "h")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_kept"),
            md5(concat_ws(" ", expr(
              "transform(filter(array_sort(collect_list(struct(idx, cnt, chunk)))," +
                " x -> x.cnt = 1), x -> x.chunk)"))).as("kept_digest"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
                SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS t FROM documents),
              chunks AS (
                SELECT doc_id, i AS idx,
                       ARRAY_TO_STRING(t[(i*10+1):(i*10+10)], ' ') AS chunk
                FROM (SELECT doc_id, t,
                             UNNEST(GENERATE_SERIES(0, CAST(CEIL(LEN(t)/10.0) AS INT) - 1)) AS i
                      FROM toks)),
              h AS (SELECT doc_id, idx, chunk,
                           ('0x'||SUBSTR(MD5(chunk),1,8))::BIGINT AS hh
                    FROM chunks),
              c AS (SELECT hh, COUNT(*) AS cnt FROM h GROUP BY hh)
              SELECT doc_id,
                     COUNT(*) AS n_chunks,
                     CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                     MD5(COALESCE(STRING_AGG(CASE WHEN cnt = 1 THEN chunk END, ' ' ORDER BY idx), ''))
                       AS kept_digest
              FROM h JOIN c USING (hh)
              GROUP BY doc_id ORDER BY doc_id""")),

    // CCNet-style corpus-level line dedup (Wenzek et al. 2020 §3.1): the
    // unit is a fixed 8-token "paragraph" segment (the corpus carries no
    // newlines, so segment = non-overlapping token window — same
    // granularity trick as dedup_spans), and unlike dedup_spans the FIRST
    // occurrence in global (doc_id, idx) order SURVIVES — repeated
    // boilerplate trains once instead of zero times. That keep-first
    // semantics is what CCNet/ RefinedWeb actually ship; remove-all
    // (dedup_spans) and keep-first (this) bracket the design space.
    //
    // Scale shape: the winner per segment hash is min(struct(doc_id,
    // idx)) — a PARTIAL-AGGREGATING groupBy on the 8-byte hash, so a
    // viral boilerplate line costs map-side combine, never a per-key
    // sort (the row_number formulation would buffer the whole occurrence
    // list of the hottest line on one task; min-struct doesn't).
    // Verdict rejoins on the same hash (equi-join, AQE-sized), reassembly
    // is a per-doc groupBy bounded by one document's segments. Two
    // compact-key shuffles at 100 TB, nothing driver-side.
    QuerySpec(
      "dedup_lines",
      (s, dir) => {
        val segged = docs(s, dir)
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(0, cast(ceil(size(t)/8.0) as int)-1), " +
              "i -> concat_ws(' ', slice(t, i*8+1, 8)))")))
          .withColumnRenamed("pos", "idx")
          .withColumnRenamed("col", "seg")
          .withColumn("h", h32(col("seg")))
        val winners = segged.groupBy("h")
          .agg(min(struct(col("doc_id"), col("idx"))).as("w"))
        segged.join(winners, "h")
          .withColumn("keep",
            col("doc_id") === col("w.doc_id") && col("idx") === col("w.idx"))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_segs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            md5(concat_ws(" ", expr(
              "transform(filter(array_sort(collect_list(struct(idx, keep, seg)))," +
                " x -> x.keep), x -> x.seg)"))).as("kept_digest"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
                SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS t FROM documents),
              segs AS (
                SELECT doc_id, i AS idx,
                       ARRAY_TO_STRING(t[(i*8+1):(i*8+8)], ' ') AS seg
                FROM (SELECT doc_id, t,
                             UNNEST(GENERATE_SERIES(0, CAST(CEIL(LEN(t)/8.0) AS INT) - 1)) AS i
                      FROM toks)),
              h AS (SELECT doc_id, idx, seg,
                           ('0x'||SUBSTR(MD5(seg),1,8))::BIGINT AS hh
                    FROM segs),
              w AS (SELECT hh, MIN(ROW(doc_id, idx)) AS win FROM h GROUP BY hh)
              SELECT doc_id,
                     COUNT(*) AS n_segs,
                     CAST(SUM(CASE WHEN ROW(doc_id, idx) = win THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_kept,
                     MD5(COALESCE(STRING_AGG(
                       CASE WHEN ROW(doc_id, idx) = win THEN seg END, ' ' ORDER BY idx), ''))
                       AS kept_digest
              FROM h JOIN w USING (hh)
              GROUP BY doc_id ORDER BY doc_id""")),

    // Cross-table fuzzy ENTITY RESOLUTION (catalog vs dirty feed): every
    // feed record carries a deterministic 1-char typo (md5-chosen
    // position, 'x'↔'q' substitution), and must still resolve to its
    // catalog entity. Blocking is the pigeonhole SEGMENT scheme (Manku's
    // hamming argument in edit-distance form): split each name into 3
    // character segments — one substitution corrupts at most one, so ≥2
    // segments match the catalog EXACTLY and the (segment-index, text,
    // length) equi-join finds every true pair with zero recall loss,
    // never an n² scan. Candidates verify with exact levenshtein ≤ 1.
    // At 100 TB: segments are the shuffle key (compact strings), bucket
    // sizes track entity-name frequency, and the verify join is
    // candidate-bounded — the standard production ER shape.
    QuerySpec(
      "dedup_entity_resolution",
      (s, dir) => {
        val part = Tables(s, dir, "part")
        val catalog = part.select(col("p_name").as("cn")).distinct()
        val dirty = part
          .select(col("p_partkey").as("rec_id"), col("p_name"))
          .withColumn("pos", h32(col("p_name")) % length(col("p_name")))
          .withColumn("och", expr("substr(p_name, CAST(pos + 1 AS INT), 1)"))
          .withColumn("dn", expr(
            "concat(substr(p_name, 1, CAST(pos AS INT)), " +
              "CASE WHEN och = 'x' THEN 'q' ELSE 'x' END, " +
              "substr(p_name, CAST(pos + 2 AS INT)))"))
          .select(col("rec_id"), col("dn"))
        def segmented(df: DataFrame, name: String): DataFrame = df
          .withColumn("l", length(col(name)))
          .select(col("*"), explode(expr(
            s"array(struct(0 AS i, substr($name, 1, l DIV 3) AS seg), " +
              s"struct(1 AS i, substr($name, l DIV 3 + 1, l DIV 3 * 2 - l DIV 3) AS seg), " +
              s"struct(2 AS i, substr($name, l DIV 3 * 2 + 1) AS seg))")).as("sg"))
          .select(df.columns.map(col) :+ col("l") :+
            col("sg.i").as("i") :+ col("sg.seg").as("seg"): _*)
        val cand = segmented(dirty, "dn")
          .join(segmented(catalog, "cn"), Seq("i", "seg", "l"))
          .select(col("rec_id"), col("dn"), col("cn")).distinct()
        cand
          .filter(levenshtein(col("dn"), col("cn")) <= 1)
          .groupBy("rec_id", "dn")
          .agg(count(lit(1)).as("n_matches"), min(col("cn")).as("first_match"))
          .orderBy("rec_id")
      },
      Some("""WITH cat AS (SELECT DISTINCT p_name AS cn FROM part),
           |d AS (SELECT p_partkey AS rec_id, p_name,
           |             ('0x'||SUBSTR(MD5(p_name),1,8))::BIGINT % LEN(p_name) AS pos
           |      FROM part),
           |d2 AS (SELECT rec_id,
           |              SUBSTR(p_name, 1, CAST(pos AS INT)) ||
           |              (CASE WHEN SUBSTR(p_name, CAST(pos + 1 AS INT), 1) = 'x'
           |                    THEN 'q' ELSE 'x' END) ||
           |              SUBSTR(p_name, CAST(pos + 2 AS INT)) AS dn
           |       FROM d),
           |dseg AS (
           |  SELECT rec_id, dn, LEN(dn) AS l, i,
           |         CASE i WHEN 0 THEN SUBSTR(dn, 1, LEN(dn) // 3)
           |                WHEN 1 THEN SUBSTR(dn, LEN(dn) // 3 + 1,
           |                                   LEN(dn) // 3 * 2 - LEN(dn) // 3)
           |                ELSE SUBSTR(dn, LEN(dn) // 3 * 2 + 1) END AS seg
           |  FROM d2, (SELECT UNNEST([0, 1, 2]) AS i)),
           |cseg AS (
           |  SELECT cn, LEN(cn) AS l, i,
           |         CASE i WHEN 0 THEN SUBSTR(cn, 1, LEN(cn) // 3)
           |                WHEN 1 THEN SUBSTR(cn, LEN(cn) // 3 + 1,
           |                                   LEN(cn) // 3 * 2 - LEN(cn) // 3)
           |                ELSE SUBSTR(cn, LEN(cn) // 3 * 2 + 1) END AS seg
           |  FROM cat, (SELECT UNNEST([0, 1, 2]) AS i)),
           |cand AS (
           |  SELECT DISTINCT d.rec_id, d.dn, c.cn
           |  FROM dseg d JOIN cseg c ON c.i = d.i AND c.seg = d.seg AND c.l = d.l)
           |SELECT rec_id, dn, COUNT(*) AS n_matches, MIN(cn) AS first_match
           |FROM cand WHERE levenshtein(dn, cn) <= 1
           |GROUP BY rec_id, dn ORDER BY rec_id""".stripMargin)),

    // Leakage-aware train/val/test split: assigning splits per DOCUMENT
    // leaks near-duplicates across the train/test boundary (the test-set
    // contamination failure every eval pipeline eventually ships);
    // assigning per near-dup COMPONENT makes cross-split leakage
    // structurally zero. Both strategies run side by side over the same
    // verified MinHash pair relation and component labels: per-split doc
    // counts plus the audited count of near-dup pairs crossing splits —
    // 0 for the cluster strategy (required in-run: same component ⇒ same
    // md5-bucket ⇒ same split), measurably > 0 for the naive baseline on
    // this corpus. Deterministic md5 bucketing (80/10/10) keeps the
    // assignment reproducible engine-to-engine and REBALANCE-FREE at
    // 100 TB: no shuffle assigns splits, only the pair audit joins.
    QuerySpec(
      "pipeline_leakage_split",
      (s, dir) => {
        val pairs = minhashPairsShared(s, dir)
        val comps = connectedComponents(pairs)
          .select(col("id").as("doc_id"), col("lbl").as("component"))
        val labeled = docs(s, dir).select(col("doc_id"))
          .join(comps, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("component"))
        def splitOf(c: Column): Column = {
          val h = h32(concat(lit("split:"), c.cast("string"))) % 10
          when(h <= 7, "train").when(h === 8, "val").otherwise("test")
        }
        val byCluster = labeled.select(col("doc_id"), splitOf(col("component")).as("split"))
        val byDoc = labeled.select(col("doc_id"), splitOf(col("doc_id")).as("split"))
        def leakCount(assign: DataFrame): Long = pairs
          .join(assign.select(col("doc_id").as("da"), col("split").as("sa")), "da")
          .join(assign.select(col("doc_id").as("db"), col("split").as("sb")), "db")
          .filter(col("sa") =!= col("sb")).count()
        val lc = leakCount(byCluster)
        require(lc == 0,
          s"cluster-level split leaked $lc near-dup pairs across splits")
        val ld = leakCount(byDoc)
        byCluster.groupBy("split").agg(count(lit(1)).as("n_docs"))
          .withColumn("strategy", lit("cluster")).withColumn("leaked_pairs", lit(lc))
          .unionByName(
            byDoc.groupBy("split").agg(count(lit(1)).as("n_docs"))
              .withColumn("strategy", lit("doc")).withColumn("leaked_pairs", lit(ld)))
          .select(col("strategy"), col("split"), col("n_docs"), col("leaked_pairs"))
          .orderBy("strategy", "split")
      },
      Some(s"""WITH RECURSIVE $MinHashPairsCtes,
           |e2 AS (SELECT da, db FROM jpairs UNION ALL SELECT db AS da, da AS db FROM jpairs),
           |reach AS (
           |  SELECT da AS src, db AS dst FROM e2
           |  UNION
           |  SELECT r.src, e.db AS dst FROM reach r JOIN e2 e ON e.da = r.dst),
           |comp AS (
           |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
           |  FROM reach GROUP BY src),
           |labeled AS (
           |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
           |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
           |asg AS (
           |  SELECT 'cluster' AS strategy, doc_id,
           |         CASE WHEN hb <= 7 THEN 'train' WHEN hb = 8 THEN 'val'
           |              ELSE 'test' END AS split
           |  FROM (SELECT doc_id,
           |               ('0x'||SUBSTR(MD5('split:'||CAST(component AS VARCHAR)),1,8))::BIGINT % 10 AS hb
           |        FROM labeled)
           |  UNION ALL
           |  SELECT 'doc' AS strategy, doc_id,
           |         CASE WHEN hb <= 7 THEN 'train' WHEN hb = 8 THEN 'val'
           |              ELSE 'test' END AS split
           |  FROM (SELECT doc_id,
           |               ('0x'||SUBSTR(MD5('split:'||CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 10 AS hb
           |        FROM labeled)),
           |leaks AS (
           |  SELECT a.strategy, COUNT(*) AS leaked
           |  FROM jpairs p
           |  JOIN asg a ON a.doc_id = p.da
           |  JOIN asg b ON b.doc_id = p.db AND b.strategy = a.strategy
           |  WHERE a.split <> b.split
           |  GROUP BY a.strategy)
           |SELECT a.strategy, a.split, COUNT(*) AS n_docs,
           |       COALESCE(MAX(l.leaked), 0) AS leaked_pairs
           |FROM asg a LEFT JOIN leaks l ON l.strategy = a.strategy
           |GROUP BY a.strategy, a.split
           |ORDER BY a.strategy, a.split""".stripMargin),
      // rides the published pair checkpoint like the ensemble — Bench
      // flags the timing as marginal-cost over the shared pair relation
      cacheAssisted = true)
  )

  /** Shared DuckDB CTE chain reimplementing the exact MinHash+LSH
    * pipeline — same hash, same (2i+1, 7919i) permutation seeds, same
    * band layout — ending in `jpairs(da, db, jaccard)`, the verified
    * near-dup pair relation. */
  /** Shared DuckDB CTE chain reimplementing the rarest-gram-blocked
    * bigram-Jaccard pipeline exactly (same hash, same 13+10 packed
    * argmin key, same 64-doc sub-block cap), ending in
    * `npairs(da, db, jaccard)` — the verified near-dup pair relation of
    * `dedup_ngram_jaccard`, reused by `dedup_editdistance`. */
  private lazy val NgramPairsCtes: String =
    s"""t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text),'\\s+') AS t FROM documents),
       |grams AS (
       |  SELECT DISTINCT doc_id,
       |         ('0x'||SUBSTR(MD5(t[i] || ' ' || t[i+1]),1,8))::BIGINT AS h
       |  FROM (SELECT doc_id, t, UNNEST(GENERATE_SERIES(1, LEN(t)-1)) AS i FROM t WHERE LEN(t) >= 2)),
       |dfreq AS (SELECT h, COUNT(*) AS df FROM grams GROUP BY h),
       |keyed AS (
       |  SELECT doc_id,
       |         MIN(LPAD(df::VARCHAR, 13, '0') || LPAD(h::VARCHAR, 10, '0')) AS blk
       |  FROM grams JOIN dfreq USING (h) GROUP BY doc_id),
       |capped AS (
       |  SELECT doc_id, blk,
       |         CASE WHEN COUNT(*) OVER (PARTITION BY blk) <= 64 THEN 0
       |              ELSE ('0x'||SUBSTR(MD5(doc_id::VARCHAR),1,8))::BIGINT
       |                   % CAST(CEIL(COUNT(*) OVER (PARTITION BY blk)/64.0) AS BIGINT) END AS sub
       |  FROM keyed),
       |cand AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db FROM capped a
       |  JOIN capped b ON a.blk = b.blk AND a.sub = b.sub AND a.doc_id < b.doc_id),
       |inter AS (
       |  SELECT da, db, COUNT(*) AS ic FROM cand
       |  JOIN grams ga ON ga.doc_id = da
       |  JOIN grams gb ON gb.doc_id = db AND gb.h = ga.h
       |  GROUP BY da, db),
       |sizes AS (SELECT doc_id, COUNT(*) AS c FROM grams GROUP BY doc_id),
       |npairs AS (
       |  SELECT da, db, ROUND(CAST(ic AS DOUBLE) / (ca.c + cb.c - ic), 6) AS jaccard
       |  FROM inter JOIN sizes ca ON ca.doc_id = da JOIN sizes cb ON cb.doc_id = db
       |  WHERE CAST(ic AS DOUBLE) / (ca.c + cb.c - ic) >= 0.3)""".stripMargin

  /** The shared shingle→signature→band chain (CTEs `toks`/`idx`/`sh`/
    * `sig`/`bands`), split out so the STREAMING near-dup oracle
    * (`stream_neardup_minhash`) reuses the exact generated permutation
    * family the batch pair queries verify against. */
  private[operators] lazy val MinHashBandCtes: String = {
    val mins = (0 until K).map(i => s"MIN((${2 * i + 1}*h+${7919L * i}) % $P) AS s$i").mkString(", ")
    val bands = (0 until Bands).map(j =>
      s"SELECT doc_id, $j AS b, s${2 * j}::VARCHAR || '_' || s${2 * j + 1}::VARCHAR AS key FROM sig")
      .mkString(" UNION ALL ")
    s"""toks AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text),'\\s+') AS t FROM documents),
       |idx AS (SELECT doc_id, t, UNNEST(GENERATE_SERIES(1, LEN(t)-2)) AS i FROM toks WHERE LEN(t) >= 3),
       |sh AS (SELECT DISTINCT doc_id,
       |       ('0x'||SUBSTR(MD5(t[i]||' '||t[i+1]||' '||t[i+2]),1,8))::BIGINT AS h FROM idx),
       |sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       |bands AS ($bands)""".stripMargin
  }

  /** Oracle twin of the native WinnowFingerprint expression, ending in
    * `winnow(doc_id, pos, h)` — K=4-token-gram md5-bridge hashes, W=4
    * window MINs over the `h·2^20 + (2^20−1−pos)` encoding (min-h with
    * rightmost-pos tie-break in one BIGINT key), full windows only,
    * DISTINCT selections. Shared by `text_winnow_fingerprint` (the
    * verified relation, TextQueries) and `dedup_winnow` (its overlap-join
    * consumer). */
  private[operators] lazy val WinnowCtes: String =
    """wtoks AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text),'\s+') AS t FROM documents),
      |gidx AS (SELECT doc_id, t, UNNEST(GENERATE_SERIES(1, LEN(t)-3)) AS i
      |         FROM wtoks WHERE LEN(t) >= 4),
      |wgrams AS (SELECT doc_id, i - 1 AS pos,
      |           ('0x'||SUBSTR(MD5(t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]),1,8))::BIGINT AS h
      |           FROM gidx),
      |wkeys AS (SELECT doc_id, pos,
      |          MIN(h * 1048576 + (1048575 - pos)) OVER (
      |            PARTITION BY doc_id ORDER BY pos
      |            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mk
      |          FROM wgrams),
      |winnow AS (SELECT DISTINCT doc_id,
      |           CAST(1048575 - (mk % 1048576) AS INT) AS pos,
      |           mk // 1048576 AS h
      |           FROM wkeys WHERE pos >= 3)""".stripMargin

  private lazy val MinHashPairsCtes: String = {
    s"""$MinHashBandCtes,
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |         FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
       |inter AS (SELECT da, db, COUNT(*) AS ic FROM cand
       |          JOIN sh sa ON sa.doc_id = da JOIN sh sb ON sb.doc_id = db AND sb.h = sa.h
       |          GROUP BY da, db),
       |sizes AS (SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY doc_id),
       |jpairs AS (
       |  SELECT da, db, ROUND(CAST(ic AS DOUBLE) / (ca.c + cb.c - ic), 6) AS jaccard
       |  FROM inter JOIN sizes ca ON ca.doc_id = da JOIN sizes cb ON cb.doc_id = db
       |  WHERE CAST(ic AS DOUBLE) / (ca.c + cb.c - ic) >= 0.2)""".stripMargin
  }

  private lazy val MinHashOracle: String =
    s"""WITH $MinHashPairsCtes
       |SELECT da AS doc_a, db AS doc_b, jaccard FROM jpairs
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Connected components over `jpairs` via transitive closure (the
    * recursive CTE is the declarative twin of the Spark side's min-label
    * propagation loop — both compute the exact per-component minimum). */
  private lazy val ComponentsOracle: String =
    s"""WITH RECURSIVE $MinHashPairsCtes,
       |e2 AS (SELECT da, db FROM jpairs UNION ALL SELECT db AS da, da AS db FROM jpairs),
       |reach AS (
       |  SELECT da AS src, db AS dst FROM e2
       |  UNION
       |  SELECT r.src, e.db AS dst FROM reach r JOIN e2 e ON e.da = r.dst),
       |comp AS (
       |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
       |  FROM reach GROUP BY src)
       |SELECT doc_id, component FROM comp ORDER BY doc_id""".stripMargin

  /** Twin of [[ComponentsOracle]] over the MinHash ∪ SimHash edge union —
    * the `sm_` prefix keeps the simhash chain's CTE names clear of the
    * MinHash chain's (which owns the unprefixed `sig`). */
  private lazy val EnsembleComponentsOracle: String =
    s"""WITH RECURSIVE $MinHashPairsCtes,
       |${simhashPairCtes("sm_")},
       |edges AS (SELECT da, db FROM jpairs
       |          UNION SELECT doc_a AS da, doc_b AS db FROM sm_pairs),
       |e2 AS (SELECT da, db FROM edges UNION ALL SELECT db AS da, da AS db FROM edges),
       |reach AS (
       |  SELECT da AS src, db AS dst FROM e2
       |  UNION
       |  SELECT r.src, e.db AS dst FROM reach r JOIN e2 e ON e.da = r.dst),
       |comp AS (
       |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
       |  FROM reach GROUP BY src)
       |SELECT doc_id, component FROM comp ORDER BY doc_id""".stripMargin
}
