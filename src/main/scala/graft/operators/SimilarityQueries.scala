package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.MmrSelect
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (array<float>, dim 64)
  * (SURVEY.md §2.12).
  *
  * Brute-force cosine top-k is the correctness baseline; the IVF variant
  * prunes the candidate set to the query's partition (here the `label`
  * column stands in for a cluster assignment), which is the 100 TB shape:
  * a partition-pruned equi-join instead of a full cross product.
  *
  * Determinism: dot products are computed in double with a left-to-right
  * fold on both engines and rounded to 6 decimals BEFORE thresholding /
  * ranking, so last-ulp float noise cannot flip a comparison.
  */
object SimilarityQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  /** Left-fold dot product of two array<double> columns — the native
    * codegen'd [[graft.functions.DotProduct]] expression (same fold order
    * as the higher-order-function chain it replaced, so oracle hashes are
    * unchanged; ~2-4× faster on the pair-join hot path). */
  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct(a, b)

  private def asD(c: Column): Column = c.cast("array<double>")

  /** (vec_id, label, e, nrm) — the shared L2-normalization stage every
    * similarity query starts from (single definition, so the fold order
    * the exact-float oracle depends on can never diverge). `normedFrom`
    * takes any (vec_id, label, embedding) relation — the Arrow-landing-
    * zone twin feeds the SAME stage, proving source-independence. */
  private[operators] def normedFrom(raw: DataFrame): DataFrame =
    raw.select(col("vec_id"), col("label"), asD(col("embedding")).as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))

  private def normed(s: SparkSession, dir: String): DataFrame =
    normedFrom(emb(s, dir))

  /** Upper-triangle covariance matrix `(i, j, s_pp, cov)` of the
    * 1000×-quantized embeddings — exact integer moments (one CovMoments
    * pass over the corpus), cov rounded to 6 decimals. Shared by
    * `embedding_covariance` (the verified relation) and
    * `embedding_pca_power` (its eigen consumer). */
  private def covarianceTri(s: SparkSession, dir: String): DataFrame = {
    val Tri = graft.functions.CovMoments.Tri
    val covm = udaf(graft.functions.CovMoments)
    val q = emb(s, dir).select(expr(
      "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))").as("q"))
    // (pos, element) rows of the packed moment buffer; localCheckpoint
    // because three consumers (triangle, marginals, count) read it and
    // physical plans never share subtrees — without the barrier the
    // corpus aggregation would run three times
    val m = q.agg(covm(col("q")).as("m"))
      .select(posexplode(col("m"))).localCheckpoint()
    // pos → (i, j) for the row-major upper triangle: one interpreted
    // build of a 2080-element literal mapping, broadcast everywhere
    val mapIJ = s.range(1).select(posexplode(expr(
      """flatten(transform(sequence(0, 63), i ->
           transform(sequence(i, 63), j -> struct(i AS i, j AS j))))""")))
      .select(col("pos"), col("col.i"), col("col.j"))
    val marg = m.filter(col("pos").between(Tri, Tri + 63))
      .select((col("pos") - Tri).cast("int").as("mi"), col("col").as("ms"))
    val n = m.filter(col("pos") === Tri + 64).select(col("col").as("n"))
    m.filter(col("pos") < Tri)
      .join(broadcast(mapIJ), "pos")
      .crossJoin(broadcast(n))
      .join(broadcast(marg).as("a"), col("a.mi") === col("i"))
      .join(broadcast(marg).as("b"), col("b.mi") === col("j"))
      // `+ 0.0` collapses IEEE -0.0 to +0.0 (DuckDB's ROUND preserves the
      // sign of an underflowing negative, Spark's BigDecimal round does
      // not — 3/2080 cells at sf0.01 diverged before this normalization)
      .select(col("i"), col("j"), col("col").as("s_pp"),
        (round((col("col").cast("double") / col("n")
          - (col("a.ms").cast("double") / col("n"))
            * (col("b.ms").cast("double") / col("n"))) / 1e6, 6) + lit(0.0)).as("cov"))
  }

  /** Top principal component `(i, loading, eigenvalue)` — the
    * PowerIterate eigen solve over [[covarianceTri]]'s constant-size
    * matrix relation, shared by `embedding_pca_power` (the verified
    * relation) and `embedding_pca_project` (its per-vector consumer). */
  private def pcaTop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tri = covarianceTri(s, dir)
    val full = tri.select(col("i"), col("j"), col("cov"))
      .unionAll(tri.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cov")))
    full.as[(Int, Int, Double)]
      .groupByKey(_ => true)
      .mapValues(identity)
      .agg(graft.functions.PowerIterate.toColumn.name("pc"))
      .toDF("g", "pc")
      .select(explode(col("pc")).as("p"))
      .select(col("p._1").as("i"), col("p._2").as("loading"),
        col("p._3").as("eigenvalue"))
  }

  /** Oracle twin of [[covarianceTri]] (same CTEs as the
    * embedding_covariance oracle), ending in `ctri(i, j, cov)`. */
  private val CovTriCtes: String =
    """q AS (
      |  SELECT LIST_TRANSFORM(embedding,
      |           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |  FROM embeddings),
      |cpairs AS (
      |  SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, q[i+1] * q[j+1] AS p
      |  FROM q, (SELECT UNNEST(RANGE(0, 64)) AS i),
      |          (SELECT UNNEST(RANGE(0, 64)) AS j)
      |  WHERE j >= i),
      |csums AS (
      |  SELECT i, j, COUNT(*) AS n, CAST(SUM(p) AS BIGINT) AS s
      |  FROM cpairs GROUP BY i, j),
      |cmarg AS (
      |  SELECT CAST(i AS INT) AS i, CAST(SUM(q[i+1]) AS BIGINT) AS ms
      |  FROM q, (SELECT UNNEST(RANGE(0, 64)) AS i) GROUP BY i),
      |ctri AS (
      |  SELECT s.i, s.j,
      |         ROUND((CAST(s.s AS DOUBLE) / s.n
      |                - (CAST(a.ms AS DOUBLE) / s.n)
      |                  * (CAST(b.ms AS DOUBLE) / s.n)) / 1e6, 6) + 0.0 AS cov
      |  FROM csums s JOIN cmarg a ON a.i = s.i JOIN cmarg b ON b.i = s.j)""".stripMargin

  /** Name of the converged-eigenvector CTE inside [[PcaCtes]]. */
  private lazy val PcaLast = s"v${graft.functions.PowerIterate.Iters}"

  /** The 20 power iterations as generated CTEs over [[CovTriCtes]] —
    * matvec and norm as positional co-UNNEST sums (list order =
    * ascending index, the NormCtes precedent), every coordinate rounded
    * per iteration. Ends with `lam(l)` (Rayleigh eigenvalue) beside the
    * converged vector [[PcaLast]]; shared by `embedding_pca_power` and
    * `embedding_pca_project`. */
  private lazy val PcaCtes: String = {
    val iters = (1 to graft.functions.PowerIterate.Iters).map { k =>
      // MATERIALIZED per iteration (the BPE-oracle precedent): without
      // it DuckDB inlines each CTE at every reference and the
      // evaluation tree doubles per iteration — 2^20 scans of the base
      s"""wl$k AS MATERIALIZED (
         |  SELECT LIST(w ORDER BY i) AS wv FROM (
         |    SELECT c.i,
         |           (SELECT SUM(p) FROM (SELECT UNNEST(c.ci) * UNNEST(v.v) AS p)) AS w
         |    FROM cmat c, v${k - 1} v)),
         |v$k AS MATERIALIZED (
         |  SELECT LIST_TRANSFORM(wl.wv, x -> ROUND(x / n.nrm, 6) + 0.0) AS v
         |  FROM wl$k wl,
         |       (SELECT SQRT((SELECT SUM(y*y) FROM (SELECT UNNEST(wv) AS y))) AS nrm
         |        FROM wl$k) n)""".stripMargin
    }.mkString(",\n")
    s"""$CovTriCtes,
       |cfull AS (
       |  SELECT i, j, cov FROM ctri
       |  UNION ALL
       |  SELECT j AS i, i AS j, cov FROM ctri WHERE i != j),
       |cmat AS MATERIALIZED (SELECT i, LIST(cov ORDER BY j) AS ci FROM cfull GROUP BY i),
       |v0 AS (SELECT LIST_TRANSFORM(RANGE(0, 64), x -> CAST(0.125 AS DOUBLE)) AS v),
       |$iters,
       |wf AS (
       |  SELECT c.i,
       |         (SELECT SUM(p) FROM (SELECT UNNEST(c.ci) * UNNEST(v.v) AS p)) AS w
       |  FROM cmat c, $PcaLast v),
       |wfl AS (SELECT LIST(w ORDER BY i) AS wv FROM wf),
       |lam AS (
       |  SELECT ROUND((SELECT SUM(p) FROM (SELECT UNNEST(v.v) * UNNEST(wl.wv) AS p)), 6)
       |           + 0.0 AS l
       |  FROM $PcaLast v, wfl wl)""".stripMargin
  }

  /** `embedding_pca_power` oracle: [[PcaCtes]] + the (i, loading,
    * eigenvalue) projection of the converged state. */
  private lazy val PcaOracleSql: String =
    s"""WITH $PcaCtes
       |SELECT CAST(g.i AS INT) AS i, v.v[g.i + 1] AS loading, lam.l AS eigenvalue
       |FROM $PcaLast v, lam, (SELECT UNNEST(RANGE(0, 64)) AS i) g
       |ORDER BY i""".stripMargin

  /** Oracle twin of [[normed]]: `n(vec_id, label, e, nrm)` CTEs (DuckDB
    * zips parallel unnests positionally; same left-to-right fold). */
  private val NormCtes =
    """v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, label, e,
             SQRT((SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x))) AS nrm
      FROM v
    )"""

  /** Oracle-side per-pair cosine over [[NormCtes]]. */
  private val CosineSql =
    s"""
    WITH $NormCtes,
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
             ROUND((SELECT SUM(p) FROM (SELECT UNNEST(q.e) * UNNEST(c.e) AS p))
                   / (q.nrm * c.nrm), 6) + 0.0 AS sim
      FROM n q JOIN n c ON q.vec_id != c.vec_id %s
      WHERE q.vec_id < 16
    )
    SELECT query_id, neighbor_id, sim FROM (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rn
      FROM pairs) WHERE rn <= 5
    ORDER BY query_id, sim DESC, neighbor_id
    """

  // ---- LSH (random-hyperplane / signed-random-projection) constants ----
  // 128 hyperplanes grouped into 16 bands of 8 sign bits; vectors sharing
  // any band key become candidates. 8-bit keys give 256 buckets per band
  // (4096 total) — unlike the earlier 4-bit geometry (16 buckets/band ⇒
  // Σ|bucket|² ≈ n²/16, no real prune), a random pair now collides in a
  // band with p = 2⁻⁸ while a cosine-0.5 true neighbor collides at ~4%
  // per band and ~47% over 16 bands: selectivity scales, recall survives.
  // At larger n, widen `bits` toward log₂(n) (the library knob below);
  // the declared query pins (16, 8) so the oracle can rebuild it exactly.
  // Hyperplane coefficients derive from md5 so the DuckDB oracle can
  // rebuild them bit-for-bit; embeddings are quantized to integers
  // (round(x*1000)) before projecting, making every sign bit exact
  // integer arithmetic on both engines — no float-order ambiguity.
  private val Bands = 16
  private val BandBits = 8

  /** (vec_id, band index b, band key) rows — one per vector per band,
    * via the native one-pass [[graft.functions.LshBandKeys]] kernel
    * (quantize once, all 128 sign bits in compiled long arithmetic; see
    * its Scaladoc for why the composed-from-built-ins version lost 5×).
    *
    * Exposed for SimilarityLshSpec's bucket-volume assertion. */
  private[operators] def lshBands(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("vec_id"),
        posexplode(graft.functions.LshBandKeys(asD(col("embedding")), Bands, BandBits)))
      .select(col("vec_id"), col("pos").as("b"), col("col").as("key"))

  // ---- k-means (Lloyd) kernels, shared by `embedding_kmeans` and
  // KmeansSpec's monotonicity law. Determinism: distances use the
  // ‖v‖² + ‖c‖² − 2·v·c identity over the native codegen'd DotProduct —
  // the SAME left-to-right double fold the cosine oracles already bridge
  // to DuckDB's UNNEST-SUM — rounded to 6 before the argmin comparison;
  // centroid sums are rounded to 6 THEN summed as DECIMAL so partial-agg
  // order can't move them. The identity also lets ‖v‖² be computed ONCE
  // per vector instead of re-folding per (vector, centroid) pair.

  private[graft] def kmVectors(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"), asD(col("embedding")).as("e"))

  /** Deterministic seeds: the k = 8 lowest vec_ids, components rounded
    * to the same 6-decimal grid updated centroids live on. */
  private[graft] def kmInit(v: DataFrame): DataFrame =
    v.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"),
        expr("transform(e, x -> round(x, 6))").as("c"))

  /** Assignment step: broadcast the k centroids (with their norms
    * precomputed), argmin over rounded-double distances, ties to the
    * lowest cid. Only (vec_id, cid) pairs ever shuffle. */
  private[graft] def kmAssign(v: DataFrame, cent: DataFrame): DataFrame =
    v.withColumn("vn2", dot(col("e"), col("e")))
      .crossJoin(broadcast(cent.withColumn("cn2", dot(col("c"), col("c")))))
      .select(col("vec_id"), col("cid"),
        round(col("vn2") + col("cn2") - lit(2.0) * dot(col("e"), col("c")), 6).as("d"))
      .groupBy("vec_id")
      .agg(min(struct(col("d"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"))

  /** Update step: per-(cid, dimension) decimal-exact means via a
    * partial-aggregating groupBy on the compact (cid, pos) key, then
    * reassembled into centroid arrays (sorted by pos — collect_list
    * order is not deterministic, the array_sort is load-bearing). */
  private[graft] def kmUpdate(v: DataFrame, a: DataFrame): DataFrame =
    kmUpdateE(v.join(a, "vec_id"))

  /** [[kmAssign]] that also CARRIES each vector through the argmin
    * aggregation, so the update step — and downstream consumers like
    * ivfpq's residual computation — need no re-join with the vector
    * relation: the (vec_id → e) pairing rides the same map-side partial
    * aggregation the argmin already pays, removing one corpus-sized
    * equi-join per consumer. Assignment values are identical to
    * kmAssign's (same rounded distances, same min(struct) tie-break);
    * `first(e)` is exact because every row of a vec_id group carries the
    * same vector. Pinned equal to the classic kernels by KmeansSpec. */
  private[graft] def kmAssignE(v: DataFrame, cent: DataFrame): DataFrame =
    v.withColumn("vn2", dot(col("e"), col("e")))
      .crossJoin(broadcast(cent.withColumn("cn2", dot(col("c"), col("c")))))
      .select(col("vec_id"), col("cid"), col("e"),
        round(col("vn2") + col("cn2") - lit(2.0) * dot(col("e"), col("c")), 6).as("d"))
      .groupBy("vec_id")
      .agg(min(struct(col("d"), col("cid"))).as("m"), first(col("e")).as("e"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("e"))

  /** [[kmUpdate]] over a relation already carrying (cid, e) — the
    * kmAssignE output — so no vector join is needed. */
  private[graft] def kmUpdateE(ae: DataFrame): DataFrame =
    ae.select(col("cid"), posexplode(col("e")))
      .groupBy("cid", "pos")
      .agg(round(sum(round(col("col"), 6).cast("decimal(18,6)")).cast("double")
        / count(lit(1)), 6).as("val"))
      .groupBy("cid")
      .agg(expr("transform(array_sort(collect_list(struct(pos, val))), p -> p.val)")
        .as("c"))

  /** Within-cluster sum of squared distances under (assignment, centroids)
    * — the Lloyd objective, for the spec's monotonicity law. */
  private[operators] def kmObjective(v: DataFrame, a: DataFrame, cent: DataFrame): Double =
    v.join(a, "vec_id").join(broadcast(cent), "cid")
      .select(round(dot(col("e"), col("e")) + dot(col("c"), col("c"))
        - lit(2.0) * dot(col("e"), col("c")), 6).as("d"))
      .agg(sum(col("d"))).collect()(0).getDouble(0)

  /** Oracle twin of the two-iteration lockstep Lloyd loop (kmInit →
    * kmAssign → kmUpdate ×2): CTEs `v`/`vn` … `a2`/`c2`, every distance
    * and centroid component rounded to the shared 6-decimal grid so both
    * engines enter each iteration with identical doubles. Shared by
    * `embedding_kmeans` (the verified relation) and
    * `topk_similarity_ivf2` (its index consumer). */
  private lazy val KmeansCtes: String =
    """v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |vn AS (SELECT vec_id, e,
      |              (SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x)) AS vn2
      |       FROM v),
      |c0 AS (SELECT CAST(vec_id AS INT) AS cid, LIST_TRANSFORM(e, x -> ROUND(x, 6)) AS c
      |       FROM v WHERE vec_id < 8),
      |n0 AS (SELECT cid, c,
      |              (SELECT SUM(x*x) FROM (SELECT UNNEST(c) AS x)) AS cn2
      |       FROM c0),
      |d1 AS (SELECT v.vec_id, k.cid,
      |              ROUND(v.vn2 + k.cn2
      |                    - 2 * (SELECT SUM(p) FROM (SELECT UNNEST(v.e) * UNNEST(k.c) AS p)),
      |                    6) AS d
      |       FROM vn v CROSS JOIN n0 k),
      |a1 AS (SELECT vec_id, cid FROM (
      |         SELECT vec_id, cid,
      |                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      |         FROM d1) WHERE rn = 1),
      |u1 AS (SELECT cid, pos,
      |              ROUND(CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(18,6))) AS DOUBLE)
      |                    / COUNT(*), 6) AS val
      |       FROM (SELECT a1.cid, UNNEST(v.e) AS x,
      |                    UNNEST(RANGE(1, LEN(v.e) + 1)) AS pos
      |             FROM a1 JOIN v USING (vec_id))
      |       GROUP BY cid, pos),
      |c1 AS (SELECT cid, LIST(val ORDER BY pos) AS c FROM u1 GROUP BY cid),
      |n1 AS (SELECT cid, c,
      |              (SELECT SUM(x*x) FROM (SELECT UNNEST(c) AS x)) AS cn2
      |       FROM c1),
      |d2 AS (SELECT v.vec_id, k.cid,
      |              ROUND(v.vn2 + k.cn2
      |                    - 2 * (SELECT SUM(p) FROM (SELECT UNNEST(v.e) * UNNEST(k.c) AS p)),
      |                    6) AS d
      |       FROM vn v CROSS JOIN n1 k),
      |a2 AS (SELECT vec_id, cid FROM (
      |         SELECT vec_id, cid,
      |                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      |         FROM d2) WHERE rn = 1),
      |u2 AS (SELECT cid, pos,
      |              ROUND(CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(18,6))) AS DOUBLE)
      |                    / COUNT(*), 6) AS val
      |       FROM (SELECT a2.cid, UNNEST(v.e) AS x,
      |                    UNNEST(RANGE(1, LEN(v.e) + 1)) AS pos
      |             FROM a2 JOIN v USING (vec_id))
      |       GROUP BY cid, pos),
      |c2 AS (SELECT cid, LIST(val ORDER BY pos) AS c FROM u2 GROUP BY cid)""".stripMargin

  /** Shared Spark-side top-k: queries = vec_id < 16, rank by rounded cosine. */
  private def topk(s: SparkSession, dir: String, sameLabelOnly: Boolean): DataFrame =
    topkOver(normed(s, dir), sameLabelOnly)

  private[operators] def topkOver(e: DataFrame, sameLabelOnly: Boolean): DataFrame = {
    val q = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("e").as("q_e"), col("nrm").as("q_nrm"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("label").as("c_label"),
      col("e").as("c_e"), col("nrm").as("c_nrm"))
    val joined =
      if (sameLabelOnly)
        q.join(c, col("q_label") === col("c_label") && col("query_id") =!= col("neighbor_id"))
      else
        // non-equi ⇒ nested-loop regardless; NO hint so the planner builds
        // on the bounded query side (16 rows), never the scaling corpus
        q.join(c, col("query_id") =!= col("neighbor_id"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    joined
      // `+ 0.0` mirrors the oracle's IEEE -0.0 → +0.0 normalization (a
      // cosine in (-5e-7, 0) rounds to negative zero under DuckDB's ROUND)
      .withColumn("sim", round(dot(col("q_e"), col("c_e")) / (col("q_nrm") * col("c_nrm")), 6) + lit(0.0))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("query_id", "neighbor_id", "sim")
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
  }

  def specs: Seq[QuerySpec] = Seq(

    // Brute-force cosine top-5: candidates broadcast, queries stay
    // partitioned — at scale this is the block-nested-loop baseline.
    QuerySpec(
      "topk_similarity",
      (s, dir) => topk(s, dir, sameLabelOnly = false),
      Some(CosineSql.format(""))),

    // The similarity ladder fed from an ARROW LANDING ZONE end-to-end:
    // the embeddings corpus re-encoded as genuine list<float32> Arrow
    // stream bytes (ReaderQueries.arrowEmbeddingsZone — the interchange
    // format a feature store actually emits), scanned by the Arrow
    // reader, then the IDENTICAL normalization + brute-force top-k
    // stage as topk_similarity. Hash-matching the parquet-sourced
    // oracle proves the Arrow path is a drop-in source for the whole
    // ladder — no float32 precision or row loss crossing the format.
    QuerySpec(
      "topk_similarity_arrow",
      (s, dir) => {
        val zone = ReaderQueries.arrowEmbeddingsZone(s, dir)
        topkOver(normedFrom(graft.sources.ArrowIpc.read(s, zone)),
          sameLabelOnly = false)
      },
      Some(CosineSql.format(""))),

    // Maximum-inner-product search via the norm-augmentation reduction
    // (Bachrach et al. 2014 / Shrivastava & Li 2014): recommendation
    // retrieval ranks by RAW inner product, which no metric index
    // serves directly — but appending one residual dimension
    // sqrt(M² − |x|²) to every corpus vector (M = max corpus norm) and
    // a 0 to every query makes all corpus vectors the SAME length M,
    // and cosine ranking over the augmented space EXACTLY equals
    // inner-product ranking over the original. That reduction is the
    // point: the whole cosine ANN ladder above (IVF/LSH/SQ/PQ/binary)
    // becomes a MIPS index with one extra column. The augmentation is
    // exact here, not approximate — the extra query coordinate is 0,
    // so the augmented dot product is bit-identical to the raw one —
    // which is why the DuckDB oracle (direct inner products, the
    // closed-form of the same ranking) hash-matches. Declared
    // quadratic: the same bounded-16-row-query brute baseline shape as
    // topk_similarity, plus a 1-row max-norm broadcast (M is a corpus
    // CONSTANT — one mergeable aggregate, broadcast everywhere,
    // independent of corpus size).
    QuerySpec(
      "topk_similarity_mips",
      (s, dir) => {
        val e = emb(s, dir).select(col("vec_id"), asD(col("embedding")).as("e"))
          .withColumn("n2", dot(col("e"), col("e")))
        val m = e.agg(max(col("n2")).as("m2"))
        val cAug = e.crossJoin(broadcast(m))
          .select(col("vec_id").as("neighbor_id"), col("m2"),
            // greatest(...,0): m2 - n2 of the max vector is an exact 0,
            // but guard the subtraction against any future fp drift
            concat(col("e"), array(sqrt(greatest(col("m2") - col("n2"), lit(0.0)))))
              .as("c_aug"))
        val q = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("query_id"),
            concat(col("e"), array(lit(0.0))).as("q_aug"),
            sqrt(col("n2")).as("q_nrm"))
        val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
        q.join(cAug, col("query_id") =!= col("neighbor_id"))
          .withColumn("sim",
            round(dot(col("q_aug"), col("c_aug")) / (col("q_nrm") * sqrt(col("m2"))), 6)
              + lit(0.0))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("query_id", "neighbor_id", "sim")
          .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              n AS (SELECT vec_id, e,
                           (SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x)) AS n2
                    FROM v),
              m AS (SELECT MAX(n2) AS m2 FROM n),
              q AS (SELECT vec_id, e, SQRT(n2) AS qn FROM n WHERE vec_id < 16),
              pairs AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROUND((SELECT SUM(p) FROM (SELECT UNNEST(q.e) * UNNEST(c.e) AS p))
                             / (q.qn * SQRT(m.m2)), 6) + 0.0 AS sim
                FROM q JOIN n c ON q.vec_id != c.vec_id CROSS JOIN m)
              SELECT query_id, neighbor_id, sim FROM (
                SELECT query_id, neighbor_id, sim,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS rn
                FROM pairs) WHERE rn <= 5
              ORDER BY query_id, sim DESC, neighbor_id""")),

    // IVF-style ANN: search only the query's cluster (label = assigned
    // centroid id). At 100 TB: partition embeddings by cluster id, prune
    // to the probed partitions — shuffle-free when pre-partitioned.
    QuerySpec(
      "topk_similarity_ivf",
      (s, dir) => topk(s, dir, sameLabelOnly = true),
      Some(CosineSql.format("AND q.label = c.label"))),

    // RECALL@5 AUDIT of the IVF single-probe search against the exact
    // brute-force ranking — the ANN twin of dedup_recall_audit, and the
    // number an embedding pipeline tracks before narrowing nprobe at
    // 100 TB (IVF with one probed cluster trades exactly this recall for
    // its cluster-pruned scan). Per-query overlap of the two top-5 sets;
    // both rankings share the deterministic (sim DESC, neighbor_id)
    // tie-break and 6-decimal rounding, so the composition is as
    // hash-stable as its parts. Cost = the two already-declared plans
    // plus a 16×5-row join.
    QuerySpec(
      "topk_similarity_recall",
      (s, dir) => {
        val exact = topk(s, dir, sameLabelOnly = false)
          .select(col("query_id"), col("neighbor_id"))
        val approx = topk(s, dir, sameLabelOnly = true)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(count(col("hit")).as("hits"))
          .select(col("query_id"), col("hits"),
            round(col("hits").cast("double") / 5.0, 6).as("recall"))
          .orderBy("query_id")
      },
      Some("""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |n AS (SELECT vec_id, label, e,
             |             SQRT((SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x))) AS nrm
             |      FROM v),
             |q AS (SELECT * FROM n WHERE vec_id < 16),
             |pairs AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |         q.label = c.label AS same,
             |         ROUND((SELECT SUM(p) FROM (SELECT UNNEST(q.e) * UNNEST(c.e) AS p))
             |               / (q.nrm * c.nrm), 6) + 0.0 AS sim
             |  FROM q JOIN n c ON q.vec_id != c.vec_id),
             |ex AS (SELECT query_id, neighbor_id FROM (
             |         SELECT query_id, neighbor_id,
             |                ROW_NUMBER() OVER (PARTITION BY query_id
             |                                   ORDER BY sim DESC, neighbor_id) AS rn
             |         FROM pairs) WHERE rn <= 5),
             |ap AS (SELECT query_id, neighbor_id FROM (
             |         SELECT query_id, neighbor_id,
             |                ROW_NUMBER() OVER (PARTITION BY query_id
             |                                   ORDER BY sim DESC, neighbor_id) AS rn
             |         FROM pairs WHERE same) WHERE rn <= 5)
             |SELECT e.query_id, COUNT(a.neighbor_id) AS hits,
             |       ROUND(CAST(COUNT(a.neighbor_id) AS DOUBLE) / 5, 6) AS recall
             |FROM ex e LEFT JOIN ap a
             |  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
             |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin)),

    // TRUE IVF, multi-probe: the production answer to the recall gap the
    // audit above measures. The coarse quantizer is the lockstep
    // two-iteration Lloyd kmeans (embedding_kmeans's exact centroid
    // relation — 8 TRAINED cells instead of the label proxy); each query
    // probes its nprobe=2 nearest centroids and exact cosine reranks the
    // union of those cells. At 100 TB: embeddings PRE-PARTITIONED by
    // cid, probes prune to 2/8 of the corpus per query with zero scan of
    // the rest, and the 8-row centroid table broadcasts — the standard
    // IVF serving shape. Oracle extends the shared KmeansCtes with the
    // same probe/rerank, every distance on the 6-decimal lockstep grid.
    QuerySpec(
      "topk_similarity_ivf2",
      (s, dir) => {
        val v = kmVectors(s, dir)
        val c0 = kmInit(v)
        // fused kernels: the assignment carries e, so neither update
        // re-joins the vector relation (KmProbe: 20-40% off the closure,
        // residuals bit-identical)
        val a1 = kmAssignE(v, c0); val c1 = kmUpdateE(a1).localCheckpoint()
        val a2 = kmAssignE(v, c1).localCheckpoint(); val c2 = kmUpdateE(a2).localCheckpoint()
        val wp = Window.partitionBy("query_id").orderBy(col("d"), col("cid"))
        val probes = v.filter(col("vec_id") < 16)
          .withColumn("vn2", dot(col("e"), col("e")))
          .crossJoin(broadcast(c2.withColumn("cn2", dot(col("c"), col("c")))))
          .select(col("vec_id").as("query_id"), col("cid"),
            round(col("vn2") + col("cn2") - lit(2.0) * dot(col("e"), col("c")), 6).as("d"))
          .withColumn("rn", row_number().over(wp))
          .filter(col("rn") <= 2)
          .select("query_id", "cid")
        val n = v.withColumn("nrm", sqrt(dot(col("e"), col("e"))))
        val cand = broadcast(probes).join(a2, "cid")
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"))
        val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
        cand
          .join(n.as("q"), col("q.vec_id") === col("query_id"))
          .join(n.as("c"), col("c.vec_id") === col("neighbor_id"))
          .withColumn("sim",
            round(dot(col("q.e"), col("c.e")) / (col("q.nrm") * col("c.nrm")), 6) + lit(0.0))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("query_id", "neighbor_id", "sim")
          .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
      },
      Some(s"""WITH $KmeansCtes,
              |n2c AS (SELECT cid, c,
              |               (SELECT SUM(x*x) FROM (SELECT UNNEST(c) AS x)) AS cn2
              |        FROM c2),
              |qd AS (SELECT v.vec_id AS query_id, k.cid,
              |              ROUND(v.vn2 + k.cn2
              |                    - 2 * (SELECT SUM(p) FROM (SELECT UNNEST(v.e) * UNNEST(k.c) AS p)),
              |                    6) AS d
              |       FROM vn v CROSS JOIN n2c k WHERE v.vec_id < 16),
              |probes AS (SELECT query_id, cid FROM (
              |             SELECT query_id, cid,
              |                    ROW_NUMBER() OVER (PARTITION BY query_id
              |                                       ORDER BY d, cid) AS rn
              |             FROM qd) WHERE rn <= 2),
              |nn AS (SELECT vec_id, e, SQRT(vn2) AS nrm FROM vn),
              |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
              |         FROM probes p JOIN a2 a ON a.cid = p.cid
              |         WHERE a.vec_id != p.query_id),
              |rnk AS (SELECT c.query_id, c.neighbor_id,
              |               ROUND((SELECT SUM(p) FROM (SELECT UNNEST(q.e) * UNNEST(n.e) AS p))
              |                     / (q.nrm * n.nrm), 6) + 0.0 AS sim
              |        FROM cand c JOIN nn q ON q.vec_id = c.query_id
              |                    JOIN nn n ON n.vec_id = c.neighbor_id)
              |SELECT query_id, neighbor_id, sim FROM (
              |  SELECT query_id, neighbor_id, sim,
              |         ROW_NUMBER() OVER (PARTITION BY query_id
              |                            ORDER BY sim DESC, neighbor_id) AS rn
              |  FROM rnk) WHERE rn <= 5
              |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin)),

    // LSH-bucketed ANN (SURVEY.md §2.12 scale path): 128 signed-random-
    // projection bits → 16 band keys of 8 bits; candidate neighbors share
    // ≥1 band; exact cosine reranks the survivors. At 100 TB the band
    // self-join shuffles only (vec_id, 8-char key) rows — candidate
    // volume is Σ|bucket|² over 256 buckets/band, tunable via bands×bits
    // — while the quadratic cross product never materializes. Matches
    // the DuckDB oracle exactly because the sign bits are integer
    // arithmetic (see constants above).
    QuerySpec(
      "topk_similarity_lsh",
      (s, dir) => {
        // quantized coords and ±1000 coefs are integers — exactly
        // representable in double — so the native codegen'd DotProduct
        // computes each projection with integer-exact signs (see
        // lshBands for the HOF-materialization barrier).
        val bands = lshBands(s, dir)
        val cand = bands.as("a").join(bands.as("b"),
            col("a.b") === col("b.b") && col("a.key") === col("b.key") &&
              col("a.vec_id") =!= col("b.vec_id") && col("a.vec_id") < 16)
          .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"))
          .distinct()
        val n = emb(s, dir)
          .select(col("vec_id"), asD(col("embedding")).as("e"))
          .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
        val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
        // no broadcast hint on the vector fetches: the SMALL side here is
        // the candidate list, not the corpus — at 100 TB these are shuffle
        // equi-joins on vec_id (AQE broadcasts cand when it fits)
        cand
          .join(n.as("q"), col("q.vec_id") === col("query_id"))
          .join(n.as("c"), col("c.vec_id") === col("neighbor_id"))
          .withColumn("sim",
            round(dot(col("q.e"), col("c.e")) / (col("q.nrm") * col("c.nrm")), 6) + lit(0.0))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("query_id", "neighbor_id", "sim")
          .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
      },
      Some("""WITH v AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              qv AS (
                SELECT vec_id, LIST_TRANSFORM(e, x -> CAST(ROUND(x * 1000) AS BIGINT)) AS qe FROM v),
              hp AS (
                SELECT j, i,
                       ('0x'||SUBSTR(MD5(j::VARCHAR||'_'||i::VARCHAR),1,8))::BIGINT % 2001 - 1000 AS coef
                FROM (SELECT UNNEST(GENERATE_SERIES(0, 127)) AS j),
                     (SELECT UNNEST(GENERATE_SERIES(0, 63)) AS i)),
              bits AS (
                SELECT vec_id, j,
                       CASE WHEN SUM(qe[i+1] * coef) >= 0 THEN 1 ELSE 0 END AS bit
                FROM qv, hp GROUP BY vec_id, j),
              bands AS (
                SELECT vec_id, j // 8 AS b, STRING_AGG(bit::VARCHAR, '' ORDER BY j) AS key
                FROM bits GROUP BY vec_id, j // 8),
              n AS (
                SELECT vec_id, e,
                       SQRT((SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x))) AS nrm
                FROM v),
              cand AS (
                SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
                FROM bands a JOIN bands b
                  ON a.b = b.b AND a.key = b.key AND a.vec_id != b.vec_id
                WHERE a.vec_id < 16),
              pairs AS (
                SELECT query_id, neighbor_id,
                       ROUND((SELECT SUM(p) FROM (SELECT UNNEST(q.e) * UNNEST(c.e) AS p))
                             / (q.nrm * c.nrm), 6) + 0.0 AS sim
                FROM cand JOIN n q ON q.vec_id = query_id
                          JOIN n c ON c.vec_id = neighbor_id)
              SELECT query_id, neighbor_id, sim FROM (
                SELECT query_id, neighbor_id, sim,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS rn
                FROM pairs) WHERE rn <= 5
              ORDER BY query_id, sim DESC, neighbor_id""")),

    QuerySpec(
      "topk_similarity_matryoshka",
      (s, dir) => {
        // Matryoshka / MRL retrieval (Kusupati et al. 2022): models
        // trained with matryoshka losses pack a usable coarse embedding
        // into every PREFIX of the vector, so a dimension PREFIX ranks
        // candidates at proportionally less compute/bandwidth and the
        // full vector exact-reranks the survivors. The quantization
        // ladder's missing rung: SQ/PQ/binary coarsen VALUES, this
        // truncates DIMENSIONS — same two-stage plan shape, same
        // bounded-16-row declared baseline join, same recall contract
        // (SimilarityMatryoshkaSpec floor). Knobs pinned at 32-of-64
        // dims with 50-candidate oversampling: the corpus embeddings
        // are NOT matryoshka-trained (prefix dims carry no special
        // mass — the technique's worst case), so the demo buys 2× and
        // oversamples; an MRL-trained model runs 8-of-768 with tight
        // candidate sets.
        val full = normed(s, dir).select(col("vec_id"), col("e"), col("nrm"))
        val head = full.select(col("vec_id"), slice(col("e"), 1, 32).as("he"))
          .withColumn("hn", sqrt(dot(col("he"), col("he"))))
        val q = head.filter(col("vec_id") < 16)
          .select(col("vec_id").as("query_id"), col("he").as("q_he"), col("hn").as("q_hn"))
        val wq = Window.partitionBy("query_id").orderBy(col("hsim").desc, col("neighbor_id"))
        val cand = q.join(head, col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            round(dot(col("q_he"), col("he")) / (col("q_hn") * col("hn")), 6).as("hsim"))
          .withColumn("rn", row_number().over(wq))
          .filter(col("rn") <= 50)
          .select(col("query_id"), col("neighbor_id"))
        val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
        cand
          .join(full.as("q2"), col("q2.vec_id") === col("query_id"))
          .join(full.as("c2"), col("c2.vec_id") === col("neighbor_id"))
          .withColumn("sim",
            round(dot(col("q2.e"), col("c2.e")) / (col("q2.nrm") * col("c2.nrm")), 6) + lit(0.0))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("query_id", "neighbor_id", "sim")
          .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
      },
      Some(s"""WITH v AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              h AS (
                SELECT vec_id, e[1:32] AS he,
                       SQRT((SELECT SUM(x*x) FROM (SELECT UNNEST(e[1:32]) AS x))) AS hn
                FROM v),
              scores AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROUND((SELECT SUM(p) FROM (SELECT UNNEST(q.he) * UNNEST(c.he) AS p))
                             / (q.hn * c.hn), 6) AS hsim
                FROM h q JOIN h c ON q.vec_id != c.vec_id
                WHERE q.vec_id < 16),
              cand AS (
                SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY hsim DESC, neighbor_id) AS rn
                  FROM scores) WHERE rn <= 50),
              n AS (
                SELECT vec_id, e,
                       SQRT((SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x))) AS nrm
                FROM v),
              rer AS (
                SELECT cand.query_id, cand.neighbor_id,
                       ROUND((SELECT SUM(p) FROM (SELECT UNNEST(q2.e) * UNNEST(c2.e) AS p))
                             / (q2.nrm * c2.nrm), 6) + 0.0 AS sim
                FROM cand JOIN n q2 ON q2.vec_id = cand.query_id
                          JOIN n c2 ON c2.vec_id = cand.neighbor_id)
              SELECT query_id, neighbor_id, sim FROM (
                SELECT query_id, neighbor_id, sim,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS rn
                FROM rer) WHERE rn <= 5
              ORDER BY query_id, sim DESC, neighbor_id""")),

    // Scalar-quantized (SQ8-style) ANN: rank ALL candidates by an
    // approximate cosine computed from integer-quantized codes
    // (q = round(x*1000), the proven LshBandKeys bridge — every product
    // and sum is integer-exact in double on both engines), keep the top
    // 20 per query, then rerank survivors with the exact float cosine.
    // At 100 TB this is the memory-bandwidth play of a vector store's
    // SQ8 index: the first-pass scan reads 4×-smaller codes (int8 vs
    // float32) and only the ~20 survivors ever touch full-precision
    // vectors — the fetch is an equi-join on vec_id, so the wide rows
    // never cross the shuffle for non-candidates. Quantized cosines are
    // rounded to 6 decimals before ranking (ties broken on neighbor_id)
    // so the candidate set is bit-deterministic on both engines.
    QuerySpec(
      "topk_similarity_sq",
      (s, dir) => {
        val qcodes = emb(s, dir)
          .select(col("vec_id"), expr(
            "transform(embedding, x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT) AS DOUBLE))")
            .as("qv"))
          .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
        val q = qcodes.filter(col("vec_id") < 16)
          .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("qn").as("q_qn"))
        val wq = Window.partitionBy("query_id").orderBy(col("qsim").desc, col("neighbor_id"))
        // bounded query side (16 rows) — the planner broadcasts it and
        // streams the corpus, same declared shape as the brute-force
        // baseline but over 4×-narrower quantized codes
        val cand = q.join(qcodes, col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            round(dot(col("q_qv"), col("qv")) / (col("q_qn") * col("qn")), 6).as("qsim"))
          .withColumn("rn", row_number().over(wq))
          .filter(col("rn") <= 20)
          .select(col("query_id"), col("neighbor_id"))
        val n = normed(s, dir).select(col("vec_id"), col("e"), col("nrm"))
        val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
        cand
          .join(n.as("q2"), col("q2.vec_id") === col("query_id"))
          .join(n.as("c2"), col("c2.vec_id") === col("neighbor_id"))
          .withColumn("sim",
            round(dot(col("q2.e"), col("c2.e")) / (col("q2.nrm") * col("c2.nrm")), 6) + lit(0.0))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("query_id", "neighbor_id", "sim")
          .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
      },
      Some(s"""WITH v AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              qc AS (
                SELECT vec_id,
                       LIST_TRANSFORM(e, x -> CAST(CAST(ROUND(x * 1000) AS BIGINT) AS DOUBLE)) AS qv
                FROM v),
              qn AS (
                SELECT vec_id, qv,
                       SQRT((SELECT SUM(x*x) FROM (SELECT UNNEST(qv) AS x))) AS qn
                FROM qc),
              scores AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROUND((SELECT SUM(p) FROM (SELECT UNNEST(q.qv) * UNNEST(c.qv) AS p))
                             / (q.qn * c.qn), 6) AS qsim
                FROM qn q JOIN qn c ON q.vec_id != c.vec_id
                WHERE q.vec_id < 16),
              cand AS (
                SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY qsim DESC, neighbor_id) AS rn
                  FROM scores) WHERE rn <= 20),
              n AS (
                SELECT vec_id, e,
                       SQRT((SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x))) AS nrm
                FROM v),
              pairs AS (
                SELECT query_id, neighbor_id,
                       ROUND((SELECT SUM(p) FROM (SELECT UNNEST(q.e) * UNNEST(c.e) AS p))
                             / (q.nrm * c.nrm), 6) + 0.0 AS sim
                FROM cand JOIN n q ON q.vec_id = query_id
                          JOIN n c ON c.vec_id = neighbor_id)
              SELECT query_id, neighbor_id, sim FROM (
                SELECT query_id, neighbor_id, sim,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS rn
                FROM pairs) WHERE rn <= 5
              ORDER BY query_id, sim DESC, neighbor_id""")),

    // Product-quantized (PQ/ADC-style) ANN — the fourth index family next
    // to IVF / LSH / SQ8: vectors split into M=4 subspaces of 16 dims;
    // each subvector is coded as the id of its nearest codebook entry, so
    // a vector stores as M small codes (here 4×4 bits of information —
    // 16× smaller than the SQ8 codes, 64× smaller than float32); queries
    // score candidates by ASYMMETRIC DISTANCE COMPUTATION — a broadcast
    // (query × subspace × centroid) lookup table of exact query-to-
    // codebook distances, so scoring a neighbor is M table lookups + a
    // sum, never a d-dim float walk. Top-20 ADC survivors rerank with the
    // exact float cosine (the SQ8 pattern). Codebooks here are sampled
    // deterministically (the M subvectors of vec_id < 16 — production
    // trains them with embedding_kmeans' Lloyd loop, same machinery);
    // everything runs on the integer grid q = round(x*1000) with integer
    // squared distances, so both engines agree bit-for-bit with no
    // tolerance. At 100 TB: the code relation (n×M compact rows) joins a
    // constant 1024-row broadcast table and partial-aggregates per
    // (query, neighbor) — linear in n with a constant factor, and the
    // full-precision vectors are touched only by the ≤20 survivors'
    // equi-join fetch.
    QuerySpec(
      "topk_similarity_pq",
      (s, dir) => {
        val M = 4; val Sub = 16; val Kc = 16
        val sqd = "aggregate(zip_with(%s, %s, (x, y) -> (x - y) * (x - y)), " +
          "CAST(0 AS BIGINT), (acc, t) -> acc + t)"
        val subs = emb(s, dir)
          .select(col("vec_id"), expr(
            "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))").as("qv"))
          .select(col("vec_id"), posexplode(expr(
            s"transform(sequence(0, ${M - 1}), s -> slice(qv, s * $Sub + 1, $Sub))")))
          .select(col("vec_id"), col("pos").as("s"), col("col").as("sub"))
        val cb = subs.filter(col("vec_id") < Kc)
          .select(col("vec_id").cast("int").as("cid"), col("s"), col("sub").as("csub"))
        // nearest codebook entry per (vector, subspace) — integer-exact
        // distances, ties to the lowest cid
        val wc = Window.partitionBy("vec_id", "s").orderBy(col("d"), col("cid"))
        val codes = subs.join(broadcast(cb), "s")
          .withColumn("d", expr(sqd.format("sub", "csub")))
          .withColumn("rn", row_number().over(wc)).filter(col("rn") === 1)
          .select(col("vec_id"), col("s"), col("cid").as("code"))
        // ADC lookup table: 16 queries × 4 subspaces × 16 centroids
        val dt = subs.filter(col("vec_id") < 16)
          .select(col("vec_id").as("query_id"), col("s").as("qs"), col("sub").as("qsub"))
          .join(broadcast(cb), col("s") === col("qs"))
          .withColumn("qd", expr(sqd.format("qsub", "csub")))
          .select(col("query_id"), col("qs"), col("cid"), col("qd"))
        val approx = codes
          .join(broadcast(dt), col("qs") === col("s") && col("cid") === col("code")
            && col("query_id") =!= col("vec_id"))
          .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
          .agg(sum(col("qd")).as("ad"))
        val wq = Window.partitionBy("query_id").orderBy(col("ad"), col("neighbor_id"))
        val cand = approx
          .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 20)
          .select(col("query_id"), col("neighbor_id"))
        val n = normed(s, dir).select(col("vec_id"), col("e"), col("nrm"))
        val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
        cand
          .join(n.as("q2"), col("q2.vec_id") === col("query_id"))
          .join(n.as("c2"), col("c2.vec_id") === col("neighbor_id"))
          .withColumn("sim",
            round(dot(col("q2.e"), col("c2.e")) / (col("q2.nrm") * col("c2.nrm")), 6) + lit(0.0))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("query_id", "neighbor_id", "sim")
          .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
      },
      Some("""WITH v AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              qg AS (
                SELECT vec_id,
                       LIST_TRANSFORM(e, x -> CAST(ROUND(x * 1000) AS BIGINT)) AS qv
                FROM v),
              subs AS (
                SELECT vec_id, s, qv[(s*16+1):(s*16+16)] AS sub
                FROM qg, (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS s)),
              cb AS (SELECT CAST(vec_id AS INT) AS cid, s, sub AS csub
                     FROM subs WHERE vec_id < 16),
              dists AS (
                SELECT t.vec_id, t.s, c.cid,
                       (SELECT SUM((a-b)*(a-b))
                        FROM (SELECT UNNEST(t.sub) AS a, UNNEST(c.csub) AS b)) AS d
                FROM subs t JOIN cb c ON c.s = t.s),
              codes AS (
                SELECT vec_id, s, cid AS code FROM (
                  SELECT vec_id, s, cid,
                         ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, cid) AS rn
                  FROM dists) WHERE rn = 1),
              dt AS (SELECT vec_id AS query_id, s, cid, d FROM dists WHERE vec_id < 16),
              approx AS (
                SELECT dt.query_id, codes.vec_id AS neighbor_id, SUM(dt.d) AS ad
                FROM codes JOIN dt ON dt.s = codes.s AND dt.cid = codes.code
                WHERE codes.vec_id != dt.query_id
                GROUP BY dt.query_id, codes.vec_id),
              cand AS (
                SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY ad, neighbor_id) AS rn
                  FROM approx) WHERE rn <= 20),
              n AS (
                SELECT vec_id, e,
                       SQRT((SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x))) AS nrm
                FROM v),
              pairs AS (
                SELECT query_id, neighbor_id,
                       ROUND((SELECT SUM(p) FROM (SELECT UNNEST(q.e) * UNNEST(c.e) AS p))
                             / (q.nrm * c.nrm), 6) + 0.0 AS sim
                FROM cand JOIN n q ON q.vec_id = query_id
                          JOIN n c ON c.vec_id = neighbor_id)
              SELECT query_id, neighbor_id, sim FROM (
                SELECT query_id, neighbor_id, sim,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS rn
                FROM pairs) WHERE rn <= 5
              ORDER BY query_id, sim DESC, neighbor_id""")),

    // IVF-PQ (Jégou, Douze & Schmid 2011, "Product Quantization for
    // Nearest Neighbor Search" §IV) — the composition FAISS ships as its
    // production index, assembled here from the two rungs already
    // verified separately: the coarse quantizer is the lockstep
    // two-iteration Lloyd kmeans (embedding_kmeans / ivf2's exact cell
    // relation), and PQ codes the RESIDUAL e − c(cell) rather than the
    // raw vector (the paper's key move — residuals concentrate near 0,
    // so the same codebook budget buys far less distortion). Queries
    // probe their nprobe=2 nearest cells; each probe gets its OWN ADC
    // table built from the query's residual against THAT cell (§IV-A:
    // the residual depends on the probed cell); candidates score as M
    // table lookups + a sum, and the top-20 rerank with exact float
    // cosine (the ladder's uniform pattern). Residuals live on the
    // integer grid round((e−c)·1000) — both engines reach c over the
    // shared 6-decimal lockstep, so subtraction, rounding, and every
    // squared distance are bit-exact with no tolerance. At 100 TB:
    // corpus-sized work is one cid-keyed equi-join (residuals), the
    // n×M code relation, and a code-table join against a broadcast
    // (query × probe × subspace × centroid) ADC table; probes prune to
    // 2/8 of the corpus BEFORE any scoring, and full-precision vectors
    // are fetched only for the ≤20 survivors — the exact serving shape
    // of a billion-vector FAISS deployment. Codebooks sample residual
    // subvectors deterministically (vec_id < 16 — production trains
    // them with the same Lloyd machinery, topk_similarity_pq's
    // documented stance).
    QuerySpec(
      "topk_similarity_ivfpq",
      (s, dir) => {
        val M = 4; val Sub = 16
        val sqd = "aggregate(zip_with(%s, %s, (x, y) -> (x - y) * (x - y)), " +
          "CAST(0 AS BIGINT), (acc, t) -> acc + t)"
        val v = kmVectors(s, dir)
        val c0 = kmInit(v)
        // c1's checkpoint stays although its subtree is consumed once:
        // kmAssign's broadcast-build references the centroid relation
        // from inside the assignment plan, and measured quiet runs are
        // ~1.8× SLOWER without the barrier (3.8 s vs 2.2 s at sf0.1) —
        // the removal was tried in round 9 and reverted on measurement
        // fused kernels: the assignment carries e (KmProbe: 20-40% off
        // the closure, residuals bit-identical) — kmUpdateE and the
        // residual step below need no re-join with the vector relation
        val a1 = kmAssignE(v, c0); val c1 = kmUpdateE(a1).localCheckpoint()
        val a2 = kmAssignE(v, c1).localCheckpoint(); val c2 = kmUpdateE(a2).localCheckpoint()
        // residuals on the integer grid straight off the checkpointed
        // assignment (which already pairs each vec_id with its vector):
        // just the 8-row centroid broadcast, no corpus-sized join left
        val res = a2.join(broadcast(c2), "cid")
          .select(col("vec_id"), col("cid"), expr(
            "zip_with(e, c, (x, y) -> CAST(round((x - y) * 1000, 0) AS BIGINT))").as("rq"))
        val subs = res
          .select(col("vec_id"), col("cid"), posexplode(expr(
            s"transform(sequence(0, ${M - 1}), s -> slice(rq, s * $Sub + 1, $Sub))")))
          .select(col("vec_id"), col("pos").as("s"), col("col").as("sub"))
          .localCheckpoint() // codebook + code assignment both consume it
        val cb = subs.filter(col("vec_id") < 16)
          .select(col("vec_id").cast("int").as("pcid"), col("s"), col("sub").as("csub"))
        val wc = Window.partitionBy("vec_id", "s").orderBy(col("d"), col("pcid"))
        val codes = subs.join(broadcast(cb), "s")
          .withColumn("d", expr(sqd.format("sub", "csub")))
          .withColumn("rn", row_number().over(wc)).filter(col("rn") === 1)
          .select(col("vec_id"), col("s"), col("pcid").as("code"))
        // nprobe=2 coarse probes (ivf2's exact probe relation)
        val wp = Window.partitionBy("query_id").orderBy(col("d"), col("cid"))
        val probes = v.filter(col("vec_id") < 16)
          .withColumn("vn2", dot(col("e"), col("e")))
          .crossJoin(broadcast(c2.withColumn("cn2", dot(col("c"), col("c")))))
          .select(col("vec_id").as("query_id"), col("cid"),
            round(col("vn2") + col("cn2") - lit(2.0) * dot(col("e"), col("c")), 6).as("d"))
          .withColumn("rn", row_number().over(wp))
          .filter(col("rn") <= 2)
          .select("query_id", "cid")
        // per-probe ADC tables from the query's residual vs THAT cell
        val qsubs = probes
          .join(v.select(col("vec_id").as("query_id"), col("e")), "query_id")
          .join(broadcast(c2), "cid")
          .select(col("query_id"), col("cid"), posexplode(expr(
            s"""transform(sequence(0, ${M - 1}), s -> slice(
               |zip_with(e, c, (x, y) -> CAST(round((x - y) * 1000, 0) AS BIGINT)),
               |s * $Sub + 1, $Sub))""".stripMargin)))
          .select(col("query_id"), col("cid"), col("pos").as("qs"), col("col").as("qsub"))
        val dt = qsubs.join(broadcast(cb), col("s") === col("qs"))
          .withColumn("qd", expr(sqd.format("qsub", "csub")))
          .select(col("query_id"), col("cid"), col("qs"), col("pcid"), col("qd"))
        // candidates = vectors of the probed cells; score = M lookups
        val cand0 = broadcast(probes).join(a2, "cid")
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("cid"), col("vec_id").as("neighbor_id"))
        val approx = cand0
          .join(codes, col("neighbor_id") === codes("vec_id"))
          .join(broadcast(dt),
            dt("query_id") === cand0("query_id") && dt("cid") === cand0("cid") &&
              col("qs") === col("s") && col("pcid") === col("code"))
          .groupBy(cand0("query_id").as("query_id"), col("neighbor_id"))
          .agg(sum(col("qd")).as("ad"))
        val wq = Window.partitionBy("query_id").orderBy(col("ad"), col("neighbor_id"))
        val cand = approx
          .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 20)
          .select(col("query_id"), col("neighbor_id"))
        val n = v.withColumn("nrm", sqrt(dot(col("e"), col("e"))))
        val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
        cand
          .join(n.as("q2"), col("q2.vec_id") === col("query_id"))
          .join(n.as("c2x"), col("c2x.vec_id") === col("neighbor_id"))
          .withColumn("sim",
            round(dot(col("q2.e"), col("c2x.e")) / (col("q2.nrm") * col("c2x.nrm")), 6) + lit(0.0))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("query_id", "neighbor_id", "sim")
          .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
      },
      Some(s"""WITH $KmeansCtes,
              |resx AS (SELECT a2.vec_id, a2.cid, UNNEST(v.e) AS x, UNNEST(c2.c) AS y,
              |                UNNEST(RANGE(1, LEN(v.e) + 1)) AS pos
              |         FROM a2 JOIN v USING (vec_id) JOIN c2 USING (cid)),
              |res AS (SELECT vec_id, cid,
              |               LIST(CAST(ROUND((x - y) * 1000) AS BIGINT) ORDER BY pos) AS rq
              |        FROM resx GROUP BY vec_id, cid),
              |subs AS (SELECT vec_id, s, rq[(s*16+1):(s*16+16)] AS sub
              |         FROM res, (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS s)),
              |cb AS (SELECT CAST(vec_id AS INT) AS pcid, s, sub AS csub
              |       FROM subs WHERE vec_id < 16),
              |pd AS (SELECT t.vec_id, t.s, c.pcid,
              |              (SELECT SUM((a-b)*(a-b))
              |               FROM (SELECT UNNEST(t.sub) AS a, UNNEST(c.csub) AS b)) AS d
              |       FROM subs t JOIN cb c ON c.s = t.s),
              |codes AS (SELECT vec_id, s, pcid AS code FROM (
              |            SELECT vec_id, s, pcid,
              |                   ROW_NUMBER() OVER (PARTITION BY vec_id, s
              |                                      ORDER BY d, pcid) AS rn
              |            FROM pd) WHERE rn = 1),
              |n2c AS (SELECT cid, c,
              |               (SELECT SUM(x*x) FROM (SELECT UNNEST(c) AS x)) AS cn2
              |        FROM c2),
              |qdst AS (SELECT v.vec_id AS query_id, k.cid,
              |                ROUND(v.vn2 + k.cn2
              |                      - 2 * (SELECT SUM(p) FROM (SELECT UNNEST(v.e) * UNNEST(k.c) AS p)),
              |                      6) AS d
              |         FROM vn v CROSS JOIN n2c k WHERE v.vec_id < 16),
              |probes AS (SELECT query_id, cid FROM (
              |             SELECT query_id, cid,
              |                    ROW_NUMBER() OVER (PARTITION BY query_id
              |                                       ORDER BY d, cid) AS rn
              |             FROM qdst) WHERE rn <= 2),
              |qresx AS (SELECT p.query_id, p.cid, UNNEST(v.e) AS x, UNNEST(c2.c) AS y,
              |                 UNNEST(RANGE(1, LEN(v.e) + 1)) AS pos
              |          FROM probes p JOIN v ON v.vec_id = p.query_id
              |                        JOIN c2 ON c2.cid = p.cid),
              |qres AS (SELECT query_id, cid,
              |                LIST(CAST(ROUND((x - y) * 1000) AS BIGINT) ORDER BY pos) AS rq
              |         FROM qresx GROUP BY query_id, cid),
              |qsubs AS (SELECT query_id, cid, s, rq[(s*16+1):(s*16+16)] AS qsub
              |          FROM qres, (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS s)),
              |dt AS (SELECT q.query_id, q.cid, q.s, c.pcid,
              |              (SELECT SUM((a-b)*(a-b))
              |               FROM (SELECT UNNEST(q.qsub) AS a, UNNEST(c.csub) AS b)) AS qd
              |       FROM qsubs q JOIN cb c ON c.s = q.s),
              |cand0 AS (SELECT p.query_id, p.cid, a.vec_id AS neighbor_id
              |          FROM probes p JOIN a2 a ON a.cid = p.cid
              |          WHERE a.vec_id != p.query_id),
              |approx AS (SELECT c0.query_id, c0.neighbor_id, SUM(dt.qd) AS ad
              |           FROM cand0 c0
              |           JOIN codes k ON k.vec_id = c0.neighbor_id
              |           JOIN dt ON dt.query_id = c0.query_id AND dt.cid = c0.cid
              |                  AND dt.s = k.s AND dt.pcid = k.code
              |           GROUP BY c0.query_id, c0.neighbor_id),
              |cand AS (SELECT query_id, neighbor_id FROM (
              |           SELECT query_id, neighbor_id,
              |                  ROW_NUMBER() OVER (PARTITION BY query_id
              |                                     ORDER BY ad, neighbor_id) AS rn
              |           FROM approx) WHERE rn <= 20),
              |nn AS (SELECT vec_id, e, SQRT(vn2) AS nrm FROM vn),
              |rnk AS (SELECT c.query_id, c.neighbor_id,
              |               ROUND((SELECT SUM(p) FROM (SELECT UNNEST(q.e) * UNNEST(n.e) AS p))
              |                     / (q.nrm * n.nrm), 6) + 0.0 AS sim
              |        FROM cand c JOIN nn q ON q.vec_id = c.query_id
              |                    JOIN nn n ON n.vec_id = c.neighbor_id)
              |SELECT query_id, neighbor_id, sim FROM (
              |  SELECT query_id, neighbor_id, sim,
              |         ROW_NUMBER() OVER (PARTITION BY query_id
              |                            ORDER BY sim DESC, neighbor_id) AS rn
              |  FROM rnk) WHERE rn <= 5
              |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin)),

    // Binary (1-bit sign) quantization ANN — the fifth index family and
    // the bottom rung of the quantization ladder (float32 → SQ8 → PQ →
    // 1 bit/dim): each 64-dim vector compresses to TWO 32-bit sign
    // words (32× smaller than float32), and the coarse ranking is pure
    // hamming distance — XOR + popcount, the cheapest similarity
    // kernel that exists and the one binary-quantized vector stores run
    // at retrieval time. Top-50 hamming survivors (a 10× oversample of the final k — binary
    // quantization's standard rescoring window, cheap because each
    // candidate costs 4 ALU ops) rerank with the exact
    // float cosine (the SQ8/PQ pattern verbatim), so the output is
    // full-precision. Sign packing, XOR, and popcount are all integer —
    // both engines agree bit-for-bit with no tolerance. At 100 TB: the
    // corpus-side relation is 3 longs per vector, the scan streams
    // against a 16-row broadcast query side, and hamming is ~4 ALU ops
    // per candidate — the shape that makes a first-pass scan over a
    // trillion vectors feasible before any exact math runs.
    // SimilarityBinarySpec pins the recall floor vs brute force.
    QuerySpec(
      "topk_similarity_binary",
      (s, dir) => {
        def word(off: Int) = expr(
          s"""aggregate(sequence(0, 31), CAST(0 AS BIGINT),
             |  (acc, i) -> acc + IF(CAST(element_at(embedding, i + $off) AS DOUBLE) > 0,
             |                       shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))""".stripMargin)
        // barrier: both sides of the self-join consume this 3-longs-per-
        // vector relation — don't re-run the packing twice
        val words = emb(s, dir).select(col("vec_id"),
          word(1).as("lo"), word(33).as("hi")).localCheckpoint()
        val q = words.filter(col("vec_id") < 16)
          .select(col("vec_id").as("query_id"),
            col("lo").as("qlo"), col("hi").as("qhi"))
        val wq = Window.partitionBy("query_id")
          .orderBy(col("hamming").asc, col("neighbor_id"))
        val cand = q.join(words, col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            (bit_count(col("qlo").bitwiseXOR(col("lo"))) +
              bit_count(col("qhi").bitwiseXOR(col("hi")))).cast("int").as("hamming"))
          .withColumn("rn", row_number().over(wq))
          .filter(col("rn") <= 50)
          .select("query_id", "neighbor_id")
        val n = normed(s, dir).select(col("vec_id"), col("e"), col("nrm"))
        val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
        cand
          .join(n.as("q2"), col("q2.vec_id") === col("query_id"))
          .join(n.as("c2"), col("c2.vec_id") === col("neighbor_id"))
          .withColumn("sim",
            round(dot(col("q2.e"), col("c2.e")) / (col("q2.nrm") * col("c2.nrm")), 6) + lit(0.0))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("query_id", "neighbor_id", "sim")
          .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
      },
      Some("""WITH v AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              words AS (
                SELECT vec_id,
                       CAST((SELECT SUM(CASE WHEN e[i + 1] > 0
                                             THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
                             FROM (SELECT UNNEST(GENERATE_SERIES(0, 31)) AS i)) AS BIGINT) AS lo,
                       CAST((SELECT SUM(CASE WHEN e[i + 33] > 0
                                             THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
                             FROM (SELECT UNNEST(GENERATE_SERIES(0, 31)) AS i)) AS BIGINT) AS hi
                FROM v),
              scores AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       CAST(BIT_COUNT(XOR(q.lo, c.lo)) + BIT_COUNT(XOR(q.hi, c.hi)) AS INTEGER) AS hamming
                FROM words q JOIN words c ON q.vec_id != c.vec_id
                WHERE q.vec_id < 16),
              cand AS (
                SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY hamming ASC, neighbor_id) AS rn
                  FROM scores) WHERE rn <= 50),
              n AS (
                SELECT vec_id, e,
                       SQRT((SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x))) AS nrm
                FROM v),
              pairs AS (
                SELECT query_id, neighbor_id,
                       ROUND((SELECT SUM(p) FROM (SELECT UNNEST(q.e) * UNNEST(c.e) AS p))
                             / (q.nrm * c.nrm), 6) + 0.0 AS sim
                FROM cand JOIN n q ON q.vec_id = query_id
                          JOIN n c ON c.vec_id = neighbor_id)
              SELECT query_id, neighbor_id, sim FROM (
                SELECT query_id, neighbor_id, sim,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS rn
                FROM pairs) WHERE rn <= 5
              ORDER BY query_id, sim DESC, neighbor_id""")),

    // Embedding normalization (the stage before any cosine/ANN search:
    // unit-length vectors make dot product == cosine): per-vector L2
    // norm plus the first normalized component as the checkable scalar
    // witness. Pure per-row kernel over the native DotProduct — linear
    // at any scale, no shuffle.
    QuerySpec(
      "embedding_norm",
      (s, dir) =>
        normed(s, dir)
          .select(col("vec_id"),
            round(col("nrm"), 6).as("l2_norm"),
            (round(col("e")(0) / col("nrm"), 6) + lit(0.0)).as("first_unit"))
          .orderBy("vec_id"),
      Some(s"""WITH $NormCtes
              SELECT vec_id, ROUND(nrm, 6) AS l2_norm,
                     ROUND(e[1] / nrm, 6) + 0.0 AS first_unit
              FROM n ORDER BY vec_id""")),

    // Int8 embedding quantization — the storage-compression pass a vector
    // store runs before indexing (float32 → uint8 cuts the corpus 4×):
    // per-vector affine quantization q = round((x - min) * 255 / (max -
    // min)). All arithmetic is float32-exactly-widened-to-double, which
    // IEEE 754 specifies bit-identically on both engines, so the oracle
    // hash-matches the quantized checksum exactly (no tolerance needed);
    // constant vectors (max == min) quantize to all-zeros rather than
    // dividing by zero. Pure per-row kernel: linear at any scale, no
    // shuffle.
    QuerySpec(
      "embedding_quantize",
      (s, dir) =>
        emb(s, dir)
          .withColumn("mn", array_min(col("embedding")).cast("double"))
          .withColumn("mx", array_max(col("embedding")).cast("double"))
          .withColumn("q", when(col("mx") === col("mn"),
              expr("transform(embedding, x -> 0)"))
            .otherwise(expr(
              "transform(embedding, x -> CAST(round((CAST(x AS DOUBLE) - mn) * 255.0 / (mx - mn), 0) AS INT))")))
          .select(col("vec_id"),
            expr("aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("qsum"),
            col("q")(0).as("q_first"))
          .orderBy("vec_id"),
      Some("""WITH b AS (SELECT vec_id, embedding,
                                CAST(LIST_MIN(embedding) AS DOUBLE) AS mn,
                                CAST(LIST_MAX(embedding) AS DOUBLE) AS mx
                         FROM embeddings),
              q AS (SELECT vec_id,
                           CASE WHEN mx = mn THEN LIST_TRANSFORM(embedding, x -> 0)
                                ELSE LIST_TRANSFORM(embedding,
                                       x -> CAST(ROUND((CAST(x AS DOUBLE) - mn) * 255.0 / (mx - mn), 0) AS INT))
                           END AS ql
                    FROM b)
              SELECT vec_id, CAST(LIST_SUM(ql) AS BIGINT) AS qsum,
                     ql[1] AS q_first
              FROM q ORDER BY vec_id""")),

    // Embedding-cosine near-dup (SURVEY.md §2.12): same-cluster pairs with
    // cosine ≥ 0.4 (the synthetic corpus has no true dup vectors; the threshold sits in the observed upper tail). The label equi-join prunes the quadratic blowup the
    // same way the IVF search does — at 100 TB this is a shuffle on
    // cluster id, never an all-pairs cross product.
    QuerySpec(
      "dedup_embedding",
      (s, dir) => {
        val e = normed(s, dir)
        e.as("a").join(e.as("b"),
            col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
          .withColumn("sim",
            round(dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm")), 6))
          .filter(col("sim") >= 0.4)
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("sim"))
          .orderBy("vec_a", "vec_b")
      },
      Some(s"""WITH $NormCtes,
              pairs AS (
                SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                       ROUND((SELECT SUM(p) FROM (SELECT UNNEST(a.e) * UNNEST(b.e) AS p))
                             / (a.nrm * b.nrm), 6) AS sim
                FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
              SELECT vec_a, vec_b, sim FROM pairs WHERE sim >= 0.4
              ORDER BY vec_a, vec_b""")),

    // SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    // embedding space FIRST (one broadcast-argmin k-means assignment —
    // the kmAssign kernel embedding_kmeans trains with), then search for
    // cosine near-dups only WITHIN each cluster and keep one exemplar
    // (the lowest vec_id) per duplicate group. Unlike dedup_embedding,
    // which prunes by a GIVEN label, this computes its own partition of
    // the space — the production shape when no curated grouping exists.
    // At 100 TB: the assignment pass is one corpus scan against k
    // broadcast centroids (only (vec_id, cid) pairs shuffle), and the
    // pair search shuffles once on cid with per-cluster quadratic work
    // bounded by the cluster-size distribution k-means exists to balance.
    // Output: every DROPPED vector with the exemplar that covers it.
    QuerySpec(
      "dedup_semantic",
      (s, dir) => {
        val v = kmVectors(s, dir)
        val a = kmAssign(v, kmInit(v)).localCheckpoint()
        val t = normed(s, dir).select(col("vec_id"), col("e"), col("nrm"))
          .join(a, "vec_id")
        t.as("a").join(t.as("b"),
            col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
          .withColumn("sim",
            round(dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm")), 6))
          .filter(col("sim") >= 0.4)
          .groupBy(col("b.vec_id").as("vec_id"), col("b.cid").as("cid"))
          .agg(min(col("a.vec_id")).as("kept_exemplar"))
          .orderBy("vec_id")
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              vn AS (SELECT vec_id, e,
                            (SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x)) AS vn2,
                            SQRT((SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x))) AS nrm
                     FROM v),
              c0 AS (SELECT CAST(vec_id AS INT) AS cid, LIST_TRANSFORM(e, x -> ROUND(x, 6)) AS c
                     FROM v WHERE vec_id < 8),
              n0 AS (SELECT cid, c,
                            (SELECT SUM(x*x) FROM (SELECT UNNEST(c) AS x)) AS cn2
                     FROM c0),
              d1 AS (SELECT v.vec_id, k.cid,
                            ROUND(v.vn2 + k.cn2
                                  - 2 * (SELECT SUM(p) FROM (SELECT UNNEST(v.e) * UNNEST(k.c) AS p)),
                                  6) AS d
                     FROM vn v CROSS JOIN n0 k),
              a1 AS (SELECT vec_id, cid FROM (
                       SELECT vec_id, cid,
                              ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
                       FROM d1) WHERE rn = 1),
              t AS (SELECT vn.vec_id, vn.e, vn.nrm, a1.cid
                    FROM vn JOIN a1 USING (vec_id)),
              pairs AS (
                SELECT a.vec_id AS ka, b.vec_id AS vec_id, b.cid,
                       ROUND((SELECT SUM(p) FROM (SELECT UNNEST(a.e) * UNNEST(b.e) AS p))
                             / (a.nrm * b.nrm), 6) AS sim
                FROM t a JOIN t b ON a.cid = b.cid AND a.vec_id < b.vec_id)
              SELECT vec_id, cid, MIN(ka) AS kept_exemplar
              FROM pairs WHERE sim >= 0.4
              GROUP BY vec_id, cid ORDER BY vec_id""")),

    // K-means (Lloyd) training — the missing piece the IVF search above
    // assumes: it prunes by a cluster assignment, and THIS is the job
    // that produces one. Classic distributed Lloyd shape, per iteration:
    //   (1) assign: broadcast the k centroids (k×dim doubles — tiny
    //       forever), one pass over the corpus computes argmin distance;
    //       NO shuffle of vectors, only (vec_id, cid) pairs move.
    //   (2) update: posexplode to (cid, dim) terms, partial-aggregating
    //       groupBy on the compact (cid, pos) key — map-side combine
    //       reduces each partition to ≤ k×dim rows before the exchange.
    // At 100 TB that is the canonical implementation: per-iteration cost
    // is one corpus scan + one k×dim-sized aggregate, and the centroid
    // relation never grows with n. Determinism bridge: distances ride
    // the proven double-fold DotProduct↔UNNEST-SUM parity (rounded to 6
    // before any comparison), argmin ties break on cid, and centroid
    // component sums are rounded to 6 THEN summed as DECIMAL so partial
    // order can't move them. Two unrolled iterations from vec_id<8 seeds.
    QuerySpec(
      "embedding_kmeans",
      (s, dir) => {
        // localCheckpoint barriers: Spark physical plans never share
        // subtrees, so without them iteration i's whole chain re-executes
        // once per downstream consumer (a2 feeds both the counts and the
        // c2 update — measured 2.97 s vs 1.2 s at sf0.1). Checkpointing
        // the 8-row centroid relation and the (vec_id, cid) assignment
        // is exactly what an iterative driver program does at 100 TB:
        // persist the loop-carried state, never its lineage.
        val v = kmVectors(s, dir)
        val c0 = kmInit(v)
        // fused kernels (KmProbe: values identical, no vector re-joins)
        val a1 = kmAssignE(v, c0); val c1 = kmUpdateE(a1).localCheckpoint()
        val a2 = kmAssignE(v, c1).localCheckpoint(); val c2 = kmUpdateE(a2)
        val counts = a2.groupBy("cid").agg(count(lit(1)).as("n_vecs"))
        val checks = c2.select(col("cid"),
          expr("""CAST(aggregate(
                    transform(c, x -> CAST(round(x, 6) AS DECIMAL(18,6))),
                    CAST(0 AS DECIMAL(28,6)),
                    (acc, t) -> CAST(acc + t AS DECIMAL(28,6))) AS DOUBLE)""")
            .as("centroid_sum"))
        counts.join(checks, "cid").orderBy("cid")
      },
      Some(s"""WITH $KmeansCtes
              SELECT k.cid, k.n_vecs,
                     CAST((SELECT SUM(CAST(ROUND(x, 6) AS DECIMAL(18,6)))
                           FROM (SELECT UNNEST(c2.c) AS x)) AS DOUBLE) AS centroid_sum
              FROM (SELECT cid, COUNT(*) AS n_vecs FROM a2 GROUP BY cid) k
              JOIN c2 USING (cid)
              ORDER BY k.cid""")),

    // Clustering QUALITY relation — per-cluster within-cluster sum of
    // squared distances (the Lloyd objective kmObjective's law spec
    // asserts, now a first-class audited output): the number that tells
    // an IVF operator whether its cells are tight enough to serve
    // (sibling of the audit family — dedup_recall_audit,
    // topk_similarity_recall, text_nb_confusion). Distances ride the
    // same 8-row centroid broadcast as assignment; the per-cid DECIMAL
    // sum is partial-agg order-independent.
    QuerySpec(
      "embedding_kmeans_quality",
      (s, dir) => {
        val v = kmVectors(s, dir)
        val c0 = kmInit(v)
        // fused kernels (KmProbe: values identical); a2 already pairs
        // each vec_id with its vector, so the WSS scan needs no v join
        val a1 = kmAssignE(v, c0); val c1 = kmUpdateE(a1).localCheckpoint()
        val a2 = kmAssignE(v, c1).localCheckpoint(); val c2 = kmUpdateE(a2)
        a2
          .join(broadcast(c2), "cid")
          .select(col("cid"),
            round(dot(col("e"), col("e")) + dot(col("c"), col("c"))
              - lit(2.0) * dot(col("e"), col("c")), 6).as("d"))
          .groupBy("cid")
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("d").cast("decimal(18,6)")).cast("double").as("wss"))
          .orderBy("cid")
      },
      Some(s"""WITH $KmeansCtes,
              |n2c AS (SELECT cid, c,
              |               (SELECT SUM(x*x) FROM (SELECT UNNEST(c) AS x)) AS cn2
              |        FROM c2),
              |dist AS (SELECT a.cid,
              |                ROUND(v.vn2 + k.cn2
              |                      - 2 * (SELECT SUM(p) FROM (SELECT UNNEST(v.e) * UNNEST(k.c) AS p)),
              |                      6) AS d
              |         FROM vn v JOIN a2 a USING (vec_id) JOIN n2c k ON k.cid = a.cid)
              |SELECT cid, COUNT(*) AS n_vecs,
              |       CAST(SUM(CAST(d AS DECIMAL(18,6))) AS DOUBLE) AS wss
              |FROM dist GROUP BY cid ORDER BY cid""".stripMargin)),

    // Dimension covariance matrix — the one-pass sufficient statistic
    // behind PCA / whitening / feature-correlation pruning of an
    // embedding corpus. Single corpus scan through the compiled
    // [[graft.functions.CovMoments]] Aggregator: each partition folds
    // its rows into ONE ~17 KB buffer (upper-triangle product sums +
    // marginals + count) before the exchange — the shuffle is
    // CONSTANT-size in n, the 100 TB shape, and the inner loop is raw
    // long arithmetic instead of an interpreted per-row fan-out.
    // Quantized to the integer grid q = round(x*1000): all sums are
    // exact BIGINT arithmetic, so both engines agree bit-for-bit (the
    // LshBandKeys bridge); overflow headroom in CovMoments' Scaladoc.
    QuerySpec(
      "embedding_covariance",
      (s, dir) => covarianceTri(s, dir).orderBy("i", "j"),
      Some("""WITH q AS (
                SELECT LIST_TRANSFORM(embedding,
                         x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
                FROM embeddings),
              pairs AS (
                SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, q[i+1] * q[j+1] AS p
                FROM q, (SELECT UNNEST(RANGE(0, 64)) AS i),
                        (SELECT UNNEST(RANGE(0, 64)) AS j)
                WHERE j >= i),
              sums AS (
                SELECT i, j, COUNT(*) AS n, CAST(SUM(p) AS BIGINT) AS s
                FROM pairs GROUP BY i, j),
              marg AS (
                SELECT CAST(i AS INT) AS i, CAST(SUM(q[i+1]) AS BIGINT) AS ms
                FROM q, (SELECT UNNEST(RANGE(0, 64)) AS i) GROUP BY i)
              SELECT s.i, s.j, s.s AS s_pp,
                     ROUND((CAST(s.s AS DOUBLE) / s.n
                            - (CAST(a.ms AS DOUBLE) / s.n)
                              * (CAST(b.ms AS DOUBLE) / s.n)) / 1e6, 6) + 0.0 AS cov
              FROM sums s JOIN marg a ON a.i = s.i JOIN marg b ON b.i = s.j
              ORDER BY s.i, s.j""")),

    // In-engine PCA top component: dominant eigenvector of the 64×64
    // covariance by 20 fixed power iterations. The corpus-sized work is
    // the ONE exact-integer moment pass covarianceTri already runs; the
    // (i, j, cov) matrix that reaches the PowerIterate Aggregator is
    // CONSTANT-size, so the eigen solve is O(20·64²) on one task at any
    // corpus scale — where a production system solves it. Lockstep: both
    // engines start at v₀ = 0.125 (exact), compute matvec/norm sums in
    // the same ascending order, and round every coordinate to 6 decimals
    // each iteration, so fp drift cannot accumulate; the oracle unrolls
    // the same 20 iterations as generated CTEs (the BPE-oracle pattern).
    QuerySpec(
      "embedding_pca_power",
      (s, dir) => pcaTop(s, dir).orderBy("i"),
      Some(PcaOracleSql)),

    // PCA PROJECTION — the consumer that makes the eigenvector useful:
    // every embedding scored by its centered projection onto the top
    // component (the first coordinate a whitening / dimensionality-
    // reduction pipeline keeps). The loading and mean vectors are
    // constant-size single-row arrays broadcast to every task; the score
    // is a per-row ascending-k fold (zero extra shuffle beyond the two
    // constant aggregates), so the query costs one corpus pass more than
    // embedding_pca_power at any scale. Lockstep: q/1000 centering uses
    // the exact integer marginals, fold order is k-ascending on both
    // engines, score rounded to 6.
    QuerySpec(
      "embedding_pca_project",
      (s, dir) => {
        // exact integer marginals (ms_k, n) → mean_k = ms_k/n/1000; the
        // posexplode→groupBy is a partial-aggregating shuffle of 64
        // compact keys
        val q = emb(s, dir).select(col("vec_id"), expr(
          "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))").as("q"))
        val marg = q.select(posexplode(col("q")))
          .groupBy("pos")
          .agg(sum(col("col")).as("ms"), count(lit(1)).as("n"))
          .select(col("pos").cast("int").as("i"),
            (col("ms").cast("double") / col("n") / 1000.0).as("mu"))
        // one 1-row frame carrying both 64-wide constant arrays
        val arrs = pcaTop(s, dir).join(marg, "i")
          .agg(
            expr("transform(array_sort(collect_list(struct(i, loading))), s -> s.loading)").as("l"),
            expr("transform(array_sort(collect_list(struct(i, mu))), s -> s.mu)").as("mu"))
        q.crossJoin(broadcast(arrs))
          .select(col("vec_id"),
            (round(expr(
              """aggregate(sequence(0, 63), CAST(0.0 AS DOUBLE),
                |  (acc, k) -> acc + (q[k] / 1000.0 - mu[k]) * l[k])""".stripMargin), 6)
              + lit(0.0)).as("score"))
          .orderBy("vec_id")
      },
      Some(s"""WITH $PcaCtes,
              |mq AS (
              |  SELECT vec_id, LIST_TRANSFORM(embedding,
              |           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
              |  FROM embeddings),
              |cnt AS (SELECT COUNT(*) AS n FROM mq),
              |mu AS (
              |  SELECT LIST(CAST(ms AS DOUBLE) / n / 1000.0 ORDER BY i) AS mu
              |  FROM cmarg, cnt)
              |SELECT m.vec_id,
              |       ROUND((SELECT SUM(p) FROM (
              |                SELECT (UNNEST(m.q) / 1000.0 - UNNEST(mu.mu))
              |                       * UNNEST(v.v) AS p)), 6) + 0.0 AS score
              |FROM mq m, mu, $PcaLast v
              |ORDER BY vec_id""".stripMargin)),

    // MMR diversified retrieval (Carbonell & Goldstein 1998): the
    // re-ranking stage after top-k — greedily pick 8 of the top-20
    // candidates maximizing λ·relevance − (1−λ)·max-similarity-to-
    // already-picked (λ=0.7), so near-duplicate hits stop crowding the
    // result list. Decomposition: the CORPUS-sized work (top-20 pool
    // per query) is the distributed brute scan topk_similarity
    // declares; the pool's pairwise cosines are a pool²-bounded
    // self-join; only the inherently-sequential greedy runs inside the
    // MmrSelect Aggregator — per-group state ≤ 20·19 pre-rounded
    // tuples, constant at any corpus size. The oracle replays the same
    // greedy as a recursive CTE over the same pre-rounded relations:
    // identical pick sequence, identical scores.
    QuerySpec(
      "rank_mmr",
      (s, dir) => {
        import s.implicits._
        val e = normed(s, dir)
        val q = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("query_id"), col("e").as("q_e"),
            col("nrm").as("q_nrm"))
        val c = e.select(col("vec_id").as("neighbor_id"), col("e").as("c_e"),
          col("nrm").as("c_nrm"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("rel").desc, col("neighbor_id"))
        // top-20 pool; localCheckpoint because it feeds BOTH sides of
        // the pairwise self-join (the contamination() precedent)
        val pool = q.join(c, col("query_id") =!= col("neighbor_id"))
          .withColumn("rel",
            round(dot(col("q_e"), col("c_e")) / (col("q_nrm") * col("c_nrm")), 6)
              + lit(0.0))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= MmrSelect.Pool)
          .select("query_id", "neighbor_id", "c_e", "c_nrm", "rel")
          .localCheckpoint()
        val psim = pool.as("a").join(pool.as("b"),
            col("a.query_id") === col("b.query_id") &&
              col("a.neighbor_id") =!= col("b.neighbor_id"))
          .select(col("a.query_id"), col("a.neighbor_id").as("a"),
            col("a.rel").as("rel"), col("b.neighbor_id").as("b"),
            (round(dot(col("a.c_e"), col("b.c_e"))
              / (col("a.c_nrm") * col("b.c_nrm")), 6) + lit(0.0)).as("sim"))
        psim.select(col("query_id"), col("a"), col("rel"), col("b"), col("sim"))
          .as[(Long, Long, Double, Long, Double)]
          .groupByKey(_._1)
          .mapValues(r => (r._2, r._3, r._4, r._5))
          .agg(MmrSelect.toColumn.name("sel"))
          .toDF("query_id", "sel")
          .select(col("query_id"), explode(col("sel")).as("s"))
          .select(col("query_id"), col("s._1").as("rank"),
            col("s._2").as("neighbor_id"), col("s._3").as("score"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH RECURSIVE $NormCtes,
              q AS (SELECT vec_id, e, nrm FROM n WHERE vec_id < 16),
              sims AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       c.e AS ce, c.nrm AS cn,
                       ROUND((SELECT SUM(p) FROM (SELECT UNNEST(q.e) * UNNEST(c.e) AS p))
                             / (q.nrm * c.nrm), 6) + 0.0 AS rel
                FROM q JOIN n c ON q.vec_id != c.vec_id),
              pool AS (
                SELECT query_id, neighbor_id, ce, cn, rel FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                               ORDER BY rel DESC, neighbor_id) AS rn
                  FROM sims) WHERE rn <= 20),
              psim AS (
                SELECT a.query_id, a.neighbor_id AS a, b.neighbor_id AS b,
                       ROUND((SELECT SUM(p) FROM (SELECT UNNEST(a.ce) * UNNEST(b.ce) AS p))
                             / (a.cn * b.cn), 6) + 0.0 AS sim
                FROM pool a JOIN pool b
                  ON a.query_id = b.query_id AND a.neighbor_id != b.neighbor_id),
              cands AS (SELECT query_id, neighbor_id AS a, rel FROM pool),
              sel AS (
                SELECT query_id, 1 AS rank, a AS picked,
                       ROUND(0.7*rel, 6) + 0.0 AS score, [a] AS ids
                FROM (SELECT query_id, a, rel,
                             ROW_NUMBER() OVER (PARTITION BY query_id
                                                ORDER BY rel DESC, a) AS rn
                      FROM cands) WHERE rn = 1
                UNION ALL
                SELECT s.query_id, s.rank + 1, c.a, c.score, list_append(s.ids, c.a)
                FROM sel s, LATERAL (
                  SELECT x.a, ROUND(0.7*x.rel - 0.3*x.maxsim, 6) + 0.0 AS score
                  FROM (SELECT c2.a, c2.rel,
                               (SELECT MAX(p.sim) FROM psim p
                                WHERE p.query_id = s.query_id AND p.a = c2.a
                                  AND list_contains(s.ids, p.b)) AS maxsim
                        FROM cands c2
                        WHERE c2.query_id = s.query_id
                          AND NOT list_contains(s.ids, c2.a)) x
                  ORDER BY score DESC, x.a LIMIT 1) c
                WHERE s.rank < 8)
              SELECT query_id, rank, picked AS neighbor_id, score
              FROM sel ORDER BY query_id, rank"""))
  )
}
