package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}

/** Relational core parity set (SURVEY.md §2.1-2.8, M2).
  *
  * Everything here is declarative DataFrame API — scans, filters, projections,
  * joins, aggregations, windows, sorts, set ops, scalar function families —
  * so Catalyst handles pushdown, pruning, partial aggregation, join selection
  * and AQE re-planning. The reference delegated all of this to DuckDB
  * (reference: core_processor.rs:391-428 CTAS dispatch); we delegate to
  * Catalyst + Tungsten.
  *
  * Scale notes (100 TB design):
  *  - fixed-size dimension joins broadcast explicitly (region/nation);
  *    corpus-scaling relations (customer) carry no hint — AQE broadcasts
  *    them while they fit and falls back to a shuffle join beyond that;
  *    fact-fact joins shuffle on their keys and AQE picks SMJ/skew handling;
  *  - no query collects to the driver; all outputs are bounded either by
  *    aggregation, selective filters, or explicit LIMIT;
  *  - double sums go through DECIMAL(38,4): exact, associative, and therefore
  *    both deterministic under any partitioning AND oracle-matchable.
  */
object RelationalQueries {

  private val Dec = DecimalType(38, 4)
  private def dec(c: Column): Column = c.cast(Dec)
  // NOTE on the round(cast(decimal AS double), 4) output bridge used by
  // the aggregate queries below: it is engine-identical while |sum| is
  // below ~2^53/10^4 ≈ 9e11 (the 4th decimal stays representable in
  // double). The verify gate runs at small SF where sums are ≤ 1e9, far
  // inside the bound; the DECIMAL(38,4) INTERNAL arithmetic is exact at
  // any scale — only the cross-engine comparison bridge has this range.
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  // the fact-table columns diag_stats profiles (shared by query/oracle/bench)
  private val diagStatsCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus")

  /** Oracle-side view of `events` with ts truncated to micros like Spark's
    * parquet reader does for nanosecond timestamps. */
  private val EventsUs =
    "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events"

  def specs: Seq[QuerySpec] = Seq(

    // ---------------------------------------------------------------- scans
    QuerySpec(
      "scan_parquet",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // Parquet AGGREGATE pushdown — MIN/MAX/COUNT answered from row-group
    // footer statistics, zero data pages read: the scan-avoidance rung
    // below filter pushdown. At 100 TB this is the difference between a
    // metadata-only operation (a few KB of footers per file) and a full
    // corpus scan for the commonest profiling query there is. Runs in a
    // child session (the conf is off by default and is only valid for
    // the no-filter, no-grouping shape this query pins); ScanPushdownSpec
    // asserts PushedAggregation reached the scan node.
    QuerySpec(
      "scan_agg_pushdown",
      (s0, dir) => {
        val s = s0.newSession()
        s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        // footer-stats pushdown lives in the V2 parquet source; the
        // default read path is V1 (useV1SourceList contains parquet)
        s.conf.set("spark.sql.sources.useV1SourceList", "")
        s.read.parquet(s"$dir/lineitem.parquet")
          .agg(min(col("l_orderkey")).as("min_key"),
            max(col("l_orderkey")).as("max_key"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key,
                     COUNT(*) AS n_rows
              FROM lineitem""")),

    // CSV round-trip: written from `nation`, read back with header +
    // schema inference + DROPMALFORMED (reference: core_processor.rs:413-418
    // read_csv(ignore_errors=true, header=true)). Oracle reads the same table.
    QuerySpec(
      "scan_csv",
      (s, dir) => {
        // path keyed by the source dir: a bench at sf0.1 and a verify at
        // sf0.01 running concurrently must not overwrite each other's copy
        val tmp = s"${sys.props("java.io.tmpdir")}/graft_scan_csv_" +
          java.lang.Integer.toHexString(dir.hashCode)
        t(s, dir, "nation").coalesce(1)
          .write.mode("overwrite").option("header", true).csv(tmp)
        s.read
          .option("header", true).option("inferSchema", true)
          .option("mode", "DROPMALFORMED").csv(tmp)
          .orderBy("n_nationkey")
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    // CSV DIALECT sniffing — the reference inherits DuckDB's delimiter
    // auto-detection (core_processor.rs:413-418); Spark hardcodes the
    // comma, so the ingest pipeline sniffs a bounded 16 KB prefix
    // (sources/CsvDialect): semicolon and tab exports — the two
    // dialects European tooling actually emits — must load with their
    // full column structure, not as one mangled column. Both fixtures
    // read through the REAL pipeline arm (IngestPipeline.read), so the
    // sniff is on the executed path, not a side API.
    QuerySpec(
      "scan_csv_dialect",
      (s, dir) => {
        def fixture(sep: String, name: String): String = {
          val tmp = ReaderQueries.fixturePath(dir, name)
          t(s, dir, "nation").coalesce(1).write.mode("overwrite")
            .option("header", true).option("sep", sep).csv(tmp)
          Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
            .filter(_.getName.endsWith(".csv")).head.getAbsolutePath
        }
        val semi = graft.plans.IngestPipeline.read(
          s, fixture(";", "csv_dialect_semi"), graft.sources.FileType.Csv)
        val tab = graft.plans.IngestPipeline.read(
          s, fixture("\t", "csv_dialect_tab"), graft.sources.FileType.Csv)
        semi.withColumn("src", lit("semi"))
          .unionByName(tab.withColumn("src", lit("tab")))
          .select(col("src"), col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .orderBy("src", "n_nationkey")
      },
      Some("""SELECT src, n_nationkey, n_name, n_regionkey FROM (
                SELECT 'semi' AS src, n_nationkey, n_name, n_regionkey FROM nation
                UNION ALL
                SELECT 'tab' AS src, n_nationkey, n_name, n_regionkey FROM nation)
              ORDER BY src, n_nationkey""")),

    // ORC round-trip — the other major columnar warehouse format, same
    // round-trip pattern as scan_csv: written from `nation`, read back
    // through Spark's built-in vectorized ORC reader (predicate pushdown
    // and column pruning work the same as parquet), oracle reads the
    // source table.
    QuerySpec(
      "scan_orc",
      (s, dir) => {
        // per-process, shutdown-cleaned fixture tree (cf. ReaderQueries:
        // repeated runs must not strand files; two JVMs must not race)
        val tmp = ReaderQueries.fixturePath(dir, "scan_orc")
        t(s, dir, "nation").coalesce(1)
          .write.mode("overwrite").orc(tmp)
        s.read.orc(tmp)
          .select("n_nationkey", "n_name", "n_regionkey")
          .orderBy("n_nationkey")
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    // Avro round-trip via the built-in datasource — the row-oriented
    // interchange format of streaming/CDC feeds (Kafka payloads, schema
    // registry); a 100 TB landing zone reads it before compacting to
    // parquet. Self-describing schema, splittable container.
    QuerySpec(
      "scan_avro",
      (s, dir) => {
        // FQCN: this distribution ships AvroFileFormat inside spark-sql
        // but without the "avro" DataSourceRegister service entry the
        // short name resolves through
        val avro = "org.apache.spark.sql.avro.AvroFileFormat"
        val tmp = ReaderQueries.fixturePath(dir, "scan_avro")
        t(s, dir, "nation").coalesce(1)
          .write.mode("overwrite").format(avro).save(tmp)
        s.read.format(avro).load(tmp)
          .select("n_nationkey", "n_name", "n_regionkey")
          .orderBy("n_nationkey")
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    // XML scan via the Spark 4 built-in datasource (rowTag record
    // extraction + schema inference) — the config/feed format legacy
    // enterprise pipelines still emit. The fixture is composed from
    // nation rows, so the oracle is plain SQL over `nation`; inferred
    // numerics are cast explicitly so the schema can't drift with the
    // inference sample.
    QuerySpec(
      "scan_xml",
      (s, dir) => {
        val tmp = ReaderQueries.fixturePath(dir, "scan_xml") + "/nation.xml"
        graft.sources.FormatWriters.writeXmlRecords(tmp, ReaderQueries.nationRows(s, dir))
        s.read.format("xml").option("rowTag", "record").load(tmp)
          .select(col("id").cast("long").as("id"), col("name"),
            col("region").cast("long").as("region"))
          .orderBy("id")
      },
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS id, n_name AS name,
                     CAST(n_regionkey AS BIGINT) AS region
              FROM nation ORDER BY id""")),

    // Schema-evolution scan — the data-lake reality at 100 TB: years of
    // parquet parts whose schemas drifted (columns added/dropped). Two
    // hive-partitioned parts are written with DIFFERENT column subsets;
    // mergeSchema reconciles them into the union schema, missing columns
    // surface as NULLs, and the partition column materializes from the
    // directory layout (no file reads row-data it doesn't have). The
    // oracle recomposes both generations from `nation` with explicit
    // NULL columns.
    QuerySpec(
      "scan_schema_merge",
      (s, dir) => {
        val tmp = ReaderQueries.fixturePath(dir, "scan_merge")
        t(s, dir, "nation").select("n_nationkey", "n_name").coalesce(1)
          .write.mode("overwrite").parquet(s"$tmp/gen=1")
        t(s, dir, "nation").select("n_nationkey", "n_regionkey").coalesce(1)
          .write.mode("overwrite").parquet(s"$tmp/gen=2")
        s.read.option("mergeSchema", "true").parquet(tmp)
          .select(col("gen").cast("int").as("gen"), col("n_nationkey"),
            col("n_name"), col("n_regionkey"))
          .orderBy("gen", "n_nationkey")
      },
      Some("""SELECT * FROM (
                SELECT 1 AS gen, n_nationkey, n_name,
                       CAST(NULL AS INTEGER) AS n_regionkey
                FROM nation
                UNION ALL
                SELECT 2 AS gen, n_nationkey, CAST(NULL AS VARCHAR) AS n_name,
                       n_regionkey
                FROM nation)
              ORDER BY gen, n_nationkey""")),

    // Deterministic 5% sample by key-hash modulus — the reproducible-
    // sampling idiom for data pipelines. Seeded df.sample() is engine-
    // specific RNG and can't be oracle-matched (or re-run stably across
    // cluster topologies); hashing the row key is stable across engines,
    // runs, partitionings, and retries, and pushes down as an ordinary
    // filter (one scan, no shuffle, no driver involvement).
    QuerySpec(
      "scan_sample",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(graft.functions.HashBridge.h32(
            concat_ws("_", col("l_orderkey"), col("l_linenumber"))) % 20 === 0)
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              WHERE ('0x'||SUBSTR(MD5(l_orderkey::VARCHAR||'_'||l_linenumber::VARCHAR),1,8))::BIGINT % 20 = 0
              ORDER BY l_orderkey, l_linenumber""")),

    // Weighted PRIORITY SAMPLING (Duffield, Lund & Thorup 2007, JACM):
    // the fixed-size weighted sample a curation pipeline draws when docs
    // have unequal importance (here w = n_chars+1, the stand-in for any
    // quality weight): priority q = w/u with u uniform on (0,1], keep
    // the top-k by q — inclusion probability ∝ min(1, w/τ) with τ the
    // (k+1)-th priority, unbiased subset-sum estimates by design. Two
    // engine-determinism choices make it oracle-exact where seeded
    // sample() can never be: u derives from the md5 bridge (same
    // "randomness" on both engines), and q = w·2³²/(h+1) uses ONLY
    // IEEE-exact operations (integer-valued multiply, one correctly-
    // rounded division — no libm transcendentals whose last ulp could
    // differ). Scale shape: orderBy+limit plans as TakeOrderedAndProject
    // — per-partition top-k heaps, driver merges k·partitions rows, no
    // global sort of the corpus.
    QuerySpec(
      "sample_priority",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"), (col("n_chars") + 1).cast("long").as("w"),
            graft.functions.HashBridge.h32(col("doc_id").cast("string")).as("h"))
          .withColumn("pr",
            col("w").cast("double") * lit(4294967296.0) / (col("h") + lit(1.0)))
          .orderBy(col("pr").desc, col("doc_id"))
          .limit(64)
          .select(col("doc_id"), col("w"),
            (round(col("pr"), 6) + lit(0.0)).as("priority")),
      Some("""SELECT doc_id, w, ROUND(pr, 6) + 0.0 AS priority FROM (
                SELECT doc_id, CAST(n_chars + 1 AS BIGINT) AS w,
                       CAST(n_chars + 1 AS DOUBLE) * 4294967296.0 /
                         (('0x'||SUBSTR(MD5(doc_id::VARCHAR),1,8))::BIGINT + 1.0) AS pr
                FROM documents)
              ORDER BY pr DESC, doc_id LIMIT 64""")),

    // The estimator that justifies priority sampling: the Horvitz-
    // Thompson subset-sum estimate Σ max(wᵢ, τ) over the top-k sample
    // (τ = the (k+1)-th priority) is UNBIASED for the true Σw — this
    // query puts the estimate beside the exact total and the relative
    // error, the check a pipeline runs before trusting sample-based
    // corpus statistics. Corpus-sized work is one TakeOrdered(65) pass
    // + one exact-sum aggregate; the rank/τ/estimate arithmetic runs on
    // the 65 surviving rows (the post-TakeOrdered global window is
    // 65 rows, not the corpus). Terms round to the 6-decimal grid and
    // sum as DECIMAL so partial order can't move the estimate.
    QuerySpec(
      "sample_priority_estimate",
      (s, dir) => {
        val pr = Tables(s, dir, "documents")
          .select(col("doc_id"), (col("n_chars") + 1).cast("long").as("w"),
            graft.functions.HashBridge.h32(col("doc_id").cast("string")).as("h"))
          .withColumn("pr",
            col("w").cast("double") * lit(4294967296.0) / (col("h") + lit(1.0)))
        val top65 = pr.orderBy(col("pr").desc, col("doc_id")).limit(65)
          .withColumn("rn", row_number().over(
            Window.orderBy(col("pr").desc, col("doc_id"))))
          .localCheckpoint()
        val tau = top65.filter(col("rn") === 65)
          .select(round(col("pr"), 6).as("tau"))
        val est = top65.filter(col("rn") <= 64)
          .crossJoin(broadcast(tau))
          .agg(sum(round(greatest(col("w").cast("double"), col("tau")), 6)
            .cast("decimal(28,6)")).cast("double").as("est"))
        val tot = pr.agg(sum(col("w")).as("true_total"))
        est.crossJoin(broadcast(tau)).crossJoin(broadcast(tot))
          .select(lit(64).as("k"), col("tau"),
            col("est").as("estimated_total"), col("true_total"),
            (round((col("est") - col("true_total")) / col("true_total"), 6)
              + lit(0.0)).as("rel_err"))
      },
      Some("""WITH pr AS (
             |  SELECT doc_id, CAST(n_chars + 1 AS BIGINT) AS w,
             |         CAST(n_chars + 1 AS DOUBLE) * 4294967296.0 /
             |           (('0x'||SUBSTR(MD5(doc_id::VARCHAR),1,8))::BIGINT + 1.0) AS pr
             |  FROM documents),
             |top65 AS (SELECT * FROM (
             |            SELECT doc_id, w, pr,
             |                   ROW_NUMBER() OVER (ORDER BY pr DESC, doc_id) AS rn
             |            FROM pr) WHERE rn <= 65),
             |tau AS (SELECT ROUND(pr, 6) AS tau FROM top65 WHERE rn = 65),
             |est AS (SELECT CAST(SUM(CAST(ROUND(GREATEST(CAST(w AS DOUBLE), tau), 6)
             |                             AS DECIMAL(28,6))) AS DOUBLE) AS est
             |        FROM top65, tau WHERE rn <= 64),
             |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS true_total FROM pr)
             |SELECT 64 AS k, tau, est AS estimated_total, true_total,
             |       ROUND((est - true_total) / true_total, 6) + 0.0 AS rel_err
             |FROM est, tau, tot""".stripMargin)),

    // Delete-a-group JACKKNIFE confidence interval (Quenouille/Tukey;
    // the delete-a-group form is the survey-statistics standard, Kott
    // 2001) for a corpus statistic — the error bar a pipeline attaches
    // to any sampled or full-corpus metric. Unlike bootstrap resampling
    // it needs NO randomness: docs hash into G=32 groups, the statistic
    // (mean n_chars) is recomputed leaving each group out, and the
    // jackknife variance (G−1)/G·Σ(θ_g−θ̄)² is assembled from those 32
    // replicates. Scale shape: corpus-sized work is ONE 32-key partial
    // aggregate (sum+count per group); every replicate θ_g comes from
    // the group table by subtraction — no second corpus pass, no
    // per-replicate scan (the naive formulation scans G times). FP
    // determinism: θ_g rounds to the 6-decimal grid and lives as
    // DECIMAL(18,6); deviations square as DECIMAL(12,6)² (exact, scale
    // 12 on both engines — wide enough that Spark's precision capping
    // never engages) and only the final sqrt runs in double (correctly
    // rounded IEEE, same input bits → same output bits).
    QuerySpec(
      "eval_jackknife_ci",
      (s, dir) => {
        val g = Tables(s, dir, "documents")
          .groupBy((col("doc_id") % 32).as("g"))
          .agg(sum(col("n_chars")).as("sg"), count(lit(1)).as("ng"))
        val tot = g.agg(sum(col("sg")).as("st"), sum(col("ng")).as("nt"))
        val th = g.crossJoin(broadcast(tot)) // 1 row, always broadcastable
          .select(round((col("st") - col("sg")).cast("double") /
              (col("nt") - col("ng")), 6).cast("decimal(18,6)").as("th"))
          .localCheckpoint() // consumed by bar AND ssq
        val bar = th.agg(round(sum(col("th")).cast("double") / 32, 6)
          .cast("decimal(18,6)").as("bar"))
        val ssq = th.crossJoin(broadcast(bar))
          .agg(sum((col("th") - col("bar")).cast("decimal(12,6)") *
            (col("th") - col("bar")).cast("decimal(12,6)")).cast("double").as("ssq"))
        val se = round(sqrt(lit(31.0) * col("ssq") / 32), 6)
        tot.crossJoin(broadcast(ssq))
          .select(lit(32).as("n_groups"),
            round(col("st").cast("double") / col("nt"), 6).as("estimate"),
            se.as("se_jack"),
            (round(round(col("st").cast("double") / col("nt"), 6) - lit(1.96) * se, 6)
              + lit(0.0)).as("ci_lo"),
            (round(round(col("st").cast("double") / col("nt"), 6) + lit(1.96) * se, 6)
              + lit(0.0)).as("ci_hi"))
      },
      Some("""WITH g AS (
             |  SELECT doc_id % 32 AS g, SUM(n_chars) AS sg, COUNT(*) AS ng
             |  FROM documents GROUP BY doc_id % 32),
             |tot AS (SELECT SUM(sg) AS st, SUM(ng) AS nt FROM g),
             |th AS (SELECT CAST(ROUND(CAST(st - sg AS DOUBLE) / (nt - ng), 6)
             |                  AS DECIMAL(18,6)) AS th
             |       FROM g, tot),
             |bar AS (SELECT CAST(ROUND(CAST(SUM(th) AS DOUBLE) / 32, 6)
             |                   AS DECIMAL(18,6)) AS bar FROM th),
             |ssq AS (SELECT CAST(SUM(CAST(th - bar AS DECIMAL(12,6)) *
             |                         CAST(th - bar AS DECIMAL(12,6))) AS DOUBLE)
             |          AS ssq
             |        FROM th, bar)
             |SELECT 32 AS n_groups,
             |       ROUND(CAST(st AS DOUBLE) / nt, 6) AS estimate,
             |       ROUND(SQRT(31.0 * ssq / 32), 6) AS se_jack,
             |       ROUND(ROUND(CAST(st AS DOUBLE) / nt, 6) -
             |             1.96 * ROUND(SQRT(31.0 * ssq / 32), 6), 6) + 0.0 AS ci_lo,
             |       ROUND(ROUND(CAST(st AS DOUBLE) / nt, 6) +
             |             1.96 * ROUND(SQRT(31.0 * ssq / 32), 6), 6) + 0.0 AS ci_hi
             |FROM tot, ssq""".stripMargin)),

    // Stratified mixture sampling — the domain-weighting idiom for
    // training-data mixtures: each source keeps a different deterministic
    // hash-mod fraction (50% / 20% / 5%), so re-runs, retries, and any
    // partitioning reproduce the same mixture exactly. Still a pure
    // pushdown filter: one scan, no shuffle, no RNG state.
    QuerySpec(
      "scan_sample_stratified",
      (s, dir) => {
        val rate = when(col("source").isin("src1", "src2", "src3"), 50)
          .when(col("source").isin("src4", "src5"), 20)
          .otherwise(5)
        t(s, dir, "documents")
          .filter(graft.functions.HashBridge.h32(
            concat_ws("_", col("source"), col("doc_id"))) % 100 < rate)
          .select("doc_id", "source")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source FROM documents
              WHERE ('0x'||SUBSTR(MD5(source||'_'||doc_id::VARCHAR),1,8))::BIGINT % 100 <
                    CASE WHEN source IN ('src1','src2','src3') THEN 50
                         WHEN source IN ('src4','src5') THEN 20
                         ELSE 5 END
              ORDER BY doc_id""")),

    // Per-source cap — the domain-balancing primitive of corpus assembly
    // (no single source may contribute more than k=16 docs): keep the k
    // docs with the smallest engine-bridged hash per source, ties broken
    // by doc_id. Hash order is stable across engines, partitionings, and
    // retries (unlike any RNG), so the kept set is reproducible. The
    // window sort is per-source; the sort-free large-k formulation is
    // the topk_grouped Aggregator pattern (same answer, law-spec'd).
    QuerySpec(
      "scan_sample_capped",
      (s, dir) => {
        val h = graft.functions.HashBridge.h32(
          concat_ws("_", col("source"), col("doc_id")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(h.asc, col("doc_id").asc)
        t(s, dir, "documents")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 16)
          .select("doc_id", "source")
          .orderBy("doc_id")
      },
      Some("""WITH r AS (
                SELECT doc_id, source,
                       ROW_NUMBER() OVER (
                         PARTITION BY source
                         ORDER BY ('0x'||SUBSTR(MD5(source||'_'||doc_id::VARCHAR),1,8))::BIGINT, doc_id) AS rn
                FROM documents)
              SELECT doc_id, source FROM r WHERE rn <= 16 ORDER BY doc_id""")),

    // Deterministic train/valid/test split — the assignment every
    // training corpus needs before anything touches it: hash-mod buckets
    // (80/10/10) on a salted doc key, so membership is a pure function of
    // the document (stable across engines, partitionings, retries, and
    // corpus growth — adding docs never moves an existing doc's split,
    // which a percentile-based split cannot promise). Per-row codegen
    // kernel + one partial-agg shuffle for the census; linear forever.
    QuerySpec(
      "sample_split",
      (s, dir) => {
        val b = graft.functions.HashBridge.h32(
          concat(col("doc_id").cast("string"), lit("_split"))) % 100
        t(s, dir, "documents")
          .withColumn("split",
            when(b < 80, "train").when(b < 90, "valid").otherwise("test"))
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("total_chars"))
          .orderBy("source", "split")
      },
      Some("""WITH b AS (
                SELECT source, n_chars,
                       ('0x'||SUBSTR(MD5(doc_id::VARCHAR||'_split'),1,8))::BIGINT % 100 AS h
                FROM documents)
              SELECT source,
                     CASE WHEN h < 80 THEN 'train'
                          WHEN h < 90 THEN 'valid' ELSE 'test' END AS split,
                     COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS total_chars
              FROM b GROUP BY 1, 2 ORDER BY source, split""")),

    // Temperature-scaled mixture weights — the per-source sampling
    // distribution a multi-source training run draws from: raw counts
    // are flattened by alpha = 0.5 (w ∝ n^alpha, the standard temperature
    // reweighting that keeps small sources from vanishing), normalized,
    // and converted to an expected document budget. One tiny per-source
    // aggregate plus a 1-row broadcast total — the same scalar-broadcast
    // shape as text_tfidf's doc count (declared in the hygiene
    // allowlist); sqrt/rounding mirrored exactly in the oracle.
    QuerySpec(
      "sample_mixture",
      (s, dir) => {
        val perSource = t(s, dir, "documents")
          .groupBy("source").agg(count(lit(1)).as("n"))
          .withColumn("w_raw", sqrt(col("n").cast("double")))
        val total = perSource.agg(sum(col("w_raw")).as("w_sum"))
        perSource.crossJoin(broadcast(total))
          .select(col("source"), col("n"),
            round(col("w_raw") / col("w_sum"), 6).as("weight"),
            round(col("w_raw") / col("w_sum") * 1000, 2).as("expected_docs_per_1k"))
          .orderBy("source")
      },
      Some("""WITH s AS (
                SELECT source, COUNT(*) AS n, SQRT(CAST(COUNT(*) AS DOUBLE)) AS w_raw
                FROM documents GROUP BY source),
              t AS (SELECT SUM(w_raw) AS w_sum FROM s)
              SELECT source, n,
                     ROUND(w_raw / w_sum, 6) AS weight,
                     ROUND(w_raw / w_sum * 1000, 2) AS expected_docs_per_1k
              FROM s, t ORDER BY source""")),

    // ------------------------------------------------- filters / projections
    QuerySpec(
      "filter_notnull", // reference: geo_strategy.rs:96,143 (null-guarded probe)
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate").isNotNull)
          .select("l_orderkey", "l_linenumber", "l_shipdate")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
              WHERE l_shipdate IS NOT NULL ORDER BY l_orderkey, l_linenumber""")),

    QuerySpec(
      "filter_conj", // reference: geo_strategy.rs:385-386 (NOT NULL AND != '')
      (s, dir) =>
        t(s, dir, "events")
          .filter(col("props").isNotNull && col("props") =!= "" && col("event_type") === "purchase")
          .select("event_id", "event_type")
          .orderBy("event_id"),
      Some("""SELECT event_id, event_type FROM events
              WHERE props IS NOT NULL AND props != '' AND event_type = 'purchase'
              ORDER BY event_id""")),

    QuerySpec(
      "filter_pred",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_quantity") >= 45 && col("l_returnflag") === "R")
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              WHERE l_quantity >= 45 AND l_returnflag = 'R'
              ORDER BY l_orderkey, l_linenumber""")),

    QuerySpec(
      "project_exclude", // reference: geo_strategy.rs:271-297 (EXCLUDE + computed col)
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
                     l_extendedprice * (1 - l_discount) AS revenue
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // The SQL entry point (`spark.sql` over temp views) — same Catalyst
    // plans as the DataFrame API, proven by running a TPC-H Q3-shaped
    // query as SQL TEXT and hash-matching it like everything else. The
    // oracle is the same statement (modulo the decimal cast dialect).
    QuerySpec(
      "sql_star_join",
      (s, dir) => {
        Seq("customer", "orders", "lineitem").foreach(n =>
          Tables(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT o_orderkey,
                 ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE), 4) AS revenue,
                 o_orderdate
          FROM customer JOIN orders ON c_custkey = o_custkey
                        JOIN lineitem ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
          GROUP BY o_orderkey, o_orderdate
          ORDER BY revenue DESC, o_orderkey
          LIMIT 20""")
      },
      Some("""SELECT o_orderkey,
                     ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE), 4) AS revenue,
                     o_orderdate
              FROM customer JOIN orders ON c_custkey = o_custkey
                            JOIN lineitem ON l_orderkey = o_orderkey
              WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
              GROUP BY o_orderkey, o_orderdate
              ORDER BY revenue DESC, o_orderkey
              LIMIT 20""")),

    // ----------------------------------------------------------------- joins
    QuerySpec(
      "join_bhj", // star-schema enrich; FIXED-SIZE dims broadcast explicitly
      (s, dir) => {
        val li = t(s, dir, "lineitem").filter(col("l_quantity") <= 2)
        val o  = t(s, dir, "orders")
        // customer gets NO hint: it scales with the corpus (unlike nation/
        // region, fixed 25/5 rows forever) — AQE broadcasts it while it
        // fits and falls back to a shuffle join at 100 TB
        val c  = t(s, dir, "customer")
        val n  = broadcast(t(s, dir, "nation"))
        val r  = broadcast(t(s, dir, "region")).filter(col("r_name") === "EUROPE")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .select(
            col("l_orderkey"), col("l_linenumber"), col("c_custkey"),
            col("n_name"), col("l_extendedprice"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, c_custkey, n_name, l_extendedprice
              FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
              WHERE l_quantity <= 2 AND r_name = 'EUROPE'
              ORDER BY l_orderkey, l_linenumber""")),

    QuerySpec(
      "join_smj", // fact-fact: shuffle on the join key, SMJ
      (s, dir) =>
        t(s, dir, "lineitem").hint("merge")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_orderstatus") === "F")
          .select("l_orderkey", "l_linenumber", "o_totalprice")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, o_totalprice
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_orderstatus = 'F'
              ORDER BY l_orderkey, l_linenumber""")),

    QuerySpec(
      "join_left",
      (s, dir) => {
        val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
        t(s, dir, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderkey"), col("l_linenumber"))
          .orderBy(col("o_orderkey").asc, col("l_linenumber").asc_nulls_first)
      },
      Some("""SELECT o_orderkey, l_linenumber
              FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 49) li
                ON o_orderkey = l_orderkey
              ORDER BY o_orderkey, l_linenumber NULLS FIRST""")),

    QuerySpec(
      "join_full", // full outer: unmatched rows survive from BOTH sides
      (s, dir) => {
        val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
          .select(col("o_custkey"), col("o_orderkey"))
        val richCust = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
          .select(col("c_custkey"))
        richCust.join(bigOrders, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(col("c_custkey"), col("o_orderkey"))
          .orderBy(col("c_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
      },
      Some("""SELECT c_custkey, o_orderkey
              FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) c
              FULL JOIN (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice > 450000) o
                ON c_custkey = o_custkey
              ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""")),

    QuerySpec(
      "join_semi",
      (s, dir) =>
        t(s, dir, "customer")
          .join(
            t(s, dir, "orders").filter(col("o_totalprice") > 400000),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey AND o_totalprice > 400000)
              ORDER BY c_custkey""")),

    QuerySpec(
      "join_anti",
      (s, dir) =>
        t(s, dir, "customer")
          .join(
            t(s, dir, "orders").filter(col("o_totalprice") > 400000),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey AND o_totalprice > 400000)
              ORDER BY c_custkey""")),

    // Range join with an equi component: the user_id equality keys the shuffle,
    // the time-band predicate filters inside each key group — scales as an
    // equi-join, not a cartesian product.
    QuerySpec(
      "join_range",
      (s, dir) => {
        val e = t(s, dir, "events").select("event_id", "user_id", "ts", "event_type")
        val a = e.filter(col("event_type") === "error")
          .select(col("event_id").as("a_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
        val b = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
        a.join(b,
            col("a_user") === col("b_user") &&
              col("b_ts") > col("a_ts") &&
              col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
          .select("a_id", "b_id")
          .orderBy("a_id", "b_id")
      },
      Some(s"""WITH e AS ($EventsUs)
               SELECT a.event_id AS a_id, b.event_id AS b_id
               FROM e a JOIN e b
                 ON a.user_id = b.user_id
                AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
               WHERE a.event_type = 'error'
               ORDER BY a_id, b_id""")),

    // PURE interval containment join — NO equi key anywhere in the
    // predicate, the shape a naive planner can only run as a nested-loop
    // cross product (join_range above always had user_id to hash on;
    // here incident windows must catch EVERY event inside them,
    // cross-user). The binning rewrite restores an equi-join: each
    // window explodes to the ≤4 ten-minute buckets it covers, every
    // event computes its single bucket, the join runs hash-partitioned
    // on bucket, and the exact containment predicate filters inside the
    // matched bucket. Each (window, event) pair meets exactly once —
    // the event lives in ONE bucket — so no dedup pass is needed.
    // At 100 TB: shuffle volume is |events| + 4|windows|, work is
    // per-bucket local, and a hot bucket is an AQE skew-split, never a
    // cross product. All arithmetic in integer microseconds.
    // BinnedRangeJoinSpec proves binned == naive AND that the naive
    // formulation really plans nested-loop while this one does not.
    QuerySpec(
      "join_range_binned",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("event_id"), unix_micros(col("ts")).as("e_us"),
            col("event_type"))
        val w = e.filter(col("event_type") === "error" && col("event_id") % 97 === 0)
          .select(col("event_id").as("w_id"), col("e_us").as("ws_us"),
            (col("e_us") + lit(1800000000L)).as("we_us"))
        val wb = w.withColumn("bucket",
          explode(expr("sequence(ws_us DIV 600000000, (we_us - 1) DIV 600000000)")))
        val eb = e.withColumn("bucket", expr("e_us DIV 600000000"))
        wb.join(eb, "bucket")
          .filter(col("e_us") >= col("ws_us") && col("e_us") < col("we_us"))
          .groupBy("w_id").agg(count(lit(1)).as("n_events"))
          .orderBy("w_id")
      },
      Some(s"""WITH e AS ($EventsUs),
               w AS (SELECT event_id AS w_id, ts AS ws, ts + INTERVAL 30 MINUTE AS we
                     FROM e WHERE event_type = 'error' AND event_id % 97 = 0)
               SELECT w_id, COUNT(*) AS n_events
               FROM w JOIN e ON e.ts >= w.ws AND e.ts < w.we
               GROUP BY w_id ORDER BY w_id""")),

    // The SAME pure interval join written NAIVELY — one range conjunction,
    // no binning in user code — relying on the injected RangeBinRewrite
    // optimizer rule to produce the binned equi-join plan automatically.
    // This is the difference between a pattern users must know and an
    // engine that optimizes the trap away: the DataFrame below is the
    // first thing anyone would write, and the executed plan must still
    // contain NO nested-loop join (RangeBinRewriteSpec asserts it, and
    // the hash oracle pins the result to join_range_binned's).
    QuerySpec(
      "join_range_auto",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("event_id"), unix_micros(col("ts")).as("e_us"),
            col("event_type"))
        val w = e.filter(col("event_type") === "error" && col("event_id") % 97 === 0)
          .select(col("event_id").as("w_id"), col("e_us").as("ws_us"))
        w.join(e,
            col("e_us") >= col("ws_us") &&
              col("e_us") < col("ws_us") + lit(1800000000L))
          .groupBy("w_id").agg(count(lit(1)).as("n_events"))
          .orderBy("w_id")
      },
      Some(s"""WITH e AS ($EventsUs),
               w AS (SELECT event_id AS w_id, ts AS ws, ts + INTERVAL 30 MINUTE AS we
                     FROM e WHERE event_type = 'error' AND event_id % 97 = 0)
               SELECT w_id, COUNT(*) AS n_events
               FROM w JOIN e ON e.ts >= w.ws AND e.ts < w.we
               GROUP BY w_id ORDER BY w_id""")),

    // As-of join via the union+window trick (SURVEY.md §2.3): for each
    // purchase, the latest error by the same user at ts <= purchase ts.
    // Scales: one shuffle on user_id, one sort — no n² candidate pairs.
    QuerySpec(
      "join_asof",
      (s, dir) => {
        val e = t(s, dir, "events")
        val errs = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), lit(0).as("tag"), col("event_id"))
        val purch = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("tag"), col("event_id"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("tag"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        errs.union(purch)
          .withColumn("asof_error_id",
            last(when(col("tag") === 0, col("event_id")), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("event_id").as("purchase_id"), col("asof_error_id"))
          .orderBy("purchase_id")
      },
      Some(s"""WITH e AS ($EventsUs),
               u AS (
                 SELECT user_id, ts, 0 AS tag, event_id FROM e WHERE event_type = 'error'
                 UNION ALL
                 SELECT user_id, ts, 1 AS tag, event_id FROM e WHERE event_type = 'purchase'
               ),
               w AS (
                 SELECT tag, event_id,
                        LAST_VALUE(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
                          OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_error_id
                 FROM u
               )
               SELECT event_id AS purchase_id, asof_error_id
               FROM w WHERE tag = 1 ORDER BY purchase_id""")),

    // As-of join WITH TOLERANCE (pandas merge_asof's `tolerance` /
    // kdb wj semantics): the latest prior error only counts if it
    // happened within the last hour — a stale match is semantically no
    // match (NULL), the contract feature-store point-in-time lookups
    // rely on (a reading from last week must not leak into today's
    // features). Same single-shuffle union+window plan as join_asof with
    // the matched TIMESTAMP carried alongside the id; the tolerance is
    // one more codegen'd comparison, zero extra exchanges.
    QuerySpec(
      "join_asof_tolerance",
      (s, dir) => {
        val e = t(s, dir, "events")
        val errs = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), lit(0).as("tag"), col("event_id"))
        val purch = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("tag"), col("event_id"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("tag"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        errs.union(purch)
          .withColumn("asof_error_id",
            last(when(col("tag") === 0, col("event_id")), ignoreNulls = true).over(w))
          .withColumn("asof_error_ts",
            last(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("event_id").as("purchase_id"),
            when(col("ts").cast("long") - col("asof_error_ts").cast("long") <= 3600,
              col("asof_error_id")).as("asof_error_id"))
          .orderBy("purchase_id")
      },
      Some(s"""WITH e AS ($EventsUs),
               u AS (
                 SELECT user_id, ts, 0 AS tag, event_id FROM e WHERE event_type = 'error'
                 UNION ALL
                 SELECT user_id, ts, 1 AS tag, event_id FROM e WHERE event_type = 'purchase'
               ),
               w AS (
                 SELECT tag, event_id, ts,
                        LAST_VALUE(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
                          OVER win AS asof_error_id,
                        LAST_VALUE(CASE WHEN tag = 0 THEN ts END IGNORE NULLS)
                          OVER win AS asof_error_ts
                 FROM u
                 WINDOW win AS (PARTITION BY user_id ORDER BY ts, tag, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               )
               SELECT event_id AS purchase_id,
                      CASE WHEN EPOCH(ts) - EPOCH(asof_error_ts) <= 3600
                           THEN asof_error_id END AS asof_error_id
               FROM w WHERE tag = 1 ORDER BY purchase_id""")),

    // The SAME as-of semantics through the custom WHOLE-OPERATOR stack
    // (plans/AsofJoin: logical node → injected SparkStrategy → sorted-
    // merge AsofJoinExec): one clustered shuffle on the key, one
    // streaming O(n+m) merge per partition, no window buffer, no union.
    // Shares join_asof's oracle verbatim — two completely different
    // execution paths, one answer. AsofJoinNativeSpec additionally
    // asserts the executed plan actually contains AsofJoinExec.
    QuerySpec(
      "join_asof_native",
      (s, dir) => {
        val e = t(s, dir, "events")
        val purch = graft.plans.AsofJoin.frame(
          e.filter(col("event_type") === "purchase"),
          col("user_id"), unix_micros(col("ts")), col("event_id"))
        val errs = graft.plans.AsofJoin.frame(
          e.filter(col("event_type") === "error"),
          col("user_id"), unix_micros(col("ts")), col("event_id"))
        graft.plans.AsofJoin(purch, errs)
          .select(col("id").as("purchase_id"), col("asof_id").as("asof_error_id"))
          .orderBy("purchase_id")
      },
      Some(s"""WITH e AS ($EventsUs),
               u AS (
                 SELECT user_id, ts, 0 AS tag, event_id FROM e WHERE event_type = 'error'
                 UNION ALL
                 SELECT user_id, ts, 1 AS tag, event_id FROM e WHERE event_type = 'purchase'
               ),
               w AS (
                 SELECT tag, event_id,
                        LAST_VALUE(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
                          OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_error_id
                 FROM u
               )
               SELECT event_id AS purchase_id, asof_error_id
               FROM w WHERE tag = 1 ORDER BY purchase_id""")),

    // Exponentially-weighted moving average — the time-series smoother
    // every monitoring/anomaly stack runs (α = 0.2, warm start 0). The
    // recurrence h ← αx + (1−α)h is order-dependent, so it rides a
    // bounded 20-row window: collect the frame, fold it left-to-right
    // with a higher-order aggregate. Both engines execute the IDENTICAL
    // multiply-add sequence over the identically-ordered frame (ties
    // broken by event_id), so the doubles agree bit-for-bit before the
    // presentation round — no tolerance needed. Scale shape: one
    // exchange+sort on user_id (shared with every other per-user
    // window), constant 20-element state per row, never an unbounded
    // running collection.
    QuerySpec(
      "win_ewma",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
          .rowsBetween(-19, 0)
        t(s, dir, "events")
          .withColumn("lastk", collect_list(col("value")).over(w))
          .withColumn("ewma",
            round(expr("aggregate(lastk, CAST(0.0 AS DOUBLE), (h, x) -> 0.2 * x + 0.8 * h)"), 6))
          .select("user_id", "event_id", "ewma")
          .orderBy("user_id", "event_id")
      },
      Some(s"""WITH e AS ($EventsUs),
               l AS (
                 SELECT user_id, event_id,
                        LIST(value) OVER (PARTITION BY user_id
                                          ORDER BY epoch_ns(ts) // 1000, event_id
                                          ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lastk
                 FROM e)
               SELECT user_id, event_id,
                      ROUND(LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE), lastk),
                                        (h, x) -> 0.2 * x + 0.8 * h), 6) AS ewma
               FROM l ORDER BY user_id, event_id""")),

    // Time-series gap-fill (resampling) — the densification every metrics
    // pipeline runs before charting/anomaly detection: the event stream
    // is bucketed to a 10-minute grid per type, EMPTY buckets are
    // materialized from a generated sequence over the observed time
    // range, and the last observed average carries forward into the gaps
    // (LOCF). Scale shape: the aggregate is a partial-agg shuffle on
    // (type, bucket); the grid is bounded by time-range/resolution ×
    // type-cardinality — independent of event VOLUME, so densification
    // never explodes with data size; the carry-forward is a per-type
    // window over grid rows only. Averages go through the DECIMAL sum
    // policy so fold order can't move the hash.
    QuerySpec(
      "win_gapfill",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("event_type"),
            expr("unix_micros(ts) div 600000000").as("bkt"), col("value"))
        val b = e.groupBy("event_type", "bkt")
          .agg(count(lit(1)).as("n"),
            round(sum(col("value").cast(Dec)).cast("double") / count(lit(1)), 6)
              .as("avg_v"))
        val bounds = e.agg(min(col("bkt")).as("lo"), max(col("bkt")).as("hi"))
        val grid = e.select("event_type").distinct()
          .crossJoin(broadcast(bounds)) // 1 row, always broadcastable
          .select(col("event_type"),
            explode(expr("sequence(lo, hi)")).as("bkt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(b, Seq("event_type", "bkt"), "left")
          .select(col("event_type"), col("bkt"),
            coalesce(col("n"), lit(0L)).as("n"),
            last(col("avg_v"), ignoreNulls = true).over(w).as("filled_v"))
          .orderBy("event_type", "bkt")
      },
      Some("""WITH e AS (
                SELECT event_type, EPOCH_US(CAST(ts AS TIMESTAMP)) // 600000000 AS bkt, value
                FROM events),
              b AS (
                SELECT event_type, bkt, COUNT(*) AS n,
                       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*), 6)
                         AS avg_v
                FROM e GROUP BY 1, 2),
              bounds AS (SELECT MIN(bkt) AS lo, MAX(bkt) AS hi FROM e),
              grid AS (
                SELECT event_type, UNNEST(GENERATE_SERIES(lo, hi)) AS bkt
                FROM (SELECT DISTINCT event_type FROM e), bounds)
              SELECT g.event_type, g.bkt,
                     COALESCE(b.n, 0) AS n,
                     LAST_VALUE(b.avg_v IGNORE NULLS)
                       OVER (PARTITION BY g.event_type ORDER BY g.bkt
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_v
              FROM grid g LEFT JOIN b ON b.event_type = g.event_type AND b.bkt = g.bkt
              ORDER BY g.event_type, g.bkt""")),

    QuerySpec(
      "join_cross", // bounded cross join (both sides tiny dims)
      (s, dir) =>
        t(s, dir, "region").select(col("r_name").as("a_name"))
          .crossJoin(t(s, dir, "region").select(col("r_name").as("b_name")))
          .orderBy("a_name", "b_name"),
      Some("""SELECT a.r_name AS a_name, b.r_name AS b_name
              FROM region a CROSS JOIN region b ORDER BY a_name, b_name""")),

    // Salted join — the manual skew-mitigation shape for a join whose
    // build key distribution has pathological hot keys (the join twin of
    // agg_salted): the probe/fact side gets a row-hash salt in [0, 8),
    // the build/dim side is replicated once per salt, and the join key
    // becomes (key, salt), spreading each hot key's rows over 8 reducers.
    // The result set is identical to the plain join the oracle runs —
    // every fact row still meets exactly one copy of its dim row. At
    // 100 TB the fact-side shuffle is the only one that scales with data
    // volume, and it is uniform by construction; the 8× dim replication
    // is the bounded price. (AQE skew-join handles moderate skew
    // automatically; this is the declarative form for the extreme case.)
    QuerySpec(
      "join_salted",
      (s, dir) => {
        val S = 8
        val fact = t(s, dir, "lineitem")
          .filter(col("l_quantity") >= 45)
          .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(S)))
          .as("f")
        val dim = t(s, dir, "orders")
          .withColumn("salt", explode(array((0 until S).map(lit(_)): _*)))
          .as("d")
        fact.join(dim,
            col("f.l_orderkey") === col("d.o_orderkey") &&
              col("f.salt") === col("d.salt"))
          .select("l_orderkey", "l_linenumber", "o_totalprice")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, o_totalprice
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE l_quantity >= 45
              ORDER BY l_orderkey, l_linenumber""")),

    // Named-WINDOW SQL surface: three window functions sharing ONE
    // declared window. The plan property is the point — Catalyst
    // resolves all three over a single Window operator fed by a single
    // Exchange+Sort on (custkey, date, key), so adding a fourth
    // function to the report costs zero extra shuffles. o_orderkey
    // makes the order total, so the running-sum frame (default RANGE
    // to current row) is tie-free and both engines agree exactly.
    QuerySpec(
      "sql_window_named",
      (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""
          SELECT o_custkey, o_orderkey,
                 CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
                 ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER w AS DOUBLE), 4) AS run_total,
                 LAG(o_orderkey) OVER w AS prev_key
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
          ORDER BY o_custkey, rn""")
      },
      Some("""SELECT o_custkey, o_orderkey,
                     CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
                     ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER w AS DOUBLE), 4) AS run_total,
                     LAG(o_orderkey) OVER w AS prev_key
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
              ORDER BY o_custkey, rn""")),

    // SQL join-strategy hints — the optimizer-override surface a user
    // reaches for when statistics mislead the planner (a "small" build
    // side that explodes after a selective filter misestimates, or a
    // dim the user KNOWS stays broadcastable at 100 TB). The query runs
    // the same star join twice: once hinted SHUFFLE_MERGE (forcing the
    // sort-merge path broadcast would otherwise win) and once hinted
    // BROADCAST — identical results, different physical strategies, so
    // the UNION pins that a hint changes HOW, never WHAT. JoinHintSpec
    // asserts each branch really planned its hinted strategy.
    QuerySpec(
      "sql_join_hints",
      (s, dir) => {
        Seq("orders", "customer")
          .foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT /*+ SHUFFLE_MERGE(customer) */
                 'merge' AS strategy, c_mktsegment, COUNT(*) AS n
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment
          UNION ALL
          SELECT /*+ BROADCAST(customer) */
                 'broadcast' AS strategy, c_mktsegment, COUNT(*) AS n
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment
          ORDER BY strategy, c_mktsegment""")
      },
      Some("""SELECT strategy, c_mktsegment, COUNT(*) AS n
              FROM orders JOIN customer ON o_custkey = c_custkey
              CROSS JOIN (SELECT UNNEST(['merge', 'broadcast']) AS strategy)
              GROUP BY strategy, c_mktsegment
              ORDER BY strategy, c_mktsegment""")),

    // Null-aware anti join — NOT IN under three-valued logic, the
    // classic silent-wrong-answer trap: if the subquery produces even
    // one NULL, `x NOT IN (...)` can never be TRUE (x <> NULL is
    // UNKNOWN), so the nullable branch must return 0 — an engine that
    // planned it as a plain anti join would return thousands of rows
    // that LOOK right. Spark plans this as a broadcast null-aware anti
    // join (single-column NAAJ support); both branches run in one row
    // so the oracle pins the clean count AND the 0 side by side.
    // NullAwareAntiJoinSpec asserts the 0 really comes from an injected
    // NULL, not an empty subquery.
    QuerySpec(
      "join_anti_nullaware",
      (s, dir) => {
        Seq("orders", "customer")
          .foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT
            (SELECT COUNT(*) FROM orders
             WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                     WHERE c_mktsegment = 'BUILDING')) AS anti_clean,
            (SELECT COUNT(*) FROM orders
             WHERE o_custkey NOT IN (SELECT CASE WHEN c_custkey % 10 = 7 THEN NULL
                                                 ELSE c_custkey END
                                     FROM customer)) AS anti_nullable""")
      },
      Some("""SELECT
                (SELECT COUNT(*) FROM orders
                 WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                         WHERE c_mktsegment = 'BUILDING')) AS anti_clean,
                (SELECT COUNT(*) FROM orders
                 WHERE o_custkey NOT IN (SELECT CASE WHEN c_custkey % 10 = 7 THEN NULL
                                                     ELSE c_custkey END
                                         FROM customer)) AS anti_nullable""")),

    // AQE skew-join — the RUNTIME twin of join_salted: the same hot-key
    // problem handled by Spark's adaptive execution instead of a manual
    // rewrite. The fact side funnels half of the orders fact onto one join key
    // (key 0), the dim is a 64-row range — a shape whose naive SMJ puts
    // 50% of the shuffle in one reducer. Under AQE's skew thresholds the
    // runtime splits that partition into advisory-sized chunks, each
    // joined against a duplicated copy of the dim side, restoring
    // parallelism with NO change to the declared plan — the 100 TB
    // mechanism for skew nobody predicted (salting is the declarative
    // form for skew you know about; AQE is the safety net for skew you
    // don't). Executed in an ISOLATED child session (newSession: own
    // SQLConf, shared context+catalog) so the aggressive thresholds the
    // demonstration needs can never leak into other queries; the result
    // is materialized (localCheckpoint) under those confs, so the rows
    // the driver hashes really were produced by the skew-split
    // execution. SkewJoinSpec asserts the executed plan carries
    // isSkew=true partitions and equals the plain-join oracle.
    QuerySpec(
      "join_skew_aqe",
      (s0, dir) => {
        val (df, _) = skewAqeRun(s0, dir)
        df
      },
      Some("""WITH fact AS (
                SELECT CASE WHEN o_orderkey % 2 = 0 THEN 0
                            ELSE o_orderkey % 64 END AS k,
                       o_totalprice,
                       MD5(CAST(o_orderkey AS VARCHAR)) AS payload
                FROM orders),
              dim AS (SELECT i AS k, i * 2 + 1 AS w
                      FROM (SELECT UNNEST(GENERATE_SERIES(0, 63)) AS i))
              SELECT k % 8 AS bucket, COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(o_totalprice * w AS DECIMAL(38,4))) AS DOUBLE), 4) AS wsum,
                     MIN(payload) AS min_digest
              FROM fact JOIN dim USING (k)
              GROUP BY bucket ORDER BY bucket""")),

    // Bloom-pruned join — the runtime-filter shape for a selective dim
    // whose KEY SET is too large to broadcast as a hash relation at
    // 100 TB: a constant 16 KiB bit set built from the dim keys
    // (functions/BloomFilter.scala) rides to every fact-scan task via a
    // 1-row broadcast, and fact rows that cannot join die at the scan —
    // BEFORE the join shuffle moves them. The exact join then removes
    // the Bloom's false positives, so the composed result equals the
    // plain join the oracle runs; the filter only prunes, never decides.
    // (Catalyst's own InjectRuntimeFilter does this for eligible shapes;
    // this is the declarative form a pipeline controls directly.)
    QuerySpec(
      "join_bloom_prune",
      (s, dir) => {
        import graft.functions.{BloomAgg, BloomFilter}
        import s.implicits._
        val dim = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val (h1, h2) = BloomFilter.hashPair(col("c_custkey"))
        val bloom = dim.select(h1.as("h1"), h2.as("h2")).as[(Long, Long)]
          .select(BloomAgg.toColumn.name("bloom")).toDF("bloom")
        t(s, dir, "orders")
          .crossJoin(broadcast(bloom))
          .filter(BloomFilter.mightContain(col("bloom"), col("o_custkey")))
          .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
          .groupBy("o_orderstatus")
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("o_totalprice").cast(Dec)).cast("double"), 4).as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE), 4) AS total
              FROM orders
              WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---------------------------------------------------------- aggregations
    QuerySpec(
      "agg_group", // flagship TPC-H Q1 shape; partial+final hash agg
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            // DECIMAL(38,4) internally (associative, order-insensitive);
            // final output rounds through double so both engines serialize
            // the identical representation (decimal stringification differs).
            round(sum(dec(col("l_quantity"))).cast("double"), 4).as("sum_qty"),
            round(sum(dec(col("l_extendedprice"))).cast("double"), 4).as("sum_base_price"),
            round(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("double"), 4).as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
                     ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE), 4) AS sum_qty,
                     ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE), 4) AS sum_base_price,
                     ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE), 4) AS sum_disc_price,
                     COUNT(*) AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")),

    QuerySpec(
      "agg_minmax", // min/max are order-insensitive on doubles: exact
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"),
            count(lit(1)).as("n"))
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, MIN(o_totalprice) AS min_price,
                     MAX(o_totalprice) AS max_price, COUNT(*) AS n
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    QuerySpec(
      "agg_distinct",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("distinct_parts"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS distinct_parts,
                     COUNT(*) AS n
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // HLL sketch — the estimate itself is engine-specific, so the oracle
    // checks an ACCURACY CONTRACT instead: |approx/exact - 1| ≤ 0.2 per
    // group (default rsd = 0.05 is a standard DEVIATION, so the bound is
    // set at 4σ — tight enough to catch a broken sketch, loose enough
    // that a legitimate estimate can't trip it; the sketch is
    // deterministic for a fixed input). DuckDB's side is the constant.
    QuerySpec(
      "agg_approx_distinct",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg((abs(
            approx_count_distinct(col("l_partkey")).cast("double") /
              countDistinct(col("l_partkey")).cast("double") - 1) <= 0.2)
            .as("within_tolerance"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, TRUE AS within_tolerance
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      // Bench times the sketch fast path alone: the tolerance contract
      // above drags an exact countDistinct through the plan, so timing it
      // would measure the oracle scaffolding, not the HLL aggregate.
      bench = Some((s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
          .orderBy("l_returnflag"))),

    QuerySpec(
      "agg_rollup",
      (s, dir) =>
        t(s, dir, "orders")
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .orderBy(
            col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
              FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
              ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    QuerySpec(
      "agg_cube",
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(round(sum(dec(col("l_quantity"))).cast("double"), 4).as("sum_qty"))
          .orderBy(
            col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
                     ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE), 4) AS sum_qty
              FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
              ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    QuerySpec(
      "agg_grouping_sets", // explicit grouping-set list (distinct from rollup/cube)
      (s, dir) =>
        t(s, dir, "orders")
          .groupingSets(
            Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(round(sum(dec(col("o_totalprice"))).cast("double"), 4).as("sum_price"))
          .orderBy(
            col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority,
                     ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE), 4) AS sum_price
              FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
              ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    QuerySpec(
      "agg_percentile", // exact percentiles (Spark percentile == DuckDB quantile_cont)
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
            round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
            round(expr("percentile(l_extendedprice, 0.25)"), 6).as("price_p25"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                     ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS p50,
                     ROUND(QUANTILE_CONT(l_quantity, 0.9), 6) AS p90,
                     ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 6) AS price_p25
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Quantile sketch (GK/approx_percentile) — like the HLL row, the
    // estimate is engine-specific, so the oracle checks an ACCURACY
    // CONTRACT: the sketch value must land within 5% of the exact
    // quantile per group (GK at accuracy 10000 bounds RANK error at
    // 1e-4; over a dense price distribution that is far inside 5% of
    // VALUE, while a broken sketch blows it immediately). The sketch is
    // the 100 TB path: constant-size mergeable state per partition vs
    // the exact percentile's full-sort per group.
    QuerySpec(
      "agg_approx_quantile",
      (s, dir) => {
        def within(p: Double) =
          (abs(
            percentile_approx(col("l_extendedprice"), lit(p), lit(10000)) /
              expr(s"percentile(l_extendedprice, CAST($p AS DOUBLE))") - 1) <= 0.05)
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(within(0.5).as("p50_within"), within(0.9).as("p90_within"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, TRUE AS p50_within, TRUE AS p90_within
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      // Bench times the sketch alone — the contract drags an exact
      // percentile (full sort per group) through the verified plan.
      bench = Some((s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
            percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000)).as("p90"))
          .orderBy("l_returnflag"))),

    QuerySpec(
      "agg_pivot", // pivot = groupBy + per-bucket conditional aggregation
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(round(sum(dec(col("o_totalprice"))).cast("double"), 4))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
                     ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(38,4)) END) AS DOUBLE), 4) AS "F",
                     ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(38,4)) END) AS DOUBLE), 4) AS "O",
                     ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(38,4)) END) AS DOUBLE), 4) AS "P"
              FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    QuerySpec(
      "agg_unpivot", // wide→long reshape (inverse of pivot)
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
            col("p_retailprice"))
          .unpivot(Array(col("p_partkey")),
            Array(col("p_size"), col("p_retailprice")), "metric", "value")
          .orderBy("p_partkey", "metric"),
      Some("""SELECT p_partkey, metric, value FROM (
                UNPIVOT (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, p_retailprice FROM part)
                ON p_size, p_retailprice INTO NAME metric VALUE value)
              ORDER BY p_partkey, metric""")),

    // Salted two-phase aggregation — the manual skew-mitigation shape for
    // pathological hot keys (l_returnflag has only 3 values over the whole
    // fact table). Phase 1 aggregates (key, salt) so the hot key's rows
    // spread over 16 reducers; phase 2 merges the 16 partials per key.
    // Decimal sums are associative, so the result is bit-identical to the
    // plain GROUP BY the oracle runs. At 100 TB the phase-1 shuffle is the
    // only one that scales with data volume, and it is perfectly balanced.
    QuerySpec(
      "agg_salted",
      (s, dir) => {
        val partial = t(s, dir, "lineitem")
          .withColumn("salt", pmod(hash(col("l_orderkey")), lit(16)))
          .groupBy(col("l_returnflag"), col("salt"))
          .agg(sum(dec(col("l_quantity"))).as("sq"), count(lit(1)).as("cnt"))
        partial.groupBy("l_returnflag")
          .agg(round(sum(col("sq")).cast(Dec).cast("double"), 4).as("sum_qty"),
            sum(col("cnt")).as("n_rows"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
                     ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE), 4) AS sum_qty,
                     COUNT(*) AS n_rows
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // --------------------------------------------------------------- windows
    QuerySpec(
      "win_rank",
      (s, dir) => {
        val byDate = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        val byStatus = Window.partitionBy("o_custkey").orderBy(col("o_orderstatus"))
        t(s, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"),
            row_number().over(byDate).as("rn"),
            rank().over(byStatus).as("rk"),
            dense_rank().over(byStatus).as("drk"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
                     CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate DESC, o_orderkey DESC) AS INT) AS rn,
                     CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS INT) AS rk,
                     CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS INT) AS drk
              FROM orders ORDER BY o_custkey, o_orderkey""")),

    QuerySpec(
      "win_dist", // distribution rankers: ntile / percent_rank / cume_dist
      (s, dir) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(
            col("o_orderkey"), col("o_orderstatus"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus,
                     NTILE(4) OVER w AS quartile,
                     ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
                     ROUND(CUME_DIST() OVER w, 6) AS cume
              FROM orders
              WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
              ORDER BY o_orderkey""")),

    QuerySpec(
      "win_lag",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(
            col("event_id"),
            lag(col("event_id"), 1).over(w).as("prev_event_id"),
            lead(col("event_id"), 1).over(w).as("next_event_id"))
          .orderBy("event_id")
      },
      Some(s"""WITH e AS ($EventsUs)
               SELECT event_id,
                      LAG(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id,
                      LEAD(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_id
               FROM e ORDER BY event_id""")),

    QuerySpec(
      "win_running", // rows frame, exact decimal running sum
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            round(sum(dec(col("o_totalprice"))).over(w).cast("double"), 4).as("running_total"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
                     ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                       OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS running_total
              FROM orders ORDER BY o_orderkey""")),

    QuerySpec(
      "win_range", // range frame keyed on a numeric column
      (s, dir) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_orderkey"))
          .rangeBetween(-100, 0)
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            round(sum(dec(col("o_totalprice"))).over(w).cast("double"), 4).as("band_total"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
                     ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                       OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
                             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS band_total
              FROM orders ORDER BY o_orderkey""")),

    QuerySpec(
      "win_ntile", // quartile assignment; tie-broken to a total order so
      // both engines enumerate rows identically
      (s, dir) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_orderkey"), ntile(4).over(w).as("quartile"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, CAST(NTILE(4) OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
              FROM orders ORDER BY o_orderkey""")),

    QuerySpec(
      "win_topk", // top-3 per group via row_number filter
      (s, dir) => {
        val w = Window.partitionBy("l_orderkey")
          .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("l_orderkey", "rn")
      },
      Some("""SELECT l_orderkey, l_linenumber, CAST(rn AS INT) AS rn FROM (
                SELECT l_orderkey, l_linenumber,
                       ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                          ORDER BY l_extendedprice DESC, l_linenumber) AS rn
                FROM lineitem) WHERE rn <= 3
              ORDER BY l_orderkey, rn""")),

    // Same result as win_topk via the bounded TopKLines Aggregator
    // (functions/TopK.scala): map-side partial top-3 per key, no sort —
    // the formulation that survives groups too large to window-sort.
    QuerySpec(
      "topk_grouped",
      (s, dir) => {
        val topk = udaf(graft.functions.TopKLines,
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Int)]())
        t(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(topk(col("l_extendedprice"), col("l_linenumber")).as("lines"))
          .select(col("l_orderkey"), posexplode(col("lines")).as(Seq("pos", "l_linenumber")))
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("pos") + 1).cast("int").as("rn"))
          .orderBy("l_orderkey", "rn")
      },
      Some("""SELECT l_orderkey, l_linenumber, CAST(rn AS INT) AS rn FROM (
                SELECT l_orderkey, l_linenumber,
                       ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                          ORDER BY l_extendedprice DESC, l_linenumber) AS rn
                FROM lineitem) WHERE rn <= 3
              ORDER BY l_orderkey, rn""")),

    // Analytic value functions over an explicit frame: first/last/nth of
    // the partition's shipdate-ordered rows — per-row window reads with a
    // running frame, not aggregation.
    QuerySpec(
      "win_firstlast",
      (s, dir) => {
        val w = Window.partitionBy("l_orderkey")
          .orderBy(col("l_shipdate"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            first(col("l_linenumber")).over(w).as("first_line"),
            last(col("l_linenumber")).over(w).as("last_line"),
            nth_value(col("l_linenumber"), 2).over(w).as("second_line"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
                     FIRST_VALUE(l_linenumber) OVER w AS first_line,
                     LAST_VALUE(l_linenumber) OVER w AS last_line,
                     NTH_VALUE(l_linenumber, 2) OVER w AS second_line
              FROM lineitem
              WINDOW w AS (PARTITION BY l_orderkey
                           ORDER BY l_shipdate, l_linenumber
                           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              ORDER BY l_orderkey, l_linenumber""")),

    // Batch sessionization via lag + running sum — the window-function
    // formulation of session assignment (vs stream_session's
    // session_window aggregate): a row opens a new session when its gap
    // to the previous event of the same user exceeds 30 min; the running
    // sum of open-flags IS the session ordinal. Two stacked windows over
    // ONE user-partitioned sort — Catalyst plans a single Exchange+Sort
    // for both, so the shuffle profile matches any per-user window op.
    QuerySpec(
      "win_sessionize",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val newSession = when(
          lag(col("ts"), 1).over(w).isNull ||
            unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) >
              1800L * 1000000L, 1L).otherwise(0L)
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            sum(newSession).over(run).as("session_id"))
          .orderBy("user_id", "event_id")
      },
      Some(s"""WITH e AS ($EventsUs),
               g AS (SELECT user_id, event_id, ts,
                            CASE WHEN LAG(ts) OVER w IS NULL
                                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                                 THEN 1 ELSE 0 END AS new_s
                     FROM e
                     WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
               SELECT user_id, event_id,
                      CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
               FROM g ORDER BY user_id, event_id""")),

    // Ordered-sequence (funnel) detection — view → click → purchase per
    // user with STRICT temporal order, the product-analytics pattern
    // engines expose as MATCH_RECOGNIZE / sequence-match. Two stacked
    // running-min windows over the same (user, ts, event_id) sort — a
    // strictly-before frame (UNBOUNDED PRECEDING .. 1 PRECEDING) carries
    // "earliest qualifying prior stage" down the event stream, so the
    // whole match runs in ONE Exchange+Sort per user partition: linear
    // at 100 TB, no self-joins, no per-user collect. Ties on ts break
    // on event_id so the frame is deterministic on both engines.
    QuerySpec(
      "win_funnel",
      (s, dir) => {
        val before = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, dir, "events")
          .withColumn("v_ts",
            min(when(col("event_type") === "view", col("ts"))).over(before))
          .withColumn("c_ts",
            min(when(col("event_type") === "click" && col("v_ts") < col("ts"),
              col("ts"))).over(before))
          .withColumn("done",
            col("event_type") === "purchase" && col("c_ts") < col("ts"))
          .groupBy("user_id")
          .agg(
            count(when(col("done"), lit(1))).as("n_completions"),
            min(when(col("done"), col("ts"))).as("first_completion"))
          .withColumn("converted", col("n_completions") > 0)
          .orderBy("user_id")
      },
      Some(s"""WITH e AS ($EventsUs),
               x AS (SELECT user_id, event_id, ts, event_type,
                            MIN(CASE WHEN event_type = 'view' THEN ts END) OVER w AS v_ts
                     FROM e
                     WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
               y AS (SELECT user_id, event_id, ts, event_type, v_ts,
                            MIN(CASE WHEN event_type = 'click' AND v_ts < ts THEN ts END)
                              OVER w AS c_ts
                     FROM x
                     WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
               SELECT user_id,
                      COUNT(CASE WHEN event_type = 'purchase' AND c_ts < ts THEN 1 END) AS n_completions,
                      MIN(CASE WHEN event_type = 'purchase' AND c_ts < ts THEN ts END) AS first_completion,
                      COUNT(CASE WHEN event_type = 'purchase' AND c_ts < ts THEN 1 END) > 0 AS converted
               FROM y GROUP BY user_id ORDER BY user_id""")),

    // Cohort retention matrix — users bucketed by first-seen week, then
    // counted per (cohort, weeks-since-cohort) activity cell: the other
    // canonical product-analytics rollup next to the funnel. Three
    // partial-aggregating shuffles on compact keys (user, user×week,
    // cohort×offset), all linear; the week offset is exact integer
    // arithmetic on epoch micros (both engines truncate weeks to Monday
    // 00:00 UTC, and every difference is an exact multiple of a week).
    QuerySpec(
      "agg_retention",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("user_id"), col("ts"))
        val cohort = e.groupBy("user_id")
          .agg(date_trunc("week", min(col("ts"))).as("cw"))
        val active = e
          .select(col("user_id"), date_trunc("week", col("ts")).as("aw"))
          .distinct()
        active.join(cohort, "user_id")
          .withColumn("week_offset",
            ((unix_micros(col("aw")) - unix_micros(col("cw"))) / 604800000000L)
              .cast("long"))
          .groupBy(col("cw").as("cohort_week"), col("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
              f AS (SELECT user_id,
                           CAST(DATE_TRUNC('week', MIN(ts)) AS TIMESTAMP) AS cw
                    FROM e GROUP BY user_id),
              a AS (SELECT DISTINCT user_id,
                           CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS aw
                    FROM e)
              SELECT cw AS cohort_week,
                     CAST((epoch_us(aw) - epoch_us(cw)) / 604800000000 AS BIGINT)
                       AS week_offset,
                     COUNT(DISTINCT user_id) AS n_users
              FROM a JOIN f USING (user_id)
              GROUP BY cohort_week, week_offset
              ORDER BY cohort_week, week_offset""")),

    // LISTAGG (SQL:2016, Spark 4) — ordered string aggregation with an
    // explicit WITHIN GROUP order, the standard's answer to the
    // collect_list nondeterminism agg_collect works around by hand.
    // DuckDB's equivalent is STRING_AGG(... ORDER BY) — one of the few
    // places the two dialects name the same aggregate differently, so
    // the oracle text intentionally diverges while the semantics pin
    // each other.
    QuerySpec(
      "agg_listagg",
      (s, dir) => {
        Tables(s, dir, "nation").createOrReplaceTempView("nation")
        s.sql("""SELECT n_regionkey,
                        listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS members
                 FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")
      },
      Some("""SELECT n_regionkey,
                     STRING_AGG(n_name, ',' ORDER BY n_name) AS members
              FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // Collection aggregates with a determinism policy: collect_list's
    // accumulation order is partitioning-dependent, so the result is
    // sorted before serialization (array_sort + array_join) — the only
    // way a collected aggregate can ever hash-match across engines or
    // even across two Spark runs.
    QuerySpec(
      "agg_collect",
      (s, dir) =>
        t(s, dir, "nation")
          .groupBy("n_regionkey")
          .agg(
            array_join(array_sort(collect_list(col("n_name"))), ",").as("names"),
            count(lit(1)).as("n"))
          .orderBy("n_regionkey"),
      Some("""SELECT n_regionkey,
                     ARRAY_TO_STRING(LIST_SORT(LIST(n_name)), ',') AS names,
                     COUNT(*) AS n
              FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // Grouped mode with a DETERMINISTIC tie-break: max(struct(n, v))
    // picks the highest count, then the lexicographically greatest value
    // — a plain partial-aggregating max over (count, value) pairs, no
    // window sort. (Built-in `mode()` breaks ties arbitrarily, which can
    // never hash-match an oracle.)
    QuerySpec(
      "agg_mode",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"))
          .groupBy("l_returnflag")
          .agg(max(struct(col("n"), col("l_linestatus"))).as("m"))
          .select(col("l_returnflag"),
            col("m.l_linestatus").as("mode_status"), col("m.n").as("n"))
          .orderBy("l_returnflag"),
      Some("""WITH c AS (SELECT l_returnflag, l_linestatus, COUNT(*) AS n
                         FROM lineitem GROUP BY 1, 2),
              r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, l_linestatus DESC) AS rn
                    FROM c)
              SELECT l_returnflag, l_linestatus AS mode_status, n
              FROM r WHERE rn = 1 ORDER BY l_returnflag""")),

    // Statistical aggregates (corr / covariance / stddev): rounded to 6
    // decimals on both engines — these are genuinely float-order-sensitive,
    // but at 6dp over ~thousands of rows the partial-agg error (~1e-10
    // relative) cannot reach the rounding boundary.
    QuerySpec(
      "agg_stats",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            // `+ 0.0` collapses IEEE -0.0 to +0.0 on the negative-capable
            // columns — a corr/covar in (-5e-7, 0) rounds to negative zero
            // under DuckDB's ROUND but not Spark's BigDecimal round
            (round(corr(col("l_quantity"), col("l_extendedprice")), 6) + lit(0.0)).as("corr_qp"),
            (round(covar_samp(col("l_quantity"), col("l_discount")), 6) + lit(0.0)).as("cov_qd"),
            round(stddev_samp(col("l_extendedprice")), 6).as("sd_price"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                     ROUND(CORR(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qp,
                     ROUND(COVAR_SAMP(l_quantity, l_discount), 6) + 0.0 AS cov_qd,
                     ROUND(STDDEV_SAMP(l_extendedprice), 6) AS sd_price
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Boolean aggregates: per-user event predicates folded with AND/OR.
    QuerySpec(
      "agg_bool",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("user_id")
          .agg(
            bool_and(col("value") > 10).as("all_gt10"),
            bool_or(col("event_type") === "purchase").as("any_purchase"),
            count(lit(1)).as("n"))
          .orderBy("user_id"),
      Some("""SELECT user_id,
                     BOOL_AND(value > 10) AS all_gt10,
                     BOOL_OR(event_type = 'purchase') AS any_purchase,
                     COUNT(*) AS n
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // Conditional scalar family: coalesce / nullif / greatest / least /
    // case — the null-plumbing every ETL expression tree leans on.
    QuerySpec(
      "fn_cond",
      (s, dir) =>
        t(s, dir, "events")
          .select(
            col("event_id"),
            coalesce(nullif(col("props"), lit("")), lit("{}")).as("props_or_empty"),
            greatest(col("value"), lit(0.0)).as("value_floor0"),
            least(col("value"), lit(100.0)).as("value_cap100"),
            when(col("event_type") === "purchase", col("value"))
              .otherwise(lit(0.0)).as("purchase_value"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
                     COALESCE(NULLIF(props, ''), '{}') AS props_or_empty,
                     GREATEST(value, 0.0) AS value_floor0,
                     LEAST(value, 100.0) AS value_cap100,
                     CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS purchase_value
              FROM events ORDER BY event_id""")),

    // Embedded-record parsing kernels — from_xml (Spark 4) and from_csv
    // over STRING COLUMNS, the shape for corpora whose rows carry
    // serialized sub-records (an XML sitemap entry, a CSV-packed
    // feature list) that never merit their own files. Payloads are
    // synthesized from nation so the oracle recomputes every extracted
    // field from the flat source — a parser that drops, re-orders, or
    // mistypes a field breaks the hash. Per-row codegen'd projections,
    // no shuffle beyond the final sort.
    QuerySpec(
      "fn_xml_csv_embedded",
      (s, dir) =>
        t(s, dir, "nation")
          .select(col("n_nationkey"),
            concat(lit("<rec><name>"), col("n_name"), lit("</name><region>"),
              col("n_regionkey"), lit("</region></rec>")).as("xml"),
            concat(col("n_name"), lit(";"), col("n_regionkey")).as("csvline"))
          .select(col("n_nationkey"),
            expr("from_xml(xml, 'name STRING, region INT')").as("x"),
            expr("from_csv(csvline, 'name STRING, region INT', map('sep', ';'))").as("c"))
          .select(col("n_nationkey"),
            col("x.name").as("xml_name"), col("x.region").as("xml_region"),
            col("c.name").as("csv_name"), col("c.region").as("csv_region"))
          .orderBy("n_nationkey"),
      Some("""SELECT n_nationkey,
                     n_name AS xml_name, n_regionkey AS xml_region,
                     n_name AS csv_name, n_regionkey AS csv_region
              FROM nation ORDER BY n_nationkey""")),

    // SQL-text CTAS — the reference's core staging pattern
    // (core_processor.rs:391-428: every ingested file becomes a
    // CREATE TABLE ... AS SELECT over the raw read). The catalog table
    // is parquet in the session warehouse, name keyed on sf-dir + pid
    // (the bucketedName discipline) so concurrent Verify/Bench runs
    // can't race each other's DDL; the follow-up aggregate proves the
    // staged table serves queries. ANALYZE TABLE then collects CBO
    // statistics over it — the stats plumbing CboStatsSpec asserts —
    // because a staging table without statistics leaves every later
    // join size-estimate to guesswork at 100 TB.
    QuerySpec(
      "sql_ctas",
      (s, dir) => ctasStage(s, dir, dropAfter = true),
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE), 4) AS total
              FROM orders WHERE o_totalprice > 1000
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Schema-directed JSON parsing with corrupt-record handling — the
    // ingest-robustness twin of fn_json: real corpora carry truncated
    // and malformed payloads, and the pipeline must QUARANTINE them
    // (parse → NULL → count) rather than fail the job. Corruption is
    // injected deterministically (every 50th record is truncated
    // mid-token); from_json under an explicit schema routes those rows
    // into the declared _corrupt_record column (Spark's PERMISSIVE
    // quarantine contract) exactly where DuckDB's json_valid says so — the
    // two engines' notions of "broken JSON" are pinned equal. Per-row
    // codegen kernel + one 2-row aggregate; linear at any scale.
    QuerySpec(
      "fn_json_corrupt",
      (s, dir) =>
        t(s, dir, "events")
          .filter(col("props").isNotNull && col("props") =!= "")
          .select(col("event_id"),
            when(col("event_id") % 50 === 0, substring(col("props"), 1, 3))
              .otherwise(col("props")).as("payload"))
          .select(col("event_id"),
            from_json(col("payload"), "k BIGINT, _corrupt_record STRING",
              Map.empty[String, String]).as("parsed"))
          .select(col("event_id"),
            col("parsed.k").as("k"),
            col("parsed._corrupt_record").isNotNull.as("is_corrupt"))
          .groupBy("is_corrupt")
          .agg(count(lit(1)).as("n"),
            sum(coalesce(col("k"), lit(0L))).as("sum_k"))
          .orderBy("is_corrupt"),
      Some("""WITH payload AS (
                SELECT event_id,
                       CASE WHEN event_id % 50 = 0 THEN SUBSTRING(props, 1, 3)
                            ELSE props END AS payload
                FROM events
                WHERE props IS NOT NULL AND props != ''),
              parsed AS (
                SELECT event_id,
                       CASE WHEN json_valid(payload)
                            THEN CAST(payload->>'k' AS BIGINT) END AS k,
                       NOT json_valid(payload) AS is_corrupt
                FROM payload)
              SELECT is_corrupt, COUNT(*) AS n,
                     CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS sum_k
              FROM parsed GROUP BY is_corrupt ORDER BY is_corrupt""")),

    // Empty-input aggregate semantics — the SQL-standard trap pinned:
    // a GLOBAL aggregate over zero rows returns ONE row (COUNT 0,
    // SUM NULL), while a GROUPED aggregate over zero rows returns ZERO
    // rows. Engines that get either wrong corrupt every downstream
    // LEFT JOIN and COALESCE silently; both behaviors are asserted in
    // one output with the grouped branch's emptiness witnessed by its
    // COUNT appearing only via the global twin.
    QuerySpec(
      "agg_empty_semantics",
      (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""
          SELECT 'global' AS branch, COUNT(*) AS n, SUM(o_totalprice) AS s
          FROM orders WHERE o_orderkey < 0
          UNION ALL
          SELECT 'grouped' AS branch, COUNT(*) AS n, SUM(o_totalprice) AS s
          FROM orders WHERE o_orderkey < 0
          GROUP BY o_orderstatus
          ORDER BY branch""")
      },
      Some("""SELECT 'global' AS branch, COUNT(*) AS n, SUM(o_totalprice) AS s
              FROM orders WHERE o_orderkey < 0
              UNION ALL
              SELECT 'grouped' AS branch, COUNT(*) AS n, SUM(o_totalprice) AS s
              FROM orders WHERE o_orderkey < 0
              GROUP BY o_orderstatus
              ORDER BY branch""")),

    // Semi-structured VARIANT processing (Spark 4's open-ended JSON
    // type — the web-crawl-metadata shape: per-record attributes whose
    // schema is unknown at write time). parse_json builds the binary
    // variant ONCE per row; typed paths come out via variant_get (a
    // binary-encoded path walk, no re-parse per field — the reason
    // variant beats get_json_object when many fields extract from one
    // payload), absent paths via try_variant_get → NULL instead of an
    // error, and schema_of_variant introspects the per-row shape. The
    // oracle rebuilds the same answers from DuckDB's JSON kernel. Pure
    // per-row codegen'd projection — linear at any scale.
    QuerySpec(
      "fn_variant",
      (s, dir) =>
        t(s, dir, "events")
          .filter(col("props").isNotNull && col("props") =!= "")
          .select(
            col("event_id"),
            expr("variant_get(parse_json(props), '$.k', 'int')").as("k_int"),
            expr("try_variant_get(parse_json(props), '$.missing', 'string')").as("k_missing"),
            expr("schema_of_variant(parse_json(props))").as("k_schema"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
                     CAST(props->>'k' AS INT) AS k_int,
                     CAST(NULL AS VARCHAR) AS k_missing,
                     'OBJECT<k: BIGINT>' AS k_schema
              FROM events
              WHERE props IS NOT NULL AND props != ''
              ORDER BY event_id""")),

    // SQL pipe syntax (Spark 4's |> operator chain — the linear query
    // form): the SAME filter → aggregate → order pipeline a reference
    // user writes as nested SQL, expressed as stages. Catalyst lowers
    // the pipe chain to the identical logical plan as the nested form
    // (the oracle IS that nested form), so the surface costs nothing —
    // one scan, partial-agg on a 3-row group key, broadcastless.
    QuerySpec(
      "sql_pipe_syntax",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          FROM lineitem
          |> WHERE l_quantity > 45
          |> AGGREGATE COUNT(*) AS n,
                       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE), 4) AS rev
             GROUP BY l_returnflag
          |> ORDER BY l_returnflag""")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE), 4) AS rev
              FROM lineitem
              WHERE l_quantity > 45
              GROUP BY l_returnflag
              ORDER BY l_returnflag""")),

    // SQL-language scalar UDF (Spark 4 CREATE FUNCTION ... RETURN expr):
    // the user-extension surface that stays INSIDE codegen — unlike a
    // Scala/Python UDF, a SQL UDF is inlined into the plan at analysis
    // time (the executed plan contains only the expanded expression, no
    // black-box call), so Catalyst still pushes/prunes/vectorizes
    // through it and the 100 TB cost is identical to writing the
    // expression inline. The oracle IS that inline form — proving the
    // inlining semantics, not just the rows. A pid-free temp function
    // name is safe: TEMPORARY functions are session-scoped, they cannot
    // collide across JVMs the way catalog tables can.
    QuerySpec(
      "sql_udf_scalar",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_margin(p DOUBLE)
                 RETURNS DOUBLE RETURN p * 7 - p / 2""")
        s.sql("""SELECT o_orderstatus, COUNT(*) AS n,
                        ROUND(CAST(SUM(CAST(graft_margin(o_totalprice) AS DECIMAL(38,4))) AS DOUBLE), 4) AS margin
                 FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(o_totalprice * 7 - o_totalprice / 2 AS DECIMAL(38,4))) AS DOUBLE), 4) AS margin
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Parameterized SQL with named parameter markers — the
    // injection-safe templating surface. The reference interpolates
    // user-controlled names/values into SQL strings by hand
    // (core_processor.rs:147-149 quotes identifiers but values ride
    // inline); named markers send VALUES out-of-band of the SQL text,
    // so a hostile string can never terminate the statement. Same plan
    // as the literal form — markers bind at parse time, pushdown intact.
    QuerySpec(
      "sql_params",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql(
          """SELECT l_returnflag, COUNT(*) AS n,
                    ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE), 4) AS rev
             FROM lineitem
             WHERE l_quantity > :qmin AND l_shipdate >= :d0
             GROUP BY l_returnflag ORDER BY l_returnflag""",
          Map("qmin" -> 45, "d0" -> "1994-01-01"))
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE), 4) AS rev
              FROM lineitem
              WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1994-01-01'
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---------------------------------------------------- sort / limit / topk
    QuerySpec(
      "sort",
      (s, dir) =>
        t(s, dir, "orders")
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey")),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey""")),

    QuerySpec(
      "topk", // TakeOrderedAndProject: no global sort materialized
      (s, dir) =>
        t(s, dir, "orders")
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    QuerySpec(
      "limit", // reference: core_processor.rs:432 (LIMIT 10 schema peek)
      (s, dir) =>
        t(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus")
          .orderBy("o_orderkey")
          .limit(10),
      Some("SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 10")),

    QuerySpec(
      "limit_offset", // pagination: LIMIT + OFFSET over a total order
      (s, dir) =>
        t(s, dir, "orders")
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
          .offset(20)
          .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_orderkey LIMIT 10 OFFSET 20""")),

    // ----------------------------------------------------------------- setops
    QuerySpec(
      "set_union",
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .union(
            t(s, dir, "customer").filter(col("c_acctbal") > 9000).select("c_custkey"))
          .distinct()
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
              UNION
              SELECT c_custkey FROM customer WHERE c_acctbal > 9000
              ORDER BY c_custkey""")),

    QuerySpec(
      "set_intersect",
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .intersect(
            t(s, dir, "customer").filter(col("c_acctbal") > 5000).select("c_custkey"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
              INTERSECT
              SELECT c_custkey FROM customer WHERE c_acctbal > 5000
              ORDER BY c_custkey""")),

    // Multiset (ALL) set ops — the bag semantics DISTINCT set ops
    // silently destroy: INTERSECT ALL keeps min(m, n) copies of each
    // row, EXCEPT ALL subtracts occurrence counts. The probe side is
    // lineitem return flags per order (genuinely multi-valued), so the
    // DISTINCT twin would give different answers — the duplicate
    // handling IS what's under test. Spark plans both as specialized
    // hash aggregates over (row, count) — one shuffle on the row key,
    // never a join.
    QuerySpec(
      "set_intersect_all",
      (s, dir) =>
        t(s, dir, "lineitem").filter(col("l_quantity") >= 25)
          .select(col("l_orderkey"), col("l_returnflag"))
          .intersectAll(
            t(s, dir, "lineitem").filter(col("l_extendedprice") > 3000)
              .select(col("l_orderkey"), col("l_returnflag")))
          .orderBy("l_orderkey", "l_returnflag"),
      Some("""SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_quantity >= 25
              INTERSECT ALL
              SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_extendedprice > 3000
              ORDER BY l_orderkey, l_returnflag""")),

    QuerySpec(
      "set_except_all",
      (s, dir) =>
        t(s, dir, "lineitem").filter(col("l_quantity") >= 25)
          .select(col("l_orderkey"), col("l_returnflag"))
          .exceptAll(
            t(s, dir, "lineitem").filter(col("l_extendedprice") > 3000)
              .select(col("l_orderkey"), col("l_returnflag")))
          .orderBy("l_orderkey", "l_returnflag"),
      Some("""SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_quantity >= 25
              EXCEPT ALL
              SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_extendedprice > 3000
              ORDER BY l_orderkey, l_returnflag""")),

    QuerySpec(
      "set_except",
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .except(
            t(s, dir, "customer").filter(col("c_acctbal") > 5000).select("c_custkey"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
              EXCEPT
              SELECT c_custkey FROM customer WHERE c_acctbal > 5000
              ORDER BY c_custkey""")),

    // --------------------------------------------------- scalar fn families
    QuerySpec(
      "fn_string",
      (s, dir) =>
        t(s, dir, "customer")
          .select(
            col("c_custkey"),
            lower(col("c_mktsegment")).as("seg_lower"),
            substring(col("c_name"), 1, 8).as("name_prefix"),
            regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
            levenshtein(col("c_mktsegment"), lit("BUILDING")).as("seg_dist"),
            length(col("c_name")).as("name_len"),
            concat(col("c_mktsegment"), lit("_"), col("c_name")).as("seg_name"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
                     LOWER(c_mktsegment) AS seg_lower,
                     SUBSTR(c_name, 1, 8) AS name_prefix,
                     REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits,
                     CAST(LEVENSHTEIN(c_mktsegment, 'BUILDING') AS INT) AS seg_dist,
                     CAST(LENGTH(c_name) AS INT) AS name_len,
                     c_mktsegment || '_' || c_name AS seg_name
              FROM customer ORDER BY c_custkey""")),

    QuerySpec(
      "fn_date",
      (s, dir) =>
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                     CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
                     CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
                     CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
                     DATE_TRUNC('month', o_orderdate) AS month_start,
                     CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since
              FROM orders ORDER BY o_orderkey""")),

    QuerySpec(
      "fn_json", // events.props is JSON text like {"k": 87}
      (s, dir) =>
        t(s, dir, "events")
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
          .orderBy("event_id"),
      Some("""SELECT event_id, CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k
              FROM events ORDER BY event_id""")),

    QuerySpec(
      "fn_array",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            size(split(trim(col("text")), "\\s+")).as("n_tokens"),
            element_at(split(trim(col("text")), "\\s+"), 1).as("first_token"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS INT) AS n_tokens,
                     STRING_SPLIT_REGEX(TRIM(text), '\s+')[1] AS first_token
              FROM documents ORDER BY doc_id""")),

    QuerySpec(
      "fn_struct", // struct build/access + map lookup survive the round-trip
      (s, dir) =>
        t(s, dir, "customer")
          .select(col("c_custkey"),
            struct(col("c_name").as("name"), col("c_acctbal").as("bal")).as("info"),
            map_from_arrays(
              array(lit("seg")), array(col("c_mktsegment"))).as("attrs"))
          .select(col("c_custkey"),
            col("info.name").as("name"),
            col("info.bal").as("bal"),
            element_at(col("attrs"), "seg").as("segment"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, s.info.name AS name, s.info.bal AS bal,
                     MAP(['seg'], [c_mktsegment])['seg'][1] AS segment
              FROM (SELECT c_custkey, c_mktsegment,
                           {'name': c_name, 'bal': c_acctbal} AS info
                    FROM customer) s
              ORDER BY c_custkey""")),

    QuerySpec(
      "fn_math", // libm last-ulp differences absorbed by round(…, 6)
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
            round(log(col("l_extendedprice")), 6).as("ln_price"),
            abs(col("l_discount") - 0.05).as("abs_disc"),
            floor(col("l_quantity")).as("qty_floor"),
            ceil(col("l_quantity")).as("qty_ceil"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
                     ROUND(SQRT(l_extendedprice), 6) AS sqrt_price,
                     ROUND(LN(l_extendedprice), 6) AS ln_price,
                     ABS(l_discount - 0.05) AS abs_disc,
                     CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
                     CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // Bitwise family over integer keys — exact on both engines.
    QuerySpec(
      "fn_bitwise",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_orderkey").bitwiseAND(255)).as("and8"),
            (col("l_orderkey").bitwiseOR(col("l_linenumber"))).as("or_ln"),
            (col("l_orderkey").bitwiseXOR(col("l_partkey"))).as("xor_pk"),
            shiftleft(col("l_linenumber"), 4).cast("long").as("shl4"),
            shiftright(col("l_orderkey"), 2).as("shr2"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
                     l_orderkey & 255 AS and8,
                     l_orderkey | l_linenumber AS or_ln,
                     xor(l_orderkey, l_partkey) AS xor_pk,
                     CAST(l_linenumber::BIGINT << 4 AS BIGINT) AS shl4,
                     l_orderkey >> 2 AS shr2
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // TPC-H Q5 shape: the canonical multi-dimension star join — region →
    // nation → (customer ⋈ supplier on nationkey) → orders → lineitem.
    // This is the join-reorder stress query: Catalyst must push the
    // region filter through nation BEFORE the fact joins, broadcast the
    // fixed-size dims (region 5 rows, nation 25 — forever), and leave
    // the two fact joins (orders, lineitem) as shuffle joins keyed on
    // order/supp keys. At 100 TB exactly that plan survives: dims stay
    // broadcast, facts co-shuffle, and the c_nationkey = s_nationkey
    // constraint is an attribute filter on the joined row, never a
    // join-order trap. Decimal-internal sum, double-rounded final.
    QuerySpec(
      "sql_tpch_q5",
      (s, dir) => {
        Seq("region", "nation", "customer", "supplier", "orders", "lineitem")
          .foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT n_name,
                 ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE), 4) AS revenue
          FROM region
            JOIN nation   ON n_regionkey = r_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders   ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
          WHERE r_name IN ('EUROPE', 'ASIA')
          GROUP BY n_name
          ORDER BY revenue DESC, n_name""")
      },
      Some("""SELECT n_name,
                     ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE), 4) AS revenue
              FROM region
                JOIN nation   ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders   ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
              WHERE r_name IN ('EUROPE', 'ASIA')
              GROUP BY n_name
              ORDER BY revenue DESC, n_name""")),

    // TPC-H Q7 shape (volume shipping): the SAME dimension joined twice
    // under DIFFERENT roles — nation as supplier country AND as customer
    // country, with a symmetric country-pair predicate. The planner test
    // is the double broadcast: both nation aliases are 25-row dims, so
    // both sides of the pair predicate resolve as broadcast hash joins
    // and the pair filter prunes facts before the orderkey shuffle; the
    // per-year rollup rides the partial-agg path on the 2×2×years
    // result grid.
    QuerySpec(
      "sql_tpch_q7",
      (s, dir) => {
        Seq("nation", "customer", "supplier", "orders", "lineitem")
          .foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
                 ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE), 4) AS revenue
          FROM supplier
            JOIN lineitem  ON s_suppkey = l_suppkey
            JOIN orders    ON o_orderkey = l_orderkey
            JOIN customer  ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
          GROUP BY supp_nation, cust_nation, l_year
          ORDER BY supp_nation, cust_nation, l_year""")
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
                     ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE), 4) AS revenue
              FROM supplier
                JOIN lineitem  ON s_suppkey = l_suppkey
                JOIN orders    ON o_orderkey = l_orderkey
                JOIN customer  ON c_custkey = o_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                 OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
              GROUP BY supp_nation, cust_nation, l_year
              ORDER BY supp_nation, cust_nation, l_year""")),

    // TPC-H Q18 shape (large-volume orders): join against an AGGREGATED
    // subquery — the semi-join-on-derived-keys pattern. The HAVING
    // subquery reduces lineitem to a small key set FIRST (decimal sum, so
    // the >300 boundary can't wobble with partial-agg order); at 100 TB
    // that derived key set is tiny relative to the facts, so AQE turns
    // the IN-join into a broadcast semi-join and the only full shuffles
    // left are the o/l fact joins on orderkey — which co-shuffle on the
    // same key and reuse the exchange. Catalyst plans the IN as a
    // LeftSemi natively; no manual rewrite needed.
    QuerySpec(
      "sql_tpch_q18",
      (s, dir) => {
        Seq("customer", "orders", "lineitem")
          .foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                 ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE), 4) AS sum_qty
          FROM customer
            JOIN orders   ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
          WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(38,4))) > 300)
          GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 100""")
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                     ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE), 4) AS sum_qty
              FROM customer
                JOIN orders   ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
              WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem
                GROUP BY l_orderkey
                HAVING SUM(CAST(l_quantity AS DECIMAL(38,4))) > 300)
              GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
              ORDER BY o_totalprice DESC, o_orderkey
              LIMIT 100""")),

    // TPC-H Q4 shape: correlated EXISTS with a CROSS-TABLE predicate
    // (l_shipdate > o_orderdate references the outer row inside the
    // subquery). This exercises Catalyst's subquery decorrelation — the
    // EXISTS rewrites to a LeftSemi join on l_orderkey with the
    // correlated comparison carried as a join condition, so at 100 TB
    // both facts co-shuffle once on orderkey and the probe side is
    // filtered BEFORE the shuffle by the pushable l_quantity gate. No
    // per-row subquery execution exists anywhere in the plan.
    QuerySpec(
      "sql_exists_corr",
      (s, dir) => {
        Seq("orders", "lineitem")
          .foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT o_orderpriority, COUNT(*) AS n_orders
          FROM orders
          WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate
              AND l_quantity > 30)
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_orders
              FROM orders
              WHERE EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate
                  AND l_quantity > 30)
              GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    // TPC-H Q17 shape: CORRELATED SCALAR subquery — each lineitem row
    // compares against an aggregate over its own part's rows. Catalyst's
    // RewriteCorrelatedScalarSubquery turns the per-row scalar into ONE
    // aggregate over lineitem grouped by l_partkey plus a join back on
    // the same key — so the "nested loop" a naive engine would run
    // becomes two co-shuffled passes over the fact. The threshold is
    // double arithmetic mirrored operation-for-operation on both engines
    // (exact DECIMAL sum → double divide → *0.2), so the boundary
    // decisions agree exactly and the aggregated output hash-matches.
    QuerySpec(
      "sql_scalar_corr",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)/7.0, 4) AS avg_yearly,
                 COUNT(*) AS n_rows
          FROM lineitem l1
          WHERE l_quantity < (
            SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*))
            FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""")
      },
      Some("""SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)/7.0, 4) AS avg_yearly,
                     COUNT(*) AS n_rows
              FROM lineitem l1
              WHERE l_quantity < (
                SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*))
                FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""")),

    // TPC-H Q22 shape: UNCORRELATED scalar subquery (global average as a
    // filter threshold — planned once as a 1-row subquery result and
    // folded into the scan predicate) combined with NOT EXISTS (anti
    // decorrelation: LeftAnti on orderkey against the selective returned-
    // lineitem probe). The two subquery classes land in the SAME plan:
    // the scalar costs one tiny pre-pass, the anti join co-shuffles with
    // the probe side already filtered to l_returnflag = 'R' before the
    // exchange. "High-value orders where nothing was returned."
    QuerySpec(
      "sql_notexists_scalar",
      (s, dir) => {
        Seq("orders", "lineitem")
          .foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT o_orderpriority, COUNT(*) AS n_orders,
                 ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE), 4) AS total_price
          FROM orders
          WHERE o_totalprice > (
              SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)/COUNT(*) FROM orders)
            AND NOT EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_orders,
                     ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE), 4) AS total_price
              FROM orders
              WHERE o_totalprice > (
                  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)/COUNT(*) FROM orders)
                AND NOT EXISTS (
                  SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
              GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    // LATERAL correlated subquery — per-nation top-3 orders by price via
    // a correlated ORDER BY + LIMIT inside the lateral branch. Catalyst
    // decorrelates this to a window-rank over the orders⋈customer side
    // partitioned by nationkey — i.e. the same distributed plan win_topk
    // hand-writes, but reached from the SQL-surface LATERAL operator a
    // reference user would write. One shuffle on the partition key; the
    // 25-row nation dim broadcasts; nothing is executed per outer row.
    QuerySpec(
      "join_lateral",
      (s, dir) => {
        Seq("nation", "orders", "customer")
          .foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT n_name, o_orderkey, o_totalprice
          FROM nation, LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_nationkey = n_nationkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
          ORDER BY n_name, o_totalprice DESC, o_orderkey""")
      },
      Some("""SELECT n_name, o_orderkey, o_totalprice
              FROM nation, LATERAL (
                SELECT o_orderkey, o_totalprice
                FROM orders JOIN customer ON o_custkey = c_custkey
                WHERE c_nationkey = n_nationkey
                ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
              ORDER BY n_name, o_totalprice DESC, o_orderkey""")),

    // Recursive CTE (Spark 4's WITH RECURSIVE): a month spine generated
    // by recursion over the corpus's fixed date range, left-joined onto
    // the monthly order rollup — the calendar gap-fill report shape, with
    // zero-filled months the data alone can't produce (verified: the
    // spine's 2001-09..12 tail has no orders). The recursion itself is
    // driver-bounded (84 single-row steps building a dimension, the only
    // sound use of recursion at scale); the DATA pass stays one
    // partial-aggregating groupBy joined against the 84-row broadcast
    // spine. Spark side spells TIMESTAMP_NTZ to match the parquet NTZ
    // dates; DuckDB's TIMESTAMP is the same wall-clock value.
    QuerySpec(
      "sql_recursive_cte",
      (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""
          WITH RECURSIVE spine(m) AS (
            SELECT CAST('1995-01-01 00:00:00' AS TIMESTAMP_NTZ)
            UNION ALL
            SELECT m + INTERVAL 1 MONTH FROM spine
            WHERE m < CAST('2001-12-01 00:00:00' AS TIMESTAMP_NTZ))
          SELECT m, COALESCE(n_orders, CAST(0 AS BIGINT)) AS n_orders,
                 ROUND(COALESCE(rev, CAST(0 AS DOUBLE)), 4) AS revenue
          FROM spine LEFT JOIN (
            SELECT DATE_TRUNC('month', o_orderdate) AS om,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS rev
            FROM orders GROUP BY 1) agg ON om = m
          ORDER BY m""")
      },
      Some("""WITH RECURSIVE spine(m) AS (
                SELECT CAST('1995-01-01 00:00:00' AS TIMESTAMP)
                UNION ALL
                SELECT m + INTERVAL 1 MONTH FROM spine
                WHERE m < CAST('2001-12-01 00:00:00' AS TIMESTAMP))
              SELECT m, COALESCE(n_orders, CAST(0 AS BIGINT)) AS n_orders,
                     ROUND(COALESCE(rev, CAST(0 AS DOUBLE)), 4) AS revenue
              FROM spine LEFT JOIN (
                SELECT DATE_TRUNC('month', o_orderdate) AS om,
                       COUNT(*) AS n_orders,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS rev
                FROM orders GROUP BY 1) agg ON om = m
              ORDER BY m""")),

    // Distribution histogram (the profiling pass a pipeline runs before
    // choosing filters/partitioning): 20 equal-width price buckets with
    // identical clamp arithmetic spelled out on both engines — a single
    // partial-aggregating groupBy on a computed int key, linear at any
    // scale. Constants pin the range so the bucketing never depends on
    // a separate min/max pass.
    QuerySpec(
      "agg_histogram",
      (s, dir) => {
        val lo = lit(900.0); val hi = lit(105000.0)
        val b = least(greatest(
          floor((col("l_extendedprice") - lo) * 20 / (hi - lo)), lit(0L)), lit(19L))
        t(s, dir, "lineitem")
          .groupBy(b.as("bucket"))
          .agg(
            count(lit(1)).as("n"),
            round(min(col("l_extendedprice")), 2).as("lo_seen"),
            round(max(col("l_extendedprice")), 2).as("hi_seen"))
          .orderBy("bucket")
      },
      Some("""SELECT CAST(LEAST(GREATEST(FLOOR((l_extendedprice - 900.0) * 20 / (105000.0 - 900.0)), 0), 19) AS BIGINT) AS bucket,
                     COUNT(*) AS n,
                     ROUND(MIN(l_extendedprice), 2) AS lo_seen,
                     ROUND(MAX(l_extendedprice), 2) AS hi_seen
              FROM lineitem GROUP BY 1 ORDER BY bucket""")),

    // SQL-text PIVOT clause — the same wide-table reshape agg_pivot
    // builds with the DataFrame API, reached from the SQL surface a
    // reference user writes. Catalyst lowers PIVOT to the identical
    // conditional-aggregate plan (one partial-aggregating groupBy, no
    // extra pass), which is exactly what the oracle spells out as CASE
    // aggregation — so the equivalence IS the check.
    QuerySpec(
      "sql_pivot",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT * FROM (
            SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem)
          PIVOT (
            ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE), 4)
            FOR l_linestatus IN ('F' AS qty_f, 'O' AS qty_o))
          ORDER BY l_returnflag""")
      },
      Some("""SELECT l_returnflag,
                     ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F'
                       THEN CAST(l_quantity AS DECIMAL(38,4)) END) AS DOUBLE), 4) AS qty_f,
                     ROUND(CAST(SUM(CASE WHEN l_linestatus = 'O'
                       THEN CAST(l_quantity AS DECIMAL(38,4)) END) AS DOUBLE), 4) AS qty_o
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Distinct counting over event-time windows — the "hourly unique
    // users" shape every analytics dashboard runs. The exact count rides
    // the oracle; the mergeable HLL++ estimate rides beside it under the
    // established accuracy contract (|approx/exact − 1| ≤ 0.2), because
    // at 100 TB the exact per-window countDistinct is a full shuffle of
    // (window, type, user) triples while the sketch is a constant-size
    // partial-aggregable state per group — the same trade diag_stats
    // documents, here at window granularity.
    QuerySpec(
      "win_distinct_approx",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(
            countDistinct(col("user_id")).as("n_users"),
            // contract = relative 20% OR absolute 3: hourly windows can
            // hold a handful of users, where a ±1 sketch wobble is a
            // huge RELATIVE error but a meaningless absolute one
            (abs(approx_count_distinct(col("user_id")).cast("double") -
              countDistinct(col("user_id")).cast("double")) <=
              greatest(countDistinct(col("user_id")).cast("double") * 0.2, lit(3.0)))
              .as("within_tolerance"))
          .select(col("window.start").as("ws"), col("event_type"),
            col("n_users"), col("within_tolerance"))
          .orderBy("ws", "event_type"),
      Some("""SELECT make_timestamp((epoch_ns(ts) // 1000) // 3600000000 * 3600000000) AS ws,
                     event_type,
                     COUNT(DISTINCT user_id) AS n_users,
                     TRUE AS within_tolerance
              FROM events GROUP BY 1, 2 ORDER BY ws, event_type""")),

    // Robust dispersion statistics — median absolute deviation per group
    // (the outlier-resistant sibling of agg_outliers' 3σ gate: one wild
    // price can move σ arbitrarily, it moves MAD not at all). Two passes:
    // exact per-group median (a 3-row relation, broadcast back onto the
    // scan), then the median of absolute deviations. The exact
    // `percentile` sorts within groups — correct here and the point of
    // the operator; the sketch path for 100 TB quantiles is already
    // covered by agg_approx_quantile's GK contract. Both engines
    // interpolate the same (1−g)·a + g·b; the round-4 bridge absorbs
    // last-ulp drift.
    QuerySpec(
      "agg_mad",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val med = li.groupBy("l_returnflag")
          .agg(expr("percentile(l_extendedprice, 0.5)").as("med"))
        li.join(broadcast(med), "l_returnflag")
          .select(col("l_returnflag"), col("med"),
            abs(col("l_extendedprice") - col("med")).as("ad"))
          .groupBy("l_returnflag")
          .agg(
            round(first(col("med")), 4).as("median_price"),
            round(expr("percentile(ad, 0.5)"), 4).as("mad"))
          .orderBy("l_returnflag")
      },
      Some("""WITH med AS (
                SELECT l_returnflag, QUANTILE_CONT(l_extendedprice, 0.5) AS med
                FROM lineitem GROUP BY l_returnflag)
              SELECT l.l_returnflag,
                     ROUND(ANY_VALUE(med), 4) AS median_price,
                     ROUND(QUANTILE_CONT(ABS(l.l_extendedprice - med), 0.5), 4) AS mad
              FROM lineitem l JOIN med USING (l_returnflag)
              GROUP BY l.l_returnflag ORDER BY l.l_returnflag""")),

    // Bucketed co-located join — the zero-exchange fact-fact join that
    // bucketing buys at 100 TB: both sides are written bucketed (8
    // buckets) and sorted on the join key, so the sort-merge join reads
    // matching buckets directly — NO exchange on the join key, no sort
    // (ScaleBehaviorSpec asserts the plan property; this query puts the
    // RESULT under the driver's hash gate). `run` pays the one-off
    // bucketed write each time for a deterministic fresh state; `bench`
    // times the join against tables created once, which is the actual
    // recurring cost the pattern exists to optimize.
    QuerySpec(
      "join_bucketed",
      (s, dir) => { bucketedTables(s, dir); bucketedJoin(s, dir) },
      Some("""SELECT c_mktsegment,
                     COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE), 4) AS total
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      bench = Some((s, dir) => {
        if (!s.catalog.tableExists(bucketedName("graft_b_orders", dir)))
          bucketedTables(s, dir)
        bucketedJoin(s, dir)
      })),

    // Dynamic partition pruning — the scan feature that makes star joins
    // viable at 100 TB: the fact side is written hive-partitioned on the
    // join key, the dim side is a tiny relation whose qualifying keys are
    // only known at runtime, and Catalyst injects a dynamic pruning
    // subquery into the fact scan's PartitionFilters — so only the
    // partitions matching the dim's keys are LISTED AND READ, before any
    // join executes (file-listing-level pruning, the same lever
    // sink_partitioned demonstrates statically). DppSpec asserts the
    // executed plan actually carries the dynamicpruning filter; this
    // query puts the RESULT under the driver's hash gate.
    QuerySpec(
      "join_dpp",
      (s, dir) => {
        val out = ReaderQueries.fixturePath(dir, "dpp_part")
        t(s, dir, "documents")
          .write.mode("overwrite").partitionBy("source").parquet(out)
        // the dim must be a SCANNED relation with a selective filter —
        // DPP's benefit heuristic requires a real predicate on the build
        // side (a literal in-memory list constant-folds to an unfiltered
        // LocalRelation and no pruning subquery is injected): derive the
        // qualifying sources from the nation dim at runtime
        val dim = t(s, dir, "nation")
          .filter(col("n_regionkey") === 1 && col("n_nationkey") < 20)
          .select(concat(lit("src"), col("n_nationkey").cast("long")).as("source"),
            (col("n_nationkey") + 1).cast("long").as("boost"))
        graft.Tables.readBack(s, graft.Tables.schemaOf(s, dir, "documents"),
            out, Seq("source"))
          .join(broadcast(dim), "source")
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars") * col("boost")).cast("long").as("boosted_chars"))
          .orderBy("source")
      },
      Some("""WITH dim AS (
                SELECT 'src' || CAST(n_nationkey AS BIGINT) AS source,
                       CAST(n_nationkey + 1 AS BIGINT) AS boost
                FROM nation WHERE n_regionkey = 1 AND n_nationkey < 20)
              SELECT d.source, COUNT(*) AS n_docs,
                     CAST(SUM(n_chars * boost) AS BIGINT) AS boosted_chars
              FROM documents d JOIN dim ON d.source = dim.source
              GROUP BY d.source ORDER BY d.source""")),

    // Key-skew profile (the diagnostic a pipeline runs before choosing
    // salting / AQE skew thresholds / bucket counts): group sizes of the
    // join key, then one bounded row of distribution stats. Two partial-
    // aggregating shuffles on compact keys; the skew ratio (max/avg) is
    // exactly the number that decides whether a key needs the salted-join
    // path. Rounded to 6 so double division can't flip the hash.
    QuerySpec(
      "diag_skew",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_orderkey").agg(count(lit(1)).as("sz"))
          .agg(
            count(lit(1)).as("n_keys"),
            max(col("sz")).as("max_sz"),
            round(avg(col("sz")), 6).as("avg_sz"),
            round(expr("percentile(sz, 0.5)"), 6).as("p50_sz"),
            round(expr("percentile(sz, 0.99)"), 6).as("p99_sz"),
            round(max(col("sz")) / avg(col("sz")), 6).as("skew_ratio")),
      Some("""WITH s AS (SELECT l_orderkey, COUNT(*) AS sz FROM lineitem GROUP BY l_orderkey)
              SELECT COUNT(*) AS n_keys,
                     MAX(sz) AS max_sz,
                     ROUND(AVG(sz), 6) AS avg_sz,
                     ROUND(QUANTILE_CONT(sz, 0.5), 6) AS p50_sz,
                     ROUND(QUANTILE_CONT(sz, 0.99), 6) AS p99_sz,
                     ROUND(MAX(sz) / AVG(sz), 6) AS skew_ratio
              FROM s""")),

    // Table-statistics collection (the ANALYZE pass a cost-based
    // optimizer and every partition planner runs first): per-column null
    // count + distinct estimate in ONE scan of the fact table. The
    // production plan (timed by bench) uses approx_count_distinct — a
    // mergeable HLL++ per column, all partial-aggregable, ONE pass with
    // NO Expand. The exact multi-distinct alternative plans via Expand,
    // a 10× row multiplication of the full scan before the shuffle — at
    // 100 TB that turns one scan into 1,000 TB of aggregate input, so it
    // appears here only inside the accuracy-contract oracle (like
    // agg_approx_distinct): per column, |approx/exact − 1| ≤ 0.2 (4σ at
    // the default rsd=0.05). Output pivots to one row per column via
    // stack so the stats table is queryable.
    QuerySpec(
      "diag_stats",
      (s, dir) => {
        val cols = diagStatsCols
        val aggs = cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
          (abs(approx_count_distinct(col(c)).cast("double") /
            countDistinct(col(c)).cast("double") - 1) <= 0.2).as(s"${c}__ok")))
        val stackArgs = cols
          .map(c => s"'$c', ${c}__nn, ${c}__ok").mkString(", ")
        t(s, dir, "lineitem")
          .agg(aggs.head, aggs.tail: _*)
          .select(expr(
            s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, nd_within_tolerance)"))
          .orderBy("col_name")
      },
      Some {
        val branches = diagStatsCols.map(c =>
          s"""SELECT '$c' AS col_name, ${c}__nn AS n_null, TRUE AS nd_within_tolerance FROM a""")
          .mkString("\nUNION ALL\n")
        val aggExprs = diagStatsCols.map(c =>
          s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${c}__nn")
          .mkString(", ")
        s"""WITH a AS (SELECT $aggExprs FROM lineitem)
            $branches
            ORDER BY col_name"""
      },
      // Bench times the production ANALYZE plan alone: the contract
      // oracle above drags the exact Expand multi-distinct through the
      // plan, so timing it would measure the oracle scaffolding, not the
      // one-pass sketch aggregate.
      bench = Some((s, dir) => {
        val cols = diagStatsCols
        val aggs = cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
          approx_count_distinct(col(c)).as(s"${c}__nd")))
        val stackArgs = cols
          .map(c => s"'$c', ${c}__nn, ${c}__nd").mkString(", ")
        t(s, dir, "lineitem")
          .agg(aggs.head, aggs.tail: _*)
          .select(expr(
            s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct_approx)"))
          .orderBy("col_name")
      })),

    // 3-sigma outlier gate per group (the numeric-quality filter a
    // curation pipeline runs on metric columns): two passes — exact
    // DECIMAL sums give each group's mean/sigma deterministically, the
    // 3-row stats relation broadcasts back onto the fact scan, and rows
    // beyond 3σ are counted. Every double step (mean division, variance
    // identity, sqrt, the |x−μ| > 3σ gate) is mirrored operation-for-
    // operation in the oracle, so the boundary decisions agree exactly.
    QuerySpec(
      "agg_outliers",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val stats = li.groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast(Dec)).as("s"),
            sum((col("l_extendedprice") * col("l_extendedprice"))
              .cast(DecimalType(38, 8))).as("s2"))
          .select(col("l_returnflag"), col("n"),
            (col("s").cast("double") / col("n")).as("mean"),
            sqrt((col("s2").cast("double")
              - col("s").cast("double") * col("s").cast("double") / col("n"))
              / col("n")).as("sigma"))
        val outs = li.join(broadcast(stats), "l_returnflag")
          .filter(abs(col("l_extendedprice") - col("mean")) > lit(3.0) * col("sigma"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_outliers"))
        stats.join(outs, Seq("l_returnflag"), "left")
          .select(col("l_returnflag"), col("n"),
            coalesce(col("n_outliers"), lit(0L)).as("n_outliers"),
            round(col("mean"), 4).as("mean"),
            round(col("sigma"), 6).as("sigma"))
          .orderBy("l_returnflag")
      },
      Some("""WITH stats AS (
                SELECT l_returnflag, COUNT(*) AS n,
                       SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS s,
                       SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8))) AS s2
                FROM lineitem GROUP BY l_returnflag),
              ms AS (
                SELECT l_returnflag, n,
                       CAST(s AS DOUBLE) / n AS mean,
                       SQRT((CAST(s2 AS DOUBLE)
                             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n) AS sigma
                FROM stats),
              outs AS (
                SELECT li.l_returnflag, COUNT(*) AS n_outliers
                FROM lineitem li JOIN ms ON li.l_returnflag = ms.l_returnflag
                WHERE ABS(li.l_extendedprice - ms.mean) > 3.0 * ms.sigma
                GROUP BY li.l_returnflag)
              SELECT ms.l_returnflag, ms.n,
                     COALESCE(outs.n_outliers, 0) AS n_outliers,
                     ROUND(ms.mean, 4) AS mean,
                     ROUND(ms.sigma, 6) AS sigma
              FROM ms LEFT JOIN outs ON ms.l_returnflag = outs.l_returnflag
              ORDER BY ms.l_returnflag""")),

    // Cryptographic digest family — content addressing, the primitive
    // under exact dedup, cache keys, and deterministic sharding in a
    // corpus pipeline. md5/sha256 are byte-identical across engines by
    // definition; `shard` derives a stable 64-way partition from the
    // digest (the same h32 bridge the sinks use), showing the
    // hash → pmod route a writer uses to spread a 100 TB corpus without
    // a shuffle key column.
    QuerySpec(
      "fn_hash",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            md5(col("text")).as("md5_hex"),
            sha2(col("text"), 256).as("sha256_hex"),
            pmod(graft.functions.HashBridge.h32(col("text")), lit(64L)).as("shard"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, MD5(text) AS md5_hex, SHA256(text) AS sha256_hex,
                     ('0x'||SUBSTR(MD5(text),1,8))::BIGINT % 64 AS shard
              FROM documents ORDER BY doc_id""")),

    // Regexp family: global replace, extract-all, match count, boolean
    // match — all RE2-safe patterns so Java regex and DuckDB RE2 agree.
    // Every call is a codegen'd built-in over one scan; at 100 TB this
    // is the embarrassingly-parallel per-row shape (no shuffle at all
    // before the output ORDER BY).
    QuerySpec(
      "fn_regexp",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            regexp_replace(col("text"), "(batch|stream)", "X").as("replaced"),
            array_join(
              expr("regexp_extract_all(text, '(join|merge)', 0)"), ",").as("matches"),
            regexp_count(col("text"), lit("spark")).cast("int").as("n_spark"),
            col("text").rlike("window").as("has_window"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     REGEXP_REPLACE(text, '(batch|stream)', 'X', 'g') AS replaced,
                     -- COALESCE: DuckDB folds the empty list to NULL here,
                     -- Spark's array_join yields '' — align on ''
                     COALESCE(ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(text, '(join|merge)'), ','), '') AS matches,
                     CAST(LEN(REGEXP_EXTRACT_ALL(text, 'spark')) AS INT) AS n_spark,
                     REGEXP_MATCHES(text, 'window') AS has_window
              FROM documents ORDER BY doc_id""")),

    // Higher-order array functions (transform / filter / aggregate
    // lambdas) — the tokenize-then-map shape LLM feature extraction
    // lives in. Lambdas stay inside whole-stage codegen (no UDF), so
    // per-token work costs the same as a hand-written loop; arrays are
    // flattened to CSV strings for the cross-engine compare.
    QuerySpec(
      "fn_array_hof",
      (s, dir) =>
        t(s, dir, "documents")
          .withColumn("tk", split(trim(col("text")), "\\s+"))
          .select(
            col("doc_id"),
            array_join(transform(col("tk"), x => length(x).cast("string")), ",")
              .as("len_csv"),
            array_join(filter(col("tk"), x => length(x) > 5), ",").as("long_toks"),
            aggregate(transform(col("tk"), x => length(x)), lit(0), (a, x) => a + x)
              .as("total_chars"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     ARRAY_TO_STRING(LIST_TRANSFORM(STRING_SPLIT_REGEX(TRIM(text), '\s+'),
                                                    x -> CAST(LENGTH(x) AS VARCHAR)), ',') AS len_csv,
                     -- COALESCE as in fn_regexp: empty list stringifies to
                     -- NULL on DuckDB, '' on Spark
                     COALESCE(ARRAY_TO_STRING(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\s+'),
                                                          x -> LENGTH(x) > 5), ','), '') AS long_toks,
                     CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT_REGEX(TRIM(text), '\s+'),
                                                  x -> LENGTH(x))) AS INT) AS total_chars
              FROM documents ORDER BY doc_id""")),

    // Gaps-and-islands: longest consecutive-day activity streak per user
    // (retention analytics' other half next to agg_retention's cohort
    // matrix). The classic date-minus-row_number grouping key turns each
    // run of consecutive days into one constant, so the whole thing is a
    // distinct + one window + two hash aggregates — every stage keyed on
    // user_id, no self-join, linear at any scale.
    QuerySpec(
      "win_streak",
      (s, dir) => {
        val days = t(s, dir, "events")
          .select(col("user_id"), col("ts").cast("date").as("d"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("d")
        days
          .withColumn("grp", date_sub(col("d"), row_number().over(w)))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(
            max(col("len")).as("longest_streak"),
            sum(col("len")).cast("long").as("n_active_days"))
          .orderBy("user_id")
      },
      Some("""WITH days AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
              g AS (
                SELECT user_id, d,
                       d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS grp
                FROM days),
              s AS (SELECT user_id, COUNT(*) AS len FROM g GROUP BY user_id, grp)
              SELECT user_id, MAX(len) AS longest_streak,
                     CAST(SUM(len) AS BIGINT) AS n_active_days
              FROM s GROUP BY user_id ORDER BY user_id""")),

    // Linear-regression aggregates (slope / intercept / R² / count) per
    // group — the one-pass sufficient-statistics family (Σx, Σy, Σxy,
    // Σx², n): partial-aggregable, constant state per group, exactly the
    // trend-fit a metrics pipeline runs per segment. Rounded to 6 with
    // the −0.0 guard agg_stats established.
    QuerySpec(
      "agg_regr",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            (round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6) + lit(0.0))
              .as("slope"),
            (round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 6) + lit(0.0))
              .as("intercept"),
            (round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6) + lit(0.0))
              .as("r2"),
            regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                     ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) + 0.0 AS slope,
                     ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 6) + 0.0 AS intercept,
                     ROUND(REGR_R2(l_extendedprice, l_quantity), 6) + 0.0 AS r2,
                     CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))
  )

  /** Builds, EXECUTES, and returns the skew-join demonstration.
    *
    * Runs in a child session (`newSession`: private SQLConf, shared
    * SparkContext/catalog) with thresholds tuned so the demonstration
    * triggers at EVERY scale factor: broadcast disabled (forces the
    * shuffle join skew handling applies to), skew factor 2.0, and
    * input-scaled byte thresholds — skew threshold
    * max(4 KB, input/64) with advisory target threshold/2, via
    * [[skewAdvisoryBytes]] — so the split count stays ~dozens whether
    * the input is sf0.001 or sf0.1; partition coalescing off so the
    * split partitions stay visible.
    * Returns the materialized result (localCheckpoint — executed under
    * these confs, tiny: 8 aggregate rows) plus the final AQE plan string
    * for SkewJoinSpec's isSkew assertion. */
  // one configured child session per (parent, dir), reused across
  // bench iterations — the demonstration's cost should be the skewed
  // join, not per-call session bootstrap + plan re-derivation
  private val skewSessions =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), SparkSession]

  /** The advisory-partition-size bytes the child session will set for
    * `dir` — exposed so SkewJoinSpec's no-leak assertion can compare the
    * parent conf against the value the child ACTUALLY sets. */
  private[operators] def skewAdvisoryBytes(dir: String): Long = {
    val inputBytes = new java.io.File(s"$dir/orders.parquet").length()
    math.max(4L << 10, inputBytes / 64) / 2
  }

  private[operators] def skewAqeRun(s0: SparkSession, dir: String): (DataFrame, String) = {
    val s = skewSessions.getOrElseUpdate((s0, dir), s0.newSession())
    // thresholds scale with the input (file size is a free metadata
    // read): a FIXED tiny advisory would shatter the sf0.1 hot
    // partition into thousands of 2 KB tasks — scheduling overhead,
    // not parallelism — while a fixed large one would never trigger at
    // sf0.001. threshold ≈ input/64 keeps the split count ~dozens at
    // every SF, which is exactly how the knobs are sized on a real
    // cluster (relative to executor-digestible chunks, not constants).
    val threshold = skewAdvisoryBytes(dir) * 2
    Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> threshold.toString,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> (threshold / 2).toString,
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "32"
    ).foreach { case (k, v) => s.conf.set(k, v) }
    // repartition(16) forces 16 map tasks into the join shuffle — a
    // single-file scan would feed it from ONE mapper, and AQE can only
    // split a skewed partition at mapper granularity; the md5 payload
    // keeps the hot partition's BYTES proportional to its rows (the
    // constant join key alone compresses away the skew the demo needs)
    val fact = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .repartition(16).select(
      when(col("o_orderkey") % 2 === 0, lit(0L))
        .otherwise(col("o_orderkey") % 64).as("k"),
      col("o_totalprice"),
      md5(col("o_orderkey").cast("string")).as("payload"))
    val dim = s.range(64).select(col("id").as("k"), (col("id") * 2 + 1).as("w"))
    val joined = fact.join(dim, "k")
      .groupBy((col("k") % 8).as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(sum((col("o_totalprice") * col("w")).cast(Dec)).cast("double"), 4).as("wsum"),
        min(col("payload")).as("min_digest"))
    // the checkpoint IS the execution — it drives joined's own
    // queryExecution, so AQE is final when the plan is read below and
    // the join runs exactly once
    val ck = joined.localCheckpoint()
    val plan = joined.queryExecution.executedPlan.toString
    (ck.orderBy("bucket"), plan)
  }

  /** CTAS staging-table name, keyed like [[bucketedName]]. */
  private[operators] def ctasName(dir: String): String =
    s"graft_ctas_${java.lang.Integer.toHexString(dir.hashCode)}_p${ProcessHandle.current().pid()}"

  /** The sql_ctas body: stage → ANALYZE → verifying aggregate. The
    * aggregate runs EAGERLY (bounded: one row per order status) so with
    * `dropAfter` the staging table is reclaimed here and now, not left
    * for the shutdown hook — a long-lived session then never accumulates
    * staging files at all. CboStatsSpec calls with `dropAfter = false`
    * to inspect the ANALYZE statistics before dropping the table itself. */
  private[operators] def ctasStage(s: SparkSession, dir: String,
      dropAfter: Boolean): DataFrame = {
    val tn = ctasName(dir)
    sweepDeadStaging(s); installStagingShutdownHook(s)
    Tables(s, dir, "orders").createOrReplaceTempView("orders_src")
    s.sql(s"DROP TABLE IF EXISTS $tn")
    s.sql(s"""CREATE TABLE $tn USING PARQUET AS
              SELECT o_orderkey, o_orderstatus, o_totalprice
              FROM orders_src WHERE o_totalprice > 1000""")
    s.sql(s"ANALYZE TABLE $tn COMPUTE STATISTICS")
    val agg = s.sql(
      s"""SELECT o_orderstatus, COUNT(*) AS n,
                 ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE), 4) AS total
          FROM $tn GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    val rows = agg.collect()
    if (dropAfter) s.sql(s"DROP TABLE IF EXISTS $tn"): Unit
    s.createDataFrame(java.util.Arrays.asList(rows: _*), agg.schema)
  }

  /** The session's warehouse directory as a local file — resolved from
    * `spark.sql.warehouse.dir` (which may be an absolute file: URI or a
    * cwd-relative default), never a hardcoded relative path: a caller
    * that configured a shared warehouse must be swept THERE. */
  private def warehouseDir(s: SparkSession): java.io.File = {
    val raw = s.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    scala.util.Try(new java.io.File(new java.net.URI(raw)))
      .getOrElse(new java.io.File(raw.stripPrefix("file:")))
  }

  /** Sweeps warehouse leftovers of pid-keyed graft staging tables whose
    * owning process is GONE. The pid keying exists so concurrent runs
    * can't race each other's DDL — the flip side is that a crashed or
    * finished JVM's staging files outlive it in the shared warehouse;
    * every sql_ctas run reclaims them here, so the warehouse can't
    * accumulate dead staging data indefinitely. Deletion is doubly
    * gated: the pid must be absent AND the files older than a 1-hour
    * safety window — on a SHARED warehouse (NFS), pid-liveness only
    * means anything for same-host processes, and the age gate keeps
    * another host's live staging out of reach. The own process's tables
    * are additionally removed by [[installStagingShutdownHook]] on clean
    * exit. Catalog entries need no sweep: the default in-memory catalog
    * dies with its JVM — only the FILES persist. */
  private[operators] def sweepDeadStaging(s: SparkSession): Unit = {
    val pat = "^graft_.*_p([0-9]+)$".r
    val safetyWindowMs = 60L * 60 * 1000
    val now = System.currentTimeMillis()
    Option(warehouseDir(s).listFiles()).getOrElse(Array.empty)
      .foreach { f =>
        f.getName match {
          case pat(pid) if !ProcessHandle.of(pid.toLong).isPresent &&
              now - f.lastModified() > safetyWindowMs => rmTree(f)
          case _ => ()
        }
      }
  }

  private def rmTree(x: java.io.File): Unit = {
    if (x.isDirectory) Option(x.listFiles).getOrElse(Array.empty).foreach(rmTree)
    x.delete(): Unit
  }

  /** One-time JVM shutdown hook deleting THIS process's staging files —
    * clean exits leave nothing for the next run's [[sweepDeadStaging]].
    * The warehouse path is captured at install time from the session's
    * actual configuration. */
  private val stagingHookInstalled = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def installStagingShutdownHook(s: SparkSession): Unit =
    if (stagingHookInstalled.compareAndSet(false, true)) {
      val dir = warehouseDir(s)
      val pid = ProcessHandle.current().pid()
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("graft_") && f.getName.endsWith(s"_p$pid"))
          .foreach(rmTree)))
    }

  /** Bucketed-table name keyed on the sf dir AND the process: the bench
    * path reuses whatever table the name resolves to, so an unkeyed name
    * could time the join over STALE data after a scale-factor switch, and
    * two JVMs sharing a CWD (Verify alongside Bench — the race
    * ReaderQueries.fixturePath exists to prevent) could race the
    * DROP/rm against each other's open readers in the shared relative
    * spark-warehouse. */
  private def bucketedName(base: String, dir: String): String =
    s"${base}_${java.lang.Integer.toHexString(dir.hashCode)}_p${ProcessHandle.current().pid()}"

  /** Fresh bucketed+sorted twins of orders/customer (8 buckets on the
    * join key) in the session warehouse — the one-off write that makes
    * every later fact-fact join on this key exchange-free. */
  private def bucketedTables(s: SparkSession, dir: String): Unit = {
    sweepDeadStaging(s); installStagingShutdownHook(s)
    Seq(bucketedName("graft_b_orders", dir), bucketedName("graft_b_customer", dir))
      .foreach { tn =>
        s.sql(s"DROP TABLE IF EXISTS $tn")
        val f = new java.io.File(warehouseDir(s), tn)
        if (f.exists()) rmTree(f)
      }
    t(s, dir, "orders").write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable(bucketedName("graft_b_orders", dir))
    t(s, dir, "customer").write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable(bucketedName("graft_b_customer", dir))
  }

  private def bucketedJoin(s: SparkSession, dir: String): DataFrame =
    s.table(bucketedName("graft_b_orders", dir))
      .join(s.table(bucketedName("graft_b_customer", dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(38,4)")).cast("double"), 4).as("total"))
      .orderBy("c_mktsegment")
}
