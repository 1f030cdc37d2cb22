package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table-maintenance operators a 100 TB training-data store runs between
  * queries: CDC upsert (merge the latest version of every row), SCD2
  * history (keep every version with validity metadata), and Z-order
  * clustering (co-locate rows so multi-dimensional range scans skip
  * files). The reference has no mutation surface at all — its pipeline
  * recreates tables wholesale (`core_processor.rs:391-428` CTAS per
  * file) — but any engine meant to HOST the ingested data needs these,
  * and each is a pure relational composition, so the DuckDB oracle
  * checks them exactly.
  *
  * Scale notes:
  *  - merge_upsert resolves latest-wins with `max_by` under a plain
  *    hash aggregate — partial aggregation runs map-side, so the only
  *    shuffle moves one pre-combined row per key per partition, not the
  *    raw update stream. (A window/row_number formulation would shuffle
  *    every version of every row and then sort; the oracle uses it
  *    because it is the clearest SQL statement of the same semantics.)
  *  - scd2_history windows per key (LEAD over ≤ version-count rows per
  *    key) — the partition is the entity, never the corpus.
  *  - layout_zorder's bit-interleave is pure integer arithmetic
  *    (shift/mask spread), codegen-friendly, no UDF; the z-bucket
  *    aggregation DEMONSTRATES the clustering property the layout buys:
  *    every z-range confines BOTH dimensions, which is exactly why
  *    min/max file statistics can skip files for 2-D range predicates
  *    after `ORDER BY zval` writes.
  */
object LayoutQueries {

  private val Dec = DecimalType(38, 4)

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  // ---- shared versioned-row fixture: orders is the base state
  // (version 1); keys ≡ 3 (mod 7) receive a deterministic update
  // (version 2: status 'U', price bumped) — the oracle rebuilds the
  // same update stream from the same predicate.

  private def baseRows(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
      lit(1).as("version"))

  private def updateRows(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 7 === 3)
      .select(
        col("o_orderkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") + 100.0).as("o_totalprice"),
        lit(2).as("version"))

  // ---- Z-order bit spread: 16-bit value -> even bit positions of a
  // 32-bit word (Morton encoding half). Pure shift/mask chain, mirrored
  // literally in the oracle SQL below.
  private def spread16(c: Column): Column = {
    val v0 = c.bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** The same spread chain as SQL text, staged through chained CTE
    * columns (suffix distinguishes the two dimensions). */
  private def spreadSqlStages(v: String): Seq[String] = Seq(
    s"(${v}) & 65535",
    s"(${v}0 | (${v}0 << 8)) & 16711935",
    s"(${v}1 | (${v}1 << 4)) & 252645135",
    s"(${v}2 | (${v}2 << 2)) & 858993459",
    s"(${v}3 | (${v}3 << 1)) & 1431655765")

  def specs: Seq[QuerySpec] = Seq(

    // CDC merge (upsert): latest version per key wins. max_by(struct,
    // version) under a hash aggregate — the partial-agg-friendly merge.
    QuerySpec(
      "merge_upsert",
      (s, dir) => {
        val merged = baseRows(s, dir).union(updateRows(s, dir))
          .groupBy("o_orderkey")
          .agg(max_by(
            struct(col("o_orderstatus"), col("o_totalprice")),
            col("version")).as("cur"))
        merged
          .groupBy(col("cur.o_orderstatus").as("o_orderstatus"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("cur.o_totalprice").cast(Dec)).cast("double"), 4)
              .as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH base AS (
                SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS version FROM orders),
              upd AS (
                SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 100.0 AS o_totalprice,
                       2 AS version
                FROM orders WHERE o_orderkey % 7 = 3),
              merged AS (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
                FROM (SELECT * FROM base UNION ALL SELECT * FROM upd))
              SELECT o_orderstatus, COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE), 4) AS total
              FROM merged WHERE rn = 1
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // SCD2 history: KEEP every version; each carries the version that
    // superseded it (NULL = current). LEAD partitions by entity key.
    QuerySpec(
      "scd2_history",
      (s, dir) => {
        val w = Window.partitionBy("o_orderkey").orderBy("version")
        baseRows(s, dir).union(updateRows(s, dir))
          .filter(col("o_orderkey") % 7 === 3)
          .select(col("o_orderkey"), col("version"), col("o_orderstatus"))
          .withColumn("superseded_by", lead("version", 1).over(w))
          .withColumn("is_current", col("superseded_by").isNull)
          .orderBy("o_orderkey", "version")
      },
      Some("""WITH h AS (
                SELECT o_orderkey, 1 AS version, o_orderstatus
                FROM orders WHERE o_orderkey % 7 = 3
                UNION ALL
                SELECT o_orderkey, 2 AS version, 'U' AS o_orderstatus
                FROM orders WHERE o_orderkey % 7 = 3)
              SELECT o_orderkey, version, o_orderstatus,
                     LEAD(version) OVER (PARTITION BY o_orderkey ORDER BY version) AS superseded_by,
                     LEAD(version) OVER (PARTITION BY o_orderkey ORDER BY version) IS NULL AS is_current
              FROM h ORDER BY o_orderkey, version""")),

    // Incremental aggregate maintenance: yesterday's aggregate table +
    // today's delta, merged WITHOUT rescanning history — the pattern
    // that turns a daily 100 TB full-scan rollup into a delta-sized job.
    // Works because the partials are algebraically mergeable (count/sum
    // add, min/max combine); the oracle computes the same totals from
    // the full corpus directly, proving merge(agg(hist), agg(delta)) ==
    // agg(hist ∪ delta).
    QuerySpec(
      "agg_incremental",
      (s, dir) => {
        def partial(rows: DataFrame): DataFrame = rows
          .groupBy("o_orderstatus")
          .agg(
            count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(Dec)).as("s"),
            min("o_totalprice").as("lo"),
            max("o_totalprice").as("hi"))
        val orders = t(s, dir, "orders")
        val hist = partial(orders.filter(col("o_orderkey") % 5 =!= 4))
        val delta = partial(orders.filter(col("o_orderkey") % 5 === 4))
        hist.unionByName(delta)
          .groupBy("o_orderstatus")
          .agg(
            sum(col("n")).as("n"),
            round(sum(col("s")).cast("double"), 4).as("total"),
            round(min(col("lo")), 2).as("lo"),
            round(max(col("hi")), 2).as("hi"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE), 4) AS total,
                     ROUND(MIN(o_totalprice), 2) AS lo,
                     ROUND(MAX(o_totalprice), 2) AS hi
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Z-order (Morton) clustering over (custkey, price-bucket): the
    // data-layout transform behind multi-dimensional file skipping.
    // Output groups rows by their top-6-bit z-range and shows each
    // range's min/max in BOTH dimensions — bounded extents per range is
    // the skipping property itself (a file written from one z-range can
    // be pruned by either predicate dimension).
    QuerySpec(
      "layout_zorder",
      (s, dir) => {
        val x = col("o_custkey") % 65536
        val y = least(greatest(
          floor((col("o_totalprice") - lit(900.0)) * 65536 / lit(600000.0 - 900.0)),
          lit(0L)), lit(65535L))
        val z = spread16(x).bitwiseOR(shiftleft(spread16(y), 1))
        t(s, dir, "orders")
          .select(x.as("x"), y.as("y"), z.as("z"))
          .groupBy(shiftright(col("z"), 26).as("zbucket"))
          .agg(
            count(lit(1)).as("n"),
            min("x").as("x_lo"), max("x").as("x_hi"),
            min("y").as("y_lo"), max("y").as("y_hi"))
          .orderBy("zbucket")
      },
      Some {
        val xs = spreadSqlStages("x").zipWithIndex
          .map { case (e, i) => s"$e AS x$i" }
        val ys = spreadSqlStages("y").zipWithIndex
          .map { case (e, i) => s"$e AS y$i" }
        val stages = xs.zip(ys).zipWithIndex.map { case ((xe, ye), i) =>
          s"s$i AS (SELECT *, $xe, $ye FROM ${if (i == 0) "b" else s"s${i - 1}"})"
        }.mkString(",\n")
        s"""WITH b AS (
              SELECT o_custkey % 65536 AS x,
                     CAST(LEAST(GREATEST(FLOOR((o_totalprice - 900.0) * 65536 / (600000.0 - 900.0)), 0), 65535) AS BIGINT) AS y
              FROM orders),
            $stages
            SELECT (x4 | (y4 << 1)) >> 26 AS zbucket, COUNT(*) AS n,
                   MIN(x) AS x_lo, MAX(x) AS x_hi, MIN(y) AS y_lo, MAX(y) AS y_hi
            FROM s4 GROUP BY 1 ORDER BY zbucket"""
      }),

    // Hilbert-curve layout — Z-order's better-locality sibling (every
    // consecutive pair of curve positions is a GRID-ADJACENT cell, so a
    // file cut from one curve range has tighter extents than the same-
    // size Morton range; HilbertIndexSpec proves the adjacency law).
    // The 16-level xy2d walk runs as the native HilbertIndex expression
    // (functions/HilbertIndex — a loop, not an expression tree, inside
    // whole-stage codegen); same dimensions and bucket aggregate as
    // layout_zorder so the two layouts are directly comparable. The
    // oracle replays the identical loop as a 16-step recursive CTE.
    QuerySpec(
      "layout_hilbert",
      (s, dir) => {
        val x = col("o_custkey") % 65536
        val y = least(greatest(
          floor((col("o_totalprice") - lit(900.0)) * 65536 / lit(600000.0 - 900.0)),
          lit(0L)), lit(65535L))
        t(s, dir, "orders")
          .select(x.as("x"), y.as("y"))
          .withColumn("h", graft.functions.HilbertIndex(col("x"), col("y")))
          .groupBy(shiftright(col("h"), 26).as("hbucket"))
          .agg(
            count(lit(1)).as("n"),
            min("x").as("x_lo"), max("x").as("x_hi"),
            min("y").as("y_lo"), max("y").as("y_hi"))
          .orderBy("hbucket")
      },
      Some("""WITH RECURSIVE b AS (
                SELECT o_custkey % 65536 AS x0,
                       CAST(LEAST(GREATEST(FLOOR((o_totalprice - 900.0) * 65536 / (600000.0 - 900.0)), 0), 65535) AS BIGINT) AS y0
                FROM orders),
              h AS (
                SELECT x0, y0, x0 AS x, y0 AS y,
                       CAST(0 AS BIGINT) AS d, CAST(32768 AS BIGINT) AS s
                FROM b
                UNION ALL
                SELECT x0, y0,
                       CASE WHEN (y & s) = 0
                            THEN (CASE WHEN (x & s) > 0 THEN s - 1 - y ELSE y END)
                            ELSE x END AS x,
                       CASE WHEN (y & s) = 0
                            THEN (CASE WHEN (x & s) > 0 THEN s - 1 - x ELSE x END)
                            ELSE y END AS y,
                       d + s * s * xor(CASE WHEN (x & s) > 0 THEN 3 ELSE 0 END,
                                       CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END) AS d,
                       s // 2 AS s
                FROM h WHERE s >= 1)
              SELECT d >> 26 AS hbucket, COUNT(*) AS n,
                     MIN(x0) AS x_lo, MAX(x0) AS x_hi,
                     MIN(y0) AS y_lo, MAX(y0) AS y_hi
              FROM h WHERE s = 0 GROUP BY 1 ORDER BY hbucket""")),

    // Small-file compaction — the table-maintenance pass every streaming
    // or incremental ingest needs: micro-batch appends leave thousands of
    // KB-sized files whose per-file open/footer overhead dominates scans
    // (the classic small-files problem). The op deliberately fragments
    // `documents` into 32 files, then compacts: list the data files
    // (driver-side metadata, the same position as a table format's
    // manifest scan), size a target file count from total bytes /
    // target-file-size, and rewrite with exactly that many output
    // partitions. The query's RESULT is the post-compaction content
    // census (row count + chars + order-insensitive text digest), so the
    // oracle proves the rewrite lost and duplicated nothing; the file-
    // count collapse itself is asserted by LayoutCompactSpec. At 100 TB
    // this runs per partition-slice with the same two metadata-bounded
    // steps — the data path is one scan + one write, no shuffle beyond
    // the repartition that IS the compaction.
    QuerySpec(
      "layout_compact",
      (s, dir) => {
        val smallDir = ReaderQueries.fixturePath(dir, "compact_small")
        val outDir = ReaderQueries.fixturePath(dir, "compact_out")
        t(s, dir, "documents")
          .repartition(32)
          .write.mode("overwrite").parquet(smallDir)
        val targetBytes = 8L * 1024 * 1024
        val totalBytes = new java.io.File(smallDir).listFiles()
          .filter(_.getName.endsWith(".parquet")).map(_.length).sum
        val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
        val docsSchema = graft.Tables.schemaOf(s, dir, "documents")
        graft.Tables.readBack(s, docsSchema, smallDir)
          .repartition(nOut)
          .write.mode("overwrite").parquet(outDir)
        graft.Tables.readBack(s, docsSchema, outDir)
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("total_chars"),
            sum(graft.functions.HashBridge.h32(col("text"))).as("text_digest"))
      },
      Some("""SELECT COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                     CAST(SUM(('0x'||SUBSTR(MD5(text),1,8))::BIGINT) AS BIGINT) AS text_digest
              FROM documents"""))
  )
}
