package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.SparkSession

/** The remaining TPC-H query SHAPES, closing the full 22-query sweep.
  *
  * The reference delegates every relational query to DuckDB's SQL engine
  * (reference: core_processor.rs:419-428 runs arbitrary SQL over the
  * ingested tables), so a reference user's analytical workload is "any
  * SQL DuckDB can run" — and TPC-H is the canonical inventory of the
  * shapes that workload contains. Rounds 1-5 covered Q1 (agg_group),
  * Q3 (sql_star_join), Q4 (sql_exists_corr), Q5/Q7/Q18 (sql_tpch_*),
  * Q17 (sql_scalar_corr), Q22 (sql_notexists_scalar); this module adds
  * the other thirteen: Q2, Q6, Q8, Q9, Q10, Q11, Q12, Q13, Q14, Q15,
  * Q16, Q19, Q20, Q21.
  *
  * The driver corpus is TPC-H-ISH, not TPC-H: there is no partsupp
  * table and several columns (l_shipmode, l_commitdate, l_receiptdate,
  * p_container, ps_supplycost) don't exist. Queries marked "adapted"
  * keep the SHAPE — the join topology, subquery class, and aggregate
  * structure the optimizer must handle — while substituting available
  * columns: the supply relation is DISTINCT (l_partkey, l_suppkey)
  * observed in lineitem, supply cost is a fixed fraction of
  * p_retailprice, lateness is l_shipdate > o_orderdate + 90 days.
  *
  * Every query follows the determinism contract (QuerySpec scaladoc):
  * money sums pass through DECIMAL(38,4) so partial-agg order can't
  * move a hash, ratios divide AFTER the exact sums, ORDER BY is total
  * (unique key last), and the IDENTICAL SQL text runs on both engines
  * — what Spark executes is what DuckDB oracles.
  *
  * Scale notes (the point of running these shapes on Spark at all):
  *  - dims (region 5, nation 25, supplier, part) broadcast; fact joins
  *    co-shuffle on orderkey/partkey and reuse exchanges (proven for
  *    Q18 in round 4; the same subtree appears in Q13/Q15/Q21).
  *  - every correlated subquery decorrelates: EXISTS/NOT EXISTS →
  *    LeftSemi/LeftAnti, correlated scalar agg → groupBy + equi-join
  *    (SubqueryDecorrelationSpec pins the plan classes; TpchPlanSpec
  *    extends the assertions to Q2/Q15/Q20/Q21). Nothing executes
  *    per-row.
  *  - Q19's OR-of-ANDs join predicate still extracts the common
  *    p_partkey = l_partkey equi-key, so it plans a broadcast hash
  *    join with the disjunction as residual — not a nested loop.
  */
object TpchQueries {

  private def viewed(s: SparkSession, dir: String, tables: Seq[String],
                     text: String) = {
    tables.foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))
    s.sql(text)
  }

  private def spec(name: String, tables: Seq[String], text: String) =
    QuerySpec(name, (s, dir) => viewed(s, dir, tables, text), Some(text))

  // Q2 (adapted — no partsupp): minimum-cost supplier. The supply
  // relation is the observed DISTINCT (partkey, suppkey) pairs; "cost"
  // is s_acctbal. The shape under test is the CORRELATED SCALAR MIN
  // subquery over a shared CTE: Catalyst rewrites it to one grouped
  // MIN aggregate over the supply relation joined back on p_partkey —
  // two co-shuffled passes, never a per-part probe. MIN equality on
  // identical doubles is exact on both engines.
  private val q2Sql = """
    WITH partsupp AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_partkey, p_brand, p_type, s_name,
           ROUND(s_acctbal, 2) AS s_acctbal
    FROM part
      JOIN partsupp ON l_partkey = p_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
    WHERE p_size <= 10 AND p_type = 'PROMO' AND r_name = 'EUROPE'
      AND s_acctbal = (
        SELECT MIN(s2.s_acctbal)
        FROM partsupp ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
          JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
        WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal, p_partkey, s_name"""

  // Q6: the pure scan-side aggregate — a selective conjunctive filter
  // and one sum, no joins. The plan IS the pushdown test: all three
  // predicates must reach the parquet scan, and the aggregate is a
  // single partial-agg pass (one row crosses the shuffle).
  private val q6Sql = """
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,4))) AS DOUBLE), 4) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24"""

  // Q8 (adapted p_type filter): national market share — the two-role
  // nation join (supplier nation n1 = the nation under test, customer
  // nation n2 → region gate) plus a CONDITIONAL-RATIO aggregate per
  // year: share = sum(volume where supp_nation = X) / sum(volume).
  // Both nation aliases broadcast; the ratio divides two exact decimal
  // sums after aggregation, so the hash can't wobble.
  private val q8Sql = """
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4)) AS volume,
             n1.n_name AS supp_nation
      FROM part
        JOIN lineitem ON l_partkey = p_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n2.n_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD') all_nations
    GROUP BY o_year
    ORDER BY o_year"""

  // Q9 (adapted — supply cost := 0.1 × p_retailprice): product-line
  // profit by nation and year. The planner test is the five-way fact
  // join with a LIKE-filtered part dim: the p_name filter prunes part
  // BEFORE it broadcasts, and profit arithmetic stays inside one
  // decimal cast per row so partial sums are exact.
  private val q9Sql = """
    SELECT nation, o_year,
           ROUND(CAST(SUM(amount) AS DOUBLE), 4) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount)
                  - 0.1 * p_retailprice * l_quantity AS DECIMAL(38,4)) AS amount
      FROM part
        JOIN lineitem ON l_partkey = p_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC"""

  // Q10: returned-item reporting — top customers by lost revenue. The
  // l_returnflag = 'R' gate pushes to the lineitem scan; customer and
  // nation broadcast; the top-20 ends in TakeOrderedAndProject (sort
  // only the per-customer aggregate, never the facts).
  private val q10Sql = """
    SELECT c_custkey, c_name,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE), 4) AS revenue,
           ROUND(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
      JOIN orders   ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20"""

  // Q11 (adapted — stock value := lineitem revenue through EUROPE
  // suppliers; a region, not one nation, so the filter is non-empty at
  // every SF): important-stock identification. The shape is the
  // UNCORRELATED SCALAR SUBQUERY IN HAVING — the per-part aggregate
  // compares against a global aggregate of the same relation. Both
  // engines compute the threshold once (Spark plans a scalar subquery
  // broadcast, exactly what survives 100 TB: the threshold is one row).
  private val q11Sql = """
    SELECT l_partkey,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE), 4) AS part_value
    FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) > (
      SELECT 0.001 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE')
    ORDER BY part_value DESC, l_partkey"""

  // Q12 (adapted — mode := l_returnflag, no l_shipmode): shipping-mode
  // priority split. The shape is the two-way CASE count under one
  // group: urgent vs non-urgent order counts per mode bucket, filter
  // window on the ship date. One co-shuffled orderkey join, then a
  // 2-row aggregate.
  private val q12Sql = """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag IN ('A', 'N')
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  // Q13: customer order-count distribution — the LEFT OUTER join with
  // a predicate INSIDE the ON clause (so customers with zero matching
  // orders survive with count 0), then a second aggregate OVER the
  // first. The double aggregation is the test: count per customer
  // (shuffle on custkey), then the tiny distribution rollup.
  private val q13Sql = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
        LEFT OUTER JOIN orders ON c_custkey = o_custkey
          AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC"""

  // Q14: promotion-effect ratio — conditional revenue share over one
  // month. Both sums ride the same scan and aggregate; the division
  // happens once, after, on exact decimal totals.
  private val q14Sql = """
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))
                   ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE), 6) AS promo_revenue,
           COUNT(*) AS n_rows
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'"""

  // Q15: top supplier — a derived per-supplier revenue aggregate
  // probed by a SCALAR MAX over itself. Spark evaluates the CTE once
  // per reference but AQE's exchange reuse collapses the two scans;
  // the max is a one-row broadcast. Revenue kept DECIMAL through the
  // equality (exact on both engines), rounded only for output.
  private val q15Sql = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           ROUND(CAST(total_revenue AS DOUBLE), 4) AS total_revenue
    FROM supplier
      JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey"""

  // Q16 (adapted — partsupp := observed pairs, excluded suppliers by
  // name pattern): parts/supplier relationship count. The shape is the
  // NOT IN subquery (→ null-safe LeftAnti) feeding a COUNT(DISTINCT)
  // grouped by part attributes. The distinct dedups (brand, type,
  // size, suppkey) BEFORE counting — one Expand-free exact distinct.
  private val q16Sql = """
    WITH partsupp AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM partsupp
      JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'ECONOMY' AND p_size <= 25
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  // Q19 (adapted — size bands instead of container classes): the
  // DISJUNCTIVE join predicate — three (brand, size-band,
  // quantity-band) conjunctions OR'd together. The optimizer test:
  // the common p_partkey = l_partkey equi-key must still extract, so
  // this plans a broadcast hash join with the OR as residual filter,
  // NOT a nested loop; and the per-branch part predicates still push
  // into the part scan as (b1 OR b2 OR b3) column bounds.
  private val q19Sql = """
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE), 4) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
        AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30))"""

  // Q20 (adapted — "excess stock" := parts a supplier shipped more
  // than 60 units of): the NESTED IN chain — suppliers IN (grouped
  // HAVING over lineitem restricted to parts IN (LIKE-filtered part)).
  // Each IN decorrelates to a semi-join; the grouped inner aggregate
  // reduces lineitem to (suppkey, partkey) totals before any join
  // against supplier, so the probe side is pre-shrunk — the 100 TB
  // shape for "which producers exceed a volume threshold".
  private val q20Sql = """
    SELECT s_name, s_suppkey
    FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,4))) > 60)
    ORDER BY s_suppkey"""

  // Q21 (adapted — lateness := shipped more than 90 days after the
  // order date; no commit/receipt dates exist): suppliers who kept
  // multi-supplier orders waiting. The DOUBLE-DECORRELATION stress:
  // one correlated EXISTS (another supplier participated in the same
  // order) AND one correlated NOT EXISTS (no OTHER supplier was also
  // late) against the same fact — LeftSemi + LeftAnti on l_orderkey,
  // all three lineitem passes co-shuffling on orderkey with exchange
  // reuse, zero per-row subquery execution.
  private val q21Sql = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders    ON o_orderkey = l1.l_orderkey
      JOIN nation    ON n_nationkey = s_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20"""

  def specs: Seq[QuerySpec] = Seq(
    spec("sql_tpch_q2", Seq("part", "lineitem", "supplier", "nation", "region"), q2Sql),
    spec("sql_tpch_q6", Seq("lineitem"), q6Sql),
    spec("sql_tpch_q8", Seq("part", "lineitem", "supplier", "orders", "customer", "nation", "region"), q8Sql),
    spec("sql_tpch_q9", Seq("part", "lineitem", "supplier", "orders", "nation"), q9Sql),
    spec("sql_tpch_q10", Seq("customer", "orders", "lineitem", "nation"), q10Sql),
    spec("sql_tpch_q11", Seq("lineitem", "supplier", "nation", "region"), q11Sql),
    spec("sql_tpch_q12", Seq("orders", "lineitem"), q12Sql),
    spec("sql_tpch_q13", Seq("customer", "orders"), q13Sql),
    spec("sql_tpch_q14", Seq("lineitem", "part"), q14Sql),
    spec("sql_tpch_q15", Seq("lineitem", "supplier"), q15Sql),
    spec("sql_tpch_q16", Seq("lineitem", "part", "supplier"), q16Sql),
    spec("sql_tpch_q19", Seq("lineitem", "part"), q19Sql),
    spec("sql_tpch_q20", Seq("supplier", "nation", "lineitem", "part"), q20Sql),
    spec("sql_tpch_q21", Seq("supplier", "lineitem", "orders", "nation"), q21Sql))
}
