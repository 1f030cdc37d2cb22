package graft

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension wiring (SURVEY.md §2.13): registers graft's native
  * Catalyst expressions for SQL callers. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
  import org.apache.spark.sql.types.IntegerType
  import graft.functions.GeoKernelExpressions
  import graft.functions.GeoKernelExpressions._

  // Argument coercion (st_point_wkt(1, 2) with integer literals etc.)
  // lives on the expressions themselves: each mixes in
  // ImplicitCastInputTypes, so the analyzer's ImplicitTypeCasts rule
  // inserts the casts for ANY construction path — SQL text through this
  // extension, direct Column-API construction, or the UDF fallback —
  // identically. (An earlier revision cast here in the builders, which
  // covered only the SQL-text path.)

  private def arity(name: String, n: Int)(
      b: Seq[Expression] => Expression): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(GeoKernelExpressions.getClass.getName, name),
    (children: Seq[Expression]) => {
      if (children.length != n)
        throw new IllegalArgumentException(
          s"$name requires exactly $n arguments, got ${children.length}")
      b(children)
    })

  /** Constructor-parameter ints (EPSG codes, band/bit counts) arrive
    * from SQL text as literal ints — the expressions take them as
    * constructor parameters, not children. */
  private def intLit(e: Expression): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"argument must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"dot_product requires exactly 2 arguments, got ${children.length}")
        DotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[graft.functions.HilbertIndex].getName, "hilbert_index"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"hilbert_index requires exactly 2 arguments, got ${children.length}")
        graft.functions.HilbertIndex(children(0), children(1))
      }))
    // aggregate(zip_with(a,b,*),0d,+) → native DotProduct, transparently
    ext.injectOptimizerRule(_ => graft.functions.DotProductRewrite)
    // pure constant-width range joins → binned equi-joins, transparently
    // (the nested-loop interval-join trap, optimized away at the plan
    // level — see plans/RangeBinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RangeBinRewrite)
    // whole-operator tier: the native sorted-merge as-of join
    // (plans/AsofJoinPlan → AsofJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // SQL DML (DELETE/UPDATE/MERGE) on `USING graft` views → the
    // transaction log's copy-on-write kernels (plans/GraftDml)
    ext.injectResolutionRule(_ => graft.plans.GraftDml)
    // catalog tables (CREATE TABLE graft_cat.ns.t …): read-side DSv2
    // relations swap to the log-backed v1 relation during resolution,
    // so catalog reads prune like path reads and DML reaches GraftDml
    ext.injectResolutionRule(s => new graft.sources.GraftCatalogRelations(s))
    // SQL-first CDF: SELECT * FROM table_changes('<path>', start[, end])
    // — Delta's TVF shape; versions inclusive both ends, end defaults to
    // head. The plan is the changeFeed's own (per-commit parquet scans
    // + exact COW images), so it composes with any SQL on top.
    ext.injectTableFunction((
      new FunctionIdentifier("table_changes"),
      new ExpressionInfo(graft.plans.TxLog.getClass.getName, "table_changes"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
        require(args.length == 2 || args.length == 3,
          s"table_changes(path, startingVersion[, endingVersion]) takes 2-3 " +
            s"arguments, got ${args.length}")
        def str(e: Expression): String = e match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"table_changes: argument must be a string literal, got $other")
        }
        def long(e: Expression): Long = e match {
          case Literal(i: Int, IntegerType) => i.toLong
          case Literal(l: Long, LongType) => l
          case other => throw new IllegalArgumentException(
            s"table_changes: version must be an integer literal, got $other")
        }
        val spark = org.apache.spark.sql.SparkSession.active
        val path = str(args(0))
        val start = long(args(1))
        val end = args.lift(2).map(long)
          .getOrElse(graft.plans.TxLog.latestVersion(path))
        // startingVersion=0 means "from the beginning" (Delta's contract)
        // — version 0 does not exist, so the exclusive lower bound clamps
        graft.plans.TxLog.changeFeed(spark, path, math.max(start - 1, 0L), end)
          .queryExecution.logical
      }))
    // SQL maintenance (VACUUM / OPTIMIZE / DESCRIBE HISTORY graft '…')
    // — three intercepted statement shapes, everything else delegated
    ext.injectParser((session, delegate) => new graft.plans.GraftSqlParser(delegate, Some(session)))

    // The geo scalar kernel for SQL-text callers — the same native
    // codegen expressions the Column API builds (GeoFunctions.register's
    // UDF wrappers remain only as the no-extensions fallback).
    ext.injectFunction(arity("st_point_wkt", 2)(c => StPointWkt(c(0), c(1))))
    ext.injectFunction(arity("st_astext_wkb", 1)(c => StAsTextFromWkb(c(0))))
    ext.injectFunction(arity("st_astext_wkt", 1)(c => StAsTextFromWkt(c(0))))
    ext.injectFunction(arity("st_astext_hexwkb", 1)(c => StAsTextFromHexWkb(c(0))))
    ext.injectFunction(arity("st_point_transform_wkt", 4)(c =>
      StPointTransformWkt(c(0), c(1), intLit(c(2)), intLit(c(3)))))
    ext.injectFunction(arity("st_transform_wkb_wkt", 3)(c =>
      StTransformWkbToWkt(c(0), intLit(c(1)), intLit(c(2)))))
    ext.injectFunction(arity("st_transform_wkt_wkt", 3)(c =>
      StTransformWktToWkt(c(0), intLit(c(1)), intLit(c(2)))))
    ext.injectFunction(arity("st_centroid_x_wkt", 1)(c => CentroidFromWkt(c(0), axisX = true)))
    ext.injectFunction(arity("st_centroid_y_wkt", 1)(c => CentroidFromWkt(c(0), axisX = false)))
    ext.injectFunction(arity("infer_crs", 4)(c => InferCrs(c)))

    // The one-pass dedup kernels for SQL-text callers (round 7): the
    // streaming near-dup signature and the winnowing fingerprint ride
    // the same registration path as dot_product.
    ext.injectFunction(arity("minhash_band_keys", 1)(c =>
      graft.functions.MinHashBandKeys(c(0))))
    ext.injectFunction(arity("winnow_fingerprint", 1)(c =>
      graft.functions.WinnowFingerprint(c(0))))
    ext.injectFunction(arity("lsh_band_keys", 3)(c =>
      graft.functions.LshBandKeys(c(0), intLit(c(1)), intLit(c(2)))))
    // the Gopher repetition battery's one-pass kernel, same path
    ext.injectFunction(arity("repetition_stats", 1)(c =>
      graft.functions.RepetitionStats(c(0))))

    // UDTF tier: the native shingle Generator for LATERAL VIEW callers
    ext.injectFunction((
      new FunctionIdentifier("shingle_explode"),
      new ExpressionInfo(classOf[graft.functions.ShingleExplode].getName, "shingle_explode"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"shingle_explode requires exactly 2 arguments, got ${children.length}")
        graft.functions.ShingleExplode(children(0), children(1))
      }))
  }
}
