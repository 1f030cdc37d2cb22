package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL MAINTENANCE statements for graft tables — the Delta-shaped
  * surface that completes the SQL-first story (readers, writers, and
  * DML already route through `USING graft` views; maintenance was the
  * last Scala-API-only corner). A delegating parser (injected by
  * GraftExtensions) intercepts exactly four statement shapes and hands
  * everything else to Spark's own parser untouched:
  *
  * {{{
  *   VACUUM graft '<table dir>' [RETAIN <n> HOURS]
  *   OPTIMIZE graft '<table dir>' [FILES <n>] [CLUSTER BY (c1, c2 [, …])]
  *   DESCRIBE HISTORY graft '<table dir>'
  *   RESTORE graft '<table dir>' TO VERSION <n> | TO TIMESTAMP <millis>
  * }}}
  *
  * The explicit `graft` keyword keeps the grammar unambiguous with any
  * future Spark statement of the same name (Spark 4 has no VACUUM /
  * OPTIMIZE of its own; DESCRIBE HISTORY would otherwise parse as a
  * DESCRIBE TABLE of a table named history). Each statement returns
  * rows (files reclaimed; versions before/after + file counts; the
  * commit history) so SQL callers can assert outcomes the way the
  * Scala API's return values allow. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Vacuum =
    """(?is)\s*VACUUM\s+graft\s+'([^']+)'(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*""".r
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+graft\s+'([^']+)'(?:\s+FILES\s+(\d+))?(?:\s+CLUSTER\s+BY\s*\(([^)]+)\))?\s*;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+graft\s+'([^']+)'\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+graft\s+'([^']+)'\s+TO\s+(VERSION|TIMESTAMP)\s+(\d+)\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Vacuum(path, retain) =>
      GraftVacuumCommand(path,
        Option(retain).map(_.toLong * 3600 * 1000)
          .getOrElse(TxLog.DefaultVacuumRetentionMs))
    case Optimize(path, files, cluster) =>
      GraftOptimizeCommand(path,
        Option(files).map(_.toInt).getOrElse(1),
        Option(cluster).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil))
    case History(path) => GraftHistoryCommand(path)
    case Restore(path, kind, v) =>
      GraftRestoreCommand(path, v.toLong, byTimestamp = kind.equalsIgnoreCase("TIMESTAMP"))
    case other => delegate.parsePlan(other)
  }

  /** Parameterized SQL (`spark.sql(text, args)`) must reach the
    * DELEGATE's parameter-aware entry point — the interface default
    * would drop the binding context and every named marker would read
    * unbound. Our three statements take no parameters, so they keep
    * routing through the plain match (all four take none). */
  override def parsePlanWithParameters(
      sqlText: String,
      context: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    sqlText match {
      case Vacuum(_, _) | Optimize(_, _, _) | History(_) | Restore(_, _, _) =>
        parsePlan(sqlText)
      case other => delegate.parsePlanWithParameters(other, context)
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

private object GraftMaintenance {
  def attrs(fields: (String, org.apache.spark.sql.types.DataType)*): Seq[Attribute] =
    fields.map { case (n, t) => AttributeReference(n, t, nullable = false)() }
}

/** `VACUUM graft '<path>' [RETAIN n HOURS]` → files reclaimed. */
final case class GraftVacuumCommand(table: String, retainMs: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    GraftMaintenance.attrs("files_reclaimed" -> LongType)
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(TxLog.vacuum(table, retainMs).toLong))
}

/** `OPTIMIZE graft '<path>' [FILES n] [CLUSTER BY (…)]` → the layout
  * change, provable from the returned counts. */
final case class GraftOptimizeCommand(
    table: String, numFiles: Int, clusterBy: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenance.attrs(
    "version" -> LongType, "files_before" -> IntegerType,
    "files_after" -> IntegerType)
  override def run(session: SparkSession): Seq[Row] = {
    val before = TxLog.liveFileCount(table)
    val v = TxLog.compact(session, table, numFiles, clusterBy)
    Seq(Row(v, before, TxLog.liveFileCount(table)))
  }
}

/** `RESTORE graft '<path>' TO VERSION n | TO TIMESTAMP millis` — the
  * metadata-only rollback as SQL text; returns the new head version and
  * the version restored to. */
final case class GraftRestoreCommand(table: String, target: Long, byTimestamp: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenance.attrs(
    "version" -> LongType, "restored_to" -> LongType)
  override def run(session: SparkSession): Seq[Row] = {
    val toVersion = if (byTimestamp) TxLog.versionAt(table, target) else target
    Seq(Row(TxLog.restore(table, toVersion), toVersion))
  }
}

/** `DESCRIBE HISTORY graft '<path>'` → the commit log, newest first. */
final case class GraftHistoryCommand(table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenance.attrs(
    "version" -> LongType, "op" -> StringType,
    "files_added" -> IntegerType, "files_removed" -> IntegerType,
    "data_change" -> BooleanType, "partition_cols" -> StringType)
  override def run(session: SparkSession): Seq[Row] = {
    require(TxLog.latestVersion(table) > 0,
      s"$table is not a graft table (no commits) — an empty history would " +
        "read as a healthy empty table")
    TxLog.history(table).reverse.map { c =>
      Row(c.version, c.op, c.add.length, c.remove.length, c.dataChange,
        c.partitionCols.mkString(","))
    }
  }
}
