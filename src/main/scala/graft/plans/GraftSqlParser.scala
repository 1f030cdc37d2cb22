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
  *   VACUUM graft '<table dir>' [RETAIN <n> HOURS] [DRY RUN]
  *   CLEAN LOG graft '<table dir>' [RETAIN <n> HOURS]
  *   OPTIMIZE graft '<table dir>' [FILES <n>] [WHERE k = 'v' [AND …]]
  *     [CLUSTER BY (c1, c2 [, …])]
  *   DESCRIBE HISTORY graft '<table dir>'
  *   DESCRIBE DETAIL graft '<table dir>'
  *   RESTORE graft '<table dir>' TO VERSION <n> | TO TIMESTAMP <millis>
  *   ALTER TABLE graft '<dir>' ADD CONSTRAINT <name> CHECK (<expr>)
  *   ALTER TABLE graft '<dir>' DROP CONSTRAINT <name>
  *   CONVERT TO GRAFT '<dir>' [PARTITIONED BY (c1, ...)]
  *   CLONE graft '<src>' TO '<dst>' [VERSION <n>]
  * }}}
  *
  * The explicit `graft` keyword keeps the grammar unambiguous with any
  * future Spark statement of the same name (Spark 4 has no VACUUM /
  * OPTIMIZE of its own; DESCRIBE HISTORY would otherwise parse as a
  * DESCRIBE TABLE of a table named history). Each statement returns
  * rows (files reclaimed; versions before/after + file counts; the
  * commit history) so SQL callers can assert outcomes the way the
  * Scala API's return values allow. */
class GraftSqlParser(
    delegate: ParserInterface,
    session: Option[SparkSession] = None) extends ParserInterface {

  /** A DOTTED target is intercepted ONLY when its head names a
    * registered [[graft.sources.GraftCatalog]] — any other dotted name
    * (another extension's table, the session catalog) must keep flowing
    * to the delegate parser untouched. The `graft '<path>'` form is
    * always ours. */
  private def ours(path: String, ident: String): Boolean =
    path != null || (ident != null && session.exists { s =>
      val head = ident.split("\\.").head
      try s.sessionState.catalogManager.catalog(head)
        .isInstanceOf[graft.sources.GraftCatalog]
      catch { case scala.util.control.NonFatal(_) => false }
    })

  // Target: `graft '<path>'` (group 1) or a DOTTED catalog identifier
  // `cat.ns….table` (group 2) — dotted-only so an unqualified name can
  // never be hijacked from a future Spark statement of the same verb.
  private val T = """(?:graft\s+'([^']+)'|([A-Za-z_][\w]*(?:\.[A-Za-z_][\w]*)+))"""
  private val Vacuum =
    ("""(?is)\s*VACUUM\s+""" + T +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS)?(?:\s+(DRY\s+RUN))?\s*;?\s*""").r
  private val WhereSpec =
    """(?:\s+WHERE\s+([A-Za-z_]\w*\s*=\s*'[^']*'(?:\s+AND\s+[A-Za-z_]\w*\s*=\s*'[^']*')*))?"""
  private val Optimize =
    ("""(?is)\s*OPTIMIZE\s+""" + T + """(?:\s+FILES\s+(\d+))?""" + WhereSpec +
      """(?:\s+CLUSTER\s+BY\s*\(([^)]+)\))?\s*;?\s*""").r

  /** `k = 'v' AND j = 'w'` → the partition spec map. */
  private def specOf(where: String): Map[String, String] =
    where.split("(?i)\\s+AND\\s+").map { kv =>
      val m = """(?s)([A-Za-z_]\w*)\s*=\s*'([^']*)'""".r
      kv.trim match {
        case m(k, v) => k -> v
        case other => throw new IllegalArgumentException(
          s"OPTIMIZE WHERE expects k = 'v' [AND ...]; got '$other'")
      }
    }.toMap
  private val History =
    ("""(?is)\s*DESCRIBE\s+HISTORY\s+""" + T + """\s*;?\s*""").r
  private val Detail =
    ("""(?is)\s*DESCRIBE\s+DETAIL\s+""" + T + """\s*;?\s*""").r
  private val Restore =
    ("""(?is)\s*RESTORE\s+""" + T + """\s+TO\s+(VERSION|TIMESTAMP)\s+(\d+)\s*;?\s*""").r
  private val AddConstraint =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + T +
      """\s+ADD\s+CONSTRAINT\s+([A-Za-z_]\w*)\s+CHECK\s*\((.+)\)\s*;?\s*""").r
  private val DropConstraint =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + T +
      """\s+DROP\s+CONSTRAINT\s+([A-Za-z_]\w*)\s*;?\s*""").r
  private val Convert =
    ("""(?is)\s*CONVERT\s+TO\s+GRAFT\s+'([^']+)'""" +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]+)\))?\s*;?\s*""").r
  private val CleanLog =
    ("""(?is)\s*CLEAN\s+LOG\s+""" + T +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*""").r
  private val CloneStmt =
    ("""(?is)\s*CLONE\s+""" + T + """\s+TO\s+'([^']+)'""" +
      """(?:\s+VERSION\s+(\d+))?\s*;?\s*""").r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Vacuum(path, ident, retain, dry) if ours(path, ident) =>
      val retainMs = Option(retain).map(_.toLong * 3600 * 1000)
        .getOrElse(TxLog.DefaultVacuumRetentionMs)
      if (dry != null) GraftVacuumDryRunCommand(GraftTableRef(path, ident), retainMs)
      else GraftVacuumCommand(GraftTableRef(path, ident), retainMs)
    case Optimize(path, ident, files, where, cluster) if ours(path, ident) =>
      GraftOptimizeCommand(GraftTableRef(path, ident),
        Option(files).map(_.toInt).getOrElse(1),
        Option(cluster).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil),
        Option(where).map(specOf).getOrElse(Map.empty))
    case History(path, ident) if ours(path, ident) =>
      GraftHistoryCommand(GraftTableRef(path, ident))
    case Detail(path, ident) if ours(path, ident) =>
      GraftDescribeDetailCommand(GraftTableRef(path, ident))
    case Restore(path, ident, kind, v) if ours(path, ident) =>
      GraftRestoreCommand(GraftTableRef(path, ident), v.toLong,
        byTimestamp = kind.equalsIgnoreCase("TIMESTAMP"))
    case AddConstraint(path, ident, name, check) if ours(path, ident) =>
      GraftAddConstraintCommand(GraftTableRef(path, ident), name, check.trim)
    case DropConstraint(path, ident, name) if ours(path, ident) =>
      GraftDropConstraintCommand(GraftTableRef(path, ident), name)
    case Convert(dir, parts) =>
      GraftConvertCommand(dir,
        Option(parts).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil))
    case CleanLog(path, ident, retain) if ours(path, ident) =>
      GraftCleanLogCommand(GraftTableRef(path, ident),
        Option(retain).map(_.toLong * 3600 * 1000)
          .getOrElse(TxLog.DefaultLogRetentionMs))
    case CloneStmt(path, ident, dst, v) if ours(path, ident) =>
      GraftCloneCommand(GraftTableRef(path, ident), dst,
        Option(v).map(_.toLong))
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
      case Vacuum(p, i, _, _) if ours(p, i) => parsePlan(sqlText)
      case Optimize(p, i, _, _, _) if ours(p, i) => parsePlan(sqlText)
      case History(p, i) if ours(p, i) => parsePlan(sqlText)
      case Detail(p, i) if ours(p, i) => parsePlan(sqlText)
      case Restore(p, i, _, _) if ours(p, i) => parsePlan(sqlText)
      case AddConstraint(p, i, _, _) if ours(p, i) => parsePlan(sqlText)
      case DropConstraint(p, i, _) if ours(p, i) => parsePlan(sqlText)
      case Convert(_, _) => parsePlan(sqlText)
      case CleanLog(p, i, _) if ours(p, i) => parsePlan(sqlText)
      case CloneStmt(p, i, _, _) if ours(p, i) => parsePlan(sqlText)
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

/** A maintenance statement's target: a raw table directory (the
  * `graft '<path>'` form) or a dotted catalog identifier resolved
  * against a registered [[graft.sources.GraftCatalog]] at RUN time —
  * parse time has no catalog manager. Exactly one of the two is set. */
final case class GraftTableRef(path: String, ident: String) {
  def resolve(session: SparkSession): String =
    if (path != null) path
    else {
      val parts = ident.split("\\.").toSeq
      val cat =
        try session.sessionState.catalogManager.catalog(parts.head)
        catch {
          // only "no such catalog" earns the registration hint — an
          // instantiation failure of a REGISTERED catalog must surface
          // as itself
          case e: org.apache.spark.sql.connector.catalog.CatalogNotFoundException =>
            throw new IllegalArgumentException(
              s"graft maintenance on '$ident': '${parts.head}' is not a " +
                "registered catalog — qualify as <graft-catalog>.<ns>.<table> " +
                "or address by path with graft '<path>'", e)
        }
      cat match {
        case g: graft.sources.GraftCatalog =>
          g.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
            parts.tail.init.toArray, parts.last)) match {
            case t: graft.sources.GraftTable => t.path
            case other => throw new IllegalStateException(
              s"catalog '${parts.head}' returned a non-graft table for " +
                s"'$ident': ${other.getClass.getName}")
          }
        case other => throw new IllegalArgumentException(
          s"graft maintenance on '$ident': catalog '${parts.head}' is " +
            s"${other.getClass.getName}, not a graft catalog")
      }
    }
  override def toString: String = if (path != null) path else ident
}

/** `VACUUM graft '<path>' [RETAIN n HOURS]` → files reclaimed. */
final case class GraftVacuumCommand(ref: GraftTableRef, retainMs: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    GraftMaintenance.attrs("files_reclaimed" -> LongType)
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(TxLog.vacuum(ref.resolve(session), retainMs).toLong))
}

/** `OPTIMIZE graft '<path>' [FILES n] [CLUSTER BY (…)]` → the layout
  * change, provable from the returned counts. */
final case class GraftOptimizeCommand(
    ref: GraftTableRef, numFiles: Int, clusterBy: Seq[String],
    partitionSpec: Map[String, String] = Map.empty)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenance.attrs(
    "version" -> LongType, "files_before" -> IntegerType,
    "files_after" -> IntegerType)
  override def run(session: SparkSession): Seq[Row] = {
    val table = ref.resolve(session)
    val before = TxLog.liveFileCount(table)
    val v = TxLog.compact(session, table, numFiles, clusterBy, partitionSpec)
    Seq(Row(v, before, TxLog.liveFileCount(table)))
  }
}

/** `VACUUM … DRY RUN` — the exact reclaim list, nothing deleted: the
  * look-before-you-leap every operator wants ahead of an irreversible
  * sweep (Delta parity). */
final case class GraftVacuumDryRunCommand(ref: GraftTableRef, retainMs: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenance.attrs("path" -> StringType)
  override def run(session: SparkSession): Seq[Row] =
    TxLog.vacuumCandidates(ref.resolve(session), retainMs).map(Row(_))
}

/** `RESTORE graft '<path>' TO VERSION n | TO TIMESTAMP millis` — the
  * metadata-only rollback as SQL text; returns the new head version and
  * the version restored to. */
final case class GraftRestoreCommand(ref: GraftTableRef, target: Long, byTimestamp: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenance.attrs(
    "version" -> LongType, "restored_to" -> LongType)
  override def run(session: SparkSession): Seq[Row] = {
    val table = ref.resolve(session)
    val toVersion = if (byTimestamp) TxLog.versionAt(table, target) else target
    Seq(Row(TxLog.restore(session, table, toVersion), toVersion))
  }
}

/** `DESCRIBE HISTORY graft '<path>'` → the commit log, newest first. */
final case class GraftHistoryCommand(ref: GraftTableRef)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenance.attrs(
    "version" -> LongType, "op" -> StringType,
    "files_added" -> IntegerType, "files_removed" -> IntegerType,
    "data_change" -> BooleanType, "partition_cols" -> StringType)
  override def run(session: SparkSession): Seq[Row] = {
    val table = ref.resolve(session)
    require(TxLog.latestVersion(table) > 0,
      s"$table is not a graft table (no commits) — an empty history would " +
        "read as a healthy empty table")
    TxLog.history(table).reverse.map { c =>
      Row(c.version, c.op, c.add.length, c.remove.length, c.dataChange,
        c.partitionCols.mkString(","))
    }
  }
}

/** `DESCRIBE DETAIL graft '<path>'` — Delta's one-row table summary:
  * format, location, head version, live file count, live bytes,
  * partition columns, first/last commit instants. O(live files) driver
  * work (one size stat per file) — an ops statement, never a hot path. */
final case class GraftDescribeDetailCommand(ref: GraftTableRef)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenance.attrs(
    "format" -> StringType, "location" -> StringType,
    "version" -> LongType, "num_files" -> LongType,
    "size_bytes" -> LongType, "partition_columns" -> StringType,
    "created_at" -> org.apache.spark.sql.types.TimestampType,
    "last_modified" -> org.apache.spark.sql.types.TimestampType)
  override def run(session: SparkSession): Seq[Row] = {
    val table = ref.resolve(session)
    require(TxLog.latestVersion(table) > 0,
      s"$table is not a graft table (no commits)")
    val snap = TxLog.snapshotInfo(table)
    val hist = TxLog.history(table)
    val bytes = snap.files.map { f =>
      val p = java.nio.file.Paths.get(table, f)
      if (java.nio.file.Files.exists(p)) java.nio.file.Files.size(p) else 0L
    }.sum
    Seq(Row("graft", table, snap.version, snap.files.length.toLong, bytes,
      snap.partitionCols.mkString(","),
      new java.sql.Timestamp(hist.head.ts), new java.sql.Timestamp(hist.last.ts)))
  }
}

/** `ALTER TABLE <t> ADD CONSTRAINT <name> CHECK (<expr>)` — validates
  * existing rows first (loud), then persists as a table property the
  * write gates enforce from the next commit on. */
final case class GraftAddConstraintCommand(
    ref: GraftTableRef, name: String, check: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenance.attrs("version" -> LongType)
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(TxLog.addConstraint(session, ref.resolve(session), name, check)))
}

/** `ALTER TABLE <t> DROP CONSTRAINT <name>` — loud if absent. */
final case class GraftDropConstraintCommand(ref: GraftTableRef, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenance.attrs("version" -> LongType)
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(TxLog.dropConstraint(ref.resolve(session), name)))
}

/** `CONVERT TO GRAFT '<dir>' [PARTITIONED BY (...)]` — adopt a plain
  * parquet directory in place (files move under the log's layout; no
  * bytes copied). */
final case class GraftConvertCommand(dir: String, partitionBy: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenance.attrs(
    "version" -> LongType, "files_converted" -> IntegerType)
  override def run(session: SparkSession): Seq[Row] = {
    val v = TxLog.convert(session, dir, partitionBy)
    Seq(Row(v, TxLog.liveFileCount(dir)))
  }
}

/** `CLONE graft '<src>' TO '<dst>' [VERSION n]` — zero-copy independent
  * clone via hard links. */
final case class GraftCloneCommand(ref: GraftTableRef, dst: String, asOf: Option[Long])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenance.attrs(
    "version" -> LongType, "files_linked" -> IntegerType)
  override def run(session: SparkSession): Seq[Row] = {
    val v = TxLog.cloneTable(ref.resolve(session), dst, asOf)
    Seq(Row(v, TxLog.liveFileCount(dst)))
  }
}

/** `CLEAN LOG graft '<path>' [RETAIN n HOURS]` — bound the log
  * directory's own growth: remove commit entries and superseded
  * checkpoints below the newest checkpoint that are past retention.
  * Returns the removal count and the new time-travel floor. */
final case class GraftCleanLogCommand(ref: GraftTableRef, retainMs: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenance.attrs(
    "entries_removed" -> IntegerType, "earliest_version" -> LongType)
  override def run(session: SparkSession): Seq[Row] = {
    val table = ref.resolve(session)
    val n = TxLog.cleanLog(table, retainMs)
    Seq(Row(n, TxLog.earliestVersion(table)))
  }
}
