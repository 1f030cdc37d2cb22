package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native as-of join — the whole-operator extension tier (SURVEY.md §2
  * custom-operator ladder, step (c)): a custom `LogicalPlan` node, a
  * planner `SparkStrategy`, and a physical `SparkPlan` that executes the
  * join as a single co-partitioned sorted merge.
  *
  * Semantics (the `join_asof` contract): for every probe row, the id of
  * the LAST build row with the same key and time ≤ the probe time —
  * inclusive, ties among equal build times resolved to the largest id
  * (the window formulation's (ts, tag, id) order).
  *
  * Why a custom operator earns its keep here: the declarative
  * union+window formulation (RelationalQueries `join_asof`) is
  * plan-shaped as union → shuffle → SORT → window → filter; this node
  * declares `ClusteredDistribution` on the key and a per-partition
  * (key, time, id) ordering, so EnsureRequirements co-partitions both
  * sides and the merge runs in ONE streaming pass per partition — no
  * window state, no union of the two relations, no post-filter, and the
  * probe side's columns never enter a window buffer. Both plans shuffle
  * once; the custom exec drops the window's sort-buffer machinery.
  *
  * Shape contract (kept deliberately narrow — this is an engine
  * demonstration, not a general API): both children project exactly
  * (key: long, timeUs: long, id: long); output = probe columns +
  * nullable `asof_id`. [[AsofJoin.apply]] validates and builds it.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    // a constructor field, NOT a derived val: tree copies (e.g.
    // withNewChildrenInternal) must preserve the attribute's exprId or
    // every parent referencing asof_id dangles after one optimizer pass
    asofAttr: AttributeReference = AttributeReference("asof_id", LongType, nullable = true)())
    extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ asofAttr

  // the node consumes EVERY child column (key, time, id on both sides);
  // without this, ColumnPruning sees an expression-less node with empty
  // references and prunes both children to zero columns
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical sorted-merge as-of join. Requirements do the heavy lifting:
  * clustered distribution on the key co-partitions the children (the one
  * shuffle), the (key, time, id) ordering lets the merge stream. Per
  * partition the algorithm is the textbook two-pointer as-of merge:
  * advance the build side while its (key, time) ≤ the probe's, remember
  * the last consumed (key, id), emit probe + id-if-key-matches. O(n+m)
  * per partition, constant memory, no window buffer. */
case class AsofJoinExec(outputAttrs: Seq[Attribute], left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = outputAttrs

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(left.output.head)),
    ClusteredDistribution(Seq(right.output.head)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    left.output.take(3).map(a => SortOrder(a, org.apache.spark.sql.catalyst.expressions.Ascending)),
    right.output.take(3).map(a => SortOrder(a, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] =
    left.execute().zipPartitions(right.execute()) { (probeIter, buildIter) =>
      val proj = UnsafeProjection.create(outputAttrs.map(_.dataType).toArray)
      val build = buildIter.buffered
      var lastKey = Long.MinValue
      var lastId = 0L
      var seen = false
      probeIter.map { l =>
        val lk = l.getLong(0); val lt = l.getLong(1)
        while (build.hasNext && {
          val rk = build.head.getLong(0)
          rk < lk || (rk == lk && build.head.getLong(1) <= lt)
        }) {
          val r = build.next()
          lastKey = r.getLong(0); lastId = r.getLong(2); seen = true
        }
        val row = new GenericInternalRow(4)
        row.setLong(0, lk); row.setLong(1, lt); row.setLong(2, l.getLong(2))
        if (seen && lastKey == lk) row.setLong(3, lastId) else row.setNullAt(3)
        proj(row)
      }
    }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to its exec — injected by
  * [[graft.GraftExtensions]] via `injectPlannerStrategy`. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsofJoinPlan =>
      AsofJoinExec(p.output, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

object AsofJoin {

  /** Build the native as-of join over two 3-column (key, timeUs, id)
    * long frames; output columns are the probe's three plus `asof_id`.
    *
    * Null contract: rows with a null key or time are DROPPED from both
    * sides before the merge — a null key/time has no as-of position, and
    * the physical merge reads raw long slots (`getLong` on a null slot
    * yields 0 and NULLS-FIRST ordering would let such a row mask real
    * matches). This matches SQL join semantics on the build side; probe
    * rows with nulls are excluded rather than emitted with a null
    * `asof_id`, and the Scaladoc is the contract. */
  def apply(probe: DataFrame, build: DataFrame): DataFrame = {
    def check(df: DataFrame, side: String): DataFrame = {
      val fs = df.schema.fields
      require(fs.length == 3 && fs.forall(_.dataType == LongType),
        s"AsofJoin $side side must be exactly (key: long, timeUs: long, id: long), " +
          s"got ${df.schema.simpleString}")
      df.na.drop(Seq(fs(0).name, fs(1).name))
    }
    val p = check(probe, "probe"); val b = check(build, "build")
    val spark = probe.sparkSession
    org.apache.spark.sql.graftbridge.Bridge.dataFrame(spark,
      AsofJoinPlan(p.queryExecution.analyzed, b.queryExecution.analyzed))
  }

  /** Column helper so callers don't need to know the positional contract. */
  def frame(df: DataFrame, key: Column, timeUs: Column, id: Column): DataFrame =
    df.select(key.cast("long").as("k"), timeUs.cast("long").as("t_us"),
      id.cast("long").as("id"))
}
