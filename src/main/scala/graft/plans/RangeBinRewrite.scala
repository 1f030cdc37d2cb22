package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite the pure constant-width range join
  *
  *   A JOIN B  ON  b.x >= a.lo AND b.x < a.lo + C        (C a long literal)
  *
  * — which has NO equi key and therefore plans as a nested-loop cross
  * product, the classic interval-join scale trap — into the binned
  * equi-join `join_range_binned` hand-writes: the `lo` side explodes to
  * the (at most two, for width-C buckets) bucket ids its interval
  * covers, the `x` side computes its single bucket, the join runs
  * hash-partitioned on bucket, and the ORIGINAL range predicate filters
  * exactly inside the matched bucket. Each qualifying (interval, x) pair
  * meets exactly once because x lives in one bucket, so no dedup is
  * needed and the rewrite is result-identical (null semantics included:
  * a null `lo` explodes to no buckets, a null `x` joins nothing — both
  * dropped, exactly as the null range predicate drops them).
  *
  * The constant width is what makes the rewrite PROVABLY safe: the
  * interval [lo, lo+C) can only span buckets trunc(lo/C) ..
  * trunc((lo+C-1)/C) (truncating division is monotone), so generating
  * that inclusive bucket range loses nothing at any sign of lo. Only the
  * exact conjunction shape above (either conjunct order, either
  * comparison orientation, LongType columns, C > 0, batch plans) is
  * touched; anything else — extra conjuncts, variable-width bounds,
  * streaming children — is left for the planner as written.
  *
  * Injected by [[graft.GraftExtensions]]; `join_range_auto` exercises it
  * from the registry and RangeBinRewriteSpec asserts both the plan shape
  * and result equality against the un-rewritten nested-loop twin.
  */
object RangeBinRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(And(c1, c2)), _)
        if !left.isStreaming && !right.isStreaming =>
      matchRange(c1, c2, j).orElse(matchRange(c2, c1, j))
        .map { case (x, lo, c) => rewrite(j, x, lo, c) }
        .getOrElse(j)
  }

  /** ge must be `x >= lo` (or `lo <= x`); lt must be `x < lo + C` (or
    * `lo + C > x`) over the SAME attributes, with x and lo on opposite
    * sides of the join. */
  private def matchRange(ge: Expression, lt: Expression, j: Join)
      : Option[(Attribute, Attribute, Long)] = {
    val geM = ge match {
      case GreaterThanOrEqual(x: AttributeReference, lo: AttributeReference) => Some((x, lo))
      case LessThanOrEqual(lo: AttributeReference, x: AttributeReference) => Some((x, lo))
      case _ => None
    }
    val ltM = lt match {
      case LessThan(x: AttributeReference,
          Add(lo: AttributeReference, Literal(c: Long, LongType), _)) => Some((x, lo, c))
      case GreaterThan(Add(lo: AttributeReference, Literal(c: Long, LongType), _),
          x: AttributeReference) => Some((x, lo, c))
      case _ => None
    }
    for {
      (x1, lo1) <- geM
      (x2, lo2, c) <- ltM
      if x1.exprId == x2.exprId && lo1.exprId == lo2.exprId && c > 0 &&
        x1.dataType == LongType && lo1.dataType == LongType &&
        ((j.left.outputSet.contains(lo1) && j.right.outputSet.contains(x1)) ||
          (j.right.outputSet.contains(lo1) && j.left.outputSet.contains(x1)))
    } yield (x1, lo1, c)
  }

  private def rewrite(j: Join, x: Attribute, lo: Attribute, c: Long): LogicalPlan = {
    val (binSide, probeSide) =
      if (j.left.outputSet.contains(lo)) (j.left, j.right) else (j.right, j.left)
    val cLit = Literal(c, LongType)
    // interval side: one row per covered bucket (≤ 2 for width-C buckets)
    val binStart = new IntegralDivide(lo, cLit)
    val wBucket = AttributeReference("graft_bin_w", LongType, nullable = true)()
    val gen = Generate(
      // timeZoneId must be pinned explicitly: analysis' ResolveTimeZone
      // has already run, and a TimeZoneAwareExpression without a zone is
      // "unresolved" to the optimizer's plan validator (irrelevant to
      // LongType sequences, but required for resolution).
      // stop clamps to >= start: if lo + (C-1) wraps past Long.MaxValue
      // the original predicate is vacuously false for that row (x < a
      // huge-negative wrap), but an unclamped descending stop would make
      // Sequence default to step -1 and fabricate a billions-long bucket
      // list; clamped, the row contributes one bucket and the re-checked
      // predicate drops it — identical result, constant work. Without
      // overflow, truncating division is monotone so stop >= start and
      // the clamp is a no-op.
      Explode(new Sequence(
        binStart,
        Greatest(Seq(binStart,
          new IntegralDivide(new Add(lo, Literal(c - 1, LongType)), cLit))),
        None, Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(wBucket), child = binSide)
    // point side: its single bucket
    val xBucket = Alias(new IntegralDivide(x, cLit), "graft_bin_x")()
    val probe = Project(probeSide.output :+ xBucket, probeSide)
    val joined = Join(gen, probe, Inner,
      Some(EqualTo(wBucket, xBucket.toAttribute)), JoinHint.NONE)
    // exact containment re-checked inside the bucket; original column
    // order restored and the bin columns dropped
    Project(j.output, Filter(j.condition.get, joined))
  }
}
