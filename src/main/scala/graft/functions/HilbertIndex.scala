package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 16-bit × 16-bit grid cell (`layout_hilbert`,
  * SURVEY.md §2.12 maintenance/layout).
  *
  * The classic xy2d walk (Wikipedia "Hilbert curve", public domain): 16
  * levels of quadrant selection with reflect/swap rotation. Unlike the
  * Z-order Morton spread (LayoutQueries.spread16), this is inherently a
  * LOOP carrying (x, y, d) state across levels — composing it from
  * built-in expressions would square the expression tree per level (each
  * level's CASE references the previous x AND y several times, and
  * Catalyst's project collapse inlines the aliases), so it lives here as
  * a native expression: nullSafeEval and doGenCode both run the 16-step
  * loop in constant space, inside whole-stage codegen, no UDF boundary.
  *
  * Inputs are masked to 16 bits; the result is the position of the cell
  * along the 65536×65536 Hilbert curve, in [0, 2^32). The DuckDB oracle
  * replays the identical loop as a 16-step recursive CTE.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_index expects (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $xa & 0xFFFFL;
         |long $y = $ya & 0xFFFFL;
         |long $d = 0L;
         |for (long $s = 32768L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_index"
}

object HilbertIndex {
  /** DataFrame-API entry: `HilbertIndex(colX, colY)` as a Column. */
  def apply(x: Column, y: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(HilbertIndex(Bridge.expression(x), Bridge.expression(y)))
  }

  /** The xy2d walk itself, for non-expression callers (the FlatGeobuf
    * packed-index writer orders features along the same curve). Inputs
    * masked to 16 bits; result in [0, 2^32). */
  def xy2d(xa: Long, ya: Long): Long = {
    var x = xa & 0xFFFFL
    var y = ya & 0xFFFFL
    var d = 0L
    var s = 32768L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
