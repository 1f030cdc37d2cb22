package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** k-dimensional Hilbert index (Skilling's transform — "Programming the
  * Hilbert curve", AIP Conf. Proc. 707, 2004; the standard public
  * in-place axes→transpose walk) for 2 ≤ k ≤ 6 dimensions of `bits`
  * bits each: the position of a grid cell along the k-D Hilbert curve,
  * in [0, 2^(k·bits)).
  *
  * The 2-D [[HilbertIndex]] stays the layout_hilbert operator (its
  * orientation is pinned by a DuckDB recursive-CTE oracle); this is the
  * ≥3-D generalization `compact(clusterBy = …)` needs for the realistic
  * training-data layouts (time × key × quality). Orientation differs
  * from the 2-D walk — irrelevant for clustering, where only the
  * locality property matters, and pinned by HilbertKSpec's exhaustive
  * unit-step adjacency proof (consecutive indexes differ by exactly one
  * step along exactly one axis — the defining Hilbert property).
  *
  * Codegen stays inside whole-stage codegen: the generated code calls
  * the shared [[HilbertK.index]] kernel (one static-ish call per row,
  * no UDF/serialization boundary). */
case class HilbertKIndex(children: Seq[Expression], bits: Int)
    extends Expression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq.fill(children.size)(LongType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 6)
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_k takes 2..6 coordinate columns, got ${children.size}")
    else if (bits < 1 || bits * children.size > 62)
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_k: $bits bits × ${children.size} dims exceeds a signed long")
    else if (children.exists(_.dataType != LongType))
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_k expects bigint coordinates, got " +
          children.map(_.dataType.simpleString).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val coords = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      coords(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertK.index(coords, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("hkCoords")
    val anyNull =
      if (!nullable) "false"
      else children.zip(evals).collect {
        case (c, e) if c.nullable => e.isNull.toString
      }.mkString(" || ") match { case "" => "false"; case s => s }
    val fill = evals.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = ${e.value};" }.mkString("\n")
    ev.copy(code = code"""
      ${evals.map(_.code).reduce(_ + _)}
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = -1L;
      if (!${ev.isNull}) {
        long[] $arr = new long[${children.size}];
        $fill
        ${ev.value} = graft.functions.HilbertK.index($arr, $bits);
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertKIndex =
    copy(children = newChildren)

  override def prettyName: String = "hilbert_k"
}

object HilbertK {
  /** DataFrame-API entry. */
  def apply(bits: Int, coords: Column*): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(HilbertKIndex(coords.map(Bridge.expression), bits))
  }

  /** Skilling's AxestoTranspose followed by bit interleave: coordinates
    * (masked to `bits` bits each) → position on the k-D Hilbert curve.
    * Called from generated code — keep the signature JVM-primitive. */
  def index(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val mask = (1L << bits) - 1
    val x = new Array[Long](n)
    var i = 0
    while (i < n) { x(i) = coords(i) & mask; i += 1 }
    // inverse undo
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transpose: x(0)'s bit is the most significant of
    // each bits-triplet (Skilling's layout)
    var d = 0L
    var j = bits - 1
    while (j >= 0) {
      var k = 0
      while (k < n) {
        d = (d << 1) | ((x(k) >> j) & 1L)
        k += 1
      }
      j -= 1
    }
    d
  }
}
