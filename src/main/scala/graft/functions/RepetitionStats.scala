package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The Gopher/MassiveText repetition battery (Rae et al. 2021, Table A1)
  * over one document's token array, in ONE compiled pass — the kernel of
  * `text_repetition_full` (SURVEY.md §2.12).
  *
  * Nine metrics per document, all char-count numerators over the same
  * total-char denominator: for n ∈ {2,3,4} the characters inside the most
  * frequent n-gram (count × gram char length, ties broken toward the
  * longer gram); for n ∈ {5..10} the characters at positions COVERED by
  * any duplicated n-gram (positional union, so overlapping duplicates
  * never double-count — what keeps the published fraction ≤ 1).
  *
  * The metric is strictly per-document, so the engine-level shape is a
  * zero-shuffle scan→project: this expression replaces a 9-way gram
  * explode + count shuffle + positional-coverage distinct + three joins
  * (6.1 s at sf0.1) with per-row work linear in document length — the
  * MinHashBandKeys promotion pattern, applied on the same evidence. The
  * DuckDB oracle keeps the relational formulation, which doubles as an
  * independent restatement of the rule.
  *
  * Characters are codepoints (UTF8String.numChars), matching `length()`
  * in both engines; separators are not counted (the relational twin
  * strips the joining spaces). Null tokens count as empty (split() never
  * emits them). Returns struct<tot, top2..top4, cov5..cov10: long>;
  * NULL on null input.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(
    StructField("tot", LongType, nullable = false) +:
      (2 to 4).map(n => StructField(s"top$n", LongType, nullable = false)) ++:
      (5 to 10).map(n => StructField(s"cov$n", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = RepetitionStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $helper.compute($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  val MinN = 2
  val TopMaxN = 4
  val MaxN = 10

  def compute(tokens: ArrayData): GenericInternalRow = {
    val m = tokens.numElements()
    val toks = new Array[String](m)
    val pre = new Array[Long](m + 1) // pre(i) = chars in tokens [0, i)
    var i = 0
    while (i < m) {
      toks(i) = if (tokens.isNullAt(i)) "" else tokens.getUTF8String(i).toString
      pre(i + 1) = pre(i) + toks(i).codePointCount(0, toks(i).length)
      i += 1
    }
    val out = new Array[Any](1 + (MaxN - MinN + 1))
    out(0) = pre(m)
    val covered = new Array[Boolean](m)
    val grams = new Array[String](m)
    var n = MinN
    while (n <= MaxN) {
      val nG = m - n + 1
      val cnt = new java.util.HashMap[String, Int]()
      var s = 0
      while (s < nG) {
        val sb = new java.lang.StringBuilder()
        var k = 0
        while (k < n) { if (k > 0) sb.append(' '); sb.append(toks(s + k)); k += 1 }
        grams(s) = sb.toString
        cnt.merge(grams(s), 1, Integer.sum)
        s += 1
      }
      if (n <= TopMaxN) {
        // most frequent n-gram; count-tie → longer gram (two grams tying
        // on both yield the same product, so the choice is immaterial)
        var bestC = 0L
        var bestL = 0L
        s = 0
        while (s < nG) {
          val c = cnt.get(grams(s)).toLong
          val l = pre(s + n) - pre(s)
          if (c > bestC || (c == bestC && l > bestL)) { bestC = c; bestL = l }
          s += 1
        }
        out(n - 1) = bestC * bestL
      } else {
        java.util.Arrays.fill(covered, false)
        s = 0
        while (s < nG) {
          if (cnt.get(grams(s)) >= 2) {
            var p = s
            while (p < s + n) { covered(p) = true; p += 1 }
          }
          s += 1
        }
        var cov = 0L
        var p = 0
        while (p < m) { if (covered(p)) cov += pre(p + 1) - pre(p); p += 1 }
        out(n - 1) = cov
      }
      n += 1
    }
    new GenericInternalRow(out)
  }

  /** DataFrame-API entry. */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(RepetitionStats(Bridge.expression(c)))
  }
}
