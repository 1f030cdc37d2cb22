package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
  * SIGMOD — the MOSS algorithm) over a token array, in ONE compiled pass
  * — the rolling-fingerprint kernel of `text_winnow_fingerprint` /
  * `dedup_winnow` (SURVEY.md §2.12).
  *
  * Selection rule (the paper's winnowing): hash every K-token gram, then
  * for every window of W consecutive gram hashes record the MINIMUM hash,
  * rightmost position on ties; the fingerprint set is the distinct
  * (pos, h) selections. Guarantee: any shared token run of length
  * ≥ K + W − 1 (= 7 here) between two documents yields at least one
  * shared fingerprint, at expected density 2/(W+1) ≈ 0.4 of grams — the
  * sampling that makes partial-overlap detection affordable at corpus
  * scale without hashing every gram into the join.
  *
  * The gram hash is the md5 HashBridge (first 8 hex chars as
  * uint32-in-long) rather than the paper's Karp–Rabin rolling hash: md5
  * is the one hash both engines share bit-for-bit, and the DuckDB oracle
  * re-derives the selection with window-frame MINs over an
  * (h·2^20 + 2^20−1−pos) encoding — min-h-then-rightmost-pos in one
  * BIGINT key (positions < 2^20; a million-token document is a corrupt
  * row at this tier's granularity).
  *
  * Returns array<struct<pos:int, h:bigint>> in ascending pos; EMPTY for
  * documents with fewer than K+W−1 tokens (no full window — such docs
  * carry no fingerprint and vanish from the overlap join); NULL on null
  * input. Null tokens inside a gram skip that gram (split() never emits
  * them).
  */
case class WinnowFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = WinnowFingerprint.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("winnow")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $helper.compute($x);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprint"
}

object WinnowFingerprint {
  /** Gram width (tokens) and winnow window (grams): detection guarantee
    * K+W−1 = 7 tokens, density 2/(W+1) = 0.4. */
  val K = 4
  val W = 4

  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val nGrams = n - K + 1
    if (nGrams < W) return new GenericArrayData(Array.empty[AnyRef])
    val md = java.security.MessageDigest.getInstance("MD5")
    // gram hashes; −1 marks a gram touching a null token (skipped windows)
    val hs = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      var nullTok = false
      var k = 0
      while (k < K && !nullTok) { nullTok = tokens.isNullAt(g + k); k += 1 }
      if (nullTok) hs(g) = -1L
      else {
        md.reset()
        k = 0
        while (k < K) {
          if (k > 0) md.update(' '.toByte)
          md.update(tokens.getUTF8String(g + k).getBytes)
          k += 1
        }
        val d = md.digest()
        hs(g) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      }
      g += 1
    }
    // winnow: per window of W grams, min hash, rightmost on ties; the
    // O(nGrams·W) scan is fine at W=4 (a deque buys nothing this small)
    val out = new java.util.LinkedHashSet[Long]() // (pos << 33) | h — distinct, insertion-ordered
    var t = 0
    while (t + W <= nGrams) {
      var bestPos = -1
      var bestH = Long.MaxValue
      var p = t
      while (p < t + W) {
        if (hs(p) >= 0 && hs(p) <= bestH) { bestH = hs(p); bestPos = p }
        p += 1
      }
      if (bestPos >= 0) out.add((bestPos.toLong << 33) | bestH): Unit
      t += 1
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) {
      val enc = it.next()
      arr(i) = new GenericInternalRow(
        Array[Any]((enc >>> 33).toInt, enc & ((1L << 33) - 1))): AnyRef
      i += 1
    }
    new GenericArrayData(arr)
  }

  /** DataFrame-API entry. */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(WinnowFingerprint(Bridge.expression(c)))
  }
}
