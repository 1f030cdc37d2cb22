package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All MinHash-LSH band keys of a token array in ONE pass — the stateless
  * signature kernel of `stream_neardup_minhash` (SURVEY.md §2.11/§2.12).
  *
  * The streaming near-dup plan cannot reach the MinHashSig UDAF (a
  * groupBy before flatMapGroupsWithState would be a second stateful
  * operator), so its first cut composed the signature from built-ins:
  * md5-bridge hashes inside a `transform` lambda plus 16 separate
  * `array_min(transform(...))` passes. Higher-order functions are
  * CodegenFallback — every pass ran an interpreted lambda per shingle and
  * allocated an intermediate array, and the 16-pass chain measured ~9 s
  * of the query's 10 s at sf0.1. This expression runs shingle → md5 →
  * 16 running mins → 8 keys as one compiled loop with a 16-long local
  * accumulator, per SURVEY §7.5's promote-on-evidence policy.
  *
  * Semantics (bit-for-bit the composed form and the DuckDB oracle):
  *   shingle s_k = tokens[k] ' ' tokens[k+1] ' ' tokens[k+2]
  *   h_k       = first-8-hex(md5(s_k)) as uint32-in-long   (HashBridge)
  *   sig_i     = min_k (h_k * (2i+1) + 7919·i) mod P        (MinHashSig family)
  *   key_j     = sig_{2j} '_' sig_{2j+1} in decimal, j = 0..7 (band index)
  * Returns the 8 keys as array<string> (index = band); an EMPTY array for
  * <3 tokens (such docs shingle to nothing and explode away — `kept` by
  * definition downstream); NULL on null input. A shingle touching a null
  * token is skipped — exactly what the composed form did (md5(concat)
  * nulls the element and array_min ignores nulls); unreachable after
  * split(), which never emits null tokens.
  */
case class MinHashBandKeys(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_keys expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashBandKeys.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = MinHashBandKeys.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("bandKeys")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $helper.compute($x);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)

  override def prettyName: String = "minhash_band_keys"
}

object MinHashBandKeys {
  import MinHashSig.{K, P}
  val Bands: Int = K / 2

  /** One pass over the token array; thread-confined MessageDigest (Spark
    * evaluates expressions single-threaded per task). */
  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[AnyRef])
    val md = java.security.MessageDigest.getInstance("MD5")
    val sig = Array.fill(K)(Long.MaxValue)
    var k = 0
    while (k + 2 < n) {
      if (!tokens.isNullAt(k) && !tokens.isNullAt(k + 1) && !tokens.isNullAt(k + 2)) {
        md.reset()
        md.update(tokens.getUTF8String(k).getBytes)
        md.update(' '.toByte)
        md.update(tokens.getUTF8String(k + 1).getBytes)
        md.update(' '.toByte)
        md.update(tokens.getUTF8String(k + 2).getBytes)
        val d = md.digest()
        // first 8 hex chars of the digest == first 4 bytes as unsigned int
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var i = 0
        while (i < K) {
          val v = ((2 * i + 1) * h + 7919L * i) % P
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      k += 1
    }
    val keys = new Array[AnyRef](Bands)
    var j = 0
    while (j < Bands) {
      keys(j) = UTF8String.fromString(s"${sig(2 * j)}_${sig(2 * j + 1)}")
      j += 1
    }
    new GenericArrayData(keys)
  }

  /** DataFrame-API entry. */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(MinHashBandKeys(Bridge.expression(c)))
  }
}
