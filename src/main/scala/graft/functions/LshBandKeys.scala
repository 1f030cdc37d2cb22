package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All signed-random-projection band keys of an embedding in ONE pass —
  * the candidate-generation kernel of `topk_similarity_lsh` (SURVEY.md
  * §2.12).
  *
  * Composing this from built-ins (bands×bits `CASE WHEN dot ≥ 0`
  * projections over an interpreted quantization HOF) planned correctly
  * but executed ~5× slower: 128 separate expression trees, each dragging
  * a 64-double literal, bloat every plan copy (the band self-join clones
  * the subtree onto both sides) and the broadcast-build pipeline ran the
  * whole forest interpreted. This expression quantizes once and runs the
  * bands×bits×dim loop in compiled JVM code, per SURVEY §7.5's
  * promote-on-evidence policy.
  *
  * Semantics (bit-for-bit what the DuckDB oracle rebuilds in SQL):
  *   q[i]    = BIGINT(round(x[i] * 1000))          (HALF_UP, exact ints)
  *   coef(j,i) = first-8-hex(md5("j_i")) % 2001 - 1000
  *   bit(j)  = Σ_i coef(j,i) * q[i] >= 0  ? '1' : '0'   (pure long math)
  *   key(b)  = bit(b*bits) .. bit(b*bits+bits-1) concatenated
  * Returns array<string> of `bands` keys; NULL on null/empty input, null
  * elements, non-finite elements, or magnitudes that could overflow the
  * long accumulator; dim > 64 (no defined hyperplanes) throws — a schema
  * mismatch, not a per-row anomaly.
  */
case class LshBandKeys(child: Expression, bands: Int, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if bands * bits <= LshBandKeys.MaxPlanes =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"lsh_band_keys supports at most ${LshBandKeys.MaxPlanes} planes, got ${bands * bits}")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"lsh_band_keys expects array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    LshBandKeys.compute(input.asInstanceOf[ArrayData], bands, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = LshBandKeys.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("bandKeys")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  $helper.compute($x, $bands, $bits);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)

  override def prettyName: String = "lsh_band_keys"
}

object LshBandKeys {
  val MaxPlanes = 128
  val MaxDim = 64

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** coef(j,i) flattened [j * MaxDim + i] — same derivation as the oracle:
    * ('0x'||SUBSTR(MD5(j||'_'||i),1,8))::BIGINT % 2001 - 1000. */
  private lazy val planes: Array[Long] = {
    val a = new Array[Long](MaxPlanes * MaxDim)
    var j = 0
    while (j < MaxPlanes) {
      var i = 0
      while (i < MaxDim) {
        a(j * MaxDim + i) =
          java.lang.Long.parseLong(md5hex(s"${j}_${i}").substring(0, 8), 16) % 2001L - 1000L
        i += 1
      }
      j += 1
    }
    a
  }

  /** Largest |q| for which the 64-term accumulator cannot wrap: coef is
    * bounded by 1000, so Σ|coef·q| ≤ 64·1000·MaxQuant = 6.4e16 ≪ 2^63.
    * A quantized value beyond this (|x| > 1e9 — three orders past any
    * normalized embedding) is a corrupt row, not a real vector. */
  val MaxQuant: Long = 1000L * 1000L * 1000L * 1000L

  /** Spark `CAST(round(x * 1000, 0) AS BIGINT)` semantics (double product
    * first, then BigDecimal shortest-repr HALF_UP), so the keys match what
    * the composed round()-based pipeline produced and what DuckDB
    * reproduces. Callers must reject non-finite input first —
    * BigDecimal.valueOf THROWS on NaN/Infinity. */
  private def quantize(d: Double): Long =
    java.math.BigDecimal.valueOf(d * 1000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** One pass: quantize dim elements, then bands*bits sign bits.
    *
    * dim > MaxDim FAILS FAST: dimensionality is a schema-level property
    * of the whole column, and silently NULLing every row would make the
    * vectors vanish from the LSH index (while the SQL oracle truncates
    * to 64 dims — a divergence, not a detection). Per-row anomalies
    * (null elements, empty arrays) degrade to NULL as documented. */
  def compute(arr: ArrayData, bands: Int, bits: Int): ArrayData = {
    val dim = arr.numElements()
    if (dim > MaxDim)
      throw new IllegalArgumentException(
        s"lsh_band_keys: embedding dim $dim exceeds the $MaxDim-dim hyperplane family")
    if (dim == 0) return null
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      val d = arr.getDouble(i)
      // Non-finite elements and magnitudes that could wrap the long
      // accumulator (|q| > MaxQuant) are per-row anomalies → NULL, the
      // same contract as null elements. Previously ±Inf clamped to
      // Long.Max/Min and the accumulator wrapped silently — deterministic
      // on the Spark side but divergent from the oracle's double sum.
      if (!java.lang.Double.isFinite(d)) return null
      val qi = quantize(d)
      if (qi > MaxQuant || qi < -MaxQuant) return null
      q(i) = qi
      i += 1
    }
    val p = planes
    val keys = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      val key = new Array[Byte](bits)
      var k = 0
      while (k < bits) {
        val j = b * bits + k
        var acc = 0L
        val off = j * MaxDim
        i = 0
        while (i < dim) {
          acc += p(off + i) * q(i)
          i += 1
        }
        key(k) = if (acc >= 0L) '1' else '0'
        k += 1
      }
      keys(b) = UTF8String.fromBytes(key)
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** DataFrame-API entry. */
  def apply(c: Column, bands: Int, bits: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(LshBandKeys(Bridge.expression(c), bands, bits))
  }
}
