package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst GENERATOR (the UDTF extension tier, SURVEY.md §2.13):
  * one input document row → one output row per k-token shingle, streamed
  * directly from the tokenizer with NO intermediate array value.
  *
  * The composed-from-built-ins formulation
  * (`explode(transform(sequence(...), i -> concat_ws(...)))`, the
  * DedupQueries shape) first MATERIALIZES the full shingle array per row
  * — for a 100k-token document that is a ~100k-element array held live in
  * the row before explode unnests it. This Generator yields shingles one
  * at a time from a lazy iterator, so peak per-row memory is one shingle
  * regardless of document length — the difference between a bounded and
  * an unbounded row buffer at web-document sizes.
  *
  * The shingle count `k` must be a literal: it shapes the output relation
  * (like the built-in `posexplode` family's static schema) and a
  * per-row-varying k would make the generator's semantics
  * row-dependent. Registered as SQL `shingle_explode(text, k)` by
  * [[graft.GraftExtensions]] for `LATERAL VIEW` callers.
  */
case class ShingleExplode(child: Expression, k: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, k)

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"shingle_explode expects a string document, got ${child.dataType.simpleString}")
    else k match {
      case Literal(n: Int, IntegerType) if n >= 1 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "shingle_explode expects a positive integer literal shingle size")
    }
  }

  private lazy val n: Int = k.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val doc = child.eval(input)
    if (doc == null) Iterator.empty
    else {
      val toks = doc.asInstanceOf[UTF8String].toString.trim
        .split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) Iterator.empty
      else (0 to toks.length - n).iterator.map { i =>
        // rebuild each shingle lazily: one live output string at a time
        InternalRow(UTF8String.fromString(
          toks.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShingleExplode =
    copy(child = newChildren(0), k = newChildren(1))
}
