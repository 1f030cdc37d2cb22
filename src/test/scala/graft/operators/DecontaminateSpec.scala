package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the contamination kernel behind `text_decontaminate`:
  * planted overlap with the eval slice must be flagged with the right
  * shared-gram count; disjoint text must never be. (Cross-engine value
  * parity is the oracle's job; this spec pins the detection contract.)
  */
class DecontaminateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // eval doc 0: 8 tokens => 5 distinct 4-gram windows
  private val evalText = "alpha beta gamma delta epsilon zeta eta theta"
  private val corpus = Seq(
    (0L, evalText),                                    // the benchmark doc
    (100L, evalText),                                  // verbatim copy
    (101L, "x y z alpha beta gamma delta q r s"),      // one shared window
    (102L, "one two three four five six seven eight"), // disjoint
    (103L, "tiny doc")                                 // below gram length
  ).toDF("doc_id", "text")

  private lazy val result =
    TextQueries.contamination(corpus, col("doc_id") === 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a verbatim copy of an eval doc is flagged with every gram shared") {
    assert(result.get(100L).contains(5L))
  }

  test("a single shared 4-token window is flagged with exactly one gram") {
    assert(result.get(101L).contains(1L))
  }

  test("disjoint and sub-gram-length docs are not flagged") {
    assert(!result.contains(102L) && !result.contains(103L))
  }

  test("eval docs themselves are excluded from the report") {
    assert(!result.contains(0L))
  }
}
