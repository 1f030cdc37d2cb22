package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class UnigramTokenizerSpec extends AnyFunSuite {
  import UnigramTokenizer._

  test("candidates keep every single char and the top multi-char pieces") {
    val vocab = Seq(("abab", 10L), ("abc", 5L))
    val c = candidates(vocab).toMap
    assert(c.keySet.intersect(Set("a", "b", "c")) == Set("a", "b", "c"))
    // "ab" occurs twice in abab (w=10 each) + once in abc (5) = 25
    assert(c("ab") == 25L)
    // "ba" occurs once in abab = 10
    assert(c("ba") == 10L)
    assert(c("abab") == 10L)
  }

  test("viterbi picks the minimum-cost decomposition") {
    // cheap 'ab' piece must beat two singles when its cost is lower
    val cost = Map("a" -> 100L, "b" -> 100L, "ab" -> 150L)
    assert(viterbi("ab", cost).get == Vector("ab"))
    // but loses when it is dearer than the parts
    val cost2 = Map("a" -> 50L, "b" -> 50L, "ab" -> 150L)
    assert(viterbi("ab", cost2).get == Vector("a", "b"))
  }

  test("viterbi tie-breaks: fewer pieces, then lexicographic path") {
    // equal-cost decompositions: ("ab","c") vs ("a","bc") both 2 pieces,
    // 200 cost — path 'a bc' < 'ab c' byte-wise, so the latter loses
    val cost = Map("a" -> 100L, "b" -> 100L, "c" -> 100L,
      "ab" -> 100L, "bc" -> 100L)
    assert(viterbi("abc", cost).get == Vector("a", "bc"))
    // fewer pieces wins before path: ("abc") at 300 vs 3 singles at 300
    val cost2 = Map("a" -> 100L, "b" -> 100L, "c" -> 100L, "abc" -> 300L)
    assert(viterbi("abc", cost2).get == Vector("abc"))
  }

  test("segmentation always concatenates back to the word") {
    val vocab = Seq(("hello", 7L), ("help", 3L), ("hollow", 2L))
    val cost = costs(candidates(vocab))
    vocab.foreach { case (w, _) =>
      val seg = viterbi(w, cost).get
      assert(seg.mkString("") == w, s"lossy segmentation of '$w': $seg")
      assert(seg.forall(_.length <= MaxPiece))
    }
  }

  test("a char outside the piece table yields None, never garbage") {
    assert(viterbi("axe", Map("a" -> 1L, "e" -> 1L)).isEmpty)
  }

  test("viterbiAll's UNK fallback segments everything, single chars only") {
    val cost = Map("a" -> 100L, "e" -> 100L, "ax" -> 90L)
    // 'x' is unknown: usable only as a single-char UNK piece
    assert(viterbiAll("axe", cost, 500L) == Vector("ax", "e"))
    assert(viterbiAll("xxa", cost, 500L) == Vector("x", "x", "a"))
    // an unknown MULTI-char piece never materializes out of thin air
    assert(viterbiAll("qq", Map.empty, 500L) == Vector("q", "q"))
  }

  test("costs are positive integers on the decimal grid") {
    val c = costs(Seq(("a", 10L), ("b", 30L)))
    assert(c.values.forall(_ > 0L))
    assert(c("a") > c("b"), "rarer piece must cost more")
    // the exact grid: -ln(10/40) rounded to 6 then scaled
    assert(c("a") == math.round(DuckRound.round6(-math.log(0.25)) * 1e6))
  }
}
