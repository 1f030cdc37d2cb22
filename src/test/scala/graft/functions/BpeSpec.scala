package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The BPE kernel's semantics: left-greedy pairing (including the
  * same-symbol run case the SQL oracle's parity trick mirrors),
  * deterministic tie-breaking, and the published training loop on a
  * hand-checkable vocabulary.
  */
class BpeSpec extends AnyFunSuite {
  import Bpe._

  private def syms(s: String): Vector[String] = s.map(_.toString).toVector

  test("left-greedy merge pairs same-symbol runs from the left") {
    assert(mergeLeftGreedy(syms("aaaa"), "a", "a") == Vector("aa", "aa"))
    assert(mergeLeftGreedy(syms("aaaaa"), "a", "a") == Vector("aa", "aa", "a"))
    assert(mergeLeftGreedy(syms("aaa"), "a", "a") == Vector("aa", "a"))
    assert(mergeLeftGreedy(syms("baaab"), "a", "a") == Vector("b", "aa", "a", "b"))
  }

  test("left-greedy merge of distinct pair consumes disjoint matches") {
    assert(mergeLeftGreedy(syms("abab"), "a", "b") == Vector("ab", "ab"))
    assert(mergeLeftGreedy(syms("aab"), "a", "b") == Vector("a", "ab"))
    assert(mergeLeftGreedy(syms("xaby"), "a", "b") == Vector("x", "ab", "y"))
    assert(mergeLeftGreedy(Vector("x", "ab", "c"), "ab", "c") == Vector("x", "abc"))
    // no cross-symbol matching: "xab","c" has no (ab, c) adjacency
    assert(mergeLeftGreedy(Vector("xab", "c"), "ab", "c") == Vector("xab", "c"))
  }

  test("training learns the expected merges on a hand vocabulary") {
    // classic example: 'low' x5, 'lowest' x2, 'newer' x6, 'wider' x3
    val vocab = Seq("low" -> 5L, "lowest" -> 2L, "newer" -> 6L, "wider" -> 3L)
    val merges = learn(vocab, 4)
    // pair counts round 1: (l,o)=7 (e,r)=9 (w,e)=6 (e,w)=6 (n,e)=6 (o,w)=7
    // (w,i)=3 (i,d)=3 (d,e)=3 (w,e... ) -> argmax (e,r)=9
    assert(merges.head == Merge(1, "e", "r", 9))
    // round 2: (l,o)=7 and (o,w)=7 tie -> (l,o) wins on left asc
    assert(merges(1) == Merge(2, "l", "o", 7))
    // round 3: (lo,w)=7 is now the argmax
    assert(merges(2) == Merge(3, "lo", "w", 7))
    assert(merges.map(_.rank) == Seq(1, 2, 3, 4))
  }

  test("tokenize applies rules in rank order") {
    val vocab = Seq("low" -> 5L, "lowest" -> 2L, "newer" -> 6L, "wider" -> 3L)
    val rules = learn(vocab, 4).map(m => (m.lft, m.rgt))
    assert(tokenize("low", rules).mkString("|") == "low")
    assert(tokenize("lower", rules).mkString("|") == "low|er")
    // unseen word falls back to finer segments
    assert(tokenize("wow", rules).contains("w"))
  }

  test("training stops when no pairs remain") {
    assert(learn(Seq("ab" -> 1L), 5).length == 1)
    assert(learn(Seq.empty, 5).isEmpty)
  }
}
