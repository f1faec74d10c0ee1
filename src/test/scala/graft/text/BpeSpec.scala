package graft.text

import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  private def rk(m: (String, String)*) = Bpe.ranksOf(m)

  test("lowest rank merges first, not leftmost-any") {
    // ("b","c") outranks ("a","b"): "abc" → a + bc, never ab + c
    val r = rk(("b", "c"), ("a", "b"))
    assert(Bpe.tokenizeWord("abc", r) == Vector("a", "bc"))
  }

  test("ties break leftmost; merged pairs re-enter the pool") {
    val r = rk(("a", "a"))
    assert(Bpe.tokenizeWord("aaaa", r) == Vector("aa", "aa"))
    val r2 = rk(("a", "a"), ("aa", "aa"))
    assert(Bpe.tokenizeWord("aaaa", r2) == Vector("aaaa"))
  }

  test("banana under (a,n): leftmost merge repeats down the word") {
    val r = rk(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"))
    assert(Bpe.tokenizeWord("banana", r) == Vector("b", "an", "an", "a"))
    assert(Bpe.tokenizeWord("the", r) == Vector("the"))
  }

  test("tokenize walks whitespace words in order, memoized per row") {
    val r = rk(("t", "h"), ("th", "e"))
    assert(Bpe.tokenize("the the  other", r).toSeq ==
      Seq("the", "the", "o", "the", "r"))
    assert(Bpe.tokenize("", r).isEmpty)
    assert(Bpe.tokenize("   ", r).isEmpty)
    assert(Bpe.tokenize(null, r).isEmpty)
  }

  test("single characters and unmergeable words pass through") {
    val r = rk(("q", "q"))
    assert(Bpe.tokenizeWord("x", r) == Vector("x"))
    assert(Bpe.tokenizeWord("xyz", r) == Vector("x", "y", "z"))
  }

  test("train: hand-derived merges, tie-breaks, early stop, input-order invariance") {
    // uniform frequencies: (a,a) and (a,b) both count 3 — lexicographic
    // tie-break picks (a,a); round 2 (a,b) leads outright; round 3 all
    // pairs count 1 and ("aa","ab") < ("aa","b") because "ab" < "b"
    val words = Seq("aaab" -> 1L, "aab" -> 1L, "cab" -> 1L)
    val m = Bpe.train(words, 3)
    assert(m == Seq(("a", "a"), ("a", "b"), ("aa", "ab")), m.toString)
    // input order must not matter (the determinism contract)
    assert(Bpe.train(words.reverse, 3) == m)
    // frequency weighting flips the first merge: heavy "cab" makes (c,a)+(a,b) dominate
    val heavy = Bpe.train(Seq("aaab" -> 1L, "cab" -> 10L), 1)
    assert(heavy == Seq(("a", "b")), heavy.toString) // (a,b): 11 beats (c,a): 10, (a,a): 2
    // early stop: once every word is one symbol there is nothing to merge
    assert(Bpe.train(Seq("ab" -> 5L), 10) == Seq(("a", "b")))
    // trained ranks actually compress the training corpus through tokenize
    val ranks = Bpe.ranksOf(m)
    assert(Bpe.tokenize("aaab aab cab", ranks).length <
      "aaabaabcab".length, "merges must reduce the token count")
    assert(Bpe.tokenize("aaab", ranks).toSeq == Seq("aaab")) // all 3 merges: full collapse
    assert(Bpe.tokenize("aaab", Bpe.ranksOf(m.take(2))).toSeq == Seq("aa", "ab"))
  }

  test("non-BMP code points stay whole: no unpaired surrogate halves") {
    val emoji = new String(Character.toChars(0x1F600)) // 😀: one code point, two chars
    assert(Bpe.tokenizeWord(s"a${emoji}b", rk()) == Vector("a", emoji, "b"))
    // every emitted token must be a VALID string (round-trips through UTF-8)
    for (t <- Bpe.tokenize(s"$emoji$emoji ok", rk())) {
      assert(new String(t.getBytes("UTF-8"), "UTF-8") == t)
      assert(!t.contains('�'))
    }
    // merges apply across code-point symbols like any other pair
    val r = rk(("a", emoji))
    assert(Bpe.tokenizeWord(s"a${emoji}", r) == Vector(s"a$emoji"))
  }
}
