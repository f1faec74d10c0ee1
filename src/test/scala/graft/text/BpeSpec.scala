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
