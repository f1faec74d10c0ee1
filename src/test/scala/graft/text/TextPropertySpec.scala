package graft.text

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based invariants for the pure-JVM text primitives — the contracts
 * the distributed ops silently rely on (whitespace-run invariance is what
 * makes hashing stable across extraction variants; BPE concatenation is what
 * makes token counts conserve content).
 */
class TextPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: $r")
  }

  private val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val words: Gen[List[String]] = Gen.listOfN(12, word)
  private val wsRun: Gen[String] = Gen.chooseNum(1, 4).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf(" ", "\t", "\n")).map(_.mkString))

  test("token hashing is whitespace-run invariant (simhash, ngrams, fingerprint)") {
    val gen = for { ws <- words; seps <- Gen.listOfN(ws.length + 1, wsRun) } yield {
      val canonical = ws.mkString(" ")
      val noisy = seps.head + ws.zip(seps.tail).map { case (w, s) => w + s }.mkString
      (canonical, noisy)
    }
    check("simhash", Prop.forAll(gen) { case (a, b) => TextHash.simhash64(a) == TextHash.simhash64(b) })
    check("ngrams", Prop.forAll(gen) { case (a, b) =>
      TextHash.ngramHashes(a, 3).toSeq == TextHash.ngramHashes(b, 3).toSeq })
    check("fingerprint", Prop.forAll(gen) { case (a, b) =>
      TextHash.rollingFingerprint(a, 8) == TextHash.rollingFingerprint(b, 8) })
  }

  test("ngramHashes length = max(0, tokens - n + 1); strict windows") {
    val gen = for { ws <- Gen.listOf(word); n <- Gen.chooseNum(1, 5) } yield (ws, n)
    check("length", Prop.forAll(gen) { case (ws, n) =>
      TextHash.ngramHashes(ws.mkString(" "), n).length == math.max(0, ws.length - n + 1)
    })
  }

  test("BPE tokens always concatenate back to the word (content conservation)") {
    val merge: Gen[(String, String)] = for {
      a <- Gen.listOfN(2, Gen.alphaLowerChar).map(_.mkString.take(2))
      b <- Gen.listOfN(2, Gen.alphaLowerChar).map(_.mkString.take(2))
    } yield (a.take(1), b.take(1)) // single-char pairs merge most often
    val gen = for {
      w <- word
      ms <- Gen.listOfN(8, merge)
    } yield (w, Bpe.ranksOf(ms.distinct))
    check("concat", Prop.forAll(gen) { case (w, ranks) =>
      Bpe.tokenizeWord(w, ranks).mkString == w
    })
    check("count-bounds", Prop.forAll(gen) { case (w, ranks) =>
      val n = Bpe.tokenizeWord(w, ranks).length
      n >= 1 && n <= w.length
    })
  }

  test("shingle jaccard: symmetric, in [0,1], identity = 1") {
    val gen = for { a <- words; b <- words } yield (a.mkString(" "), b.mkString(" "))
    check("symmetry", Prop.forAll(gen) { case (a, b) =>
      TextHash.shingleJaccard(a, b, 3) == TextHash.shingleJaccard(b, a, 3) })
    check("bounds", Prop.forAll(gen) { case (a, b) =>
      val j = TextHash.shingleJaccard(a, b, 3); j >= 0.0 && j <= 1.0 })
    check("identity", Prop.forAll(words.map(_.mkString(" ")).suchThat(_.nonEmpty)) { a =>
      TextHash.shingleJaccard(a, a, 3) == 1.0 })
  }
}
