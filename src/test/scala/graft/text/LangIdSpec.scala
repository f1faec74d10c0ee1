package graft.text

import org.scalatest.funsuite.AnyFunSuite

class LangIdSpec extends AnyFunSuite {

  test("held-out sentences classify to their language — all 17 + the und rows") {
    LangId.HeldOut.foreach { case (lang, text) =>
      val (got, _) = LangId.classify(text)
      assert(got == lang, s"'$text' → $got, want $lang")
    }
    // the fixture list must actually exercise the unknown class
    assert(LangId.HeldOut.count(_._1 == LangId.Und) >= 3)
  }

  test("und gate: uncovered scripts sit at 0 coverage, covered held-outs clear the bar") {
    LangId.HeldOut.foreach { case (lang, text) =>
      val best = LangId.coveragePermille(text).values.max
      if (lang == LangId.Und)
        assert(best < LangId.MinCoveragePermille, s"und fixture covered at $best‰: $text")
      else
        assert(best >= LangId.MinCoveragePermille, s"$lang held-out only $best‰: $text")
    }
    // 'und' is a refusal, never a trainable class
    assert(!LangId.Langs.contains(LangId.Und))
    assert(!LangId.Training.contains(LangId.Und))
    // empty text has nothing to cover → und (the '  ' pad gram is unseen)
    assert(LangId.classify("")._1 == LangId.Und)
  }

  test("training sentences classify to their own language (sanity floor)") {
    val wrong = for {
      (lang, sents) <- LangId.Training.toSeq
      s <- sents
      got = LangId.classify(s)._1
      if got != lang
    } yield s"$lang→$got: $s"
    assert(wrong.isEmpty, wrong.mkString("\n"))
  }

  test("deterministic: same input → same (lang, score); langs are sorted for tie-break") {
    val a = LangId.classify("the weather is nice today and the sun is warm")
    val b = LangId.classify("the weather is nice today and the sun is warm")
    assert(a == b)
    assert(LangId.Langs.toSeq == LangId.Langs.toSeq.sorted)
  }

  test("bigrams are code points (non-BMP safe) with single-space padding") {
    assert(LangId.bigramsOf("ab").toSeq == Seq(" a", "ab", "b "))
    assert(LangId.bigramsOf("").toSeq == Seq("  "))
    // U+1F600 is one code point (two UTF-16 units): 𝜋-style pairs must not split
    val g = LangId.bigramsOf("a😀b")
    assert(g.length == 4) // " a", "a😀", "😀b", "b "
    assert(g(1) == "a😀" && g(2) == "😀b")
  }

  test("cap: scoring reads at most MaxCodePoints code points") {
    val base = "der schnelle braune fuchs springt über den faulen hund "
    val long = base * 200 // ~11k chars
    val capped = LangId.classify(long)
    // appending adversarial tail AFTER the cap cannot change the verdict
    val tail = LangId.classify(long + ("the english tail " * 500))
    assert(capped == tail)
    assert(capped._1 == "de")
  }

  test("model export: ≤ |langs|·KeptPerLang rows, all integer micro-nats negative") {
    val rows = LangId.modelRows
    // languages with fewer distinct training bigrams than the cap (CJK —
    // short logographic sentences) keep them all; the cap is an upper bound
    assert(rows.size <= LangId.Langs.length * LangId.KeptPerLang)
    val perLang = rows.groupBy(_._2).view.mapValues(_.size).toMap
    assert(LangId.Langs.forall(l => perLang(l) >= 64), perLang.toString)
    assert(rows.forall(_._3 < 0L))
    assert(LangId.oovRows.size == LangId.Langs.length)
    // OOV must cost MORE than any kept gram of the same language
    val worstKept = rows.groupBy(_._2).map { case (l, rs) => l -> rs.map(_._3).min }
    LangId.oovRows.foreach { case (l, o) => assert(o < worstKept(l)) }
  }

  test("mixed-script text goes to the dominant script's language") {
    assert(LangId.classify("сегодня холодно very cold сегодня ветер дует с севера")._1 == "ru")
  }
}
