package graft.html

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

class HtmlExtractSpec extends AnyFunSuite {

  private def ex(html: String): String =
    HtmlExtract.extract(html.getBytes(StandardCharsets.UTF_8))

  test("main paragraph survives, nav/header/footer dropped") {
    val html =
      """<html><head><title>t</title></head><body>
        |<nav><a href=/>one</a> <a href=/>two</a> <a href=/>three</a> <a href=/>four</a> <a href=/>five</a></nav>
        |<header><h1>site name here</h1></header>
        |<p>this is the real article content body</p>
        |<footer>copyright two thousand twenty four company</footer>
        |</body></html>""".stripMargin
    assert(ex(html) == "this is the real article content body")
  }

  test("link-dense block dropped even outside nav") {
    val html =
      """<body><div><a href=a>aa bb</a> <a href=b>cc dd</a> <a href=c>ee ff</a></div>
        |<p>actual content paragraph with enough words</p></body>""".stripMargin
    assert(ex(html) == "actual content paragraph with enough words")
  }

  test("short blocks below MinWords dropped") {
    assert(ex("<p>too short</p><p>this one has exactly five words</p>") ==
      "this one has exactly five words")
  }

  test("script and style contents fully dropped, even with markup inside") {
    val html =
      """<script>var s = '<p>fake para inside script tag</p>';</script>
        |<style>p { color: red; } /* one two three four five six */</style>
        |<p>visible paragraph content with five words</p>""".stripMargin
    assert(ex(html) == "visible paragraph content with five words")
  }

  test("entities decoded: named, decimal, hex; unknown kept") {
    val html = "<p>fish &amp; chips &#65;B &#x43; caf&eacute; &nbsp; end</p>"
    // &eacute; is not in the supported set → literal; &nbsp; is whitespace
    assert(ex(html) == "fish & chips AB C caf&eacute; end")
  }

  test("inline tags do not split blocks; block tags do") {
    val html = "<p>alpha <em>beta</em> gamma <span>delta</span> epsilon</p><div>second block of words here now</div>"
    assert(ex(html) == "alpha beta gamma delta epsilon\nsecond block of words here now")
  }

  test("a single inline link inside long text is fine (density <= 1/3)") {
    val html = """<p>one two three four five six seven <a href=x>eight</a> nine</p>"""
    assert(ex(html) == "one two three four five six seven eight nine")
  }

  test("unclosed tags and bare attributes never break extraction") {
    val html = """<div class=main><p>unclosed paragraph with plenty of words flowing"""
    assert(ex(html) == "unclosed paragraph with plenty of words flowing")
  }

  test("latin-1 charset sniffed from meta, bytes decoded correctly") {
    val html = "<html><head><meta charset=\"iso-8859-1\"></head><body><p>café résumé naïve déjà vu</p></body></html>"
    val bytes = html.getBytes(StandardCharsets.ISO_8859_1)
    assert(ex(new String(bytes, StandardCharsets.ISO_8859_1)) != "") // sanity
    assert(HtmlExtract.extract(bytes) == "café résumé naïve déjà vu")
  }

  test("utf-8 hebrew text round-trips byte-identically") {
    val html = "<p>שלום עולם טקסט מסמך עמוד שורה</p>"
    assert(ex(html) == "שלום עולם טקסט מסמך עמוד שורה")
  }

  test("comments dropped; quoted > inside attributes handled") {
    val html = """<!-- <p>ghost words here not real</p> --><p title="a>b">real words in this paragraph here</p>"""
    assert(ex(html) == "real words in this paragraph here")
  }

  test("blocks() reports words, link words and content flags") {
    val bs = HtmlExtract.blocks(
      """<nav><a href="/">x y z w v</a></nav><p>plain body text of five words yes</p>""".getBytes(StandardCharsets.UTF_8))
    val nav = bs.find(_.tag == "nav").getOrElse(fail("no nav block"))
    assert(!nav.isContent && nav.linkWords == nav.words)
    val p = bs.find(_.tag == "p").getOrElse(fail("no p block"))
    assert(p.isContent && p.linkWords == 0 && p.words == 7)
  }

  test("empty / null / binary junk inputs are total") {
    assert(HtmlExtract.extract(Array.emptyByteArray) == "")
    assert(HtmlExtract.extract(null) == "")
    val junk = Array.tabulate[Byte](256)(i => i.toByte)
    HtmlExtract.extract(junk) // must not throw
  }

  test("property: extractor is total and deterministic on arbitrary bytes (500 seeded cases)") {
    var z = 0x9e3779b97f4a7c15L
    def next(): Long = { z ^= z << 13; z ^= z >>> 7; z ^= z << 17; z }
    (0 until 500).foreach { _ =>
      val len = (next() & 0x3ff).toInt
      val bytes = Array.fill(len)((next() & 0xff).toByte)
      val a = HtmlExtract.extract(bytes)
      val b = HtmlExtract.extract(bytes)
      assert(a == b)
    }
  }

  test("property: total on adversarial tag soup (500 seeded cases)") {
    val frags = Array("alpha", "<p>", "</p>", "<div", "class='x", "&amp;", "&#xZZ;",
      "<script>", "</script>", "<!--", "-->", ">", "<", "&", "<a href=", "beta gamma")
    var z = 42L
    def next(): Long = { z ^= z << 13; z ^= z >>> 7; z ^= z << 17; z }
    (0 until 500).foreach { _ =>
      val s = (0 until 40).map(_ => frags(java.lang.Math.floorMod(next(), frags.length.toLong).toInt)).mkString(" ")
      HtmlExtract.extract(s.getBytes(StandardCharsets.UTF_8)) // must not throw
    }
  }
}
