package graft.html

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class HtmlLinksSpec extends AnyFunSuite {

  private def links(html: String, url: String = "https://h.example/dir/page"): Seq[String] =
    HtmlLinks.extract(html.getBytes(java.nio.charset.StandardCharsets.UTF_8), url).toSeq

  private val base = HtmlLinks.parseBase("http://a/b/c/d;p?q")

  test("RFC 3986 section 5.4.1 normal examples against the spec's own base") {
    // the spec's reference-resolution table, base = http://a/b/c/d;p?q
    val cases = Seq(
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g"
    )
    for ((ref, want) <- cases)
      assert(HtmlLinks.resolve(base, ref) == want, s"ref '$ref'")
  }

  test("network-path references get section 5.2.2 dot-segment removal too") {
    val cases = Seq(
      "//host/a/../b" -> "http://host/b",
      "//host/./x" -> "http://host/x",
      "//host/a/b/../../c?q=1" -> "http://host/c?q=1",
      "//host?q" -> "http://host?q",
      "//host/a/../.." -> "http://host/")
    for ((ref, want) <- cases)
      assert(HtmlLinks.resolve(base, ref) == want, s"ref '$ref'")
  }

  test("RFC 3986 section 5.4.2 abnormal examples: dot segments never climb past root") {
    val cases = Seq(
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h"
    )
    for ((ref, want) <- cases)
      assert(HtmlLinks.resolve(base, ref) == want, s"ref '$ref'")
  }

  test("edges that are not edges: fragments, unsupported schemes, empty") {
    assert(HtmlLinks.resolve(base, "#s") == null)
    assert(HtmlLinks.resolve(base, "") == null)
    assert(HtmlLinks.resolve(base, "mailto:x@y.z") == null)
    assert(HtmlLinks.resolve(base, "javascript:void(0)") == null)
    assert(HtmlLinks.resolve(base, "tel:+1234") == null)
    assert(HtmlLinks.resolve(base, "data:text/plain,x") == null)
    // fragment stripped from a real edge
    assert(HtmlLinks.resolve(base, "g#frag") == "http://a/b/c/g")
    assert(HtmlLinks.resolve(base, "HTTPS://X.example/Y#f") == "HTTPS://X.example/Y")
    // relative ref under an unparseable base drops; absolute survives
    assert(HtmlLinks.resolve(null, "g") == null)
    assert(HtmlLinks.resolve(null, "http://ok.example/p") == "http://ok.example/p")
  }

  test("document walk: order, quoting styles, entity-decoded hrefs, skips") {
    val got = links(
      """<html><head><script>var s = '<a href="/decoy">';</script></head><body>
        |<!-- <a href="/commented">x</a> -->
        |<a href="/one">1</a> <a href='two'>2</a> <a href=//c.example/three>3</a>
        |<a href="/q?a=1&amp;b=2">4</a> <a name="no-href">5</a> <A HREF="/CAPS">6</A>
        |</body></html>""".stripMargin)
    assert(got == Seq(
      "https://h.example/one",
      "https://h.example/dir/two",
      "https://c.example/three",
      "https://h.example/q?a=1&b=2",
      "https://h.example/CAPS"))
  }

  test("anchor text: nested inline tags, auto-close, EOF-close, entities, cap") {
    import HtmlLinks.Anchor
    def anchors(h: String) = HtmlLinks.extractWithText(
      h.getBytes(java.nio.charset.StandardCharsets.UTF_8), "https://h.example/d/p").toSeq
    assert(anchors("""<a href="/x">read  <b>the&nbsp;doc</b> now</a>""") ==
      Seq(Anchor("https://h.example/x", "read the doc now", nofollow = false)))
    // a new <a> auto-closes the previous one (browser rule)
    assert(anchors("""<a href="/one">first <a href="/two">second</a>""") ==
      Seq(Anchor("https://h.example/one", "first", nofollow = false),
        Anchor("https://h.example/two", "second", nofollow = false)))
    // EOF closes an open anchor
    assert(anchors("""<a href="/open">dangling text""") ==
      Seq(Anchor("https://h.example/open", "dangling text", nofollow = false)))
    // pseudo-links contribute neither a row nor captured text
    assert(anchors("""<a href="mailto:x@y">mail</a><a href="/r">real</a>""") ==
      Seq(Anchor("https://h.example/r", "real", nofollow = false)))
    // script inside an anchor contributes no text
    assert(anchors("""<a href="/s">ok<script>var x='<b>no</b>';</script> fine</a>""") ==
      Seq(Anchor("https://h.example/s", "ok fine", nofollow = false)))
    // cap: text truncates at MaxAnchorText
    val long = anchors(s"""<a href="/l">${"word " * 200}</a>""")
    assert(long.head.text.length == HtmlLinks.MaxAnchorText)
  }

  test("base href: the first <base> re-bases relative links (absolute links unaffected)") {
    val got = links(
      """<html><head><base href="https://other.example/dir/"></head><body>
        |<a href="rel">1</a> <a href="/root">2</a> <a href="https://abs.example/a">3</a>
        |<base href="https://second.example/ignored/">
        |<a href="rel2">4</a></body></html>""".stripMargin)
    assert(got == Seq(
      "https://other.example/dir/rel",
      "https://other.example/root",
      "https://abs.example/a",
      "https://other.example/dir/rel2"))
    // a RELATIVE base href resolves against the document url first
    val rel = links("""<base href="sub/"><a href="x">1</a>""", "https://h.example/d/p")
    assert(rel == Seq("https://h.example/d/sub/x"))
  }

  test("nofollow: rel token-list semantics, case-insensitive, reset per anchor") {
    def flags(h: String) = HtmlLinks.extractWithText(
      h.getBytes(java.nio.charset.StandardCharsets.UTF_8), "https://h.example/")
      .toSeq.map(a => (a.href, a.nofollow))
    assert(flags(
      """<a href="/a" rel="nofollow">1</a><a href="/b" rel="ugc NOFOLLOW">2</a>
        |<a href="/c" rel=nofollow>3</a><a href="/d" rel="sponsored">4</a>
        |<a href="/e" rel="nofollowed">5</a><a href="/f">6</a>""".stripMargin) ==
      Seq(("https://h.example/a", true), ("https://h.example/b", true),
        ("https://h.example/c", true), ("https://h.example/d", false),
        ("https://h.example/e", false), ("https://h.example/f", false)))
  }

  test("hostile-input cap and totality") {
    val many = "<a href=\"/x\">l</a>" * (HtmlLinks.MaxLinks + 100)
    assert(links(many).length == HtmlLinks.MaxLinks)
    assert(HtmlLinks.extract(null, "https://h.example/").isEmpty)
    assert(HtmlLinks.extract(Array.emptyByteArray, null).isEmpty)
    val p = Prop.forAll(Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      HtmlLinks.extract(bs, "https://h.example/a/b")
      HtmlLinks.extract(bs, null)
      true
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"totality fuzz: $r")
  }

  test("base parsing: query kept for ?-refs, authority-only base, garbage base") {
    val b = HtmlLinks.parseBase("https://host.example")
    assert(b != null && HtmlLinks.resolve(b, "g") == "https://host.example/g")
    assert(HtmlLinks.parseBase("not a url") == null)
    assert(HtmlLinks.parseBase("https://") == null)
    val withQ = HtmlLinks.parseBase("https://h.example/p/page?x=1#frag")
    assert(HtmlLinks.resolve(withQ, "?y=2") == "https://h.example/p/page?y=2")
  }
}
