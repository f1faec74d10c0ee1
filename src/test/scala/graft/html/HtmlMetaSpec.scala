package graft.html

import org.scalatest.funsuite.AnyFunSuite

class HtmlMetaSpec extends AnyFunSuite {

  private def p(s: String): HtmlMeta.Meta =
    HtmlMeta.parse(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  test("full head: every field, mixed quoting and attribute order") {
    val m = p("""<!DOCTYPE html><html lang="en-US"><head>
      <meta charset="utf-8">
      <title> A &amp; B &#233;  title </title>
      <link href='https://example.com/canon' rel=canonical>
      <meta content="noindex, FOLLOW" name="ROBOTS">
      <meta property="og:title" content="OG title">
      <meta name="description" content="desc here">
      </head><body>text</body></html>""")
    assert(m.title == "A & B é title") // entities decoded, ws collapsed
    assert(m.canonical == "https://example.com/canon")
    assert(m.robots == "noindex, follow") // lowercased
    assert(m.lang == "en-US")
    assert(m.ogTitle == "OG title")
    assert(m.description == "desc here")
  }

  test("first occurrence wins; body metadata is ignored (spam stance)") {
    val m = p("""<html lang=de><head><title>first</title><title>second</title>
      <link rel="canonical" href="/a"><link rel="canonical" href="/b">
      </head><body><meta name="robots" content="noindex">
      <link rel=canonical href=/spam></body>""")
    assert(m.title == "first")
    assert(m.canonical == "/a")
    assert(m.robots == null) // declared in body — not metadata
    assert(m.lang == "de")
  }

  test("unquoted values, stylesheet links don't become canonical, comments skipped") {
    val m = p("""<html><head><!-- <title>not me</title> -->
      <link rel=stylesheet href=/css><link rel=canonical href=https://x.y/z>
      <script>var t = "<title>nor me</title>";</script>
      <title>real</title></head>""")
    assert(m.title == "real")
    assert(m.canonical == "https://x.y/z")
  }

  test("absent head yields all nulls; </head> stops the scan") {
    val m = p("<html><body>no head at all</body></html>")
    assert(m == HtmlMeta.Meta(null, null, null, null, null, null, null))
    val m2 = p("""<html><head></head><meta name=robots content=noindex>""")
    assert(m2.robots == null)
  }

  test("totality: truncations and hostile bytes never throw") {
    val full = ("""<html lang="en"><head><title>T &amp; U</title>""" +
      """<link rel="canonical" href="https://e.com/p"><meta name=robots content=none></head>""")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    for (n <- 0 until full.length) HtmlMeta.parse(java.util.Arrays.copyOf(full, n))
    HtmlMeta.parse(Array.fill[Byte](512)(0x3c)) // all '<'
    HtmlMeta.parse(Array[Byte](-1, -2, -3, 0x3c, 0x61))
    val unterminated = "<head><title>x".getBytes
    assert(HtmlMeta.parse(unterminated).title == "x")
  }

  test("meta refresh: delay + url variants, pure reload is not a redirect") {
    assert(p("""<meta http-equiv="refresh" content="5; url=/next">""").refreshUrl == "/next")
    assert(p("""<meta HTTP-EQUIV="Refresh" content="0;URL='https://x.example/n'">""").refreshUrl
      == "https://x.example/n")
    assert(p("""<meta http-equiv="refresh" content="30">""").refreshUrl == null)
    assert(p("""<meta http-equiv="refresh" content="5; url=">""").refreshUrl == null)
    // first wins
    assert(p("""<meta http-equiv=refresh content="1;url=/a"><meta http-equiv=refresh content="1;url=/b">""")
      .refreshUrl == "/a")
  }
}
