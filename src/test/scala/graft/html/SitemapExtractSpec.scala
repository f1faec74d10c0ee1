package graft.html

import org.scalatest.funsuite.AnyFunSuite

class SitemapExtractSpec extends AnyFunSuite {

  private def entries(s: String) =
    SitemapExtract.entries(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toSeq
  private def kind(s: String) =
    SitemapExtract.kind(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  import SitemapExtract.Entry

  test("kind sniff: urlset, sitemapindex, first-wins, neither") {
    assert(kind("""<?xml version="1.0"?><urlset xmlns="x">""") == "urlset")
    assert(kind("""<sitemapindex xmlns="x">""") == "sitemapindex")
    // hostile both-roots payload: earliest root wins (the FeedExtract rule)
    assert(kind("<sitemapindex><urlset>") == "sitemapindex")
    assert(kind("<html><body>page</body></html>") == null)
    assert(kind("") == null)
    assert(SitemapExtract.kind(null) == null)
  }

  test("kind: root found past a long preamble (comments, doctype, PIs, BOM)") {
    // the old fixed 2 KiB probe rejected a valid urlset whose root started
    // after a long preamble — a lost discovery channel (r07 advice)
    val longComment = "x" * 5000
    assert(kind(s"<!-- $longComment --><urlset>") == "urlset")
    assert(kind("﻿<?xml version=\"1.0\"?>\n<!DOCTYPE urlset>\n" +
      s"<?xml-stylesheet href='s.xsl'?><!-- $longComment -->\n<sitemapindex>") == "sitemapindex")
    // entries() dispatches through the same sniff: the payload parses
    val e = SitemapExtract.entries(
      (s"<!-- $longComment --><urlset><url><loc>https://x/p</loc></url></urlset>")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(e.map(_.loc).toSeq == Seq("https://x/p"))
    // hostile shapes stay null: stray text before the root, unterminated
    // comment, preamble past the probe cap
    assert(kind(s"junk <urlset>") == null)
    assert(kind("<!-- never closed <urlset>") == null)
    assert(kind("<!-- " + "y" * (300 << 10) + " --><urlset>") == null)
    assert(kind("<urlsetx>") == null) // name boundary
  }

  test("urlset: all four fields, entity-decoded loc, trimmed padding, missing fields null") {
    val sm =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://x/p?a=1&amp;b=2</loc><lastmod>2024-01-02</lastmod>
        |  <changefreq>daily</changefreq><priority>0.8</priority></url>
        |<url><LOC>  https://x/q  </LOC></url>
        |</urlset>""".stripMargin
    assert(entries(sm) == Seq(
      Entry("https://x/p?a=1&b=2", "2024-01-02", "daily", "0.8"),
      Entry("https://x/q", null, null, null)))
  }

  test("loc-less entries and name-boundary decoys are skipped") {
    val sm =
      """<urlset><url><lastmod>2024-03-01</lastmod></url>
        |<urlx><loc>https://decoy/x</loc></urlx>
        |<url><loc>https://x/real</loc></url></urlset>""".stripMargin
    assert(entries(sm) == Seq(Entry("https://x/real", null, null, null)))
  }

  test("sitemapindex: loc + lastmod only; changefreq/priority stay null even if present") {
    val ix =
      """<sitemapindex><sitemap><loc>https://x/maps/1.xml</loc>
        |<lastmod>2024-02-03</lastmod><priority>0.9</priority></sitemap>
        |<sitemap><loc>https://x/maps/2.xml</loc></sitemap></sitemapindex>""".stripMargin
    assert(entries(ix) == Seq(
      Entry("https://x/maps/1.xml", "2024-02-03", null, null),
      Entry("https://x/maps/2.xml", null, null, null)))
  }

  test("totality fuzz: arbitrary bytes never throw in kind or entries") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val p = Prop.forAll(Gen.asciiPrintableStr, Gen.listOf(Gen.choose(-128, 127).map(_.toByte))) {
      (s, bs) =>
        SitemapExtract.kind(s.getBytes("UTF-8")); SitemapExtract.entries(s.getBytes("UTF-8"))
        SitemapExtract.kind(bs.toArray); SitemapExtract.entries(bs.toArray)
        // seeded with sitemap-ish fragments to reach the walk paths
        val mixed = ("<urlset><url><loc>" + s + "</loc>").getBytes("UTF-8")
        SitemapExtract.entries(mixed)
        true
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$r")
  }

  test("total on hostile bytes: truncation, binary, unclosed tags") {
    assert(entries("<urlset><url><loc>https://x/cut") ==
      Seq(Entry("https://x/cut", null, null, null)))
    assert(entries("<urlset><url><loc></loc></url></urlset>").isEmpty)
    assert(SitemapExtract.entries(Array[Byte](0, -1, 3, 9)).isEmpty)
    assert(SitemapExtract.entries(null).isEmpty)
  }
}
