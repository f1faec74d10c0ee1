package graft.html

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class FeedExtractSpec extends AnyFunSuite {

  private def items(s: String) =
    FeedExtract.items(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toSeq
  private def kind(s: String) =
    FeedExtract.kind(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  import FeedExtract.Item

  test("kind sniff: rss, atom, first-wins, neither") {
    assert(kind("""<?xml version="1.0"?><rss version="2.0">""") == "rss")
    assert(kind("""<feed xmlns="http://www.w3.org/2005/Atom">""") == "atom")
    assert(kind("<html><body>page</body></html>") == null)
    assert(kind("") == null)
  }

  test("RSS: CDATA titles, element-text links, case-insensitive pubDate, missing fields") {
    val feed =
      """<rss version="2.0"><channel><title>chan</title>
        |<item><title><![CDATA[a <b> title]]></title><link> https://x/1 </link>
        |  <PUBDATE>Tue, 02 Jan 2024 00:00:00 GMT</PUBDATE></item>
        |<item><link>https://x/2</link></item>
        |<item><title>t &lt;3&gt;</title></item>
        |</channel></rss>""".stripMargin
    assert(items(feed) == Seq(
      Item("a <b> title", "https://x/1", "Tue, 02 Jan 2024 00:00:00 GMT"),
      Item(null, "https://x/2", null),
      Item("t <3>", null, null)))
  }

  test("Atom: alternate link preferred over self, rel-less counts as alternate, published fallback") {
    val feed =
      """<feed><entry><title>one</title>
        |  <link rel="self" href="https://a/self"/><link rel="alternate" href="https://a/1"/>
        |  <updated>2024-01-01T00:00:00Z</updated></entry>
        |<entry><title>two</title><link href="https://a/2"/>
        |  <published>2024-02-02T00:00:00Z</published></entry>
        |<entry><title>three</title><link rel="enclosure" href="https://a/enc"/></entry>
        |</feed>""".stripMargin
    assert(items(feed) == Seq(
      Item("one", "https://a/1", "2024-01-01T00:00:00Z"),
      Item("two", "https://a/2", "2024-02-02T00:00:00Z"),
      Item("three", "https://a/enc", null)))
  }

  test("Atom: a blank <updated> falls through to <published>") {
    val feed =
      """<feed><entry><title>blank</title><link href="https://a/b"/>
        |  <updated>  </updated><published>2024-03-03T00:00:00Z</published></entry>
        |<entry><title>empty</title><link href="https://a/c"/>
        |  <updated></updated><published>2024-04-04T00:00:00Z</published></entry>
        |</feed>""".stripMargin
    assert(items(feed) == Seq(
      Item("blank", "https://a/b", "2024-03-03T00:00:00Z"),
      Item("empty", "https://a/c", "2024-04-04T00:00:00Z")))
  }

  test("item-tag boundary: <itemref> is not an <item>; unclosed last item kept") {
    val feed =
      """<rss><channel><itemref>nope</itemref>
        |<item><title>real</title><link>https://x/r</link>
        |</channel></rss>""".stripMargin
    assert(items(feed) == Seq(Item("real", "https://x/r", null)))
  }

  test("caps and totality") {
    val many = "<rss><channel>" +
      "<item><title>t</title></item>" * (FeedExtract.MaxItems + 5) + "</channel></rss>"
    assert(items(many).length == FeedExtract.MaxItems)
    val p = Prop.forAll(Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      FeedExtract.items(bs); FeedExtract.kind(bs); true
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$r")
  }
}
