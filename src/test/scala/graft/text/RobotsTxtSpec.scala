package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class RobotsTxtSpec extends AnyFunSuite {

  private val policy =
    """# comment line
      |User-agent: graftbot
      |Disallow: /g-only
      |
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok$
      |Disallow: /t*.pdf$
      |Crawl-delay: 10
      |Sitemap: https://x.example/s.xml
      |""".stripMargin

  test("group selection: a named agent's group EXCLUDES the * rules (RFC 9309 2.2.1)") {
    assert(!RobotsTxt.isAllowed(policy, "graftbot", "/g-only/x"))
    assert(RobotsTxt.isAllowed(policy, "GRAFTBOT", "/private/anything"), "case-insensitive")
    assert(!RobotsTxt.isAllowed(policy, "other", "/private/anything"))
    assert(RobotsTxt.isAllowed(policy, "other", "/g-only/x"))
  }

  test("longest match wins; Allow breaks ties; $ anchors; * wildcards") {
    assert(RobotsTxt.isAllowed(policy, "other", "/private/ok"), "longer Allow overrides")
    assert(!RobotsTxt.isAllowed(policy, "other", "/private/ok2"), "$ anchor limits the Allow")
    assert(!RobotsTxt.isAllowed(policy, "other", "/t123.pdf"))
    assert(RobotsTxt.isAllowed(policy, "other", "/t123.pdfx"), "$ anchor fails")
    assert(RobotsTxt.isAllowed(policy, "other", "/public"))
    // tie in length -> Allow (least restrictive)
    val tie = "User-agent: *\nDisallow: /a\nAllow: /a\n"
    assert(RobotsTxt.isAllowed(tie, "x", "/a/b"))
  }

  test("grouping rules: consecutive UA lines share, UA after rules starts fresh, orphan rules ignored") {
    val multi =
      """Disallow: /orphan
        |User-agent: a
        |User-agent: b
        |Disallow: /x
        |User-agent: c
        |Disallow: /y
        |""".stripMargin
    assert(!RobotsTxt.isAllowed(multi, "a", "/x/1"))
    assert(!RobotsTxt.isAllowed(multi, "b", "/x/1"))
    assert(RobotsTxt.isAllowed(multi, "b", "/y/1"), "b's group ended before /y")
    assert(!RobotsTxt.isAllowed(multi, "c", "/y/1"))
    assert(RobotsTxt.isAllowed(multi, "anyone", "/orphan/f"), "rules before any UA line are ignored")
  }

  test("empty Disallow allows everything; no groups allows everything; combining same-agent groups") {
    assert(RobotsTxt.isAllowed("User-agent: *\nDisallow:\n", "x", "/any"))
    assert(RobotsTxt.isAllowed("", "x", "/any"))
    assert(RobotsTxt.isAllowed("just some text\nno directives", "x", "/any"))
    val combined = "User-agent: *\nDisallow: /a\nUser-agent: *\nDisallow: /b\n"
    assert(!RobotsTxt.isAllowed(combined, "x", "/a/1"))
    assert(!RobotsTxt.isAllowed(combined, "x", "/b/1"))
  }

  test("wildcard placement: leading, embedded, multiple, trailing") {
    def allowed(pat: String, path: String): Boolean =
      RobotsTxt.isAllowed(s"User-agent: *\nDisallow: $pat\n", "x", path)
    assert(!allowed("*/mid/*", "/a/mid/b"))
    assert(!allowed("/a*b*c", "/aXXbYYc-and-more"))
    assert(allowed("/a*b*c", "/aXXbYY"))
    assert(!allowed("/end$", "/end"))
    assert(allowed("/end$", "/end/no"))
    assert(!allowed("/any*$", "/anything/at/all"))
  }

  test("Sitemap: directive — group-independent, case-insensitive, comments stripped, dup-collapsed") {
    val txt =
      """Sitemap: https://x/before-any-group.xml
        |User-agent: *
        |Disallow: /tmp
        |sitemap: https://x/a.xml # trailing comment
        |SITEMAP: https://x/a.xml
        |User-agent: bot
        |Sitemap:https://x/b.xml
        |Sitemap:
        |# Sitemap: https://x/commented-out.xml
        |""".stripMargin
    assert(RobotsTxt.sitemaps(txt) == Seq(
      "https://x/before-any-group.xml", "https://x/a.xml", "https://x/b.xml"))
    assert(RobotsTxt.sitemaps(null).isEmpty)
    assert(RobotsTxt.sitemaps("User-agent: *\nDisallow:").isEmpty)
  }

  test("Crawl-delay: group selection, first-valid-wins, decimal millis, overflow cap") {
    val txt =
      """User-agent: graftbot
        |Crawl-delay: 1.5
        |Disallow: /x
        |User-agent: *
        |Crawl-delay: bogus
        |Crawl-delay: 2
        |Disallow:
        |""".stripMargin
    assert(RobotsTxt.crawlDelayMillis(txt, "graftbot") == Some(1500L))
    assert(RobotsTxt.crawlDelayMillis(txt, "otherbot") == Some(2000L))
    assert(RobotsTxt.crawlDelayMillis("User-agent: *\nDisallow:", "x").isEmpty)
    assert(RobotsTxt.crawlDelayMillis(null, "x").isEmpty)
    // hostile values: overflow capped, fraction truncated, junk rejected
    assert(RobotsTxt.crawlDelayMillis(
      "User-agent: *\nCrawl-delay: 99999999999", "x") == Some(RobotsTxt.MaxDelayMillis))
    assert(RobotsTxt.crawlDelayMillis(
      "User-agent: *\nCrawl-delay: 0.12345", "x") == Some(123L))
    assert(RobotsTxt.crawlDelayMillis(
      "User-agent: *\nCrawl-delay: 1.2.3", "x").isEmpty)
    // a crawl-delay line is a rule line: a UA after it starts a NEW group
    val regroup = "User-agent: a\nCrawl-delay: 3\nUser-agent: b\nDisallow: /q\n"
    assert(RobotsTxt.crawlDelayMillis(regroup, "b").isEmpty)
    assert(RobotsTxt.crawlDelayMillis(regroup, "a") == Some(3000L))
  }

  test("totality fuzz: arbitrary text never throws, result is boolean") {
    val p = Prop.forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (txt, path) =>
      RobotsTxt.isAllowed(txt, "bot", path)
      RobotsTxt.isAllowed(txt, null, null)
      true
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$r")
  }
}
