package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite with SparkTestBase {

  private def canon(urls: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    urls.toDF("u").select(graft.functions.canonical_url(col("u"))).collect().map(_.getString(0)).toSeq
  }

  test("canonical_url: case, ports, fragments, tracking params, param order") {
    assert(canon("HTTP://WWW.Example.COM:80/A/b?z=1&utm_source=x&a=2#frag") ==
      Seq("http://www.example.com/A/b?a=2&z=1"))
    // https default port stripped; non-default ports KEPT
    assert(canon("https://Host.example:443/p", "https://host.example:8443/p") ==
      Seq("https://host.example/p", "https://host.example:8443/p"))
    // http :443 is NOT default — kept
    assert(canon("http://h.example:443/") == Seq("http://h.example:443/"))
    // empty path normalizes to "/"; query-only urls keep sorted params
    assert(canon("http://h.example?b=2&a=1") == Seq("http://h.example/?a=1&b=2"))
    // all-tracking query collapses to no query
    assert(canon("http://h.example/p?utm_source=a&utm_medium=b&gclid=1&fbclid=2&ref=x") ==
      Seq("http://h.example/p"))
    // already-canonical urls pass through unchanged
    assert(canon("https://h.example/path?a=1") == Seq("https://h.example/path?a=1"))
  }

  test("canonical_url: malformed urls yield null, never a throw") {
    val got = canon("not a url at all", "", "http//missing.colon/x")
    assert(got.forall(_ == null), got)
  }

  private def surt(urls: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    urls.toDF("u").select(graft.functions.surt_url(col("u"))).collect().map(_.getString(0)).toSeq
  }

  test("surt_url: label reversal, www strip, ports, lowercasing, query cleaning") {
    assert(surt("HTTPS://WWW.Example.COM/Path?b=2&utm_source=x&a=1#frag") ==
      Seq("com,example)/path?a=1&b=2"))
    // www strip covers www1/www2 mirrors; non-www hosts keep every label
    assert(surt("http://www2.news.example.org/x", "http://news.example.org/x") ==
      Seq("org,example,news)/x", "org,example,news)/x"))
    // default port stripped, non-default kept after the labels
    assert(surt("http://h.example.net:80/", "http://h.example.net:8080/") ==
      Seq("net,example,h)/", "net,example,h:8080)/"))
    // one host's keys sort contiguous (the CDX ordering property):
    // subdomains of example.com sort together, ahead of example2
    val keys = surt("https://b.example.com/x", "https://a.example2.com/x",
      "https://a.example.com/y")
    assert(keys.sorted == Seq("com,example,a)/y", "com,example,b)/x", "com,example2,a)/x"))
  }

  test("surt_url: non-http(s) and malformed urls yield null, never a throw") {
    val got = surt("ftp://x.example/f", "not a url", "", "mailto:a@b.c")
    assert(got.forall(_ == null), got)
  }

  test("deflate_len: repetition compresses far below varied text; deterministic; empty is tiny") {
    val s = spark
    import s.implicits._
    val rep = "spam ham " * 200
    val varied = (1 to 300).map(i => s"w${i * 7919}").mkString(" ")
    val rows = Seq(rep, varied, "").toDF("t")
      .select(graft.functions.deflate_len(encode(col("t"), "UTF-8")).as("d"),
        octet_length(encode(col("t"), "UTF-8")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val (dRep, nRep) = rows(0); val (dVar, nVar) = rows(1)
    assert(dRep * 10 < nRep, s"repetition should compress >10x: $dRep / $nRep")
    // numeric tokens still deflate ~2x (small alphabet); the point is the
    // ORDER-of-magnitude gap vs wholesale repetition, not incompressibility
    assert(dVar * 3 > nVar, s"varied text should not compress 3x: $dVar / $nVar")
    assert(rows(2)._1 <= 8)
    // deterministic: the expression and the plan-build runtime call agree
    assert(dRep == graft.expr.TextExprRuntime.deflateLen(rep.getBytes("UTF-8")))
  }

  test("canonical_url is idempotent and stable under param shuffles") {
    val variants = Seq(
      "http://A.example/p?x=1&y=2&utm_source=s",
      "HTTP://a.EXAMPLE:80/p?y=2&x=1#top",
      "http://a.example/p?utm_campaign=c&y=2&x=1")
    val cs = canon(variants: _*)
    assert(cs.distinct.size == 1, cs)
    assert(canon(cs.head) == Seq(cs.head)) // idempotent
  }
}
