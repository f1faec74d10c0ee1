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
