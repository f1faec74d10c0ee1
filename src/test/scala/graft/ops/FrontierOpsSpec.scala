package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.pipeline.FrontierPipeline

class FrontierOpsSpec extends AnyFunSuite with SparkTestBase {

  private def htmlPage(links: String): Array[Byte] =
    s"<html><head></head><body>$links</body></html>".getBytes("UTF-8")

  test("composes anchors, refresh, and feed items; respects nofollow") {
    import spark.implicits._
    val html = htmlPage(
      """<a href="/p/1">a</a> <a rel="nofollow" href="/nf/1">n</a>
        |<a href="https://other.example/x">b</a>""".stripMargin) ++
      "".getBytes
    val withRefresh =
      ("""<html><head><meta http-equiv="refresh" content="0; url=/go/7"></head>""" +
        """<body><a href="/p/2">c</a></body></html>""").getBytes("UTF-8")
    val rss =
      ("""<?xml version="1.0"?><rss version="2.0"><channel><title>t</title>""" +
        """<item><title>i</title><link>https://feed.example/item1</link></item>""" +
        """</channel></rss>""").getBytes("UTF-8")
    val pages = Seq(
      ("https://h1.example/dir/page", html),
      ("https://h2.example/a", withRefresh),
      ("https://h3.example/feed.xml", rss)
    ).toDF("url", "payload")
    val got = FrontierOps.frontier(pages, "url", "payload")
      .select("url", "host", "kind", "discovered_from")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(got == Set(
      ("https://h1.example/p/1", "h1.example", "anchor", "https://h1.example/dir/page"),
      ("https://other.example/x", "other.example", "anchor", "https://h1.example/dir/page"),
      ("https://h2.example/p/2", "h2.example", "anchor", "https://h2.example/a"),
      ("https://h2.example/go/7", "h2.example", "refresh", "https://h2.example/a"),
      ("https://feed.example/item1", "feed.example", "feed", "https://h3.example/feed.xml")),
      got.toString)
  }

  test("sitemap channel: opt-in, document-resolved, runs through the same gates") {
    import spark.implicits._
    val sm = ("""<?xml version="1.0"?><urlset>""" +
      """<url><loc>https://sm.example/p/1</loc></url>""" +
      """<url><loc>/relative/2</loc></url>""" +
      """<url><loc>https://sm.example/seen</loc></url></urlset>""").getBytes("UTF-8")
    val ix = ("""<sitemapindex><sitemap><loc>https://sm.example/maps/part1.xml""" +
      """</loc></sitemap></sitemapindex>""").getBytes("UTF-8")
    val pages = Seq(
      ("https://sm.example/sitemap.xml", sm),
      ("https://sm.example/sitemap_index.xml", ix)).toDF("url", "payload")
    val seen = Seq("https://sm.example/seen").toDF("url")
    // default OFF: sitemap payloads contribute nothing (anchors/feeds find
    // no targets in XML sitemaps)
    assert(FrontierOps.frontier(pages, "url", "payload").count() == 0)
    val got = FrontierOps.frontier(pages, "url", "payload",
      seen = Some(seen), sitemaps = true)
      .select("url", "kind").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("https://sm.example/p/1", "sitemap"),
      ("https://sm.example/relative/2", "sitemap"), // resolved against the sitemap url
      ("https://sm.example/maps/part1.xml", "sitemap")), got.toString)
  }

  test("gate order: robots and blocklist filter BEFORE dedup; seen anti-joins after") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.example/", htmlPage(
        """<a href="https://t.example/p/9">x</a> <a href="https://t.example/ok">y</a>
          |<a href="https://spam.example/z">s</a> <a href="https://t.example/seen">w</a>""".stripMargin))
    ).toDF("url", "payload")
    // the duplicate robots row must not duplicate candidates (host-deduped
    // with a deterministic min before the join)
    val robots = Seq(
      ("t.example", "User-agent: *\nDisallow: /p/"),
      ("t.example", "User-agent: *\nDisallow: /p/")).toDF("host", "robots_txt")
    val seen = Seq("https://t.example/seen").toDF("url")
    val got = FrontierOps.frontier(pages, "url", "payload",
      robots = Some(robots), blockedDomains = Seq("spam.example"), seen = Some(seen))
      .select("url").collect().map(_.getString(0)).toSeq
    assert(got == Seq("https://t.example/ok"), got.toString)
  }

  test("crawl_delay_ms rides along from the robots frame; null without robots/directive") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.example/", htmlPage(
        """<a href="https://t.example/1">x</a> <a href="https://u.example/2">y</a>"""))
    ).toDF("url", "payload")
    val robots = Seq(("t.example", "User-agent: *\nCrawl-delay: 2.5\nDisallow: /p"))
      .toDF("host", "robots_txt")
    val got = FrontierOps.frontier(pages, "url", "payload", robots = Some(robots))
      .select("host", "crawl_delay_ms").collect()
      .map(r => r.getString(0) -> Option(r.getAs[java.lang.Long](1)).map(_.toLong)).toMap
    assert(got == Map("t.example" -> Some(2500L), "u.example" -> None), got.toString)
    // no robots frame at all: the column exists, every row null
    val bare = FrontierOps.frontier(pages, "url", "payload")
      .select("crawl_delay_ms").collect().map(r => r.isNullAt(0))
    assert(bare.nonEmpty && bare.forall(identity))
  }

  test("schedule: per-host slots spaced by crawl delay, default when null, url-ordered") {
    import spark.implicits._
    val targets = Seq(
      ("https://a.example/1", "a.example", Some(2000L)),
      ("https://a.example/2", "a.example", Some(2000L)),
      ("https://a.example/3", "a.example", Some(2000L)),
      ("https://b.example/x", "b.example", None),
      ("https://b.example/y", "b.example", None)
    ).toDF("url", "host", "crawl_delay_ms")
    val got = FrontierOps.schedule(targets)
      .select("url", "fetch_offset_ms").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "https://a.example/1" -> 0L, "https://a.example/2" -> 2000L,
      "https://a.example/3" -> 4000L,
      "https://b.example/x" -> 0L, "https://b.example/y" -> 1000L), got.toString)
  }

  test("canonical dedup keeps one row with the min-struct keeper") {
    import spark.implicits._
    // the same target discovered from two pages and with a tracking-noise
    // variant: one output row, keeper = lexicographically smallest
    // (kind, discovered_from, url)
    val pages = Seq(
      ("https://b.example/", htmlPage("""<a href="https://t.example/page#frag">x</a>""")),
      ("https://a.example/", htmlPage("""<a href="https://t.example/page">x</a>"""))
    ).toDF("url", "payload")
    val got = FrontierOps.frontier(pages, "url", "payload")
      .select("url", "discovered_from").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.length == 1)
    assert(got.head._2 == "https://a.example/", got.head.toString)
  }

  test("politeness key is stable per host and bounded by shards") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.example/", htmlPage(
        """<a href="https://t.example/1">x</a> <a href="https://t.example/2">y</a>
          |<a href="https://u.example/3">z</a>""".stripMargin))
    ).toDF("url", "payload")
    val got = FrontierOps.frontier(pages, "url", "payload", shards = 8)
      .select("host", "politeness_key").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.forall { case (_, k) => k >= 0 && k < 8 })
    assert(got.filter(_._1 == "t.example").map(_._2).distinct.length == 1)
  }

  test("pipeline: crash between commit groups resumes to byte-identical frontier") {
    import spark.implicits._
    val pages = (1 to 60).map { i =>
      (s"https://h${i % 5}.example/p$i",
        htmlPage((1 to 4).map(j => s"""<a href="/l/${i}_$j">x</a>""").mkString(" ")))
    }.toDF("url", "payload")
    def digests(dir: String): Map[Int, String] = {
      val lin = spark.read.parquet(s"$dir/lineage")
      lin.groupBy(col("bucket")).agg(max(col("digest")).as("d"))
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    }
    val clean = java.nio.file.Files.createTempDirectory("frontier-clean").toString
    FrontierPipeline.runJob(spark, pages, clean, "url", "payload",
      nBuckets = 8, commitGroups = 4)
    val crash = java.nio.file.Files.createTempDirectory("frontier-crash").toString
    intercept[IllegalStateException] {
      FrontierPipeline.runJob(spark, pages, crash, "url", "payload",
        nBuckets = 8, commitGroups = 4, failAfterGroups = Some(2))
    }
    val resumed = FrontierPipeline.runJob(spark, pages, crash, "url", "payload",
      nBuckets = 8, commitGroups = 4)
    assert(resumed.resumedBuckets > 0, "resume must skip committed buckets")
    assert(digests(crash) == digests(clean), "resumed bytes must equal uninterrupted")
    assert(resumed.nTargets == 240)
  }

  test("crawl-loop idempotence: last round's output as seen yields nothing new") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.example/", htmlPage("""<a href="/x">x</a> <a href="/y">y</a>"""))
    ).toDF("url", "payload")
    val round1 = FrontierOps.frontier(pages, "url", "payload")
    assert(round1.count() == 2)
    val round2 = FrontierOps.frontier(pages, "url", "payload",
      seen = Some(round1.select("url")))
    assert(round2.count() == 0)
  }

  test("pipeline: a CONVERGED round (everything seen) completes with 0 targets") {
    // the steady state of a crawl loop — the empty dynamic-overwrite dir
    // must read back as an empty frame (explicit schema), not a schema-
    // inference error, or the loop dies exactly when it is done
    import spark.implicits._
    val pages = Seq(
      ("https://a.example/", htmlPage("""<a href="/x">x</a>"""))
    ).toDF("url", "payload")
    val dir = java.nio.file.Files.createTempDirectory("frontier-conv").toString
    val r1 = FrontierPipeline.runJob(spark, pages, s"$dir/r0", "url", "payload",
      nBuckets = 4)
    assert(r1.nTargets == 1)
    val seen = spark.read.parquet(s"$dir/r0/frontier").select(col("url"))
    val r2 = FrontierPipeline.runJob(spark, pages, s"$dir/r1", "url", "payload",
      nBuckets = 4, seen = Some(seen))
    assert(r2.nTargets == 0)
    // and a rerun over the converged round resumes its committed buckets
    val r3 = FrontierPipeline.runJob(spark, pages, s"$dir/r1", "url", "payload",
      nBuckets = 4, seen = Some(seen))
    assert(r3.nTargets == 0 && r3.resumedBuckets == 4)
  }
}
