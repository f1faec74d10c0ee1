package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.fixtures.CorpusGen
import graft.model.PageRow

class StreamingExtractSpec extends AnyFunSuite with SparkTestBase {

  private def fixtureRows(from: Int, until: Int): Seq[PageRow] =
    (from until until).map { i =>
      val p = CorpusGen.page(i.toLong)
      PageRow(p.url, p.warcTs, p.html, p.text, p.lang)
    }

  test("streaming extraction produces the same digests as batch") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val source = MemoryStream[PageRow]
    val q = StreamingExtract.extractTransform(source.toDF())
      .writeStream.format("memory").queryName("stream_extracted")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(fixtureRows(0, 100))
      q.processAllAvailable()
      source.addData(fixtureRows(100, 200)) // second micro-batch
      q.processAllAvailable()
      val got = s.table("stream_extracted")
        .select("url", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val truth = graft.fixtures.Corpus.truth(200)
      val validKinds = Set("html", "pdf")
      val expected = truth.collect { case (u, (k, e)) if validKinds(k) => u -> e }
      // 'pre' rows pass validation too (they are valid HTML with text set)
      assert(got.size >= expected.size)
      expected.foreach { case (u, e) =>
        assert(got(u) == e, s"stream/batch divergence for $u")
      }
    } finally q.stop()
  }

  test("per-row curation gates compose onto streams: normalize + quality parity with batch") {
    // the curation ops are plain selects, so the SAME code runs over a stream
    // — this pins that no op silently requires a batch-only feature
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val source = MemoryStream[(Long, String)]
    val docs = (1L to 40L).map(i => (i,
      if (i % 3 == 0) "short"
      else (1 to 60).map(k => s"the word of item$k").mkString(" ") + "  padded… and done"))
    val streamed = graft.ops.CurationOps.gopherQualitySignals(
      source.toDF().toDF("doc_id", "text")
        .withColumn("text", graft.ops.CurationOps.normalizeText(org.apache.spark.sql.functions.col("text"))),
      "text", "doc_id")
    val q = streamed.writeStream.format("memory").queryName("stream_gates")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(docs.take(20))
      q.processAllAvailable()
      source.addData(docs.drop(20))
      q.processAllAvailable()
      val got = s.table("stream_gates")
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(8))).toMap
      val batch = graft.ops.CurationOps.gopherQualitySignals(
        docs.toDF("doc_id", "text")
          .withColumn("text", graft.ops.CurationOps.normalizeText(org.apache.spark.sql.functions.col("text"))),
        "text", "doc_id")
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(8))).toMap
      assert(got == batch, "stream/batch gate divergence")
      assert(got.values.exists(_._2) && got.values.exists(!_._2), "both verdicts present")
    } finally q.stop()
  }

  test("streaming dedup by content digest: duplicates across micro-batches dropped, state watermark-bounded") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val source = MemoryStream[PageRow]
    val q = StreamingExtract.dedupByDigest(source.toDF(), watermark = "10 minutes")
      .select("url")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      def page(url: String, tsMin: Int, body: String): PageRow =
        PageRow(url, new java.sql.Timestamp(3600L * 1000 + tsMin * 60000L),
          s"<html><body><p>$body enough words to pass validation checks here</p></body></html>".getBytes,
          null, null)
      // batch 1: two distinct docs + an in-batch mirror copy of doc a
      source.addData(Seq(
        page("http://a.example/1", 1, "alpha content"),
        page("http://mirror.example/1", 1, "alpha content"), // same bytes → same digest
        page("http://b.example/1", 2, "beta content")))
      q.processAllAvailable()
      // batch 2: a revisit of doc a (within watermark) + one new doc
      source.addData(Seq(
        page("http://a.example/1?revisit", 3, "alpha content"),
        page("http://c.example/1", 4, "gamma content")))
      q.processAllAvailable()
      val got = s.table("stream_dedup").collect().map(_.getString(0)).toSet
      assert(got.size == 3, got)
      // exactly one representative of the alpha-content cluster survived
      val alphaReps = got.filter(u => u.contains("a.example") || u.contains("mirror.example"))
      assert(alphaReps.size == 1, s"alpha cluster must keep exactly one: $got")
      assert(got.exists(_.contains("b.example")) && got.exists(_.contains("c.example")))
    } finally q.stop()
  }

  test("file sink with checkpoint: stop/restart neither loses nor duplicates") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val source = MemoryStream[PageRow]
    def start() = StreamingExtract.extractTransform(source.toDF())
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    source.addData(fixtureRows(0, 80))
    q1.processAllAvailable()
    q1.stop()
    // restart against the same checkpoint; feed the next batch
    val q2 = start()
    source.addData(fixtureRows(80, 160))
    q2.processAllAvailable()
    q2.stop()
    val urls = s.read.parquet(s"$dir/out").select("url").collect().map(_.getString(0))
    assert(urls.length == urls.distinct.length, "duplicates after restart")
    val validCount = fixtureRows(0, 160).count { p =>
      val k = graft.fixtures.CorpusGen.page(
        p.url.split('/').last.toLong).kind
      k == "html" || k == "pdf" || k == "pre"
    }
    assert(urls.length == validCount, s"${urls.length} != $validCount")
  }

  test("windowed per-host counts under watermark (event time)") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val source = MemoryStream[PageRow]
    val q = StreamingExtract.hostWindowCounts(source.toDF(), watermark = "10 minutes",
        windowLen = "10 minutes")
      .writeStream.format("memory").queryName("host_windows")
      .outputMode(OutputMode.Complete()).start()
    try {
      source.addData(fixtureRows(0, 300))
      q.processAllAvailable()
      val rows = s.table("host_windows").collect()
      assert(rows.nonEmpty)
      val total = rows.map(_.getLong(2)).sum
      assert(total == 300)
      // zipf skew visible per host
      val byHost = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
      assert(byHost.values.max > byHost.values.sum / byHost.size)
    } finally q.stop()
  }

  test("stateful crawl sessionization: flatMapGroupsWithState with event-time timeout") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    def page(host: String, path: String, minute: Long): PageRow =
      PageRow(s"http://$host/$path", new java.sql.Timestamp(minute * 60000L),
        "<html><body><p>five words of body text</p></body></html>".getBytes, null, "en")
    val source = MemoryStream[PageRow]
    val q = StreamingExtract.hostCrawlSessions(source.toDF(),
        gapMs = 30L * 60 * 1000, watermark = "10 minutes")
      .writeStream.format("memory").queryName("crawl_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // host a: two pages 10 min apart (one session), then a page 2h later
      // (closes session #1); host b: one page. Times start at t=100min — an
      // event AT the initial watermark (0) would be dropped as late.
      source.addData(Seq(page("a.example", "1", 100), page("a.example", "2", 110),
        page("b.example", "1", 105)))
      q.processAllAvailable()
      source.addData(Seq(page("a.example", "3", 230)))
      q.processAllAvailable()
      val closed1 = s.table("crawl_sessions").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / 60000,
          r.getTimestamp(2).getTime / 60000, r.getLong(3)))
      assert(closed1.contains(("a.example", 100L, 110L, 2L)), closed1.mkString(";"))
      // advance the watermark far past every open session's timeout: the
      // event-time timeout must flush a.example's session #2 and b's session
      source.addData(Seq(page("c.example", "1", 1100)))
      q.processAllAvailable()
      source.addData(Seq(page("c.example", "2", 2100)))
      q.processAllAvailable()
      val all = s.table("crawl_sessions").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / 60000,
          r.getTimestamp(2).getTime / 60000, r.getLong(3))).toSet
      assert(all.contains(("a.example", 230L, 230L, 1L)), all.mkString(";"))
      assert(all.contains(("b.example", 105L, 105L, 1L)), all.mkString(";"))
    } finally q.stop()
  }

  test("late-but-in-gap event extends the session backwards (start moves earlier)") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    def page(host: String, path: String, minute: Long): PageRow =
      PageRow(s"http://$host/$path", new java.sql.Timestamp(minute * 60000L),
        "<html><body><p>five words of body text</p></body></html>".getBytes, null, "en")
    val source = MemoryStream[PageRow]
    val q = StreamingExtract.hostCrawlSessions(source.toDF(),
        gapMs = 30L * 60 * 1000, watermark = "2 hours")
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(Seq(page("h.example", "1", 200)))
      q.processAllAvailable()
      // within-watermark straggler 10 min BEFORE the open session's start
      source.addData(Seq(page("h.example", "2", 190)))
      q.processAllAvailable()
      // a late batch carrying a whole OLD session: consecutive stragglers far
      // before the open session must sessionize together, not emit singletons
      source.addData(Seq(page("h.example", "o1", 100), page("h.example", "o2", 101),
        page("h.example", "o3", 110)))
      q.processAllAvailable()
      // close the live session with a far-future event
      source.addData(Seq(page("h.example", "3", 500)))
      q.processAllAvailable()
      val all = s.table("late_sessions").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / 60000,
          r.getTimestamp(2).getTime / 60000, r.getLong(3))).toSet
      assert(all.contains(("h.example", 190L, 200L, 2L)), all.mkString(";"))
      assert(all.contains(("h.example", 100L, 110L, 3L)), all.mkString(";"))
      assert(!all.exists(s0 => s0._2 == 100L && s0._4 == 1L), all.mkString(";"))
    } finally q.stop()
  }
}
