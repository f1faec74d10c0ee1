package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StreamingFrontierSpec extends AnyFunSuite with SparkTestBase {

  private def ts(min: Int) = new Timestamp(min * 60_000L)

  private def page(url: String, min: Int, links: String): (Timestamp, String, Array[Byte]) =
    (ts(min), url, s"<html><body>$links</body></html>".getBytes("UTF-8"))

  test("cross-batch first-seen dedup per host; novel urls still emit") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val source = MemoryStream[(Timestamp, String, Array[Byte])]
    val q = StreamingFrontier.targets(
      source.toDF().toDF("warc_ts", "url", "html"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("frontier_targets")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(page("https://a.example/1", 1,
        """<a href="https://t.example/x">x</a> <a href="https://t.example/y">y</a>"""))
      q.processAllAvailable()
      // second batch re-discovers x (must dedup) and adds z (must emit)
      source.addData(page("https://a.example/2", 2,
        """<a href="https://t.example/x">x</a> <a href="https://t.example/z">z</a>"""))
      q.processAllAvailable()
      val got = s.table("frontier_targets")
        .select("url").collect().map(_.getString(0)).sorted.toSeq
      assert(got == Seq("https://t.example/x", "https://t.example/y", "https://t.example/z"),
        got.toString)
    } finally q.stop()
  }

  test("canonical-form dedup: fragment/tracking variants collapse to one emission") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val source = MemoryStream[(Timestamp, String, Array[Byte])]
    val q = StreamingFrontier.targets(
      source.toDF().toDF("warc_ts", "url", "html"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("frontier_canon")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(page("https://a.example/1", 1,
        """<a href="https://t.example/p">x</a>"""))
      q.processAllAvailable()
      source.addData(page("https://a.example/2", 2,
        """<a href="https://t.example/p#frag">x</a>"""))
      q.processAllAvailable()
      assert(s.table("frontier_canon").count() == 1)
    } finally q.stop()
  }

  test("nofollow, blocklist, and robots gates hold on the stream") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val robots = Seq(("t.example", "User-agent: *\nDisallow: /p/")).toDF("host", "robots_txt")
    val source = MemoryStream[(Timestamp, String, Array[Byte])]
    val q = StreamingFrontier.targets(
      source.toDF().toDF("warc_ts", "url", "html"),
      robots = Some(robots), blockedDomains = Seq("spam.example"),
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("frontier_gates")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(page("https://a.example/1", 1,
        """<a href="https://t.example/p/no">r</a> <a href="https://t.example/ok">y</a>
          |<a rel="nofollow" href="https://t.example/nf">n</a>
          |<a href="https://spam.example/s">s</a>""".stripMargin))
      q.processAllAvailable()
      val got = s.table("frontier_gates").select("url").collect().map(_.getString(0)).toSeq
      assert(got == Seq("https://t.example/ok"), got.toString)
    } finally q.stop()
  }

  test("per-host cap: a full seen set still filters but novel urls re-emit") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val source = MemoryStream[(Timestamp, String, Array[Byte])]
    val q = StreamingFrontier.targets(
      source.toDF().toDF("warc_ts", "url", "html"),
      watermark = "10 minutes", maxSeenPerHost = 2)
      .writeStream.format("memory").queryName("frontier_cap")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(page("https://a.example/1", 1,
        """<a href="https://t.example/1">a</a> <a href="https://t.example/2">b</a>
          |<a href="https://t.example/3">c</a>""".stripMargin))
      q.processAllAvailable()
      // 1 and 2 admitted to the set; 3 emitted but NOT admitted (cap)
      assert(s.table("frontier_cap").count() == 3)
      source.addData(page("https://a.example/2", 2,
        """<a href="https://t.example/1">a</a> <a href="https://t.example/3">c</a>"""))
      q.processAllAvailable()
      // 1 filtered (in set); 3 re-emits (cap kept it out of the set) —
      // the documented conservative stance: discovery never silently drops
      val rows = s.table("frontier_cap").select("url", "seen_state").collect()
        .map(r => (r.getString(0), r.getString(1)))
      val urls = rows.map(_._1)
      assert(urls.count(_ == "https://t.example/3") == 2)
      assert(urls.count(_ == "https://t.example/1") == 1)
      // seen_state marks the cap boundary: admitted rows are "fresh", every
      // emission of the unadmitted url (first AND re-emit) is "overflow" —
      // the consumer's signal to route it through the exact batch anti-join
      assert(rows.toSet == Set(
        ("https://t.example/1", "fresh"),
        ("https://t.example/2", "fresh"),
        ("https://t.example/3", "overflow")))
      assert(rows.count(_ == ("https://t.example/3", "overflow")) == 2)
    } finally q.stop()
  }
}
