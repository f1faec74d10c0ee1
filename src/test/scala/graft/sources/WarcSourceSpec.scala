package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class WarcSourceSpec extends AnyFunSuite with SparkTestBase {

  private def record(warcType: String, uri: String, date: String, payload: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder
    h.append("WARC/1.0\r\n")
    h.append(s"WARC-Type: $warcType\r\n")
    if (uri != null) h.append(s"WARC-Target-URI: $uri\r\n")
    h.append(s"WARC-Date: $date\r\n")
    h.append(s"WARC-Record-ID: <urn:uuid:0000-$warcType>\r\n")
    h.append(s"Content-Length: ${payload.length}\r\n")
    h.append("\r\n")
    val out = new ByteArrayOutputStream()
    out.write(h.toString.getBytes(US_ASCII))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(US_ASCII))
    out.toByteArray
  }

  private def httpResponse(body: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: ${body.length}\r\n\r\n"
    val out = new ByteArrayOutputStream()
    out.write(head.getBytes(US_ASCII))
    out.write(body)
    out.toByteArray
  }

  private val html = "<html><body><p>the quick brown fox jumps over the lazy dog today</p></body></html>".getBytes(US_ASCII)
  private val html2 = "<html><body><p>another page with enough words to count as real content here</p></body></html>".getBytes(US_ASCII)

  private def warcBytes(): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(record("warcinfo", null, "2026-01-02T03:04:05Z", "software: test".getBytes(US_ASCII)))
    out.write(record("request", "http://x.example/a", "2026-01-02T03:04:05Z",
      "GET /a HTTP/1.1\r\nHost: x.example\r\n\r\n".getBytes(US_ASCII)))
    out.write(record("response", "http://x.example/a", "2026-01-02T03:04:05Z", httpResponse(html)))
    out.write(record("response", "http://x.example/b", "2026-01-02T03:04:06Z", httpResponse(html2)))
    out.toByteArray
  }

  test("plain WARC: response records become PageRows, HTTP headers stripped") {
    val recs = WarcSource.records(warcBytes(), gzipped = false).toList
    assert(recs.map(_.warcType) == List("warcinfo", "request", "response", "response"))
    val dir = Files.createTempDirectory("graft-warc")
    Files.write(dir.resolve("test.warc"), warcBytes())
    val df = WarcSource.pages(spark, dir.toString)
    assert(df.columns.toSeq == Seq("url", "warc_ts", "html", "text", "lang"))
    val rows = df.orderBy("url").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "http://x.example/a")
    assert(rows(0).getAs[Array[Byte]]("html").toSeq == html.toSeq) // HTTP head stripped
    assert(rows(0).getTimestamp(1).toInstant.toString == "2026-01-02T03:04:05Z")
    // pipeline-ready: extraction over the warc rows
    val texts = df.withColumn("t", graft.functions.extract_any_text(col("html")))
      .select("url", "t").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(texts("http://x.example/a") == "the quick brown fox jumps over the lazy dog today")
  }

  test("Transfer-Encoding: chunked bodies are de-chunked (CC stores raw HTTP)") {
    def chunkedResponse(parts: Seq[Array[Byte]], trailer: Boolean = false): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n").getBytes(US_ASCII))
      parts.foreach { p =>
        out.write(f"${p.length}%x;ext=1\r\n".getBytes(US_ASCII)) // chunk extension ignored
        out.write(p); out.write("\r\n".getBytes(US_ASCII))
      }
      out.write("0\r\n".getBytes(US_ASCII))
      if (trailer) out.write("X-Trailer: t\r\n".getBytes(US_ASCII))
      out.write("\r\n".getBytes(US_ASCII))
      out.toByteArray
    }
    // body split at an awkward boundary — the hex size lines must NOT leak
    val split = Seq(html.take(13), html.drop(13))
    val got = WarcSource.stripHttpHeaders(chunkedResponse(split, trailer = true))
    assert(got.toSeq == html.toSeq)
    // end-to-end through a WARC record
    val out = new ByteArrayOutputStream()
    out.write(record("response", "http://x.example/c", "2026-01-02T03:04:07Z",
      chunkedResponse(split)))
    val dir = Files.createTempDirectory("graft-warc-chunked")
    Files.write(dir.resolve("c.warc"), out.toByteArray)
    val rows = WarcSource.pages(spark, dir.toString).collect()
    assert(rows.length == 1 && rows(0).getAs[Array[Byte]]("html").toSeq == html.toSeq)
    // truncated chunk data keeps the decoded prefix
    val trunc = chunkedResponse(split).dropRight(12)
    assert(new String(WarcSource.stripHttpHeaders(trunc), US_ASCII).startsWith("<html>"))
    // a body whose FIRST size line is not chunked syntax passes through
    // unchanged: replayed/proxied captures keep the chunked header on an
    // already-de-chunked body, and decoding that to empty would drop the doc
    val bad = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZ\r\nnope".getBytes(US_ASCII)
    assert(new String(WarcSource.stripHttpHeaders(bad), US_ASCII) == "ZZ\r\nnope")
    val preDechunked = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
      + "<html><body>already decoded</body></html>").getBytes(US_ASCII)
    assert(new String(WarcSource.stripHttpHeaders(preDechunked), US_ASCII)
      == "<html><body>already decoded</body></html>")
    // ...but a LEGIT empty chunked body still decodes to empty (the fallback
    // fires only when the first size line fails to parse)
    val empty = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n0\r\n\r\n".getBytes(US_ASCII)
    assert(WarcSource.stripHttpHeaders(empty).isEmpty)
    // and a malformed SECOND size line keeps the decoded prefix, no fallback
    val midBad = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
      + "5\r\nhello\r\nnope").getBytes(US_ASCII)
    assert(new String(WarcSource.stripHttpHeaders(midBad), US_ASCII) == "hello")
    // non-chunked responses are untouched by the new path
    assert(WarcSource.stripHttpHeaders(httpResponse(html)).toSeq == html.toSeq)
  }

  test("captures: HTTP status + mime parsed (charset param cut), resource/non-HTTP null out") {
    def resp(status: String, ctype: String, body: String): Array[Byte] =
      (s"HTTP/1.1 $status\r\n" +
        (if (ctype != null) s"Content-Type: $ctype\r\n" else "") +
        s"Content-Length: ${body.length}\r\n\r\n$body").getBytes(US_ASCII)
    val out = new ByteArrayOutputStream()
    out.write(record("response", "http://c.example/ok", "2026-01-02T03:04:05Z",
      resp("200 OK", "text/HTML; charset=UTF-8", "<html>ok</html>")))
    out.write(record("response", "http://c.example/gone", "2026-01-02T03:04:06Z",
      resp("404 Not Found", "text/plain", "nope")))
    out.write(record("response", "http://c.example/pdf", "2026-01-02T03:04:07Z",
      resp("200 OK", null, "%PDF-")))
    out.write(record("response", "http://c.example/raw", "2026-01-02T03:04:08Z",
      "not an http payload at all".getBytes(US_ASCII)))
    // a 4-digit garbage status must NOT parse as its first 3 digits
    out.write(record("response", "http://c.example/badstatus", "2026-01-02T03:04:10Z",
      resp("2004 Weird", "text/plain", "junk")))
    out.write(record("resource", "http://c.example/res", "2026-01-02T03:04:09Z",
      "raw resource bytes".getBytes(US_ASCII)))
    val dir = Files.createTempDirectory("warc-cap").toString
    Files.write(Paths.get(dir, "c.warc"), out.toByteArray)
    val got = WarcSource.captures(spark, dir).collect().map { r =>
      (r.getAs[String]("url"),
        Option(r.getAs[Integer]("http_status")).map(_.toInt),
        r.getAs[String]("mime"),
        new String(r.getAs[Array[Byte]]("body"), US_ASCII))
    }.toSet
    assert(got == Set(
      ("http://c.example/ok", Some(200), "text/html", "<html>ok</html>"),
      ("http://c.example/gone", Some(404), "text/plain", "nope"),
      ("http://c.example/pdf", Some(200), null, "%PDF-"),
      ("http://c.example/raw", None, null, "not an http payload at all"),
      ("http://c.example/badstatus", None, "text/plain", "junk"),
      ("http://c.example/res", None, null, "raw resource bytes")), got.toString)
  }

  test("WAT metadata records: raw JSON envelopes, from_json composition downstream") {
    val out = new ByteArrayOutputStream()
    out.write(record("metadata", "http://m.example/a", "2026-01-02T03:04:05Z",
      """{"Envelope": {"WARC-Header-Length": "433", "Links": [{"url": "/x"}]}}"""
        .getBytes(US_ASCII)))
    out.write(record("response", "http://m.example/a", "2026-01-02T03:04:05Z",
      httpResponse(html))) // non-metadata records are NOT metadata rows
    val dir = Files.createTempDirectory("warc-wat").toString
    Files.write(Paths.get(dir, "m.warc"), out.toByteArray)
    val got = WarcSource.metadata(spark, dir)
    assert(got.count() == 1)
    val parsed = got.select(col("url"),
      from_json(col("json"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "Envelope STRUCT<`WARC-Header-Length`: STRING>"))
        .getField("Envelope").getField("WARC-Header-Length").as("hl"))
      .collect()(0)
    assert(parsed.getString(0) == "http://m.example/a" && parsed.getString(1) == "433")
  }

  test("WET conversion records land as pre-extracted TEXT (html null)") {
    // Common Crawl's *.warc.wet.gz: conversion records whose payload IS the
    // extracted plain text — the pipeline's B2 filter then skips them
    val wetText = "the quick brown fox jumps over the lazy dog\nsecond line"
    val out = new ByteArrayOutputStream()
    out.write(record("warcinfo", null, "2026-01-02T03:04:05Z", "software: wet".getBytes(US_ASCII)))
    out.write(record("conversion", "http://x.example/a", "2026-01-02T03:04:05Z",
      wetText.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    out.write(record("response", "http://x.example/b", "2026-01-02T03:04:06Z", httpResponse(html)))
    val dir = Files.createTempDirectory("wet").toString
    val gz = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(gz)
    g.write(out.toByteArray); g.close()
    Files.write(Paths.get(dir, "part.warc.wet.gz"), gz.toByteArray)
    val rows = WarcSource.pages(spark, dir)
      .select("url", "html", "text").collect().sortBy(_.getString(0))
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "http://x.example/a")
    assert(rows(0).isNullAt(1) && rows(0).getString(2) == wetText)
    assert(rows(1).getString(0) == "http://x.example/b")
    assert(!rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("gzipped WARC with one gzip member PER RECORD (Common Crawl layout)") {
    val out = new ByteArrayOutputStream()
    def member(rec: Array[Byte]): Unit = {
      val gz = new GZIPOutputStream(out)
      gz.write(rec); gz.finish()
    }
    member(record("response", "http://y.example/1", "2026-02-03T00:00:00Z", httpResponse(html)))
    member(record("request", "http://y.example/1", "2026-02-03T00:00:00Z", "GET / HTTP/1.1\r\n\r\n".getBytes(US_ASCII)))
    member(record("response", "http://y.example/2", "2026-02-03T00:00:01Z", httpResponse(html2)))
    val dir = Files.createTempDirectory("graft-warcgz")
    Files.write(dir.resolve("cc.warc.gz"), out.toByteArray)
    val df = WarcSource.pages(spark, dir.toString)
    assert(df.count() == 2)
    assert(df.select("url").collect().map(_.getString(0)).toSet ==
      Set("http://y.example/1", "http://y.example/2"))
  }

  test("UTF-8 target URIs survive header decoding (WARC 1.1 IRIs)") {
    val uri = "http://x.example/café/über"
    val rec = {
      val h = (s"WARC/1.1\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: ${httpResponse(html).length}\r\n\r\n")
        .getBytes("UTF-8")
      val out = new ByteArrayOutputStream()
      out.write(h); out.write(httpResponse(html)); out.write("\r\n\r\n".getBytes(US_ASCII))
      out.toByteArray
    }
    val got = WarcSource.records(rec, gzipped = false).toList
    assert(got.head.targetUri == uri, got.head.targetUri)
  }

  test("streaming reader: a ~200 MB archive reads with O(record) task memory") {
    // the pre-round-3 reader materialized the archive as one Array[Byte] per
    // task; this archive (≈200 MB raw, 100k records) would have been a ~200 MB
    // single allocation — the streaming reader's working set is one ~2 KB
    // record. Digest-verified: every record must arrive intact and in order.
    val dir = Files.createTempDirectory("graft-warc-big")
    val n = 100000
    val os = new java.io.BufferedOutputStream(
      Files.newOutputStream(dir.resolve("big.warc")), 1 << 20)
    val pad = ("x" * 1800).getBytes(US_ASCII)
    (0 until n).foreach { i =>
      val body = f"<html><body><p>doc $i%06d ".getBytes(US_ASCII) ++ pad ++ "</p></body></html>".getBytes(US_ASCII)
      os.write(record("response", f"http://big.example/$i%06d", "2026-03-01T00:00:00Z", httpResponse(body)))
    }
    os.close()
    assert(Files.size(dir.resolve("big.warc")) > 190L * 1024 * 1024)
    val df = WarcSource.pages(spark, dir.toString)
    import org.apache.spark.sql.functions._
    val agg = df.agg(
      count(lit(1)), min(col("url")), max(col("url")),
      sum(length(col("html")))).collect()(0)
    assert(agg.getLong(0) == n)
    assert(agg.getString(1) == "http://big.example/000000")
    assert(agg.getString(2) == "http://big.example/099999")
    // every body intact: fixed-width records, so sizes sum exactly
    val one = "<html><body><p>doc 000000 ".length + 1800 + "</p></body></html>".length
    assert(agg.getLong(3) == n.toLong * one, s"got ${agg.getLong(3)}, want ${n.toLong * one}")
    // cleanup the ~200 MB temp archive
    Files.delete(dir.resolve("big.warc"))
  }

  test("corrupt gzip member mid-archive: records before it survive, no throw") {
    val out = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(out)
    gz.write(record("response", "http://ok.example/1", "2026-04-01T00:00:00Z", httpResponse(html)))
    gz.finish()
    out.write(Array.fill[Byte](64)(0x5A)) // garbage where the next member header should be
    val dir = Files.createTempDirectory("graft-warc-corrupt")
    Files.write(dir.resolve("broken.warc.gz"), out.toByteArray)
    val rows = WarcSource.pages(spark, dir.toString).collect()
    assert(rows.length == 1 && rows(0).getString(0) == "http://ok.example/1")
  }

  test("totality: truncated records, junk bytes, bad dates never throw") {
    assert(WarcSource.records(Array.emptyByteArray, gzipped = false).isEmpty)
    assert(WarcSource.records("JUNK NOT WARC".getBytes(US_ASCII), gzipped = false).isEmpty)
    assert(WarcSource.records("garbage".getBytes(US_ASCII), gzipped = true).isEmpty)
    val truncated = warcBytes().take(100)
    assert(WarcSource.records(truncated, gzipped = false).isEmpty) // header ok, body short
    // declared length overruns payload → iteration ends, no throw
    val lying = record("response", "http://z.example", "not-a-date", httpResponse(html))
    val mangled = new String(lying, US_ASCII).replace(s"Content-Length: ", "Content-Length: 9")
    WarcSource.records(mangled.getBytes(US_ASCII), gzipped = false).toList
    assert(WarcSource.parseWarcDate("not-a-date").getTime == 0L)
  }
}
