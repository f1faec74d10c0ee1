package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.PageRow

/**
 * WARC (ISO 28500) source: the native container of Common-Crawl-style corpora
 * (the north rule's input shape). Reads `*.warc` / `*.warc.gz` files into
 * PageRow-shaped rows: url = WARC-Target-URI, warc_ts = WARC-Date,
 * html = the HTTP response body bytes, text = null, lang = null.
 *
 * Format notes (public spec + Common Crawl layout):
 *  - a record is a CRLF-terminated header block ("WARC/1.x", name: value
 *    lines, blank line), Content-Length payload bytes, then CRLF CRLF;
 *  - only `WARC-Type: response` (and `resource`) records carry page payloads;
 *    request/metadata/warcinfo records are skipped;
 *  - response payloads are HTTP messages — status line + headers are stripped
 *    to the body (the reference consumes file bytes directly; a crawl source
 *    must do this strip itself);
 *  - Common Crawl gzips each record as its OWN gzip member; GZIPInputStream
 *    reads concatenated members natively, so one stream pass covers both
 *    whole-file and member-per-record layouts.
 *
 * Scale shape: one task per WARC file via Spark's binaryFile source (CC ships
 * ~64k files of ~1 GB per crawl — file-level parallelism IS the scale axis;
 * records inside a file are inherently sequential because gzip members are
 * not seekable without an index). Parsing is streaming and total: a corrupt
 * record ends that file's iteration rather than killing the task.
 */
object WarcSource {

  final case class WarcRecord(
      warcType: String,
      targetUri: String,
      date: String,
      body: Array[Byte]
  )

  def pages(spark: SparkSession, dir: String, glob: String = "*.{warc,warc.gz}",
            recursive: Boolean = true): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", recursive.toString)
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
    val rows: Dataset[PageRow] = files.flatMap { case (path, content) =>
      records(content, gzipped = path.endsWith(".gz"))
        .filter(r => r.warcType == "response" || r.warcType == "resource")
        .map { r =>
          val body = if (r.warcType == "response") stripHttpHeaders(r.body) else r.body
          PageRow(r.targetUri, parseWarcDate(r.date), body, null, null)
        }
    }
    rows.toDF()
  }

  /** ISO-8601 WARC-Date → Timestamp; epoch 0 when absent/unparseable (total). */
  private[sources] def parseWarcDate(s: String): Timestamp = {
    if (s == null || s.isEmpty) return new Timestamp(0L)
    try Timestamp.from(java.time.Instant.parse(s))
    catch { case _: Exception => new Timestamp(0L) }
  }

  /** Streaming record iterator over WARC bytes (optionally gzipped,
    * multi-member safe). Total: malformed input ends the iterator. */
  def records(bytes: Array[Byte], gzipped: Boolean): Iterator[WarcRecord] = {
    val in: InputStream =
      try {
        if (gzipped) new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
        else new ByteArrayInputStream(bytes)
      } catch { case _: Exception => return Iterator.empty }
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var done = false
      private def advance(): Unit = {
        while (nextRec == null && !done) {
          try {
            val headers = readHeaderBlock(in)
            if (headers == null) { done = true }
            else {
              val len = headers.getOrElse("content-length", "-1").trim.toLong
              if (len < 0 || len > Int.MaxValue) { done = true }
              else {
                val body = readFully(in, len.toInt)
                if (body == null) { done = true }
                else {
                  // trailing CRLF CRLF between records (tolerate any number)
                  nextRec = WarcRecord(
                    headers.getOrElse("warc-type", "").trim.toLowerCase,
                    headers.getOrElse("warc-target-uri", "").trim,
                    headers.getOrElse("warc-date", "").trim,
                    body)
                }
              }
            }
          } catch { case _: Exception => done = true }
        }
      }
      override def hasNext: Boolean = { advance(); nextRec != null }
      override def next(): WarcRecord = {
        advance()
        if (nextRec == null) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Header block: skips inter-record blank lines, requires a WARC/ version
    * line, then name:value lines until the blank separator. Null at EOF. */
  private def readHeaderBlock(in: InputStream): Map[String, String] = {
    var line = readLine(in)
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null) return null
    if (!line.startsWith("WARC/")) return null
    val out = scala.collection.mutable.Map.empty[String, String]
    var l = readLine(in)
    while (l != null && l.nonEmpty) {
      val colon = l.indexOf(':')
      if (colon > 0)
        out(l.substring(0, colon).trim.toLowerCase) = l.substring(colon + 1)
      l = readLine(in)
    }
    if (l == null) null else out.toMap
  }

  /** One CRLF/LF-terminated line, decoded as UTF-8 — WARC 1.1 allows UTF-8
    * header values (IRI target URIs); per-byte chars would mojibake them into
    * the url column and every digest keyed on it. Null at EOF before any byte. */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(64)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      if (b != '\r') buf.write(b)
      b = in.read()
    }
    new String(buf.toByteArray, StandardCharsets.UTF_8)
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(buf, off, n - off)
      if (k < 0) return null
      off += k
    }
    buf
  }

  /** Strip the HTTP status line + headers from a response payload; the body
    * starts after the first blank line. Payloads that don't look like HTTP
    * pass through unchanged (resource records, weird crawlers). */
  private[sources] def stripHttpHeaders(payload: Array[Byte]): Array[Byte] = {
    if (payload.length < 5 ||
        !(payload(0) == 'H' && payload(1) == 'T' && payload(2) == 'T' && payload(3) == 'P'))
      return payload
    var i = 0
    val n = payload.length
    while (i + 3 < n) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, n)
      i += 1
    }
    // LF LF fallback
    i = 0
    while (i + 1 < n) {
      if (payload(i) == '\n' && payload(i + 1) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 2, n)
      i += 1
    }
    payload
  }
}
