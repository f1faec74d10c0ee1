package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.PageRow

/**
 * WARC (ISO 28500) source: the native container of Common-Crawl-style corpora
 * (the north rule's input shape). Reads `*.warc` / `*.warc.gz` — and the WET
 * (`*.warc.wet[.gz]`) extracted-text variant — into PageRow-shaped rows:
 * url = WARC-Target-URI, warc_ts = WARC-Date, html = the HTTP response body
 * bytes (text = null), or for WET conversion records text = the
 * already-extracted plain text (html = null).
 *
 * Format notes (public spec + Common Crawl layout):
 *  - a record is a CRLF-terminated header block ("WARC/1.x", name: value
 *    lines, blank line), Content-Length payload bytes, then CRLF CRLF;
 *  - `WARC-Type: response` (and `resource`) records carry page payloads;
 *    `conversion` records (WET files) carry pre-extracted text;
 *    request/metadata/warcinfo records are skipped;
 *  - response payloads are HTTP messages — status line + headers are stripped
 *    to the body (the reference consumes file bytes directly; a crawl source
 *    must do this strip itself);
 *  - Common Crawl gzips each record as its OWN gzip member; GZIPInputStream
 *    reads concatenated members natively, so one stream pass covers both
 *    whole-file and member-per-record layouts.
 *
 * Scale shape: one task per WARC file (CC ships ~64k files of ~1 GB per
 * crawl — file-level parallelism IS the scale axis; records inside a file are
 * inherently sequential because gzip members are not seekable without an
 * index). A task's memory is O(one record), never O(file): files are listed
 * driver-side (metadata only) and each task opens a FileSystem stream and
 * decodes records as it iterates — the earlier binaryFile-based reader
 * materialized the whole archive as one Array[Byte] (~1 GB heap per task,
 * 2 GB hard cap). Parsing is streaming and total: a corrupt record ends that
 * file's iteration rather than killing the task.
 */
object WarcSource {

  final case class WarcRecord(
      warcType: String,
      targetUri: String,
      date: String,
      body: Array[Byte]
  )

  /** Hadoop Configuration is not Serializable; Spark's own wrapper is
    * private[spark], so the closure carries this minimal equivalent. */
  private[sources] final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Shared per-archive stream plumbing: one task per file, an open
    * FileSystem stream decoded record-by-record (O(record) memory), closed
    * at exhaustion or task completion. `f` maps each file's record iterator
    * to output rows. */
  private def overRecords[T: org.apache.spark.sql.Encoder](
      spark: SparkSession, dir: String, glob: String, recursive: Boolean)(
      f: Iterator[WarcRecord] => Iterator[T]): Dataset[T] = {
    import spark.implicits._
    val paths = listPaths(spark, dir, glob, recursive)
    if (paths.isEmpty) return spark.emptyDataset[T]
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    // one partition per archive (gzip members are not seekable mid-stream)
    spark.createDataset(paths)
      .repartition(paths.length)
      .mapPartitions { pathsInTask =>
        pathsInTask.flatMap { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          val in: InputStream = {
            var raw: InputStream = null
            try {
              raw = new java.io.BufferedInputStream(
                path.getFileSystem(conf.value).open(path), 1 << 16)
              // BufferedInputStream keeps available() > 0 at member boundaries
              // so GZIPInputStream continues into the next gzip member
              // (member-per-record is the Common Crawl layout)
              if (p.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16) else raw
            } catch {
              // the GZIP constructor reads the header eagerly: a corrupt
              // header must not leak the underlying file stream
              case _: Exception =>
                if (raw != null) closeQuietly(raw)
                new ByteArrayInputStream(Array.emptyByteArray)
            }
          }
          // the stream closes at iterator exhaustion; the task-completion
          // listener covers early abandonment (limit, failure)
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => closeQuietly(in)))
          closing(in, f(records(in)))
        }
      }
  }

  def pages(spark: SparkSession, dir: String,
            glob: String = "*.{warc,warc.gz,warc.wet,warc.wet.gz}",
            recursive: Boolean = true): DataFrame = {
    import spark.implicits._
    overRecords[PageRow](spark, dir, glob, recursive) { rs =>
      rs.filter(r => r.warcType == "response" || r.warcType == "resource" ||
                     r.warcType == "conversion")
        .map { r =>
          if (r.warcType == "conversion")
            // WET records (Common Crawl's *.warc.wet): the payload IS the
            // already-extracted plain text — it lands in `text`, so the
            // pipeline's skip-already-extracted filter (B2) treats these
            // rows as done instead of re-extracting nothing
            PageRow(r.targetUri, parseWarcDate(r.date), null,
              new String(r.body, java.nio.charset.StandardCharsets.UTF_8), null)
          else {
            val body = if (r.warcType == "response") stripHttpHeaders(r.body) else r.body
            PageRow(r.targetUri, parseWarcDate(r.date), body, null, null)
          }
        }
    }.toDF()
  }

  /** One row per response/resource capture with the HTTP envelope PARSED,
    * not just stripped: `http_status` and `mime` (Content-Type up to any
    * `;charset=` parameter, lowercased) let a reader gate on
    * `http_status = 200 AND mime = 'text/html'` BEFORE paying extraction —
    * at crawl scale the non-200/non-HTML majority should die in this
    * filter, pushed against the streaming source. `resource` records (no
    * HTTP envelope) carry null status/mime and their raw body. */
  def captures(spark: SparkSession, dir: String,
               glob: String = "*.{warc,warc.gz}",
               recursive: Boolean = true): DataFrame = {
    import spark.implicits._
    overRecords[CaptureRow](spark, dir, glob, recursive) { rs =>
      rs.filter(r => r.warcType == "response" || r.warcType == "resource")
        .map { r =>
          if (r.warcType == "response") {
            val (status, mime, body) = parseHttp(r.body)
            CaptureRow(r.targetUri, parseWarcDate(r.date), status, mime, body)
          } else CaptureRow(r.targetUri, parseWarcDate(r.date), None, null, r.body)
        }
    }.toDF()
  }

  final case class CaptureRow(url: String, warc_ts: Timestamp,
                              http_status: Option[Int], mime: String,
                              body: Array[Byte])

  /** WAT-style metadata records (`*.warc.wat[.gz]` — Common Crawl wraps one
    * JSON envelope per capture in a `metadata` WARC record): returns
    * (url, warc_ts, json) with the envelope as RAW JSON text — compose with
    * `from_json` and a caller-chosen schema, the LdJsonBlocks pattern (the
    * WAT envelope is deep and version-drifting; baking one schema in here
    * would silently null future fields). Completes the CC format family:
    * WARC payloads (pages/captures), WET text (pages), CDX index
    * (CdxSource), WAT metadata (this). */
  def metadata(spark: SparkSession, dir: String,
               glob: String = "*.{warc,warc.gz,warc.wat,warc.wat.gz}",
               recursive: Boolean = true): DataFrame = {
    import spark.implicits._
    overRecords[MetadataRow](spark, dir, glob, recursive) { rs =>
      rs.filter(_.warcType == "metadata").map { r =>
        MetadataRow(r.targetUri, parseWarcDate(r.date),
          new String(r.body, java.nio.charset.StandardCharsets.UTF_8))
      }
    }.toDF()
  }

  final case class MetadataRow(url: String, warc_ts: Timestamp, json: String)

  /** Driver-side metadata listing (never reads content). Deterministic order. */
  private def listPaths(spark: SparkSession, dir: String, glob: String,
                        recursive: Boolean): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Nil
    val filter = new org.apache.hadoop.fs.GlobFilter(glob)
    val it = fs.listFiles(base, recursive)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && filter.accept(new org.apache.hadoop.fs.Path(st.getPath.getName)))
        buf += st.getPath.toString
    }
    buf.sorted.toSeq
  }

  private def closeQuietly(in: InputStream): Unit =
    try in.close() catch { case _: Exception => () }

  private def closing[A](in: InputStream, it: Iterator[A]): Iterator[A] = new Iterator[A] {
    private var closed = false
    override def hasNext: Boolean = {
      val h = it.hasNext
      if (!h && !closed) { closed = true; closeQuietly(in) }
      h
    }
    override def next(): A = it.next()
  }

  /** ISO-8601 WARC-Date → Timestamp; epoch 0 when absent/unparseable (total). */
  private[sources] def parseWarcDate(s: String): Timestamp = {
    if (s == null || s.isEmpty) return new Timestamp(0L)
    try Timestamp.from(java.time.Instant.parse(s))
    catch { case _: Exception => new Timestamp(0L) }
  }

  /** In-memory convenience over [[records(in*]] (tests, small archives). */
  def records(bytes: Array[Byte], gzipped: Boolean): Iterator[WarcRecord] = {
    val in: InputStream =
      try {
        if (gzipped) new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
        else new ByteArrayInputStream(bytes)
      } catch { case _: Exception => return Iterator.empty }
    records(in)
  }

  /** Streaming record iterator over a WARC stream (already un-gzipped,
    * multi-member safe upstream). Memory is O(current record). Total:
    * malformed input ends the iterator. */
  def records(in: InputStream): Iterator[WarcRecord] = {
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

  /** Strip the HTTP status line + headers from a response payload — and when
    * the headers declare `Transfer-Encoding: chunked`, decode the chunked
    * body (RFC 9112 §7.1: hex size line [; extensions] CRLF, data, CRLF,
    * until a 0-size chunk; trailer headers dropped). Common Crawl stores the
    * RAW HTTP bytes, so without this the extracted "HTML" of a chunked
    * response is interleaved with hex size lines. Truncated bodies keep the
    * decoded prefix; payloads that don't look like HTTP pass through
    * unchanged (resource records, weird crawlers). */
  private[sources] def stripHttpHeaders(payload: Array[Byte]): Array[Byte] =
    parseHttp(payload)._3

  /** Parse an HTTP response envelope: (status, mime, body). Non-HTTP
    * payloads pass through as (None, null, payload) — same totality stance
    * as the strip-only path, which is this function's `._3`. */
  private[sources] def parseHttp(payload: Array[Byte]): (Option[Int], String, Array[Byte]) = {
    if (payload.length < 5 ||
        !(payload(0) == 'H' && payload(1) == 'T' && payload(2) == 'T' && payload(3) == 'P'))
      return (None, null, payload)
    val n = payload.length
    var bodyAt = -1
    var i = 0
    while (bodyAt < 0 && i + 3 < n) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') bodyAt = i + 4
      i += 1
    }
    if (bodyAt < 0) { // LF LF fallback
      i = 0
      while (bodyAt < 0 && i + 1 < n) {
        if (payload(i) == '\n' && payload(i + 1) == '\n') bodyAt = i + 2
        i += 1
      }
    }
    if (bodyAt < 0) return (None, null, payload)
    // ISO-8859-1 view of the header block only (headers are ASCII-ish; the
    // body may be any bytes and is never decoded here)
    val headerText = new String(payload, 0, bodyAt, java.nio.charset.StandardCharsets.ISO_8859_1)
      .toLowerCase
    // status: the 3-digit token after the first space of "http/x.y NNN ..."
    val eol1 = headerText.indexOf('\n') match { case -1 => headerText.length; case e => e }
    val line1 = headerText.substring(0, eol1)
    val sp = line1.indexOf(' ')
    val status = {
      val tok = if (sp > 0) line1.drop(sp + 1).take(3) else ""
      // the char after the 3 digits must be a delimiter — "HTTP/1.1 2004"
      // is garbage, not a 200 the pre-extraction gate should admit
      val after = if (sp > 0 && line1.length > sp + 4) line1.charAt(sp + 4) else ' '
      if (tok.length == 3 && tok.forall(c => c >= '0' && c <= '9') &&
          (after == ' ' || after == '\r')) Some(tok.toInt)
      else None
    }
    var mime: String = null
    var chunked = false
    headerText.linesIterator.foreach { l =>
      val c = l.indexOf(':')
      if (c > 0) {
        val key = l.substring(0, c).trim
        if (key == "transfer-encoding" && l.substring(c + 1).contains("chunked"))
          chunked = true
        if (key == "content-type" && mime == null) {
          val v0 = l.substring(c + 1)
          val semi = v0.indexOf(';')
          val v = (if (semi < 0) v0 else v0.substring(0, semi)).trim
          if (v.nonEmpty) mime = v
        }
      }
    }
    val body = java.util.Arrays.copyOfRange(payload, bodyAt, n)
    (status, mime, if (chunked) dechunk(body) else body)
  }

  /** RFC 9112 chunked-body decoder, total on hostile bytes: a malformed size
    * line or truncation ends the walk and keeps whatever decoded so far.
    * If the VERY FIRST size line is not chunked syntax the body is returned
    * unchanged: replayed/proxied captures commonly keep the original
    * `Transfer-Encoding: chunked` header on an already-de-chunked body
    * (starting `<html>`/`<!DOCTYPE`), and decoding that to empty would drop
    * the whole document. */
  private[sources] def dechunk(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var pos = 0
    val n = body.length
    var done = false
    var malformedFirst = false
    while (!done && pos < n) {
      // size line: hex digits, optional ";ext", ends CRLF (or bare LF)
      var size = 0L
      var k = pos
      var sawDigit = false
      while (k < n && size <= (1L << 31) && {
        val c = body(k)
        val d = if (c >= '0' && c <= '9') c - '0'
                else if (c >= 'a' && c <= 'f') c - 'a' + 10
                else if (c >= 'A' && c <= 'F') c - 'A' + 10
                else -1
        if (d >= 0) { size = size * 16 + d; sawDigit = true; true } else false
      }) k += 1
      while (k < n && body(k) != '\n') k += 1 // skip extensions to line end
      if (!sawDigit || k >= n) {              // malformed/truncated size line
        if (!sawDigit && pos == 0) malformedFirst = true
        done = true
      } else {
        k += 1 // past LF
        if (size == 0L) done = true           // final chunk; trailers dropped
        else {
          val take = math.min(size, (n - k).toLong).toInt
          out.write(body, k, take)
          pos = k + take
          if (take < size) done = true        // truncated data
          else {
            if (pos + 1 < n && body(pos) == '\r' && body(pos + 1) == '\n') pos += 2
            else if (pos < n && body(pos) == '\n') pos += 1
          }
          // pos advanced strictly past the size line's LF — no in-place spin
        }
      }
    }
    if (malformedFirst) body else out.toByteArray
  }
}
