package graft.pdf

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater
import scala.collection.mutable

/**
 * Layout-aware PDF text reconstruction: parse PDF objects and content streams,
 * interpret the text operators (BT ET Tf TL Td TD Tm T* Tj TJ '), build positioned
 * glyph runs, group runs into lines by y-tolerance, sort into reading order
 * (page asc, line y desc, run x asc), and emit text.
 *
 * Reference analogs: the hOCR positioned word-span model consumed at
 * ocr_combined.py:73-82 (span = (page, bbox, word) in reading order) and the
 * Tesseract sidecar text contract (lines joined by '\n', pages by '\f',
 * ocr_combined.py:169,196). Preflight mirrors security_validator.py:370-461
 * (header magic + version at :377-385, /Encrypt|/StmF|/StrF in first 2KB at
 * :425-430, /EmbeddedFile in first 4KB at :450-455).
 *
 * Totality: every entry point catches internal errors and degrades (preflight
 * reports issues; text/spans return empty on malformed bodies) — one bad payload
 * must never kill a task (reference per-file catch, ocr_combined.py:219-230).
 *
 * Width model: PDF text extraction needs only relative ordering, so run advance
 * width is approximated as 0.5 * fontSize per char (Helvetica-ish average);
 * TJ numeric adjustments apply exactly (-n/1000 * fontSize).
 */
object PdfExtract {

  final case class Run(page: Int, x: Float, y: Float, size: Float, text: String)
  final case class Span(page: Int, x1: Int, y1: Int, x2: Int, y2: Int, word: String)
  final case class Preflight(
      isPdf: Boolean,
      version: String,
      encrypted: Boolean,
      embedded: Boolean,
      suspicious: Boolean,
      issues: List[String]
  )

  /** Suspicious active-content markers scanned in the first 1MB
    * (reference pattern list analog, security_validator.py:64-80):
    * auto-executing actions and embedded scripts. */
  private val SuspiciousMarkers: List[(String, String)] = List(
    "/JavaScript" -> "suspicious_javascript",
    "/OpenAction" -> "suspicious_openaction",
    "/Launch" -> "suspicious_launch",
    "/AA" -> "suspicious_autoaction")

  /** Line-grouping y tolerance in text-space units. */
  val YTol = 2.0f

  // ---------------------------------------------------------------- preflight

  def isPdfMagic(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 5 &&
      bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-'

  def preflight(bytes: Array[Byte]): Preflight = {
    val issues = mutable.ListBuffer.empty[String]
    if (!isPdfMagic(bytes)) {
      return Preflight(isPdf = false, version = "", encrypted = false, embedded = false,
        suspicious = false, issues = List("not_pdf_header"))
    }
    // version: chars after "%PDF-" up to whitespace, must parse as a float
    var j = 5
    val vs = new StringBuilder
    while (j < math.min(bytes.length, 16) && !isWsByte(bytes(j))) { vs.append(bytes(j).toChar); j += 1 }
    val version = vs.result()
    val versionOk = try { version.toFloat; true } catch { case _: Exception => false }
    if (!versionOk) issues += "bad_version"
    def prefixHas(marker: String, limit: Int): Boolean = {
      val m = marker.getBytes(StandardCharsets.US_ASCII)
      val lim = math.min(bytes.length, limit)
      var i = 0
      var found = false
      while (!found && i + m.length <= lim) {
        var k = 0
        while (k < m.length && bytes(i + k) == m(k)) k += 1
        if (k == m.length) found = true else i += 1
      }
      found
    }
    // /Encrypt rides the TRAILER in real files — the head window only sees
    // it in linearized PDFs, so the last 2 KB are scanned too
    def suffixHas(marker: String, window: Int): Boolean = {
      val m = marker.getBytes(StandardCharsets.US_ASCII)
      var i = math.max(0, bytes.length - window)
      var found = false
      while (!found && i + m.length <= bytes.length) {
        var k = 0
        while (k < m.length && bytes(i + k) == m(k)) k += 1
        if (k == m.length) found = true else i += 1
      }
      found
    }
    val encrypted = prefixHas("/Encrypt", 2048) || suffixHas("/Encrypt", 2048) ||
      prefixHas("/StmF", 2048) || prefixHas("/StrF", 2048)
    if (encrypted) issues += "encrypted"
    val embedded = prefixHas("/EmbeddedFile", 4096)
    if (embedded) issues += "embedded_files"
    val hits = SuspiciousMarkers.collect { case (m, issue) if prefixHas(m, 1 << 20) => issue }
    issues ++= hits
    Preflight(isPdf = versionOk, version = version, encrypted = encrypted,
      embedded = embedded, suspicious = hits.nonEmpty, issues = issues.toList)
  }

  private def isWsByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\r' || b == '\n' || b == '\f' || b == 0

  // ---------------------------------------------------------------- object model

  /** streamOff = index just after the "stream" keyword (-1 if no stream);
    * endStreamAt = absolute index of "endstream" (-1 if none). Offsets captured
    * during the single object scan so stream decoding never re-searches. */
  private final case class PdfObj(num: Int, body: Array[Byte], bodyOff: Int, bodyLen: Int,
      streamOff: Int, endStreamAt: Int) {
    /** Dict region only (up to the stream payload) — never copies stream bytes. */
    def dictStr: String = {
      val end = if (streamOff >= 0) streamOff - "stream".length else bodyOff + bodyLen
      new String(body, bodyOff, math.max(0, end - bodyOff), StandardCharsets.ISO_8859_1)
    }
  }

  /** Scan `N G obj ... endobj` object frames; no xref needed (objects located
    * by scan). PDF ≥1.5 packs objects — including page/catalog dicts — into
    * compressed `/Type /ObjStm` streams; those are inflated and their
    * contained objects added (top-level frames win on number collision).
    * Without this, ObjStm documents silently extract as empty. */
  private def scanObjects(bytes: Array[Byte]): Map[Int, PdfObj] = {
    val (top, dups) = scanTopLevel(bytes)
    // duplicate `N G obj` frames mean the document carries revisions
    // (incremental updates, §7.5.6): the xref chain — not file order — says
    // which frame is active. Single-revision documents (no duplicates, the
    // overwhelmingly common case) never pay for xref parsing.
    val resolved = if (dups.isEmpty) top else applyXrefPreference(bytes, top, dups)
    // gate on a single substring scan: most documents have no ObjStm and the
    // hot path must not allocate per-object dict strings twice
    if (indexOf(bytes, "/ObjStm", 0) < 0) resolved else expandObjStm(resolved)
  }

  /** Objects contained in /ObjStm streams: header is N pairs "objnum offset"
    * (offset relative to /First); object k's body is decoded[First+off_k,
    * First+off_{k+1}). Contained objects cannot themselves hold streams. */
  private def expandObjStm(objs: Map[Int, PdfObj]): Map[Int, PdfObj] = {
    val extra = mutable.Map.empty[Int, PdfObj]
    objs.values.foreach { o =>
      if (o.streamOff >= 0) {
        val dict = o.dictStr
        if (dict.contains("/ObjStm")) {
          for {
            nObjs <- dictInt(dict, "/N")
            first <- dictInt(dict, "/First")
            data <- streamBytes(o)
            if nObjs > 0 && nObjs <= (1 << 20) && first > 0 && first <= data.length
          } {
            val nums = new Array[Long](nObjs * 2)
            var i = 0
            var count = 0
            var ok = true
            while (count < nObjs * 2 && ok) {
              while (i < first && isWsByte(data(i))) i += 1
              if (i >= first) ok = false
              else {
                var v = 0L
                val st = i
                while (i < first && data(i) >= '0' && data(i) <= '9') { v = v * 10 + (data(i) - '0'); i += 1 }
                if (i == st) ok = false else { nums(count) = v; count += 1 }
              }
            }
            if (ok) {
              var k = 0
              while (k < nObjs) {
                val num = nums(k * 2)
                val off = first.toLong + nums(k * 2 + 1)
                val end = if (k + 1 < nObjs) first.toLong + nums(k * 2 + 3) else data.length.toLong
                if (num > 0 && num <= Int.MaxValue && off >= 0 && off < data.length &&
                    end > off && end <= data.length &&
                    !objs.contains(num.toInt) && !extra.contains(num.toInt))
                  extra(num.toInt) = PdfObj(num.toInt, data, off.toInt, (end - off).toInt, -1, -1)
                k += 1
              }
            }
          }
        }
      }
    }
    if (extra.isEmpty) objs else objs ++ extra
  }

  /** Frame body starting just after the "obj" keyword at `objKw`: locates the
    * dict/stream extents. Returns the object and the scan-resume index. */
  private def frameBodyAt(bytes: Array[Byte], num: Int, objKw: Int): (PdfObj, Int) = {
    val n = bytes.length
    val bodyStart = objKw + 3
    // find endobj; if a stream begins, skip its payload by search
    var e = indexOf(bytes, "endobj", bodyStart)
    val streamAt = indexOf(bytes, "stream", bodyStart)
    var streamOff = -1
    var endStreamAt = -1
    if (streamAt >= 0 && (e < 0 || streamAt < e)) {
      streamOff = streamAt + "stream".length
      endStreamAt = indexOf(bytes, "endstream", streamAt)
      if (endStreamAt >= 0) e = indexOf(bytes, "endobj", endStreamAt)
    }
    val bodyEnd = if (e < 0) n else e
    (PdfObj(num, bytes, bodyStart, bodyEnd - bodyStart, streamOff, endStreamAt),
      if (e < 0) n else e + 6)
  }

  /** Object frame at a byte offset (the xref's view: "N G obj" with optional
    * leading whitespace). None when the offset doesn't hold a frame. */
  private def frameAt(bytes: Array[Byte], off: Long): Option[PdfObj] = {
    val n = bytes.length
    if (off < 0 || off >= n) return None
    var i = off.toInt
    while (i < n && isWsByte(bytes(i))) i += 1
    val numStart = i
    var num = 0L
    while (i < n && bytes(i) >= '0' && bytes(i) <= '9' && num <= Int.MaxValue) {
      num = num * 10 + (bytes(i) - '0'); i += 1
    }
    if (i == numStart || num <= 0 || num > Int.MaxValue) return None
    while (i < n && isWsByte(bytes(i))) i += 1
    val genStart = i
    while (i < n && bytes(i) >= '0' && bytes(i) <= '9') i += 1
    if (i == genStart) return None
    while (i < n && isWsByte(bytes(i))) i += 1
    if (i + 3 > n || bytes(i) != 'o' || bytes(i + 1) != 'b' || bytes(i + 2) != 'j') return None
    Some(frameBodyAt(bytes, num.toInt, i)._1)
  }

  private def scanTopLevel(bytes: Array[Byte]): (Map[Int, PdfObj], List[Int]) = {
    val out = mutable.Map.empty[Int, PdfObj]
    val dups = mutable.ListBuffer.empty[Int]
    val n = bytes.length
    var i = 0
    while (i + 3 < n) {
      // find "obj" preceded by "N G "
      if (bytes(i) == 'o' && bytes(i + 1) == 'b' && bytes(i + 2) == 'j' &&
          (i + 3 >= n || !isRegular(bytes(i + 3)))) {
        // walk back: ws, digits (gen), ws, digits (num)
        var k = i - 1
        while (k >= 0 && isWsByte(bytes(k))) k -= 1
        val genEnd = k
        while (k >= 0 && bytes(k) >= '0' && bytes(k) <= '9') k -= 1
        val genStart = k + 1
        var numEnd = -1; var numStart = -1
        if (genEnd >= genStart) {
          while (k >= 0 && isWsByte(bytes(k))) k -= 1
          numEnd = k
          while (k >= 0 && bytes(k) >= '0' && bytes(k) <= '9') k -= 1
          numStart = k + 1
        }
        if (numEnd >= numStart && numStart >= 0 && (numStart == 0 || !isRegular(bytes(numStart - 1)))) {
          val num = new String(bytes, numStart, numEnd - numStart + 1, StandardCharsets.US_ASCII).toInt
          val (obj, resume) = frameBodyAt(bytes, num, i)
          if (out.contains(num)) dups += num
          out(num) = obj
          i = resume
        } else i += 1
      } else i += 1
    }
    (out.toMap, dups.toList)
  }

  private def isRegular(b: Byte): Boolean =
    !isWsByte(b) && b != '/' && b != '<' && b != '>' && b != '[' && b != ']' && b != '(' && b != ')' && b != '%'

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val m = needle.getBytes(StandardCharsets.US_ASCII)
    var i = math.max(from, 0)
    while (i + m.length <= hay.length) {
      var k = 0
      while (k < m.length && hay(i + k) == m(k)) k += 1
      if (k == m.length) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(hay: Array[Byte], needle: String): Int = {
    val m = needle.getBytes(StandardCharsets.US_ASCII)
    var i = hay.length - m.length
    while (i >= 0) {
      var k = 0
      while (k < m.length && hay(i + k) == m(k)) k += 1
      if (k == m.length) return i
      i -= 1
    }
    -1
  }

  // ------------------------------------------------------------ xref chain

  /** Latest-xref view of one object: its byte offset (type-1), membership in
    * an /ObjStm (type-2), or freed (deleted by a revision). */
  private sealed trait XEntry
  private case object XFree extends XEntry
  private final case class XOffset(off: Long) extends XEntry
  private final case class XInStream(stm: Int) extends XEntry

  /** num → entry from the newest xref chain: start at the LAST `startxref`,
    * walk /Prev newest-first; a num's first (newest) entry wins, so earlier
    * revisions never override. Handles classic tables (§7.5.4) and xref
    * streams (§7.5.8, W/Index fields, filters via the normal stream decode).
    * Hybrid-reference /XRefStm side-tables are not chased — every object a
    * hybrid file hides there is also found by the frame scan. Empty map when
    * no usable startxref (the scan fallback remains authoritative). */
  private def parseXrefChain(bytes: Array[Byte]): Map[Int, XEntry] = {
    val sx = lastIndexOf(bytes, "startxref")
    if (sx < 0) return Map.empty
    var i = sx + "startxref".length
    while (i < bytes.length && isWsByte(bytes(i))) i += 1
    var off = 0L
    val d0 = i
    while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9' && off < Int.MaxValue) {
      off = off * 10 + (bytes(i) - '0'); i += 1
    }
    if (i == d0) return Map.empty
    val out = mutable.Map.empty[Int, XEntry]
    val seen = mutable.Set.empty[Long] // cycle guard: a hostile /Prev loop must terminate
    var cur = off
    while (cur > 0 && cur < bytes.length && seen.add(cur))
      cur = parseXrefSection(bytes, cur.toInt, out)
    out.toMap
  }

  /** Parse one xref section at `at`, adding entries for nums not yet seen
    * (newest-first chain ⇒ first writer wins). Returns /Prev or -1. */
  private def parseXrefSection(bytes: Array[Byte], at: Int, out: mutable.Map[Int, XEntry]): Long = {
    val n = bytes.length
    var i = at
    while (i < n && isWsByte(bytes(i))) i += 1
    def readInt(): Long = {
      while (i < n && isWsByte(bytes(i))) i += 1
      var v = -1L
      while (i < n && bytes(i) >= '0' && bytes(i) <= '9' && v < Long.MaxValue / 16) {
        if (v < 0) v = 0
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    if (i + 4 <= n && bytes(i) == 'x' && bytes(i + 1) == 'r' && bytes(i + 2) == 'e' && bytes(i + 3) == 'f') {
      // classic table: subsections "start count" then count entries
      // "oooooooooo ggggg n|f" until the trailer keyword
      i += 4
      var continue = true
      while (continue) {
        while (i < n && isWsByte(bytes(i))) i += 1
        if (i >= n || !(bytes(i) >= '0' && bytes(i) <= '9')) continue = false
        else {
          val start = readInt()
          val count = readInt()
          if (start < 0 || count < 0 || count > (1 << 22)) return -1L
          var k = 0L
          while (k < count) {
            val f1 = readInt()
            readInt() // generation — revisions tracked per num, not per gen
            while (i < n && isWsByte(bytes(i))) i += 1
            val flag = if (i < n) bytes(i) else 'f'.toByte
            if (flag == 'n' || flag == 'f') i += 1
            val num = (start + k).toInt
            if (f1 >= 0 && num > 0 && !out.contains(num))
              out(num) = if (flag == 'n') XOffset(f1) else XFree
            k += 1
          }
        }
      }
      val tAt = indexOf(bytes, "trailer", i)
      if (tAt < 0) return -1L
      // trailer dicts are small; a bounded window avoids scanning megabytes
      val win = new String(bytes, tAt, math.min(4096, n - tAt), StandardCharsets.ISO_8859_1)
      dictInt(win, "/Prev").map(_.toLong).getOrElse(-1L)
    } else {
      // xref STREAM: a normal object frame whose decoded stream holds
      // fixed-width rows [type, field2, field3] per /W over /Index ranges
      frameAt(bytes, at) match {
        case Some(o) if o.streamOff >= 0 =>
          val dict = o.dictStr
          val data = streamBytes(o).getOrElse(return -1L)
          val w = dictIntArray(dict, "/W")
          if (w.length < 3) return -1L
          val (w1, w2, w3) = (w(0), w(1), w(2))
          val rowLen = w1 + w2 + w3
          if (w1 < 0 || w2 < 0 || w3 < 0 || rowLen <= 0 || rowLen > 32) return -1L
          val size = dictInt(dict, "/Size").getOrElse(0)
          val index = { val ix = dictIntArray(dict, "/Index"); if (ix.nonEmpty) ix else List(0, size) }
          var pos = 0
          def field(width: Int, default: Long): Long = {
            if (width == 0) return default
            var v = 0L
            var k = 0
            while (k < width) { v = (v << 8) | (data(pos + k) & 0xffL); k += 1 }
            pos += width
            v
          }
          index.grouped(2).foreach {
            case List(start, count) if start >= 0 && count >= 0 && count <= (1 << 22) =>
              var k = 0
              while (k < count && pos + rowLen <= data.length) {
                val t = field(w1, 1L) // absent type field defaults to 1 (§7.5.8.3)
                val a = field(w2, 0L)
                field(w3, 0L)
                val num = start + k
                if (num > 0 && !out.contains(num)) t match {
                  case 0L => out(num) = XFree
                  case 1L => out(num) = XOffset(a)
                  case 2L => if (a > 0 && a <= Int.MaxValue) out(num) = XInStream(a.toInt)
                  case _ => ()
                }
                k += 1
              }
            case _ => ()
          }
          dictInt(dict, "/Prev").map(_.toLong).getOrElse(-1L)
        case _ => -1L
      }
    }
  }

  /** Revision resolution for documents with duplicate object frames: the
    * newest xref chain designates the active frame per num — file order is
    * only a heuristic (right for append-only updates, wrong for rolled-back
    * or superseded objects). An XInStream/XFree verdict REMOVES the top-level
    * frame: the active version lives in an /ObjStm (expansion fills it) or
    * was deleted. No/corrupt xref keeps the scan's last-frame-wins fallback. */
  private def applyXrefPreference(bytes: Array[Byte], top: Map[Int, PdfObj],
                                  dups: List[Int]): Map[Int, PdfObj] = {
    val xref = try parseXrefChain(bytes) catch { case scala.util.control.NonFatal(_) => Map.empty[Int, XEntry] }
    if (xref.isEmpty) return top
    var out = top
    dups.distinct.foreach { num =>
      xref.get(num) match {
        case Some(XOffset(off)) =>
          frameAt(bytes, off).filter(_.num == num).foreach(o => out = out.updated(num, o))
        case Some(XInStream(_)) | Some(XFree) => out = out - num
        case None => ()
      }
    }
    out
  }

  /** Plain integer array value `[i1 i2 ...]` for a dict key (/W, /Index). */
  private def dictIntArray(body: String, key: String): List[Int] = {
    val at = body.indexOf(key)
    if (at < 0) return Nil
    val open = body.indexOf('[', at + key.length)
    if (open < 0) return Nil
    val region = bracketRegion(body, open)
    if (region == null) Nil
    else """-?\d+""".r.findAllIn(region).flatMap(s => s.toIntOption).toList
  }


  private val RefRx = """(\d+)\s+\d+\s+R""".r

  private def dictRef(body: String, key: String): Option[Int] = {
    val at = body.indexOf(key)
    if (at < 0) None
    else RefRx.findFirstMatchIn(body.substring(at + key.length)).map(_.group(1).toInt)
  }

  /** All references under a key whose value may be a single ref OR an array of
    * refs — the `/Contents [4 0 R 5 0 R]` shape (PDF 32000-1 §7.7.3.3: a page's
    * contents array denotes the CONCATENATION of the streams). Real generators
    * (TeX, Office print pipelines) split page content routinely; taking only
    * the first ref silently drops everything after stream one. */
  private def dictRefArray(body: String, key: String): List[Int] = {
    val at = body.indexOf(key)
    if (at < 0) return Nil
    val after = body.substring(at + key.length)
    val trimmed = after.dropWhile(_.isWhitespace)
    if (trimmed.startsWith("[")) {
      val close = trimmed.indexOf(']')
      if (close < 0) Nil
      else RefRx.findAllMatchIn(trimmed.substring(1, close)).map(_.group(1).toInt).toList
    } else RefRx.findFirstMatchIn(after).map(_.group(1).toInt).toList
  }

  private def dictInt(body: String, key: String): Option[Int] = {
    val at = body.indexOf(key)
    if (at < 0) None
    else """\d+""".r.findFirstIn(body.substring(at + key.length)).map(_.toInt)
  }

  private def kidsRefs(body: String): List[Int] = {
    val at = body.indexOf("/Kids")
    if (at < 0) Nil
    else {
      val open = body.indexOf('[', at)
      val close = if (open >= 0) body.indexOf(']', open) else -1
      if (open < 0 || close < 0) Nil
      else RefRx.findAllMatchIn(body.substring(open + 1, close)).map(_.group(1).toInt).toList
    }
  }

  /** Decode an object's stream payload (FlateDecode or raw) using the offsets
    * captured at scan time — no re-search, no stream-bytes-into-String copies. */
  private def streamBytes(o: PdfObj): Option[Array[Byte]] = {
    if (o.streamOff < 0) return None
    val dict = o.dictStr
    var start = o.streamOff
    if (start < o.body.length && o.body(start) == '\r') start += 1
    if (start < o.body.length && o.body(start) == '\n') start += 1
    val len = dictInt(dict, "/Length")
    val bodyEndAbs = o.bodyOff + o.bodyLen
    // declared /Length is trusted only when it stays strictly inside the
    // payload region (before the "endstream" keyword itself); a wrong /Length
    // must not feed keyword bytes to inflate/interpret
    val end = len match {
      case Some(l) if l >= 0 && start + l <= bodyEndAbs && (o.endStreamAt < 0 || start + l <= o.endStreamAt) =>
        start + l
      case _ => if (o.endStreamAt < 0) bodyEndAbs else o.endStreamAt
    }
    if (end <= start) return Some(Array.emptyByteArray)
    val raw = java.util.Arrays.copyOfRange(o.body, start, end)
    val filters = filterNames(dict)
    if (filters.isEmpty) Some(raw)
    else Some(applyPredictor(dict, filters.foldLeft(raw)((data, f) => applyFilter(f, data))))
  }

  /** /DecodeParms predictors over the post-filter bytes (§7.4.4.4): modern
    * generators PNG-predict ObjStm/xref Flate streams routinely. Predictor
    * ≥ 10 = PNG row filters (tag byte + row, same five filters as PngDecode);
    * 2 = TIFF horizontal differencing (8-bit components only); 1/absent =
    * passthrough. Malformed geometry degrades to the unpredicted bytes. */
  private[pdf] def applyPredictor(dict: String, data: Array[Byte]): Array[Byte] = {
    if (!dict.contains("/Predictor")) return data
    val pred = dictInt(dict, "/Predictor").getOrElse(1)
    if (pred < 2) return data
    val columns = dictInt(dict, "/Columns").getOrElse(1)
    val colors = dictInt(dict, "/Colors").getOrElse(1)
    val bpc = dictInt(dict, "/BitsPerComponent").getOrElse(8)
    val bpp = math.max(1, colors * bpc / 8)
    val rowBytes = (columns * colors * bpc + 7) / 8
    if (rowBytes <= 0 || rowBytes > (1 << 24)) return data
    if (pred == 2) {
      if (bpc != 8) return data
      val out = data.clone()
      var r = 0
      while ((r + 1) * rowBytes <= out.length) {
        val base = r * rowBytes
        var x = bpp
        while (x < rowBytes) {
          out(base + x) = (((out(base + x) & 0xff) + (out(base + x - bpp) & 0xff)) & 0xff).toByte
          x += 1
        }
        r += 1
      }
      out
    } else if (pred >= 10) { // 10..15 = PNG row predictors; 3..9 undefined → passthrough
      val nRows = data.length / (rowBytes + 1)
      if (nRows == 0) return data
      val out = new Array[Byte](nRows * rowBytes)
      def paethP(a: Int, b: Int, c: Int): Int = {
        val p = a + b - c
        val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
        if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
      }
      var y = 0
      while (y < nRows) {
        val tag = data(y * (rowBytes + 1)) & 0xff
        val rs = y * (rowBytes + 1) + 1
        val os = y * rowBytes
        var x = 0
        while (x < rowBytes) {
          val rv = data(rs + x) & 0xff
          val a = if (x >= bpp) out(os + x - bpp) & 0xff else 0
          val up = if (y > 0) out(os - rowBytes + x) & 0xff else 0
          val c = if (x >= bpp && y > 0) out(os - rowBytes + x - bpp) & 0xff else 0
          val v = tag match {
            case 0 => rv
            case 1 => rv + a
            case 2 => rv + up
            case 3 => rv + ((a + up) >> 1)
            case 4 => rv + paethP(a, up, c)
            case _ => return data // undefined tag: bytes were not PNG-predicted
          }
          out(os + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    } else data
  }

  /** Filter names under /Filter — a single name or an array (a filter CHAIN,
    * applied in order: `[/ASCII85Decode /FlateDecode]` un-85s then inflates).
    * Indirect /Filter refs (rare) parse as no filter → raw passthrough. */
  private def filterNames(dict: String): List[String] = {
    val at = dict.indexOf("/Filter")
    if (at < 0) return Nil
    val after = dict.substring(at + "/Filter".length)
    val trimmed = after.dropWhile(_.isWhitespace)
    if (trimmed.startsWith("[")) {
      val close = trimmed.indexOf(']')
      if (close < 0) Nil
      else """/(\w+)""".r.findAllMatchIn(trimmed.substring(1, close)).map(_.group(1)).toList
    } else """^/(\w+)""".r.findFirstMatchIn(trimmed).map(_.group(1)).toList
  }

  /** Thrown for a genuinely undecodable filter (DCT, JPX, CCITT, Crypt): the
    * row must carry a DISTINCT error class ("pdf_unsupported_filter"), not a
    * silent empty extraction. */
  final case class UnsupportedPdfFilter(name: String)
    extends RuntimeException(s"unsupported PDF stream filter /$name")

  /** The standard decode filters implementable on the bare JVM (PDF 32000-1
    * §7.4), including the short names PDF permits in inline-image contexts. */
  private def applyFilter(name: String, data: Array[Byte]): Array[Byte] = name match {
    case "FlateDecode" | "Fl" => inflate(data)
    case "ASCIIHexDecode" | "AHx" => asciiHexDecode(data)
    case "ASCII85Decode" | "A85" => ascii85Decode(data)
    case "RunLengthDecode" | "RL" => runLengthDecode(data)
    case "LZWDecode" | "LZW" => lzwDecode(data)
    case other => throw UnsupportedPdfFilter(other)
  }

  /** §7.4.2: hex pairs, whitespace ignored, '>' = EOD, odd final digit padded
    * with 0. Non-hex garbage bytes are skipped (degrade, don't throw). */
  private def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else if (c == '>') { done = true; -1 }
        else -1
      if (v >= 0) {
        if (hi < 0) hi = v
        else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd digit: low nibble zero
    out.toByteArray
  }

  /** §7.4.3: base-85 groups of 5 chars → 4 bytes; 'z' = four zero bytes
    * (only between groups); '~>' = EOD; a partial final group of n chars
    * yields n-1 bytes (pad with 'u', drop pad bytes). */
  private def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 4)
    val grp = new Array[Int](5)
    var k = 0
    var i = 0
    // skip the optional "<~" opener some producers emit
    if (data.length >= 2 && data(0) == '<' && data(1) == '~') i = 2
    var done = false
    def flush(nChars: Int): Unit = {
      var v = 0L
      var j = 0
      while (j < 5) { v = v * 85 + (if (j < nChars) grp(j) else 84); j += 1 }
      val nBytes = nChars - 1
      var b = 0
      while (b < nBytes) { out.write(((v >>> (24 - 8 * b)) & 0xff).toInt); b += 1 }
    }
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') done = true
      else if (c == 'z' && k == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        grp(k) = c - '!'
        k += 1
        if (k == 5) { flush(5); k = 0 }
      } // whitespace and garbage skipped
      i += 1
    }
    if (k >= 2) flush(k) // k == 1 is malformed (no bytes derivable) — dropped
    out.toByteArray
  }

  /** §7.4.5: length byte L ∈ [0,127] → copy next L+1 literally; L ∈ [129,255]
    * → repeat next byte 257-L times; 128 = EOD. Truncated input degrades to
    * what was decoded. */
  private def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2)
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val l = data(i) & 0xff
      if (l == 128) done = true
      else if (l < 128) {
        val n = math.min(l + 1, data.length - i - 1)
        out.write(data, i + 1, n)
        i += n
      } else if (i + 1 < data.length) {
        val b = data(i + 1)
        var r = 0
        while (r < 257 - l) { out.write(b); r += 1 }
        i += 1
      }
      i += 1
    }
    out.toByteArray
  }

  /** §7.4.4: PDF/TIFF LZW — 8-bit symbols, 256 = ClearTable, 257 = EOD, codes
    * widen at 511/1023/2047 entries ("early change" default 1, i.e. one code
    * early). Predictors are not applied here (content/ToUnicode/ObjStm streams
    * in the wild don't use them; TiffDecode applies its own predictor tag on
    * top of this shared core — TIFF 6.0 §13 specifies the identical variant,
    * which is why PDF names the filter after it).
    *
    * `maxOut` bounds the decoded size: LZW expands up to ~3,640× its input
    * (each post-reset code can emit a 4 KB dictionary entry), so a crafted
    * 1 MB stream could otherwise force a multi-GB allocation — an
    * OutOfMemoryError is a VirtualMachineError that NO NonFatal handler
    * catches, killing the executor task instead of degrading. Callers that
    * know the plaintext size (TIFF strips) pass it exactly; the PDF filter
    * path uses a generous fixed ceiling. */
  private[graft] def lzwDecode(data: Array[Byte], maxOut: Int = 1 << 28): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4, 1 << 20).max(64))
    val dict = new Array[Array[Byte]](4096)
    var dictSize = 258
    var codeBits = 9
    var prev: Array[Byte] = null
    var acc = 0L
    var nBits = 0
    var i = 0
    var done = false
    def reset(): Unit = { dictSize = 258; codeBits = 9; prev = null }
    while (i < data.length && !done) {
      acc = (acc << 8) | (data(i) & 0xff)
      nBits += 8
      while (nBits >= codeBits && !done) {
        val code = ((acc >>> (nBits - codeBits)) & ((1 << codeBits) - 1)).toInt
        nBits -= codeBits
        if (code == 256) reset()
        else if (code == 257) done = true
        else {
          val entry: Array[Byte] =
            if (code < 256) Array(code.toByte)
            else if (code < dictSize && dict(code) != null) dict(code)
            else if (prev != null) prev :+ prev(0) // KwKwK case
            else return out.toByteArray // corrupt: degrade
          out.write(entry, 0, entry.length)
          if (out.size >= maxOut) done = true // hostile expansion: stop here
          if (prev != null && dictSize < 4096) {
            dict(dictSize) = prev :+ entry(0)
            dictSize += 1
          }
          // early change: width grows one code before the table fills
          if (dictSize + 1 >= (1 << codeBits) && codeBits < 12) codeBits += 1
          prev = entry
        }
      }
      i += 1
    }
    out.toByteArray
  }

  // one Inflater per executor thread, reset per stream: constructing a fresh
  // Inflater is a JNI init costing tens of microseconds — real PDFs hold 1-6
  // Flate streams per document, and the init dominated small-stream inflation
  private val inflaterTL: ThreadLocal[Inflater] = new ThreadLocal[Inflater] {
    override def initialValue(): Inflater = new Inflater()
  }

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    try {
      val inf = inflaterTL.get()
      inf.reset()
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(raw.length * 4)
      val buf = new Array[Byte](8192)
      var guard = 0
      val maxIters = 1 << 16
      while (!inf.finished() && guard < maxIters) {
        val k = inf.inflate(buf)
        if (k == 0 && inf.needsInput()) guard = maxIters // truncated
        else out.write(buf, 0, k)
        guard += 1
      }
      out.toByteArray
    } catch { case _: Exception => Array.emptyByteArray }
  }

  // --------------------------------------------------- ToUnicode / CID text

  /** Code→text map from a font's /ToUnicode CMap (PDF 32000 §9.10.3).
    * Real-world PDFs show CID text as 2-byte codes meaningless without this —
    * the round-1 interpreter read such strings as latin-1 garbage. */
  private[pdf] final case class ToUni(twoByte: Boolean, map: Map[Int, String])

  private val HexTok = """<([0-9A-Fa-f]+)>""".r

  /** Parse bfchar/bfrange sections of a ToUnicode CMap stream. Total. */
  private[pdf] def parseToUnicode(bytes: Array[Byte]): Option[ToUni] = {
    try {
      val s = new String(bytes, StandardCharsets.ISO_8859_1)
      def hexInt(h: String): Int = java.lang.Integer.parseInt(h, 16)
      def utf16(h: String): String = {
        val sb = new java.lang.StringBuilder(h.length / 4)
        var i = 0
        while (i + 4 <= h.length) { sb.append(hexInt(h.substring(i, i + 4)).toChar); i += 4 }
        if (i < h.length) sb.append(hexInt(h.substring(i)).toChar) // short dst (rare)
        sb.toString
      }
      var twoByte = true
      val cs = s.indexOf("begincodespacerange")
      if (cs >= 0)
        HexTok.findFirstMatchIn(s.substring(cs, math.min(s.length, cs + 256)))
          .foreach(m => twoByte = m.group(1).length > 2)
      val out = mutable.Map.empty[Int, String]
      def sections(begin: String, end: String): Iterator[String] = {
        var from = 0
        Iterator.continually {
          val b = s.indexOf(begin, from)
          if (b < 0) null
          else {
            val e = s.indexOf(end, b)
            val sec = if (e < 0) s.substring(b) else s.substring(b + begin.length, e)
            from = if (e < 0) s.length else e + end.length
            sec
          }
        }.takeWhile(_ != null)
      }
      sections("beginbfchar", "endbfchar").foreach { sec =>
        val toks = HexTok.findAllMatchIn(sec).map(_.group(1)).toList
        toks.grouped(2).foreach {
          case List(src, dst) if out.size < (1 << 17) => out(hexInt(src)) = utf16(dst)
          case _ =>
        }
      }
      sections("beginbfrange", "endbfrange").foreach { sec =>
        // <lo> <hi> <dst>  |  <lo> <hi> [<d0> <d1> ...]
        var rest = sec
        val Range3 = """(?s)\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(<[0-9A-Fa-f]+>|\[[^\]]*\])(.*)""".r
        var continue = true
        while (continue) rest match {
          case Range3(lo0, hi0, dst, tail) =>
            val lo = hexInt(lo0); val hi = hexInt(hi0)
            if (hi >= lo && hi - lo < (1 << 16) && out.size < (1 << 17)) {
              if (dst.startsWith("[")) {
                val ds = HexTok.findAllMatchIn(dst).map(m => utf16(m.group(1))).toIndexedSeq
                var c = lo
                while (c <= hi && (c - lo) < ds.length) { out(c) = ds(c - lo); c += 1 }
              } else {
                val base = utf16(dst.substring(1, dst.length - 1))
                var c = lo
                while (c <= hi) {
                  // per spec: increment the LAST UTF-16 unit by the offset
                  if (base.nonEmpty) {
                    val arr = base.toCharArray
                    arr(arr.length - 1) = (arr(arr.length - 1) + (c - lo)).toChar
                    out(c) = new String(arr)
                  }
                  c += 1
                }
              }
            }
            rest = tail
          case _ => continue = false
        }
      }
      if (out.isEmpty) None else Some(ToUni(twoByte, out.toMap))
    } catch { case _: Exception => None }
  }

  /** Per-font info resolved from the page's /Resources /Font dict:
    * optional ToUnicode CMap (CID text), optional simple-font /Widths metrics
    * (FirstChar-based, 1/1000 text-space units), and optional /Encoding
    * /Differences byte→string remaps (AGL glyph names). Any may be null — the
    * interpreter falls back to identity decoding / the 0.5em width model.
    * Decode priority per code: ToUnicode (authoritative) → Differences →
    * identity. */
  private[pdf] final case class FontInfo(toUni: ToUni, widths: Array[Float], firstChar: Int,
                                         diffs: Array[String] = null,
                                         cidWidths: Map[Int, Float] = null,
                                         cidDefault: Float = 1000f,
                                         type3NoUni: Boolean = false)

  /** Adobe Glyph List subset covering the names real generators emit in
    * /Differences (letters, digits, ASCII punctuation, common Latin-1
    * accents, f-ligatures, typographic quotes/dashes) plus the uniXXXX /
    * uXXXXXX conventions. Unknown names decode as U+FFFD — a visible signal,
    * never latin-1 garbage. */
  private[pdf] val glyphNames: Map[String, String] = {
    val m = mutable.Map.empty[String, String]
    ('A' to 'Z').foreach(c => m(c.toString) = c.toString)
    ('a' to 'z').foreach(c => m(c.toString) = c.toString)
    Seq("zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine")
      .zipWithIndex.foreach { case (n, i) => m(n) = i.toString }
    Seq("space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
      "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
      "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
      "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
      "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
      "braceright" -> "}", "asciitilde" -> "~", "quoteleft" -> "‘",
      "quoteright" -> "’", "quotedblleft" -> "“", "quotedblright" -> "”",
      "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
      "fi" -> "ﬁ", "fl" -> "ﬂ", "germandbls" -> "ß",
      "adieresis" -> "ä", "odieresis" -> "ö", "udieresis" -> "ü",
      "Adieresis" -> "Ä", "Odieresis" -> "Ö", "Udieresis" -> "Ü",
      "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
      "ccedilla" -> "ç", "ntilde" -> "ñ", "degree" -> "°",
      "copyright" -> "©", "registered" -> "®", "trademark" -> "™",
      "Euro" -> "€", "sterling" -> "£", "yen" -> "¥",
      "cent" -> "¢", "section" -> "§", "paragraph" -> "¶")
      .foreach { case (k, v) => m(k) = v }
    m.toMap
  }

  private[pdf] def glyphToString(name: String): String =
    glyphNames.getOrElse(name, {
      def hexChar(hex: String): String =
        try {
          val cp = Integer.parseInt(hex, 16)
          if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp)) else "�"
        } catch { case _: Exception => "�" }
      if (name.startsWith("uni") && name.length >= 7) hexChar(name.substring(3, 7))
      else if (name.startsWith("u") && name.length >= 5 && name.length <= 7) hexChar(name.substring(1))
      else "�"
    })

  /** Substring of `s` inside the bracket pair opening at `open` (nesting-aware
    * — /W arrays nest: `[ c [w1 w2] ... ]`). Null when unbalanced. */
  private def bracketRegion(s: String, open: Int): String = {
    var depth = 0
    var i = open
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '[') depth += 1
      else if (ch == ']') { depth -= 1; if (depth == 0) return s.substring(open + 1, i) }
      i += 1
    }
    null
  }

  /** CID per-code widths from the Type0 font's descendant CIDFont: /DW default
    * (spec default 1000) and the /W array's two clause forms — `c [w1 w2 ...]`
    * (consecutive codes from c) and `cFirst cLast w` (a range at one width).
    * Codes are CIDs; with the Identity-H layout (the common crawl-PDF case,
    * and the same assumption the ToUnicode decode makes) code == CID.
    * (null, 1000) when absent. Entry count capped (a hostile /W must not
    * allocate unboundedly). */
  private def parseCidWidths(fontBody: String, bodies: Map[Int, String]): (Map[Int, Float], Float) = {
    val none = (null: Map[Int, Float], 1000f)
    val dfAt = fontBody.indexOf("/DescendantFonts")
    if (dfAt < 0) return none
    val after = fontBody.substring(dfAt + "/DescendantFonts".length)
    val trimmed = after.dropWhile(_.isWhitespace)
    val arrTxt =
      if (trimmed.startsWith("[")) trimmed.take(256)
      else RefRx.findFirstMatchIn(trimmed.take(64)).map(_.group(1).toInt).flatMap(bodies.get)
        .getOrElse(return none)
    val descBody = RefRx.findFirstMatchIn(arrTxt).map(_.group(1).toInt).flatMap(bodies.get)
      .getOrElse(return none)
    val dw = dictInt(descBody, "/DW").getOrElse(1000).toFloat
    val wAt = """/W(?![A-Za-z])""".r.findFirstMatchIn(descBody).map(_.start).getOrElse(return (null, dw))
    val wVal = descBody.substring(wAt + 2).dropWhile(_.isWhitespace)
    val region =
      if (wVal.startsWith("[")) bracketRegion(wVal, 0)
      else { // indirect /W N 0 R
        val b = RefRx.findFirstMatchIn(wVal.take(64)).map(_.group(1).toInt).flatMap(bodies.get)
          .getOrElse(return (null, dw))
        val open = b.indexOf('[')
        if (open < 0) return (null, dw) else bracketRegion(b, open)
      }
    if (region == null) return (null, dw)
    val toks = """\[|\]|-?\d+(?:\.\d+)?""".r.findAllIn(region).toArray
    val out = mutable.Map.empty[Int, Float]
    val cap = 1 << 16
    var i = 0
    while (i < toks.length && out.size < cap) {
      // clause start: a code number
      if (toks(i) == "[" || toks(i) == "]") i += 1
      else {
        val c = toks(i).toFloat.toInt
        if (i + 1 < toks.length && toks(i + 1) == "[") {
          var j = i + 2
          var cid = c
          while (j < toks.length && toks(j) != "]" && out.size < cap) {
            out(cid) = toks(j).toFloat; cid += 1; j += 1
          }
          i = j + 1
        } else if (i + 2 < toks.length && toks(i + 1) != "[" && toks(i + 2) != "[") {
          val cLast = toks(i + 1).toFloat.toInt
          val w = toks(i + 2).toFloat
          var cid = c
          while (cid <= cLast && out.size < cap) { out(cid) = w; cid += 1 }
          i += 3
        } else i += 1
      }
    }
    (if (out.isEmpty) null else out.toMap, dw)
  }

  /** /Encoding /Differences array: `[ code /name /name code /name ... ]` —
    * each number resets the code counter, each name assigns code++ (PDF
    * 32000-1 §9.6.6.1). The base-encoding name (/WinAnsiEncoding etc.) is
    * ignored: unmapped codes keep identity decode. Null when absent. */
  private def parseDifferences(fontBody: String, bodies: Map[Int, String]): Array[String] = {
    val at = fontBody.indexOf("/Encoding")
    if (at < 0) return null
    val after = fontBody.substring(at + "/Encoding".length)
    val trimmed = after.dropWhile(_.isWhitespace)
    val encBody: String =
      if (trimmed.startsWith("<<")) trimmed
      else if (trimmed.startsWith("/")) return null // named base encoding only
      else RefRx.findFirstMatchIn(trimmed).map(_.group(1).toInt).flatMap(bodies.get)
        .getOrElse(return null)
    val dAt = encBody.indexOf("/Differences")
    if (dAt < 0) return null
    val open = encBody.indexOf('[', dAt)
    val close = if (open >= 0) encBody.indexOf(']', open) else -1
    if (open < 0 || close < 0) return null
    val out = new Array[String](256)
    var code = -1
    """(\d+)|/([A-Za-z0-9.]+)""".r.findAllMatchIn(encBody.substring(open + 1, close)).foreach { m =>
      if (m.group(1) != null) code = m.group(1).toInt
      else if (code >= 0 && code < 256) { out(code) = glyphToString(m.group(2)); code += 1 }
    }
    if (out.forall(_ == null)) null else out
  }

  private def parseWidths(fontBody: String, bodies: Map[Int, String]): (Array[Float], Int) = {
    val wAt = fontBody.indexOf("/Widths")
    if (wAt < 0) return (null, 0)
    val after = fontBody.substring(wAt + "/Widths".length)
    val trimmed = after.dropWhile(_.isWhitespace)
    val arrText: String =
      if (trimmed.startsWith("[")) {
        val close = trimmed.indexOf(']')
        if (close < 0) return (null, 0) else trimmed.substring(1, close)
      } else {
        val body = RefRx.findFirstMatchIn(trimmed).map(_.group(1).toInt).flatMap(bodies.get)
          .getOrElse(return (null, 0))
        val open = body.indexOf('[')
        val close = if (open >= 0) body.indexOf(']', open) else -1
        if (open < 0 || close < 0) return (null, 0) else body.substring(open + 1, close)
      }
    val nums = """-?\d+(?:\.\d+)?""".r.findAllIn(arrText).map(_.toFloat).toArray
    if (nums.isEmpty || nums.length > (1 << 16)) return (null, 0)
    val firstChar = dictInt(fontBody, "/FirstChar").getOrElse(0)
    (nums, firstChar)
  }

  /** Font-resource-name → FontInfo for a page (via /Resources /Font). `chain`
    * is the page dict followed by its /Pages ancestors; the first dict that
    * DECLARES /Resources supplies them (inheritable attribute, §7.7.3.4). */
  private def fontMapOf(objs: Map[Int, PdfObj], bodies: Map[Int, String],
                        chain: List[String]): Map[String, FontInfo] = {
    try {
      val pageBody = chain.find(_.contains("/Resources")).getOrElse(return Map.empty)
      val at = pageBody.indexOf("/Resources")
      if (at < 0) return Map.empty
      val after = pageBody.substring(at + "/Resources".length)
      val trimmed = after.dropWhile(c => c == ' ' || c == '\n' || c == '\r' || c == '\t')
      val res: String =
        if (trimmed.startsWith("<<")) trimmed
        else RefRx.findFirstMatchIn(trimmed).map(_.group(1).toInt).flatMap(bodies.get).getOrElse(return Map.empty)
      val fa = res.indexOf("/Font")
      if (fa < 0) return Map.empty
      val sub = res.substring(fa)
      val open = sub.indexOf("<<")
      val close = if (open >= 0) sub.indexOf(">>", open) else -1
      val region = if (open >= 0 && close > open) sub.substring(open, close) else sub.take(512)
      val FontPair = """/(\w+)\s+(\d+)\s+\d+\s+R""".r
      FontPair.findAllMatchIn(region).flatMap { m =>
        bodies.get(m.group(2).toInt).flatMap { fb =>
          val tu = (for {
            tuRef <- dictRef(fb, "/ToUnicode")
            obj <- objs.get(tuRef)
            sb <- streamBytes(obj)
            parsed <- parseToUnicode(sb)
          } yield parsed).orNull
          val (widths, firstChar) = parseWidths(fb, bodies)
          val diffs = parseDifferences(fb, bodies)
          val (cidW, cidDw) = parseCidWidths(fb, bodies)
          // Type3 glyphs are arbitrary content-stream procedures (§9.6.5):
          // without /ToUnicode (or usable /Differences) their codes have NO
          // text meaning — decoding them as latin-1 yields silent garbage, so
          // the font is flagged and shown text under it is suppressed +
          // surfaced as a distinct error class instead
          val t3 = fb.contains("/Type3") && tu == null && diffs == null
          if (tu == null && widths == null && diffs == null && cidW == null && !t3) None
          else Some(m.group(1) -> FontInfo(tu, widths, firstChar, diffs, cidW, cidDw, t3))
        }
      }.toMap
    } catch { case _: Exception => Map.empty }
  }

  /** Page content streams in document page order (catalog → pages → kids). */
  private def pageStreams(bytes: Array[Byte]): List[(Array[Byte], Map[String, FontInfo])] =
    pageStreamsOf(scanObjects(bytes))

  private def pageStreamsOf(objs: Map[Int, PdfObj]): List[(Array[Byte], Map[String, FontInfo])] = {
    if (objs.isEmpty) return Nil
    val bodies = objs.map { case (k, v) => k -> v.dictStr }
    val pageOrder: List[Int] = {
      val catalog = bodies.collectFirst { case (k, b) if b.contains("/Type") && b.contains("/Catalog") => k }
      val viaKids = for {
        c <- catalog
        pagesRef <- dictRef(bodies(c), "/Pages")
        pagesBody <- bodies.get(pagesRef)
      } yield {
        // one level of kids is enough for our corpus; nested Pages nodes flatten
        def expand(ref: Int, depth: Int): List[Int] =
          bodies.get(ref) match {
            case Some(b) if b.contains("/Type") && b.contains("/Pages") && depth < 8 =>
              kidsRefs(b).flatMap(expand(_, depth + 1))
            case Some(b) if b.contains("/Type") && b.contains("/Page") => List(ref)
            case _ => Nil
          }
        expand(pagesRef, 0)
      }
      viaKids.filter(_.nonEmpty).getOrElse {
        bodies.collect { case (k, b) if b.contains("/Type") && b.contains("/Page") && !b.contains("/Pages") => k }
          .toList.sorted
      }
    }
    pageOrder.flatMap { p =>
      // /Contents may be one ref or an array of refs; the array denotes the
      // concatenation of the decoded streams (one logical stream — the spec
      // guarantees stream divisions fall between lexical tokens, so a
      // newline separator preserves tokenization)
      val parts = dictRefArray(bodies(p), "/Contents")
        .flatMap(r => objs.get(r).flatMap(streamBytes))
      if (parts.isEmpty) None
      else {
        val sb = parts match {
          case single :: Nil => single
          case many =>
            val out = new java.io.ByteArrayOutputStream(many.map(_.length + 1).sum)
            many.foreach { s => out.write(s, 0, s.length); out.write('\n') }
            out.toByteArray
        }
        Some((sb, fontMapOf(objs, bodies, resourceChain(bodies, p))))
      }
    }
  }

  /** Dict bodies to search for /Resources: the page first, then its /Parent
    * chain (PDF 32000-1 §7.7.3.4 — /Resources and /MediaBox are inheritable
    * page attributes; TeX/Office generators routinely declare fonts on the
    * /Pages node). First body CONTAINING /Resources wins — inheritance is
    * whole-value replacement, never a merge. Cycle-guarded. */
  private def resourceChain(bodies: Map[Int, String], pageRef: Int): List[String] = {
    val chain = mutable.ListBuffer(bodies(pageRef))
    val seen = mutable.Set(pageRef)
    var cur = pageRef
    var depth = 0
    while (depth < 8) {
      dictRef(bodies(cur), "/Parent").filter(p => bodies.contains(p) && !seen(p)) match {
        case Some(p) => chain += bodies(p); seen += p; cur = p; depth += 1
        case None => depth = 8
      }
    }
    chain.toList
  }

  // ------------------------------------------------------- content interpreter

  private final case class Name(s: String)

  /** Tokenize + interpret one content stream into positioned runs for `page`.
    * `fonts` maps font resource names (Tf operand) to ToUnicode CMaps; shown
    * strings under a mapped font decode through it (CID/2-byte text). */
  private def interpret(content: Array[Byte], page: Int, out: mutable.ArrayBuffer[Run],
                        fonts: Map[String, FontInfo] = Map.empty): Boolean = {
    val n = content.length
    var i = 0
    val operands = mutable.ArrayBuffer.empty[Any] // Float | String | List[Any] | Name
    var fontSize = 12f
    var curFont: FontInfo = null
    var leading = 0f
    var lineX = 0f; var lineY = 0f
    var curX = 0f; var curY = 0f
    var sawType3 = false // text shown under an unmappable Type3 font (suppressed, flagged)

    def decodeShown(raw: String): String = {
      if (curFont == null || (curFont.toUni == null && curFont.diffs == null)) return raw
      val tu = curFont.toUni
      val sb = new java.lang.StringBuilder(raw.length)
      if (tu != null && tu.twoByte) {
        var k = 0
        while (k + 1 < raw.length) {
          val code = ((raw.charAt(k) & 0xff) << 8) | (raw.charAt(k + 1) & 0xff)
          sb.append(tu.map.getOrElse(code, "\uFFFD"))
          k += 2
        }
        if ((raw.length & 1) == 1) sb.append('\uFFFD') // odd trailing byte
      } else {
        // simple font: ToUnicode (authoritative) \u2192 /Differences \u2192 identity
        var k = 0
        while (k < raw.length) {
          val c = raw.charAt(k)
          val code = c & 0xff
          val viaTu = if (tu != null) tu.map.get(code) else None
          sb.append(viaTu.getOrElse {
            val d = if (curFont.diffs != null) curFont.diffs(code) else null
            if (d != null) d else String.valueOf(c)
          })
          k += 1
        }
      }
      sb.toString
    }

    /** Advance width for the shown codes: /Widths metrics when the simple
      * font declares them (1/1000 text-space units per code), else the 0.5em
      * average model over the decoded text. */
    def advanceOf(raw: String, decoded: String): Float = {
      // 2-byte CID fonts meter widths per CODE via the descendant CIDFont's
      // /W map (+ /DW default), never per byte via /Widths (double-counting)
      if (curFont != null && curFont.toUni != null && curFont.toUni.twoByte) {
        if (curFont.cidWidths == null) return 0.5f * fontSize * decoded.length
        var sum = 0f
        var k = 0
        while (k + 1 < raw.length) {
          val code = ((raw.charAt(k) & 0xff) << 8) | (raw.charAt(k + 1) & 0xff)
          sum += curFont.cidWidths.getOrElse(code, curFont.cidDefault) / 1000f * fontSize
          k += 2
        }
        return sum
      }
      if (curFont == null || curFont.widths == null)
        return 0.5f * fontSize * decoded.length
      val ws = curFont.widths
      var sum = 0f
      var k = 0
      while (k < raw.length) {
        val idx = (raw.charAt(k) & 0xff) - curFont.firstChar
        sum += (if (idx >= 0 && idx < ws.length) ws(idx) else 500f) / 1000f * fontSize
        k += 1
      }
      sum
    }

    /** Show a raw string operand: decode (CID/ToUnicode) and advance by the
      * font's /Widths metrics when declared, else the 0.5em model. */
    def show(raw: String): Unit = {
      // unmappable Type3 text: the codes index glyph PROCEDURES, not
      // characters — emitting them would be silent garbage. Advance the pen
      // (layout stays sane for any mappable runs around it) but emit nothing
      // and flag the page, so the caller can classify pdf_type3_font.
      if (curFont != null && curFont.type3NoUni) {
        if (raw.nonEmpty) sawType3 = true
        curX += advanceOf(raw, raw)
        return
      }
      val decoded = decodeShown(raw)
      if (decoded.nonEmpty) {
        out += Run(page, curX, curY, fontSize, decoded)
        curX += advanceOf(raw, decoded)
      }
    }
    def num(a: Any): Float = a match {
      case f: Float => f
      case _ => 0f
    }
    def popN(k: Int): IndexedSeq[Float] = {
      val vals = operands.takeRight(k).map(num).toIndexedSeq
      operands.remove(math.max(0, operands.length - k), math.min(k, operands.length))
      if (vals.length == k) vals else IndexedSeq.fill(k)(0f)
    }

    def parseString(): String = {
      // at '(' — returns decoded text, advances i past ')'
      var depth = 1
      i += 1
      val sb = new java.lang.StringBuilder(32)
      while (i < n && depth > 0) {
        val b = content(i)
        if (b == '\\' && i + 1 < n) {
          val e = content(i + 1)
          e match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0; i += 1
              while (k < 3 && i < n && content(i) >= '0' && content(i) <= '7') { v = v * 8 + (content(i) - '0'); i += 1; k += 1 }
              sb.append((v & 0xff).toChar)
            case _ => i += 2 // line continuation or unknown escape: drop
          }
        } else if (b == '(') { depth += 1; sb.append('('); i += 1 }
        else if (b == ')') { depth -= 1; if (depth > 0) sb.append(')'); i += 1 }
        else { sb.append((b & 0xff).toChar); i += 1 }
      }
      sb.toString
    }

    def parseHexString(): String = {
      // at '<' (not '<<') — bytes from hex pairs, latin-1 view
      i += 1
      val sb = new java.lang.StringBuilder(16)
      var hi = -1
      while (i < n && content(i) != '>') {
        val c = content(i).toChar
        val d = Character.digit(c, 16)
        if (d >= 0) { if (hi < 0) hi = d else { sb.append(((hi << 4) | d).toChar); hi = -1 } }
        i += 1
      }
      if (hi >= 0) sb.append((hi << 4).toChar)
      if (i < n) i += 1
      sb.toString
    }

    def applyOp(op: String): Unit = op match {
      case "Tf" =>
        fontSize = num(operands.lastOption.getOrElse(0f))
        // the font operand is the name before the size: /F1 12 Tf
        curFont = (if (operands.length >= 2) operands(operands.length - 2) else null) match {
          case Name(nm) => fonts.getOrElse(nm, null)
          case _ => curFont
        }
        operands.clear()
      case "TL" => leading = popN(1)(0); operands.clear()
      case "Td" =>
        val v = popN(2); lineX += v(0); lineY += v(1); curX = lineX; curY = lineY; operands.clear()
      case "TD" =>
        val v = popN(2); leading = -v(1); lineX += v(0); lineY += v(1); curX = lineX; curY = lineY; operands.clear()
      case "Tm" =>
        val v = popN(6); lineX = v(4); lineY = v(5); curX = lineX; curY = lineY; operands.clear()
      case "T*" =>
        lineY -= leading; curX = lineX; curY = lineY; operands.clear()
      case "BT" =>
        lineX = 0f; lineY = 0f; curX = 0f; curY = 0f; operands.clear()
      case "ET" => operands.clear()
      case "Tj" =>
        operands.lastOption match { case Some(s: String) => show(s); case _ => }
        operands.clear()
      case "'" =>
        lineY -= leading; curX = lineX; curY = lineY
        operands.lastOption match { case Some(s: String) => show(s); case _ => }
        operands.clear()
      case "\"" =>
        // aw ac string ": set word/char spacing (ignored by the 0.5em width
        // model), then next-line-show like ' — the string must not be dropped
        lineY -= leading; curX = lineX; curY = lineY
        operands.lastOption match { case Some(s: String) => show(s); case _ => }
        operands.clear()
      case "TJ" =>
        operands.lastOption match {
          case Some(arr: List[_]) =>
            arr.foreach {
              case s: String => show(s)
              case f: Float => curX -= f / 1000f * fontSize
              case _ =>
            }
          case _ =>
        }
        operands.clear()
      case "ID" =>
        // inline image (`BI <dict> ID <binary samples> EI`, §8.9.7): the
        // samples follow one whitespace byte after ID and would otherwise
        // tokenize as garbage strings/operators, corrupting the text state.
        // Skip to a whitespace-delimited EI (the standard heuristic — a
        // spurious " EI " inside samples truncates the image, not the text).
        if (i < n && isWsByte(content(i))) i += 1
        var found = false
        while (!found && i + 1 < n) {
          if (content(i) == 'E' && content(i + 1) == 'I' &&
              (i == 0 || isWsByte(content(i - 1))) &&
              (i + 2 >= n || isWsByte(content(i + 2))))
            { found = true; i += 2 }
          else i += 1
        }
        if (!found) i = n
        operands.clear()
      case _ => operands.clear() // any other operator: consume operands
    }

    var arrayAcc: mutable.ArrayBuffer[Any] = null
    while (i < n) {
      val b = content(i)
      if (isWsByte(b)) i += 1
      else if (b == '%') { while (i < n && content(i) != '\n') i += 1 }
      else if (b == '(') {
        val s = parseString()
        if (arrayAcc != null) arrayAcc += s else operands += s
      } else if (b == '<' && i + 1 < n && content(i + 1) == '<') {
        // inline dict: skip to >>
        var depth = 0
        while (i + 1 < n && !(depth == 1 && content(i) == '>' && content(i + 1) == '>')) {
          if (content(i) == '<' && content(i + 1) == '<') { depth += 1; i += 2 }
          else if (content(i) == '>' && content(i + 1) == '>') { depth -= 1; i += 2 }
          else i += 1
        }
        i = math.min(n, i + 2)
      } else if (b == '<') {
        val s = parseHexString()
        if (arrayAcc != null) arrayAcc += s else operands += s
      } else if (b == '[') { arrayAcc = mutable.ArrayBuffer.empty[Any]; i += 1 }
      else if (b == ']') {
        if (arrayAcc != null) { operands += arrayAcc.toList; arrayAcc = null }
        i += 1
      } else if (b == '/') {
        i += 1
        val nameStart = i
        while (i < n && isRegular(content(i))) i += 1
        // names ride as operands so Tf can resolve the font resource
        if (arrayAcc == null)
          operands += Name(new String(content, nameStart, i - nameStart, StandardCharsets.US_ASCII))
      } else if ((b >= '0' && b <= '9') || b == '-' || b == '+' || b == '.') {
        val start = i
        i += 1
        while (i < n && ((content(i) >= '0' && content(i) <= '9') || content(i) == '.' || content(i) == '-' || content(i) == '+')) i += 1
        val f = try new String(content, start, i - start, StandardCharsets.US_ASCII).toFloat catch { case _: Exception => 0f }
        if (arrayAcc != null) arrayAcc += f else operands += f
      } else {
        val start = i
        while (i < n && isRegular(content(i))) i += 1
        if (i == start) i += 1
        else {
          val op = new String(content, start, i - start, StandardCharsets.US_ASCII)
          applyOp(op)
        }
      }
    }
    sawType3
  }

  // --------------------------------------------------------------- assembly

  def runs(bytes: Array[Byte]): IndexedSeq[Run] = {
    try {
      val out = mutable.ArrayBuffer.empty[Run]
      pageStreams(bytes).zipWithIndex.foreach { case ((cs, fonts), p) => interpret(cs, p, out, fonts) }
      out.toIndexedSeq
    } catch { case _: Exception => IndexedSeq.empty }
  }

  /** Minimum x-gap (text-space units) between disjoint x-coverage clusters for
    * a page to be treated as multi-column. */
  val MinColGap = 24f

  /** Column detection: 1D connected components of the page's x-coverage
    * (run intervals merged while gaps < MinColGap). A split is accepted only if
    * there are ≥2 clusters and every cluster spans ≥2 distinct text lines —
    * a lone wide gap on a single line (table cell, kerning jump) is NOT a column. */
  private def columnsOf(prs: IndexedSeq[Run]): List[IndexedSeq[Run]] = {
    if (prs.isEmpty) return Nil
    val intervals = prs.map(r => (r.x, r.x + 0.5f * r.size * r.text.length)).sortBy(_._1)
    val bounds = mutable.ListBuffer.empty[(Float, Float)]
    var cs = intervals.head._1
    var ce = intervals.head._2
    intervals.tail.foreach { case (s, e) =>
      if (s - ce >= MinColGap) { bounds += ((cs, ce)); cs = s; ce = e }
      else ce = math.max(ce, e)
    }
    bounds += ((cs, ce))
    if (bounds.size <= 1) return List(prs)
    val clusters = bounds.toList.map { case (s, e) =>
      prs.filter(r => r.x >= s - 0.01f && r.x <= e + 0.01f)
    }.filter(_.nonEmpty)
    val allMultiLine = clusters.forall(_.map(r => math.round(r.y / YTol)).distinct.size >= 2)
    if (clusters.size >= 2 && allMultiLine) clusters else List(prs)
  }

  /** Lines in reading order: page → column (left-to-right) → line (y desc) →
    * run (x asc). Single-column pages skip the column stage. */
  private def lines(rs: IndexedSeq[Run]): List[(Int, List[List[Run]])] = {
    rs.groupBy(_.page).toList.sortBy(_._1).map { case (p, prs) =>
      val cols = columnsOf(prs)
      val colLines = cols.flatMap { colRuns =>
        val sorted = colRuns.sortBy(r => (-r.y, r.x))
        val ls = mutable.ListBuffer.empty[mutable.ListBuffer[Run]]
        var lastY = Float.NaN
        sorted.foreach { r =>
          if (ls.isEmpty || math.abs(r.y - lastY) > YTol) {
            ls += mutable.ListBuffer(r)
            lastY = r.y
          } else ls.last += r
        }
        ls.map(_.sortBy(_.x).toList).toList
      }
      p -> colLines
    }
  }

  /** Extracted text: run texts joined by ' ' within a line, lines by '\n', pages by '\f'. */
  def text(bytes: Array[Byte]): String = {
    val ls = lines(runs(bytes))
    ls.map { case (_, pageLines) =>
      pageLines.map(_.map(_.text.trim).filter(_.nonEmpty).mkString(" "))
        .filter(_.nonEmpty).mkString("\n")
    }.mkString("\f")
  }

  /** Word spans (hOCR analog, ocr_combined.py:73-82): one span per word. */
  def spans(bytes: Array[Byte]): IndexedSeq[Span] = spansFromRuns(runs(bytes))

  private def spansFromRuns(rs: IndexedSeq[Run]): IndexedSeq[Span] = {
    val out = mutable.ArrayBuffer.empty[Span]
    lines(rs).foreach { case (p, pageLines) =>
      pageLines.foreach { line =>
        line.foreach { r =>
          var x = r.x
          r.text.split(' ').filter(_.nonEmpty).foreach { w =>
            val wWidth = 0.5f * r.size * w.length
            out += Span(p, math.round(x), math.round(r.y),
              math.round(x + wWidth), math.round(r.y + r.size), w)
            x += wWidth + 0.5f * r.size // advance past word + one space
          }
        }
      }
    }
    out.toIndexedSeq
  }

  /** Fused text + spans from a single parse (the pipeline's visual/force path —
    * avoids interpreting every content stream twice). */
  def textAndSpans(bytes: Array[Byte]): (String, IndexedSeq[Span]) = {
    val o = outcome(bytes)
    (o.text, o.spans)
  }

  /** Single-parse extraction with a per-row failure signal. `error` is null on
    * success; otherwise a stable category ("pdf_no_objects",
    * "pdf_no_content_stream", "pdf_type3_font", or "pdf_" + ErrorClass
    * keyword category). The
    * reference swallows per-file failures into its error handler
    * (ocr_combined.py:219-230, error_handler.py:305-325); at 10^12 docs a
    * silent empty string is indistinguishable from a genuinely empty doc, so
    * the reason must ride on the row. */
  final case class Outcome(text: String, spans: IndexedSeq[Span], error: String)

  def outcome(bytes: Array[Byte]): Outcome = {
    try {
      val objs = scanObjects(bytes)
      if (objs.isEmpty) return Outcome("", IndexedSeq.empty, "pdf_no_objects")
      val streams = pageStreamsOf(objs)
      if (streams.isEmpty) return Outcome("", IndexedSeq.empty, "pdf_no_content_stream")
      val out = mutable.ArrayBuffer.empty[Run]
      var sawType3 = false
      streams.zipWithIndex.foreach { case ((cs, fonts), p) =>
        if (interpret(cs, p, out, fonts)) sawType3 = true
      }
      val rs = out.toIndexedSeq
      // only the Type3 glyph procedures carried the document's text: nothing
      // extractable remains, and that deserves a DISTINCT class — an empty
      // string with error=null is indistinguishable from a blank document
      if (sawType3 && rs.isEmpty)
        return Outcome("", IndexedSeq.empty, "pdf_type3_font")
      val text = lines(rs).map { case (_, pageLines) =>
        pageLines.map(_.map(_.text.trim).filter(_.nonEmpty).mkString(" "))
          .filter(_.nonEmpty).mkString("\n")
      }.mkString("\f")
      Outcome(text, spansFromRuns(rs), null)
    } catch {
      // NonFatal only: an OutOfMemoryError/StackOverflowError leaves the
      // executor in an undefined state — let it propagate and kill the task
      // (Spark retries it) rather than recording a per-row "resource" error
      // and continuing to produce rows from a broken JVM
      case scala.util.control.NonFatal(e) =>
        Outcome("", IndexedSeq.empty, "pdf_" + graft.ErrorClass.classify(e))
    }
  }
}
