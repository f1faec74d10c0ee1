package graft.fixtures

import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.util.zip.Deflater

/**
 * Deterministic fixture corpus (FIXTURES.md §1-3): Common-Crawl-style pages with
 * the exact input shape (url, warc_ts, html:binary, text, lang). Everything is a
 * pure function of (masterSeed, rowIndex) via splitmix64 — bit-for-bit reproducible,
 * no RNG state, safe to generate inside executors with mapPartitions/range.
 *
 * Payload mix: ~64% HTML, ~20% PDF, ~8% pre-extracted (text already set — the
 * "skip_text" rows, reference ocr_combined.py:124-129), ~8% adversarial/invalid
 * (quarantine candidates: encrypted PDFs per security_validator.py:425-430,
 * truncated headers, junk bytes, oversized payloads per :177-179).
 *
 * Hosts are zipfian (s≈1.2 over 50 hosts) so a few hosts dominate — the skew the
 * pipeline must salt (SURVEY.md §4).
 */
object CorpusGen {

  val DefaultSeed = 42L
  val NumHosts = 50
  /** Payload size cap used by fixtures + pipeline default (reference 100MB analog, scaled down). */
  val MaxBytes: Int = 1 << 20

  final case class FixturePage(
      url: String,
      warcTs: Timestamp,
      html: Array[Byte],
      text: String, // null unless pre-extracted
      lang: String,
      kind: String, // html | pdf | pre | junk | enc_pdf | trunc_pdf | big
      expected: String // intended extraction in force mode; null for quarantine kinds
  )

  // splitmix64 — public-domain PRNG (Steele et al.), used as a stateless hash-chain
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Stateless stream of pseudo-random longs keyed by (seed, idx, draw). */
  private final class Rng(seed: Long, idx: Long) {
    private var n = 0L
    def nextLong(): Long = { n += 1; mix(mix(seed ^ mix(idx)) + n) }
    def nextInt(bound: Int): Int = {
      val v = nextLong() >>> 1
      (v % bound).toInt
    }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  private val Words: Array[String] =
    ("the quick brown fox jumps over lazy dog data spark engine extract content " +
      "pipeline partition shuffle broadcast column text page word line block stream " +
      "table scan filter group join sort merge window batch query row value key host " +
      "crawl archive snapshot digest golden lineage resume salt skew bucket range").split(' ')

  private val HebWords: Array[String] =
    Array("שלום", "עולם", "טקסט", "מסמך", "עמוד", "שורה", "מילה", "תוכן", "נתונים", "חיפוש")

  private val NavWords: Array[String] =
    Array("home", "about", "contact", "login", "register", "terms", "privacy", "careers", "blog", "shop")

  // zipf s=1.2 cumulative over NumHosts
  private val hostCum: Array[Double] = {
    val w = (1 to NumHosts).map(r => 1.0 / math.pow(r, 1.2)).toArray
    val tot = w.sum
    w.scanLeft(0.0)(_ + _).tail.map(_ / tot)
  }

  private def pickHost(r: Rng): String = {
    val u = r.nextDouble()
    var i = 0
    while (i < NumHosts - 1 && hostCum(i) < u) i += 1
    s"host$i.example.com"
  }

  private def sentence(r: Rng, lang: String, nWords: Int): String = {
    val src = if (lang.startsWith("heb") && r.nextInt(2) == 0) HebWords else Words
    (0 until nWords).map(_ => src(r.nextInt(src.length))).mkString(" ")
  }

  // ------------------------------------------------------------------ HTML

  /** Returns (payloadBytes, expectedExtraction). */
  private def genHtml(r: Rng, lang: String): (Array[Byte], String) = {
    val latin1 = r.nextInt(10) == 0 && !lang.startsWith("heb")
    val sb = new StringBuilder(4096)
    val expected = new StringBuilder(1024)
    sb.append("<!DOCTYPE html>\n<html>\n<head>\n")
    if (latin1) sb.append("""<meta charset="iso-8859-1">""").append('\n')
    sb.append(s"<title>fixture ${r.nextInt(1000)} page</title>\n")
    sb.append("<style>body { color: #000; } .ad { display:none }</style>\n")
    sb.append("<script>var x = '<p>not content</p>'; if (x > 1) { x = 2; }</script>\n")
    sb.append("</head>\n<body>\n")
    // nav boilerplate (high link density AND inside <nav>)
    sb.append("<nav><ul>")
    (0 until 6).foreach { _ =>
      sb.append(s"""<li><a href="/x">${NavWords(r.nextInt(NavWords.length))}</a></li>""")
    }
    sb.append("</ul></nav>\n")
    sb.append(s"<header><h1>${sentence(r, "eng", 3)}</h1></header>\n")
    // cookie banner (few words → below MinWords)
    sb.append("""<div id="cookie"><a href="/accept">accept cookies</a></div>""").append('\n')
    // sidebar: link-dense div outside <aside> half the time (tests link-density rule)
    if (r.nextInt(2) == 0) {
      sb.append("<div class=related>")
      (0 until 5).foreach(_ => sb.append(s"""<a href="/r">${NavWords(r.nextInt(NavWords.length))} link here</a> """))
      sb.append("</div>\n")
    } else {
      sb.append("<aside><p>")
      sb.append(sentence(r, "eng", 12))
      sb.append("</p></aside>\n")
    }
    // main article — the expected content
    sb.append("<article>\n")
    val nParas = 3 + r.nextInt(10)
    (0 until nParas).foreach { p =>
      val raw = sentence(r, lang, 6 + r.nextInt(20))
      // sprinkle entities + an inline anchor in some paragraphs
      val withEntity =
        if (r.nextInt(3) == 0) raw + " fish &amp; chips &#x41;BC"
        else raw
      sb.append("<p>").append(withEntity)
      if (p == 1) sb.append(""" see <a href="/more">details</a> inline""")
      sb.append("</p>\n")
      if (expected.nonEmpty) expected.append('\n')
      expected.append(decodeIntent(withEntity))
      if (p == 1) expected.append(" see details inline")
    }
    if (latin1) {
      // non-ASCII ISO-8859-1 bytes (invalid as UTF-8) — exercises charset sniffing
      sb.append("<p>café résumé naïve déjà vu encore</p>\n")
      expected.append('\n').append("café résumé naïve déjà vu encore")
    }
    // unclosed tag noise
    if (r.nextInt(3) == 0) sb.append("<div><p>").append(sentence(r, lang, 8)).append('\n')
    sb.append("</article>\n")
    sb.append(s"<footer><p>copyright ${1990 + r.nextInt(30)} ${sentence(r, "eng", 6)}</p></footer>\n")
    sb.append("</body>\n</html>\n")
    val html = sb.toString
    // recompute expected for the unclosed-tag branch: it appears after the paragraphs
    val unclosedAt = html.indexOf("<div><p>")
    val exp =
      if (unclosedAt >= 0) {
        val tail = html.substring(unclosedAt + 8, html.indexOf('\n', unclosedAt))
        expected.append('\n').append(tail.trim)
        expected.toString
      } else expected.toString
    val bytes =
      if (latin1) html.getBytes(StandardCharsets.ISO_8859_1)
      else html.getBytes(StandardCharsets.UTF_8)
    (bytes, exp)
  }

  /** Intent-level entity decoding for expected text (mirror of extractor's entity table). */
  private def decodeIntent(s: String): String =
    s.replace("&amp;", "&").replace("&#x41;", "A")

  // ------------------------------------------------------------------ PDF

  /** Minimal valid PDF: catalog, pages, N pages each with a content stream of
    * positioned lines (Td, TD, Tj, TJ, T-star, quote). Returns (bytes, expectedText). */
  private def genPdf(r: Rng, flate: Boolean, shuffleObjs: Boolean): (Array[Byte], String) = {
    val nPages = 1 + r.nextInt(3)
    // style drawn before line generation: two-column pages (style 3) need short
    // lines so the columns' x-coverages stay disjoint (PdfExtract.MinColGap)
    val pageSpecs = (0 until nPages).map { _ =>
      val style = r.nextInt(4)
      val nLines = if (style == 3) 4 + r.nextInt(4) else 2 + r.nextInt(6)
      val maxExtraWords = if (style == 3) 2 else 6
      (style, (0 until nLines).map(_ => sentence(r, "eng", 3 + r.nextInt(maxExtraWords))))
    }
    // reading order: two-column pages emit left column (first half of lines)
    // top-down, then right column — which equals input line order by construction
    val expected = pageSpecs.map(_._2.mkString("\n")).mkString("\f")

    def contentStream(styleIn: Int, lines: Seq[String], r: Rng): Array[Byte] = {
      val sb = new StringBuilder
      sb.append("BT\n/F1 12 Tf\n14 TL\n")
      val style = styleIn
      style match {
        case 0 => // absolute Td per line, emitted in order
          lines.zipWithIndex.foreach { case (l, k) =>
            sb.append(s"1 0 0 1 72 ${720 - 14 * k} Tm\n(${esc(l)}) Tj\n")
          }
        case 1 => // out-of-order emission (reconstructor must re-sort by y)
          val idx = lines.indices.reverse
          idx.foreach { k =>
            sb.append(s"1 0 0 1 72 ${720 - 14 * k} Tm\n(${esc(lines(k))}) Tj\n")
          }
        case 3 => // two-column layout: left column then right, same y ladder
          val k = lines.length / 2
          val left = lines.take(k)
          val right = lines.drop(k)
          val leftW = left.map(_.length * 6).max
          val x2 = 72 + leftW + 60 // >= MinColGap beyond the widest left line
          left.zipWithIndex.foreach { case (l, i) =>
            sb.append(s"1 0 0 1 72 ${720 - 14 * i} Tm\n(${esc(l)}) Tj\n")
          }
          right.zipWithIndex.foreach { case (l, i) =>
            sb.append(s"1 0 0 1 $x2 ${720 - 14 * i} Tm\n(${esc(l)}) Tj\n")
          }
        case 2 => // relative positioning with T* / ' and TJ kerning splits
          sb.append("72 720 Td\n")
          lines.zipWithIndex.foreach { case (l, k) =>
            val parts = l.split(' ')
            if (parts.length > 2 && r.nextInt(2) == 0) {
              val head = parts.take(parts.length / 2).mkString(" ")
              val tail = parts.drop(parts.length / 2).mkString(" ")
              if (k == 0) sb.append(s"[(${esc(head)} ) -10 (${esc(tail)})] TJ\n")
              else sb.append(s"T*\n[(${esc(head)} ) -10 (${esc(tail)})] TJ\n")
            } else {
              if (k == 0) sb.append(s"(${esc(l)}) Tj\n")
              else sb.append(s"(${esc(l)}) '\n")
            }
          }
      }
      sb.append("ET\n")
      sb.toString.getBytes(StandardCharsets.US_ASCII)
    }

    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

    // content streams generated FIRST (their Rng draws pin the expected text);
    // container choices (filters, multi-stream splits) draw afterwards so the
    // same (seed, idx) always yields the same TEXT in any generator version —
    // golden digests survive container-coverage extensions
    val rawContents = (0 until nPages).map(p => contentStream(pageSpecs(p)._1, pageSpecs(p)._2, r))
    // filter coverage mirrors the wild: Flate dominates; the long tail carries
    // raw, [/ASCII85Decode /FlateDecode] chains, RunLength, ASCIIHex, LZW —
    // the decode paths a crawl-grade reader must have
    val encs = (0 until nPages).map(_ => if (flate) 1 else r.nextInt(6))
    // ~1 in 4 pages splits its content across TWO streams (/Contents [a b]) —
    // the TeX/Office shape
    val splits = (0 until nPages).map(_ => r.nextInt(4) == 0)

    // object numbering: 1=catalog, 2=pages, 3..=page objs, then content objs
    // (split pages consume two content numbers)
    val pageObjNums = (0 until nPages).map(3 + _)
    var nextContNum = 3 + nPages
    val objs = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    objs += 1 -> s"<< /Type /Catalog /Pages 2 0 R >>".getBytes(StandardCharsets.US_ASCII)
    objs += 2 -> s"<< /Type /Pages /Kids [${pageObjNums.map(n => s"$n 0 R").mkString(" ")}] /Count $nPages >>"
      .getBytes(StandardCharsets.US_ASCII)
    def contentObj(num: Int, raw: Array[Byte], enc: Int): Unit = {
      val (payload, filter) = encodeStream(raw, enc)
      val head = s"<< /Length ${payload.length}$filter >>\nstream\n".getBytes(StandardCharsets.US_ASCII)
      val tail = "\nendstream".getBytes(StandardCharsets.US_ASCII)
      objs += num -> (head ++ payload ++ tail)
    }
    (0 until nPages).foreach { p =>
      val raw = rawContents(p)
      val parts = if (splits(p)) splitAtLine(raw) else None
      parts match {
        case Some((c1, c2)) =>
          val (n1, n2) = (nextContNum, nextContNum + 1)
          nextContNum += 2
          objs += pageObjNums(p) ->
            s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents [$n1 0 R $n2 0 R] >>"
              .getBytes(StandardCharsets.US_ASCII)
          contentObj(n1, c1, encs(p))
          contentObj(n2, c2, encs(p))
        case None =>
          val n1 = nextContNum
          nextContNum += 1
          objs += pageObjNums(p) ->
            s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents $n1 0 R >>"
              .getBytes(StandardCharsets.US_ASCII)
          contentObj(n1, raw, encs(p))
      }
    }
    val ordered = if (shuffleObjs) objs.sortBy { case (n, _) => mix(r.nextLong() ^ n) } else objs
    val out = new java.io.ByteArrayOutputStream(4096)
    out.write("%PDF-1.4\n".getBytes(StandardCharsets.US_ASCII))
    ordered.foreach { case (num, body) =>
      out.write(s"$num 0 obj\n".getBytes(StandardCharsets.US_ASCII))
      out.write(body)
      out.write("\nendobj\n".getBytes(StandardCharsets.US_ASCII))
    }
    out.write("%%EOF\n".getBytes(StandardCharsets.US_ASCII))
    (out.toByteArray, expected)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val n = d.deflate(buf)
    d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  /** Stream payload under the chosen decode filter (enc 0..5); returns
    * (payload, "/Filter ..." dict fragment). */
  private def encodeStream(raw: Array[Byte], enc: Int): (Array[Byte], String) = enc match {
    case 1 => (deflate(raw), " /Filter /FlateDecode")
    case 2 => (a85Encode(deflate(raw)), " /Filter [/ASCII85Decode /FlateDecode]")
    case 3 => (rleEncode(raw), " /Filter /RunLengthDecode")
    case 4 => (hexEncode(raw), " /Filter /ASCIIHexDecode")
    case 5 => (lzwEncode(raw), " /Filter /LZWDecode")
    case _ => (raw, "")
  }

  /** Split operator text at a newline near the middle — the division falls
    * between lexical tokens, so `/Contents [a b]` concatenation is lossless. */
  private def splitAtLine(raw: Array[Byte]): Option[(Array[Byte], Array[Byte])] = {
    var i = raw.length / 2
    while (i < raw.length && raw(i) != '\n') i += 1
    if (i <= 4 || i >= raw.length - 4) None
    else Some((java.util.Arrays.copyOfRange(raw, 0, i + 1),
      java.util.Arrays.copyOfRange(raw, i + 1, raw.length)))
  }

  private def hexEncode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(data.length * 2 + 1)
    data.foreach(b => sb.append(f"${b & 0xff}%02X"))
    sb.append('>')
    sb.toString.getBytes(StandardCharsets.US_ASCII)
  }

  private def rleEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + data.length / 128 + 2)
    var i = 0
    while (i < data.length) {
      val n = math.min(128, data.length - i)
      out.write(n - 1)
      out.write(data, i, n)
      i += n
    }
    out.write(128) // EOD
    out.toByteArray
  }

  private def a85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(data.length * 5 / 4 + 4)
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (if (i + j < data.length) data(i + j) & 0xffL else 0L); j += 1 }
      if (n == 4 && v == 0) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var x = v
        var k = 4
        while (k >= 0) { cs(k) = ('!' + (x % 85).toInt).toChar; x /= 85; k -= 1 }
        sb.appendAll(cs, 0, n + 1)
      }
      i += 4
    }
    sb.append("~>")
    sb.toString.getBytes(StandardCharsets.US_ASCII)
  }

  /** PDF LZW (earlyChange=1): the encoder stays one dictionary add AHEAD of
    * the decoder, widening codes at nextFree == 2^bits (decoder widens at
    * 2^bits - 1 one add later — the pdf.js-compatible sync). */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val dict = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
    var nextFree = 258
    var codeBits = 9
    val out = new java.io.ByteArrayOutputStream(data.length + 64)
    var acc = 0L
    var nBits = 0
    def put(code: Int): Unit = {
      acc = (acc << codeBits) | code
      nBits += codeBits
      while (nBits >= 8) { out.write(((acc >>> (nBits - 8)) & 0xff).toInt); nBits -= 8 }
    }
    def codeOf(w: Seq[Byte]): Int = if (w.length == 1) w.head & 0xff else dict(w)
    put(256) // clear table
    var w = Seq.empty[Byte]
    data.foreach { b =>
      val wb = w :+ b
      if (w.isEmpty) w = wb
      else if (dict.contains(wb)) w = wb
      else {
        put(codeOf(w))
        dict(wb) = nextFree
        nextFree += 1
        if (nextFree >= (1 << codeBits) && codeBits < 12) codeBits += 1
        w = Seq(b)
      }
    }
    if (w.nonEmpty) put(codeOf(w))
    put(257) // EOD
    if (nBits > 0) out.write(((acc << (8 - nBits)) & 0xff).toInt)
    out.toByteArray
  }

  // ------------------------------------------------------------------ rows

  def page(i: Long, seed: Long = DefaultSeed): FixturePage = {
    val r = new Rng(seed, i)
    val host = pickHost(r)
    val url = s"https://$host/doc/${i}"
    val ts = new Timestamp(1700000000000L + i * 37003L)
    val lang = r.nextInt(4) match {
      case 0 => "heb"
      case 1 => "heb+eng"
      case _ => "eng"
    }
    val roll = r.nextInt(25)
    if (roll < 16) { // HTML
      val (bytes, exp) = genHtml(r, lang)
      FixturePage(url, ts, bytes, null, lang, "html", exp)
    } else if (roll < 21) { // PDF
      val (bytes, exp) = genPdf(r, flate = r.nextInt(2) == 0, shuffleObjs = r.nextInt(3) == 0)
      FixturePage(url, ts, bytes, null, "eng", "pdf", exp)
    } else if (roll < 22) { // pre-extracted: skip in cli/visual modes
      val (bytes, exp) = genHtml(r, lang)
      FixturePage(url, ts, bytes, "pre-extracted text for " + url, lang, "pre", exp)
    } else if (roll == 22) { // active-content pdf (B7 suspicious) → quarantine
      val body = ("%PDF-1.6\n1 0 obj\n<< /OpenAction << /S /JavaScript /JS (x) >> >>\nendobj\n")
        .getBytes(StandardCharsets.US_ASCII)
      FixturePage(url, ts, body, null, "eng", "js_pdf", null)
    } else if (roll == 23) { // encrypted pdf → quarantine
      val body = s"%PDF-1.5\n1 0 obj\n<< /Encrypt 9 0 R >>\nendobj\n".getBytes(StandardCharsets.US_ASCII)
      FixturePage(url, ts, body, null, "eng", "enc_pdf", null)
    } else { // junk bytes → quarantine (not HTML-like, not PDF)
      val junk = new Array[Byte](64 + r.nextInt(512))
      var k = 0
      while (k < junk.length) { junk(k) = (r.nextLong() & 0x7f).toByte; k += 1 }
      junk(0) = 'J' // guarantee first byte is neither '<' nor '%' nor whitespace
      FixturePage(url, ts, junk, null, "eng", "junk", null)
    }
  }

  def corpus(n: Int, seed: Long = DefaultSeed): IndexedSeq[FixturePage] =
    (0 until n).map(i => page(i.toLong, seed))
}
