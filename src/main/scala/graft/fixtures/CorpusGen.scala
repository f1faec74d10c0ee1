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

    // object numbering: 1=catalog, 2=pages, 3..=page objs, then content objs
    val pageObjNums = (0 until nPages).map(3 + _)
    val contObjNums = (0 until nPages).map(3 + nPages + _)
    val objs = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    objs += 1 -> s"<< /Type /Catalog /Pages 2 0 R >>".getBytes(StandardCharsets.US_ASCII)
    objs += 2 -> s"<< /Type /Pages /Kids [${pageObjNums.map(n => s"$n 0 R").mkString(" ")}] /Count $nPages >>"
      .getBytes(StandardCharsets.US_ASCII)
    (0 until nPages).foreach { p =>
      objs += pageObjNums(p) ->
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents ${contObjNums(p)} 0 R >>"
          .getBytes(StandardCharsets.US_ASCII)
      val raw = contentStream(pageSpecs(p)._1, pageSpecs(p)._2, r)
      val (payload, filter) =
        if (flate) (deflate(raw), " /Filter /FlateDecode") else (raw, "")
      val head = s"<< /Length ${payload.length}$filter >>\nstream\n".getBytes(StandardCharsets.US_ASCII)
      val tail = "\nendstream".getBytes(StandardCharsets.US_ASCII)
      objs += contObjNums(p) -> (head ++ payload ++ tail)
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
