package graft.pdf

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

class PdfExtractSpec extends AnyFunSuite {

  private def minimalPdf(contents: String*): Array[Byte] = {
    val nPages = contents.length
    val sb = new StringBuilder
    sb.append("%PDF-1.4\n")
    sb.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until nPages).map(p => s"${3 + p} 0 R").mkString(" ")
    sb.append(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $nPages >>\nendobj\n")
    contents.zipWithIndex.foreach { case (c, p) =>
      sb.append(s"${3 + p} 0 obj\n<< /Type /Page /Parent 2 0 R /Contents ${3 + nPages + p} 0 R >>\nendobj\n")
    }
    contents.zipWithIndex.foreach { case (c, p) =>
      sb.append(s"${3 + nPages + p} 0 obj\n<< /Length ${c.length} >>\nstream\n$c\nendstream\nendobj\n")
    }
    sb.append("%%EOF\n")
    sb.toString.getBytes(StandardCharsets.US_ASCII)
  }

  test("preflight: magic, version, encryption, embedded files") {
    val ok = PdfExtract.preflight("%PDF-1.7\nrest".getBytes)
    assert(ok.isPdf && ok.version == "1.7" && !ok.encrypted && !ok.embedded)
    val notPdf = PdfExtract.preflight("<html></html>".getBytes)
    assert(!notPdf.isPdf && notPdf.issues.contains("not_pdf_header"))
    val badVer = PdfExtract.preflight("%PDF-abc\n".getBytes)
    assert(!badVer.isPdf && badVer.issues.contains("bad_version"))
    val enc = PdfExtract.preflight("%PDF-1.5\n1 0 obj << /Encrypt 9 0 R >> endobj".getBytes)
    assert(enc.encrypted && enc.issues.contains("encrypted"))
    val emb = PdfExtract.preflight("%PDF-1.5\n<< /EmbeddedFile >>".getBytes)
    assert(emb.embedded)
  }

  test("simple Tj at absolute positions, top-down reading order") {
    val pdf = minimalPdf(
      "BT\n/F1 12 Tf\n1 0 0 1 72 700 Tm\n(first line) Tj\n1 0 0 1 72 680 Tm\n(second line) Tj\nET")
    assert(PdfExtract.text(pdf) == "first line\nsecond line")
  }

  test("out-of-order emission is re-sorted by y") {
    val pdf = minimalPdf(
      "BT\n/F1 12 Tf\n1 0 0 1 72 600 Tm\n(below) Tj\n1 0 0 1 72 700 Tm\n(above) Tj\nET")
    assert(PdfExtract.text(pdf) == "above\nbelow")
  }

  test("Td/TD/T*/quote relative positioning") {
    val pdf = minimalPdf(
      "BT\n/F1 12 Tf\n14 TL\n72 720 Td\n(line one) Tj\nT*\n(line two) Tj\n(line three) '\nET")
    assert(PdfExtract.text(pdf) == "line one\nline two\nline three")
  }

  test("TJ array with kerning keeps same line; runs joined by space") {
    val pdf = minimalPdf(
      "BT\n/F1 12 Tf\n72 700 Td\n[(hello ) -20 (world)] TJ\nET")
    assert(PdfExtract.text(pdf) == "hello world")
  }

  test("multi-page: pages joined by form-feed in kids order") {
    val pdf = minimalPdf(
      "BT\n/F1 12 Tf\n72 700 Td\n(page one text) Tj\nET",
      "BT\n/F1 12 Tf\n72 700 Td\n(page two text) Tj\nET")
    assert(PdfExtract.text(pdf) == "page one text\fpage two text")
  }

  test("escapes in strings: parens, backslash, octal") {
    val pdf = minimalPdf("BT\n/F1 12 Tf\n72 700 Td\n(a \\(b\\) c \\\\ d \\101) Tj\nET")
    assert(PdfExtract.text(pdf) == "a (b) c \\ d A")
  }

  test("same y within tolerance groups into one line sorted by x") {
    val pdf = minimalPdf(
      "BT\n/F1 12 Tf\n1 0 0 1 200 700 Tm\n(right) Tj\n1 0 0 1 72 701 Tm\n(left) Tj\nET")
    assert(PdfExtract.text(pdf) == "left right")
  }

  test("spans carry page and bbox-ish geometry in reading order") {
    val pdf = minimalPdf(
      "BT\n/F1 12 Tf\n72 700 Td\n(alpha beta) Tj\nET",
      "BT\n/F1 12 Tf\n72 700 Td\n(gamma) Tj\nET")
    val ss = PdfExtract.spans(pdf)
    assert(ss.map(_.word) == Seq("alpha", "beta", "gamma"))
    assert(ss.map(_.page) == Seq(0, 0, 1))
    assert(ss(0).x1 < ss(1).x1) // beta to the right of alpha
    assert(ss(0).y1 == 700 && ss(0).y2 == 712)
  }

  test("two-column layout: left column read before right (x-coverage clustering)") {
    val pdf = minimalPdf(
      "BT\n/F1 12 Tf\n" +
        "1 0 0 1 72 720 Tm\n(left one) Tj\n" +
        "1 0 0 1 72 706 Tm\n(left two) Tj\n" +
        "1 0 0 1 300 720 Tm\n(right one) Tj\n" +
        "1 0 0 1 300 706 Tm\n(right two) Tj\nET")
    assert(PdfExtract.text(pdf) == "left one\nleft two\nright one\nright two")
  }

  test("a lone wide gap on one line is NOT a column split") {
    val pdf = minimalPdf(
      "BT\n/F1 12 Tf\n1 0 0 1 72 720 Tm\n(cell) Tj\n1 0 0 1 400 720 Tm\n(far) Tj\nET")
    assert(PdfExtract.text(pdf) == "cell far")
  }

  test("fixture generator round-trip: flate + shuffled objects + all styles") {
    // exercised heavily in FixtureTruthSpec; here just one deterministic case
    import graft.fixtures.CorpusGen
    val pdfPages = CorpusGen.corpus(400).filter(_.kind == "pdf")
    assert(pdfPages.nonEmpty)
    pdfPages.foreach { p =>
      assert(PdfExtract.text(p.html) == p.expected, s"mismatch for ${p.url}")
    }
  }

  /** PDF ≥1.5 object-stream fixture: catalog/pages/page dicts packed into a
    * FlateDecode /ObjStm; only the content stream stays top-level. */
  private def objStmPdf(contents: String*): Array[Byte] = {
    val nPages = contents.length
    val kids = (0 until nPages).map(p => s"${3 + p} 0 R").mkString(" ")
    val packed: Seq[(Int, String)] =
      Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> s"<< /Type /Pages /Kids [$kids] /Count $nPages >>") ++
        contents.indices.map(p =>
          (3 + p) -> s"<< /Type /Page /Parent 2 0 R /Contents ${3 + nPages + p} 0 R >>")
    val offsets = packed.map(_._2.length + 1).scanLeft(0)(_ + _) // +1: '\n' separators
    val header = packed.zip(offsets).map { case ((num, _), off) => s"$num $off" }.mkString(" ")
    val payload = (header + "\n" + packed.map(_._2).mkString("\n") + "\n")
      .getBytes(StandardCharsets.US_ASCII)
    val first = header.length + 1
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(payload); deflater.finish()
    val buf = new Array[Byte](payload.length * 2 + 64)
    val m = deflater.deflate(buf); deflater.end()
    val flate = java.util.Arrays.copyOf(buf, m)
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.5\n".getBytes(StandardCharsets.US_ASCII))
    out.write((s"9 0 obj\n<< /Type /ObjStm /N ${packed.length} /First $first " +
      s"/Length ${flate.length} /Filter /FlateDecode >>\nstream\n").getBytes(StandardCharsets.US_ASCII))
    out.write(flate)
    out.write("\nendstream\nendobj\n".getBytes(StandardCharsets.US_ASCII))
    contents.zipWithIndex.foreach { case (c, p) =>
      out.write((s"${3 + nPages + p} 0 obj\n<< /Length ${c.length} >>\nstream\n$c\nendstream\nendobj\n")
        .getBytes(StandardCharsets.US_ASCII))
    }
    out.write("%%EOF\n".getBytes(StandardCharsets.US_ASCII))
    out.toByteArray
  }

  test("ObjStm: page/catalog dicts inside a compressed object stream round-trip") {
    val pdf = objStmPdf("BT\n/F1 12 Tf\n72 700 Td\n(hidden in objstm) Tj\nET")
    assert(PdfExtract.text(pdf) == "hidden in objstm")
    val multi = objStmPdf(
      "BT\n/F1 12 Tf\n72 700 Td\n(page one) Tj\nET",
      "BT\n/F1 12 Tf\n72 700 Td\n(page two) Tj\nET")
    assert(PdfExtract.text(multi) == "page one\fpage two")
    // spans work through the same path
    assert(PdfExtract.spans(multi).map(_.word) == Seq("page", "one", "page", "two"))
    // before ObjStm support these documents extracted as empty with
    // pdf_no_content_stream — assert the outcome is now clean
    assert(PdfExtract.outcome(pdf).error == null)
  }

  test("ObjStm bounds guards: corrupt header/offsets degrade, never throw") {
    val good = objStmPdf("BT (x) Tj ET")
    // mutate bytes inside the flate payload region — inflate fails or header garbles
    (0 until 200 by 7).foreach { k =>
      val bad = good.clone()
      val at = math.min(good.length - 1, 60 + k)
      bad(at) = (bad(at) ^ 0x5a).toByte
      PdfExtract.text(bad) // must not throw
      PdfExtract.outcome(bad)
    }
    // top-level object with the same number wins over the ObjStm copy
    val top = new String(good, StandardCharsets.ISO_8859_1) +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    PdfExtract.text(top.getBytes(StandardCharsets.ISO_8859_1))
  }

  /** CID-font fixture: page resources bind /F9 to a Type0-ish font whose
    * /ToUnicode CMap maps 2-byte codes to text; content shows hex strings. */
  private def cidPdf(cmap: String, contentHex: String): Array[Byte] = {
    val content = s"BT /F9 12 Tf 72 720 Td <$contentHex> Tj ET"
    (s"""%PDF-1.5
       |1 0 obj
       |<< /Type /Catalog /Pages 2 0 R >>
       |endobj
       |2 0 obj
       |<< /Type /Pages /Kids [3 0 R] /Count 1 >>
       |endobj
       |3 0 obj
       |<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources << /Font << /F9 5 0 R >> >> >>
       |endobj
       |4 0 obj
       |<< /Length ${content.length} >>
       |stream
       |$content
       |endstream
       |endobj
       |5 0 obj
       |<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H /ToUnicode 6 0 R >>
       |endobj
       |6 0 obj
       |<< /Length ${cmap.length} >>
       |stream
       |$cmap
       |endstream
       |endobj
       |%%EOF
       |""").stripMargin.getBytes(StandardCharsets.US_ASCII)
  }

  test("ToUnicode CMap: 2-byte CID codes decode via bfchar and bfrange") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0041> <0048>
        |<0042> <0069>
        |endbfchar
        |1 beginbfrange
        |<0100> <0105> <0061>
        |endbfrange
        |endcmap
        |""".stripMargin
    // bfchar: 0041->H, 0042->i; bfrange: 0100..0105 -> a..f
    val pdf = cidPdf(cmap, "00410042" + "010001010102") // "Hi" + "abc"
    assert(PdfExtract.text(pdf) == "Hiabc")
    // unmapped code -> replacement char, never latin-1 garbage
    val pdf2 = cidPdf(cmap, "0041FFFE0042")
    assert(PdfExtract.text(pdf2) == "H\uFFFDi")
  }

  test("ToUnicode: multi-char dst, array bfrange, 1-byte codespace") {
    val cmap =
      """begincodespacerange
        |<00> <FF>
        |endcodespacerange
        |1 beginbfchar
        |<61> <00660066>
        |endbfchar
        |1 beginbfrange
        |<70> <72> [<0078> <0079> <007A>]
        |endbfrange
        |endcmap
        |""".stripMargin
    // 1-byte codes: 0x61 -> "ff" (ligature-style multi-char), 70/71/72 -> x/y/z
    val pdf = cidPdf(cmap, "61707172")
    assert(PdfExtract.text(pdf) == "ffxyz")
    // fonts WITHOUT ToUnicode keep identity semantics (regression)
    val plain = minimalPdf("BT /F1 12 Tf 72 720 Td (plain text kept) Tj ET")
    assert(PdfExtract.text(plain) == "plain text kept")
  }

  test("/Widths metrics drive the advance: narrow glyphs do not split words apart") {
    // font with per-char widths: 'i'=200, 'w'=900, default FirstChar=105 ('i')
    def pdf(widths: String) =
      (s"""%PDF-1.4
         |1 0 obj
         |<< /Type /Catalog /Pages 2 0 R >>
         |endobj
         |2 0 obj
         |<< /Type /Pages /Kids [3 0 R] /Count 1 >>
         |endobj
         |3 0 obj
         |<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>
         |endobj
         |4 0 obj
         |<< /Length 44 >>
         |stream
         |BT /F1 10 Tf 72 700 Td (iii) Tj (www) Tj ET
         |endstream
         |endobj
         |5 0 obj
         |<< /Type /Font /Subtype /Type1 /FirstChar 105 /Widths [$widths] >>
         |endobj
         |%%EOF
         |""").stripMargin.getBytes(StandardCharsets.US_ASCII)
    // widths array spans chars 105..119: i=200, w(119)=900
    val w = (105 to 119).map(c => if (c == 'w') 900 else 200).mkString(" ")
    val spans = PdfExtract.spans(pdf(w))
    assert(spans.map(_.word) == Seq("iii", "www"))
    // the second run starts exactly 3×(200/1000×10) = 6 units after the
    // first (x=78) — the 0.5em model would have put it at 72+15=87
    assert(spans(0).x1 == 72 && spans(1).x1 == 78, spans.mkString(";"))
    assert(PdfExtract.text(pdf(w)) == "iii www")
  }

  // ---- round-3 additions: contents arrays, inherited resources, filters ----

  private def rawPdf(objects: (Int, Array[Byte])*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n".getBytes(StandardCharsets.US_ASCII))
    objects.foreach { case (num, body) =>
      out.write(s"$num 0 obj\n".getBytes(StandardCharsets.US_ASCII))
      out.write(body)
      out.write("\nendobj\n".getBytes(StandardCharsets.US_ASCII))
    }
    out.write("%%EOF\n".getBytes(StandardCharsets.US_ASCII))
    out.toByteArray
  }

  private def streamObj(dict: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"$dict\nstream\n".getBytes(StandardCharsets.US_ASCII))
    out.write(payload)
    out.write("\nendstream".getBytes(StandardCharsets.US_ASCII))
    out.toByteArray
  }

  private def ascii(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)

  test("/Contents array: page content split across streams concatenates in order") {
    // BT opened in stream one, closed in stream two — text state must flow
    // through the concatenation (the array IS one logical stream)
    val c1 = ascii("BT /F1 12 Tf 72 700 Td (part one) Tj")
    val c2 = ascii("(part two) Tj ET")
    val pdf = rawPdf(
      1 -> ascii("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> ascii("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> ascii("<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>"),
      4 -> streamObj(s"<< /Length ${c1.length} >>", c1),
      5 -> streamObj(s"<< /Length ${c2.length} >>", c2))
    assert(PdfExtract.text(pdf) == "part one part two")
    // single-ref pages still parse through the same path (regression)
    assert(PdfExtract.text(minimalPdf("BT /F1 12 Tf 72 700 Td (solo) Tj ET")) == "solo")
  }

  test("inherited /Resources: font declared on the /Pages ancestor decodes the page's CID text") {
    val cmap = "begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
      "2 beginbfchar\n<0041> <0057>\n<0042> <006F>\nendbfchar\nendcmap\n"
    val content = ascii("BT /F9 12 Tf 72 720 Td <00410042> Tj ET")
    val pdf = rawPdf(
      1 -> ascii("<< /Type /Catalog /Pages 2 0 R >>"),
      // resources live on the Pages NODE, not the page
      2 -> ascii("<< /Type /Pages /Kids [3 0 R] /Count 1 /Resources << /Font << /F9 5 0 R >> >> >>"),
      3 -> ascii("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
      4 -> streamObj(s"<< /Length ${content.length} >>", content),
      5 -> ascii("<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>"),
      6 -> streamObj(s"<< /Length ${cmap.length} >>", ascii(cmap)))
    assert(PdfExtract.text(pdf) == "Wo")
  }

  test("page's own /Resources overrides the ancestor's (whole-value replacement)") {
    val cmapW = "begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
      "1 beginbfchar\n<0041> <0057>\nendbfchar\nendcmap\n" // 0041 -> W
    val cmapX = "begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
      "1 beginbfchar\n<0041> <0058>\nendbfchar\nendcmap\n" // 0041 -> X
    val content = ascii("BT /F9 12 Tf 72 720 Td <0041> Tj ET")
    val pdf = rawPdf(
      1 -> ascii("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> ascii("<< /Type /Pages /Kids [3 0 R] /Count 1 /Resources << /Font << /F9 5 0 R >> >> >>"),
      3 -> ascii("<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources << /Font << /F9 7 0 R >> >> >>"),
      4 -> streamObj(s"<< /Length ${content.length} >>", content),
      5 -> ascii("<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>"),
      6 -> streamObj(s"<< /Length ${cmapW.length} >>", ascii(cmapW)),
      7 -> ascii("<< /Type /Font /Subtype /Type0 /ToUnicode 8 0 R >>"),
      8 -> streamObj(s"<< /Length ${cmapX.length} >>", ascii(cmapX)))
    assert(PdfExtract.text(pdf) == "X")
  }

  private def onePageFiltered(filterEntry: String, payload: Array[Byte]): Array[Byte] = rawPdf(
    1 -> ascii("<< /Type /Catalog /Pages 2 0 R >>"),
    2 -> ascii("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
    3 -> ascii("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
    4 -> streamObj(s"<< /Length ${payload.length} $filterEntry >>", payload))

  private val FilterContent = "BT /F1 12 Tf 72 700 Td (filtered text) Tj ET"

  private def a85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var v = 0L
      (0 until 4).foreach(j => v = (v << 8) | (if (i + j < data.length) data(i + j) & 0xffL else 0L))
      if (n == 4 && v == 0) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var x = v
        (4 to 0 by -1).foreach { k => cs(k) = ('!' + (x % 85).toInt).toChar; x /= 85 }
        sb.appendAll(cs, 0, n + 1)
      }
      i += 4
    }
    sb.append("~>")
    ascii(sb.toString)
  }

  private def rlEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
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

  /** PDF LZW encoder (earlyChange=1): stays one dictionary add AHEAD of the
    * decoder, so it widens codes when its nextFree reaches 2^bits (the decoder
    * widens at 2^bits - 1 one add later — pdf.js-compatible sync). */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val dict = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
    var nextFree = 258
    var codeBits = 9
    val out = new java.io.ByteArrayOutputStream()
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
      if (w.isEmpty || wb.length == 1) w = wb
      else if (dict.contains(wb) ) w = wb
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

  test("ASCIIHexDecode round-trips (with whitespace and EOD marker)") {
    val hex = FilterContent.getBytes(StandardCharsets.US_ASCII)
      .map(b => f"${b & 0xff}%02X").mkString(" ") + " >"
    val pdf = onePageFiltered("/Filter /ASCIIHexDecode", ascii(hex))
    assert(PdfExtract.text(pdf) == "filtered text")
  }

  test("ASCII85Decode round-trips (partial final group, z shortcut)") {
    val pdf = onePageFiltered("/Filter /ASCII85Decode", a85Encode(ascii(FilterContent)))
    assert(PdfExtract.text(pdf) == "filtered text")
    // z-group exercise: zeros in the payload round-trip too
    val withZeros = ascii("BT /F1 12 Tf 72 700 Td (a") ++ Array.fill[Byte](8)(0) ++ ascii("b) Tj ET")
    val dec = onePageFiltered("/Filter /ASCII85Decode", a85Encode(withZeros))
    assert(PdfExtract.text(dec).startsWith("a"))
  }

  test("RunLengthDecode round-trips (literal chunks + EOD)") {
    val pdf = onePageFiltered("/Filter /RunLengthDecode", rlEncode(ascii(FilterContent)))
    assert(PdfExtract.text(pdf) == "filtered text")
  }

  test("LZWDecode round-trips across a code-width boundary") {
    val pdf = onePageFiltered("/Filter /LZWDecode", lzwEncode(ascii(FilterContent)))
    assert(PdfExtract.text(pdf) == "filtered text")
    // long repetitive content forces dictionary growth past 511 (10-bit codes)
    val long = "BT /F1 12 Tf 72 700 Td (" +
      (1 to 120).map(i => s"tok$i tok$i").mkString(" ") + ") Tj ET"
    val pdf2 = onePageFiltered("/Filter /LZWDecode", lzwEncode(ascii(long)))
    assert(PdfExtract.text(pdf2) == long.drop("BT /F1 12 Tf 72 700 Td (".length).dropRight(") Tj ET".length))
  }

  test("filter ARRAY applies the chain in order: [/ASCII85Decode /FlateDecode]") {
    val deflater = new java.util.zip.Deflater()
    val src = ascii(FilterContent)
    deflater.setInput(src); deflater.finish()
    val buf = new Array[Byte](src.length * 2 + 64)
    val m = deflater.deflate(buf); deflater.end()
    val flate = java.util.Arrays.copyOf(buf, m)
    val pdf = onePageFiltered("/Filter [/ASCII85Decode /FlateDecode]", a85Encode(flate))
    assert(PdfExtract.text(pdf) == "filtered text")
  }

  test("unsupported filter yields the DISTINCT pdf_unsupported_filter error class") {
    val pdf = onePageFiltered("/Filter /DCTDecode", ascii("ÿØ jpeg-ish bytes"))
    val o = PdfExtract.outcome(pdf)
    assert(o.text == "" && o.error == "pdf_unsupported_filter", o)
  }

  test("/Encoding /Differences remaps simple-font bytes via AGL glyph names") {
    val content = ascii("BT /F1 12 Tf 72 720 Td (ABCD) Tj ET")
    def pdf(encEntry: String, extra: (Int, Array[Byte])*): Array[Byte] = rawPdf(
      (Seq(
        1 -> ascii("<< /Type /Catalog /Pages 2 0 R >>"),
        2 -> ascii("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        3 -> ascii("<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
        4 -> streamObj(s"<< /Length ${content.length} >>", content),
        5 -> ascii(s"<< /Type /Font /Subtype /Type1 $encEntry >>")) ++ extra): _*)
    // A(65)->germandbls, B(66) skipped (identity), 67 -> uni0045 'E', 68 -> unknown name
    val inline = pdf("/Encoding << /Differences [65 /germandbls 67 /uni0045 /bogusname] >>")
    assert(PdfExtract.text(inline) == "ßBE�")
    // same dict behind an indirect ref
    val viaRef = pdf("/Encoding 6 0 R",
      6 -> ascii("<< /Type /Encoding /Differences [65 /germandbls 67 /uni0045 /bogusname] >>"))
    assert(PdfExtract.text(viaRef) == "ßBE�")
    // a bare base-encoding NAME leaves identity decoding untouched
    val named = pdf("/Encoding /WinAnsiEncoding")
    assert(PdfExtract.text(named) == "ABCD")
    // glyph name coverage: letters, digits, punctuation, u+hex forms
    assert(PdfExtract.glyphToString("a") == "a" && PdfExtract.glyphToString("seven") == "7")
    assert(PdfExtract.glyphToString("comma") == "," && PdfExtract.glyphToString("emdash") == "—")
    assert(PdfExtract.glyphToString("uni20AC") == "€" && PdfExtract.glyphToString("u1F600") == "😀")
    assert(PdfExtract.glyphToString("no.such.glyph") == "�")
  }

  test("CID /W widths: per-code advances from the descendant CIDFont, /DW default") {
    val cmap = "begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
      "3 beginbfchar\n<0041> <0041>\n<0042> <0042>\n<0050> <0050>\nendbfchar\nendcmap\n"
    // two shows: first advances by W(0x41)+W(0x42) = (300+400)/1000×12 = 8.4
    val content = ascii("BT /F9 12 Tf 72 720 Td <00410042> Tj <0050> Tj ET")
    val pdf = rawPdf(
      1 -> ascii("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> ascii("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> ascii("<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources << /Font << /F9 5 0 R >> >> >>"),
      4 -> streamObj(s"<< /Length ${content.length} >>", content),
      5 -> ascii("<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R /DescendantFonts [7 0 R] >>"),
      6 -> streamObj(s"<< /Length ${cmap.length} >>", ascii(cmap)),
      // range clause 100..102 exercises the cFirst cLast w form
      7 -> ascii("<< /Type /Font /Subtype /CIDFontType2 /DW 600 /W [65 [300 400] 100 102 250] >>"))
    val ss = PdfExtract.spans(pdf)
    assert(ss.map(_.word) == Seq("AB", "P"), ss)
    assert(ss(0).x1 == 72)
    // second run starts at 72 + 8.4 = 80.4 → int 80 (0.5em model would say 84)
    assert(ss(1).x1 == 80, ss.mkString(";"))
    // /DW default applies to unmapped code 0x50: next pen x would be 80.4+7.2
    assert(PdfExtract.text(pdf) == "AB P")
  }

  test("inline images: BI..ID <binary> EI is skipped, binary never reaches the text state") {
    // the image samples contain "(fake) Tj" and "BT" — without the ID skip
    // these would tokenize as real operators and inject text
    val img = "BI /W 4 /H 2 /BPC 8 /CS /G ID  (fake) Tj BT ÿþ EI"
    val pdf = minimalPdf(s"BT /F1 12 Tf 72 700 Td (before) Tj ET $img BT /F1 12 Tf 72 680 Td (after) Tj ET")
    assert(PdfExtract.text(pdf) == "before\nafter")
  }

  test("/DecodeParms PNG and TIFF predictors reconstruct post-filter bytes") {
    val payload = (0 until 96).map(i => ((i * 7 + 3) % 256).toByte).toArray
    val cols = 12
    // PNG tag-2 (Up) encode: row y stores payload(y) - payload(y-1)
    val pngEnc = new java.io.ByteArrayOutputStream()
    (0 until payload.length / cols).foreach { y =>
      pngEnc.write(2)
      (0 until cols).foreach { x =>
        val up = if (y > 0) payload((y - 1) * cols + x) & 0xff else 0
        pngEnc.write(((payload(y * cols + x) & 0xff) - up) & 0xff)
      }
    }
    val dict = s"<< /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $cols >> >>"
    assert(PdfExtract.applyPredictor(dict, pngEnc.toByteArray).toSeq == payload.toSeq)
    // TIFF predictor 2: horizontal differencing per row
    val tiffEnc = payload.clone()
    (0 until payload.length / cols).foreach { y =>
      ((cols - 1) to 1 by -1).foreach { x =>
        tiffEnc(y * cols + x) =
          (((payload(y * cols + x) & 0xff) - (payload(y * cols + x - 1) & 0xff)) & 0xff).toByte
      }
    }
    val dict2 = s"<< /Filter /FlateDecode /DecodeParms << /Predictor 2 /Columns $cols >> >>"
    assert(PdfExtract.applyPredictor(dict2, tiffEnc).toSeq == payload.toSeq)
    // no predictor entry → passthrough; malformed geometry degrades, not throws
    assert(PdfExtract.applyPredictor("<< /Length 3 >>", payload) eq payload)
    PdfExtract.applyPredictor("<< /Predictor 12 /Columns 0 >>", payload)
  }

  test("totality: junk, truncated, empty never throw") {
    assert(PdfExtract.text("%PDF-1.4 garbage no objects".getBytes) == "")
    assert(PdfExtract.text(Array.emptyByteArray) == "")
    val trunc = minimalPdf("BT\n/F1 12 Tf\n(unterminated").take(40).toArray
    PdfExtract.text(trunc) // must not throw
  }

  // ------------------------------------------------------------ Type3 fonts

  private def type3Pdf(fontDict: String, content: String,
                       extra: (Int, Array[Byte])*): Array[Byte] = rawPdf(
    Seq(
      1 -> ascii("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> ascii("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> ascii("<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >>"),
      4 -> streamObj(s"<< /Length ${content.length} >>", ascii(content)),
      5 -> ascii(fontDict)) ++ extra: _*)

  test("Type3 font without ToUnicode: distinct pdf_type3_font class, no garbage") {
    // glyph codes index CharProcs procedures — latin-1 decoding them would be
    // silent garbage; the run is suppressed and the document classified
    val pdf = type3Pdf(
      "<< /Type /Font /Subtype /Type3 /FontBBox [0 0 10 10] /CharProcs 6 0 R >>",
      "BT /F1 12 Tf 72 700 Td () Tj ET",
      6 -> ascii("<< >>"))
    val o = PdfExtract.outcome(pdf)
    assert(o.error == "pdf_type3_font")
    assert(o.text == "")
    assert(PdfExtract.text(pdf) == "") // the raw-text API suppresses too
  }

  test("Type3 WITH ToUnicode decodes normally (no error)") {
    val cmap =
      """begincodespacerange <00> <FF> endcodespacerange
        |beginbfchar <01> <0041> <02> <0042> endbfchar""".stripMargin
    val pdf = type3Pdf(
      "<< /Type /Font /Subtype /Type3 /CharProcs 7 0 R /ToUnicode 6 0 R >>",
      "BT /F1 12 Tf 72 700 Td <0102> Tj ET",
      6 -> streamObj(s"<< /Length ${cmap.length} >>", ascii(cmap)),
      7 -> ascii("<< >>"))
    val o = PdfExtract.outcome(pdf)
    assert(o.error == null)
    assert(o.text == "AB")
  }

  test("mixed fonts: mappable text extracts, Type3 runs suppressed, no error") {
    val content = "BT /F1 12 Tf 72 700 Td () Tj /F2 12 Tf 72 680 Td (readable) Tj ET"
    val pdf = rawPdf(
      1 -> ascii("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> ascii("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> ascii("<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >> >>"),
      4 -> streamObj(s"<< /Length ${content.length} >>", ascii(content)),
      5 -> ascii("<< /Type /Font /Subtype /Type3 /CharProcs 7 0 R >>"),
      6 -> ascii("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      7 -> ascii("<< >>"))
    val o = PdfExtract.outcome(pdf)
    assert(o.error == null, "partial extraction is success — only all-Type3 documents classify")
    assert(o.text == "readable")
  }
}
