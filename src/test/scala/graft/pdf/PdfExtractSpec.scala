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

  test("totality: junk, truncated, empty never throw") {
    assert(PdfExtract.text("%PDF-1.4 garbage no objects".getBytes) == "")
    assert(PdfExtract.text(Array.emptyByteArray) == "")
    val trunc = minimalPdf("BT\n/F1 12 Tf\n(unterminated").take(40).toArray
    PdfExtract.text(trunc) // must not throw
  }
}
