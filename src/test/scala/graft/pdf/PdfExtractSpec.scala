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

  test("totality: junk, truncated, empty never throw") {
    assert(PdfExtract.text("%PDF-1.4 garbage no objects".getBytes) == "")
    assert(PdfExtract.text(Array.emptyByteArray) == "")
    val trunc = minimalPdf("BT\n/F1 12 Tf\n(unterminated").take(40).toArray
    PdfExtract.text(trunc) // must not throw
  }
}
