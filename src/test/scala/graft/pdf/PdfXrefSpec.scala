package graft.pdf

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** Incremental-update (revision) resolution via the xref chain (§7.5.4/.6/.8):
  * when a document carries duplicate `N G obj` frames, the ACTIVE frame is the
  * one the newest xref designates — file order is only the no-xref fallback. */
class PdfXrefSpec extends AnyFunSuite {

  /** Byte builder that reports the offset each part lands at. */
  private final class B {
    private val bos = new java.io.ByteArrayOutputStream()
    def pos: Int = bos.size
    def add(s: String): Int = { val p = pos; bos.write(s.getBytes(StandardCharsets.US_ASCII)); p }
    def addRaw(a: Array[Byte]): Int = { val p = pos; bos.write(a, 0, a.length); p }
    def bytes: Array[Byte] = bos.toByteArray
  }

  private def contentObj(num: Int, text: String): String = {
    val c = s"BT /F1 12 Tf 72 700 Td ($text) Tj ET"
    s"$num 0 obj\n<< /Length ${c.length} >>\nstream\n$c\nendstream\nendobj\n"
  }

  private def skeleton(b: B): Unit = {
    b.add("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    b.add("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    b.add("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
  }

  private def classicXref(b: B, num: Int, off: Int, flag: Char = 'n',
                          prev: Int = -1): Int = {
    val prevEntry = if (prev >= 0) s" /Prev $prev" else ""
    b.add(f"xref\n$num 1\n$off%010d 00000 $flag \ntrailer\n<< /Size 10$prevEntry >>\n")
  }

  private def finish(b: B, xrefAt: Int): Array[Byte] = {
    b.add(s"startxref\n$xrefAt\n%%EOF\n")
    b.bytes
  }

  test("no xref: last duplicate frame wins (append-only heuristic)") {
    val b = new B
    b.add("%PDF-1.4\n")
    skeleton(b)
    b.add(contentObj(4, "original"))
    b.add(contentObj(4, "updated"))
    b.add("%%EOF\n")
    assert(PdfExtract.text(b.bytes) == "updated")
  }

  test("classic xref designates the EARLIER frame: file order loses") {
    val b = new B
    b.add("%PDF-1.4\n")
    val offActive = b.add(contentObj(4, "active version"))
    skeleton(b)
    b.add(contentObj(4, "abandoned revision"))
    val x = classicXref(b, 4, offActive)
    assert(PdfExtract.text(finish(b, x)) == "active version")
  }

  test("classic xref append-only update extracts the UPDATED text") {
    val b = new B
    b.add("%PDF-1.4\n")
    skeleton(b)
    b.add(contentObj(4, "first revision"))
    val offUpd = b.add(contentObj(4, "second revision"))
    val x = classicXref(b, 4, offUpd)
    assert(PdfExtract.text(finish(b, x)) == "second revision")
  }

  test("/Prev chain: the NEWEST section's entry wins over the older one's") {
    val b = new B
    b.add("%PDF-1.4\n")
    val offA = b.add(contentObj(4, "newest says me"))
    skeleton(b)
    val offB = b.add(contentObj(4, "older xref victim"))
    val oldX = classicXref(b, 4, offB)
    val newX = classicXref(b, 4, offA, prev = oldX)
    assert(PdfExtract.text(finish(b, newX)) == "newest says me")
  }

  test("xref STREAM (W/Index rows) designates the active frame") {
    val b = new B
    b.add("%PDF-1.4\n")
    val offActive = b.add(contentObj(4, "stream xref pick"))
    skeleton(b)
    b.add(contentObj(4, "not this one"))
    // W [1 2 0]: rows of [type:1][offset:2]; Index [4 1] — one entry for obj 4
    val row = Array[Byte](1, ((offActive >> 8) & 0xff).toByte, (offActive & 0xff).toByte)
    val dict = s"<< /Type /XRef /Size 10 /W [1 2 0] /Index [4 1] /Length ${row.length} >>"
    val xAt = b.pos
    b.add(s"6 0 obj\n$dict\nstream\n")
    b.addRaw(row)
    b.add("\nendstream\nendobj\n")
    assert(PdfExtract.text(finish(b, xAt)) == "stream xref pick")
  }

  test("xref marks the duplicate num FREE: object deleted, no content stream") {
    val b = new B
    b.add("%PDF-1.4\n")
    skeleton(b)
    b.add(contentObj(4, "deleted one"))
    b.add(contentObj(4, "deleted two"))
    val x = classicXref(b, 4, 0, flag = 'f')
    val o = PdfExtract.outcome(finish(b, x))
    assert(o.error == "pdf_no_content_stream")
    assert(o.text == "")
  }

  test("corrupt startxref offset: scan fallback keeps the last frame") {
    val b = new B
    b.add("%PDF-1.4\n")
    skeleton(b)
    b.add(contentObj(4, "first"))
    b.add(contentObj(4, "last wins on corrupt xref"))
    b.add("startxref\n999999999\n%%EOF\n")
    assert(PdfExtract.text(b.bytes) == "last wins on corrupt xref")
  }

  test("single-frame documents never consult the xref (no regression)") {
    // a deliberately WRONG xref pointing at the catalog: harmless, because
    // preference only applies to duplicated nums
    val b = new B
    b.add("%PDF-1.4\n")
    skeleton(b)
    b.add(contentObj(4, "only version"))
    val x = classicXref(b, 4, 9)
    assert(PdfExtract.text(finish(b, x)) == "only version")
  }

  test("totality: hostile xref shapes never throw") {
    val cases = Seq(
      "startxref\n-5\n%%EOF", "startxref\nabc\n%%EOF", "startxref\n",
      "xref\n0 999999999\nstartxref\n9\n%%EOF")
    cases.foreach { junk =>
      val b = new B
      b.add("%PDF-1.4\n")
      skeleton(b)
      b.add(contentObj(4, "a"))
      b.add(contentObj(4, "b"))
      b.add(junk)
      PdfExtract.outcome(b.bytes) // must not throw
    }
  }
}
