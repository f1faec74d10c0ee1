package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.CorpusGen
import graft.html.HtmlExtract

/** Totality under mutation (per-task timeout analog, SURVEY.md §4): extractors
  * must never throw or hang on corrupted payloads — one bad document must never
  * kill a 10^12-doc job (reference per-file catch, ocr_combined.py:219-230). */
class PdfFuzzSpec extends AnyFunSuite {

  private var z = 0xdeadbeefL
  private def next(): Long = { z ^= z << 13; z ^= z >>> 7; z ^= z << 17; z }

  private def mutate(b: Array[Byte], nFlips: Int): Array[Byte] = {
    val out = b.clone()
    (0 until nFlips).foreach { _ =>
      val pos = java.lang.Math.floorMod(next(), out.length.toLong).toInt
      out(pos) = (next() & 0xff).toByte
    }
    out
  }

  private def truncate(b: Array[Byte]): Array[Byte] = {
    val len = 1 + java.lang.Math.floorMod(next(), b.length.toLong).toInt
    java.util.Arrays.copyOf(b, len)
  }

  test("mutated PDFs: 2000 corrupted variants never throw, bounded time") {
    val pdfs = CorpusGen.corpus(300).filter(_.kind == "pdf").map(_.html)
    val t0 = System.nanoTime()
    (0 until 2000).foreach { i =>
      val base = pdfs(i % pdfs.size)
      val corrupted =
        if (i % 3 == 0) truncate(base)
        else mutate(base, 1 + (i % 20))
      PdfExtract.text(corrupted)
      PdfExtract.spans(corrupted)
      PdfExtract.preflight(corrupted)
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 60, f"fuzzing too slow: $sec%.1f s (possible quadratic path)")
  }

  test("mutated HTML: 2000 corrupted variants never throw, bounded time") {
    val htmls = CorpusGen.corpus(300).filter(_.kind == "html").map(_.html)
    val t0 = System.nanoTime()
    (0 until 2000).foreach { i =>
      val base = htmls(i % htmls.size)
      val corrupted =
        if (i % 3 == 0) truncate(base)
        else mutate(base, 1 + (i % 30))
      HtmlExtract.extract(corrupted)
      HtmlExtract.blocks(corrupted)
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 60, f"fuzzing too slow: $sec%.1f s")
  }

  test("pathological inputs: repeated markers, deep nesting, giant tokens") {
    // no quadratic blowup on adversarial shapes
    val repeatedObj = ("%PDF-1.4\n" + "1 0 obj\n<< /Length 3 >>\nstream\nxyz\nendstream\nendobj\n" * 500).getBytes
    PdfExtract.text(repeatedObj)
    val deepParens = ("%PDF-1.4\n1 0 obj\n<< /Length 2000 >>\nstream\nBT " + "(" * 1000 + ") Tj ET\nendstream\nendobj\n").getBytes
    PdfExtract.text(deepParens)
    val deepTags = ("<div>" * 5000 + "words here in the deep" + "</div>" * 5000).getBytes
    HtmlExtract.extract(deepTags)
    val giantWord = ("<p>" + "x" * 1000000 + "</p>").getBytes
    HtmlExtract.extract(giantWord)
    val manyEntities = ("<p>" + "&amp;" * 200000 + "</p>").getBytes
    HtmlExtract.extract(manyEntities)
    succeed
  }
}
