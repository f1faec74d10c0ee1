package graft.fixtures

import org.scalatest.funsuite.AnyFunSuite

import graft.html.HtmlExtract
import graft.pdf.PdfExtract

/** The by-construction golden check (FIXTURES.md): every fixture page's intended
  * main content must be reproduced byte-identically by the extractors. */
class FixtureTruthSpec extends AnyFunSuite {

  private val N = 600
  private lazy val corpus = CorpusGen.corpus(N)

  test("corpus mix covers all kinds") {
    val kinds = corpus.groupBy(_.kind).view.mapValues(_.size).toMap
    assert(kinds.keySet == Set("html", "pdf", "pre", "enc_pdf", "js_pdf", "junk"),
      s"kinds: $kinds")
    assert(kinds("html") > N / 3)
    assert(kinds("pdf") > N / 12)
  }

  test("hosts are zipfian: head host dominates") {
    val hosts = corpus.groupBy(p => p.url.split('/')(2)).view.mapValues(_.size).toMap
    val max = hosts.values.max
    val mean = hosts.values.sum.toDouble / hosts.size
    assert(max > 3 * mean, s"expected skew, got max=$max mean=$mean")
  }

  test("HTML pages extract byte-identically to intent") {
    corpus.filter(p => p.kind == "html" || p.kind == "pre").foreach { p =>
      val got = HtmlExtract.extract(p.html)
      assert(got == p.expected,
        s"${p.url}\n--- got ---\n$got\n--- want ---\n${p.expected}")
    }
  }

  test("PDF pages extract byte-identically to intent") {
    corpus.filter(_.kind == "pdf").foreach { p =>
      assert(PdfExtract.text(p.html) == p.expected, s"mismatch for ${p.url}")
    }
  }

  test("generation is deterministic: same (seed, idx) → same bytes") {
    (0 until 50).foreach { i =>
      val a = CorpusGen.page(i.toLong)
      val b = CorpusGen.page(i.toLong)
      assert(java.util.Arrays.equals(a.html, b.html) && a.url == b.url)
    }
  }

  test("adversarial kinds are flagged by preflight / payload shape") {
    corpus.filter(_.kind == "enc_pdf").foreach { p =>
      assert(PdfExtract.preflight(p.html).encrypted)
    }
    corpus.filter(_.kind == "js_pdf").foreach { p =>
      val pf = PdfExtract.preflight(p.html)
      assert(pf.suspicious && pf.issues.contains("suspicious_javascript") &&
        pf.issues.contains("suspicious_openaction"))
    }
    corpus.filter(_.kind == "junk").foreach { p =>
      assert(!PdfExtract.isPdfMagic(p.html))
      assert(p.html(0) == 'J'.toByte)
    }
  }
}
