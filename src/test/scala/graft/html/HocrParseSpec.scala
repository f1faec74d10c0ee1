package graft.html

import org.scalatest.funsuite.AnyFunSuite

import graft.pdf.PdfExtract.Span

/** hOCR word-span parser (reference ocr_combined.py:73-82 semantics). */
class HocrParseSpec extends AnyFunSuite {

  private def parse(html: String): IndexedSeq[Span] =
    HocrParse.spans(html.getBytes("UTF-8"))

  test("tesseract-shaped hOCR: words with bbox, page from ocr_page id") {
    val hocr =
      """<html><body>
        |<div class='ocr_page' id='page_1' title='image "x.png"; bbox 0 0 2480 3508; ppageno 0'>
        | <span class='ocr_line' id='line_1_1' title='bbox 100 80 900 120'>
        |  <span class='ocrx_word' id='word_1_1' title='bbox 100 80 220 120; x_wconf 96'>Hello</span>
        |  <span class='ocrx_word' id='word_1_2' title='bbox 240 80 400 120; x_wconf 93'>world</span>
        | </span>
        |</div>
        |<div class='ocr_page' id='page_2' title='bbox 0 0 2480 3508'>
        |  <span class='ocrx_word' id='word_2_1' title='bbox 10 20 30 40'>next</span>
        |</div>
        |</body></html>""".stripMargin
    val ss = parse(hocr)
    assert(ss == IndexedSeq(
      Span(1, 100, 80, 220, 120, "Hello"),
      Span(1, 240, 80, 400, 120, "world"),
      Span(2, 10, 20, 30, 40, "next")))
  }

  test("bounds guards: malformed bbox / missing title / missing page are skipped") {
    val hocr =
      """<div class='ocr_page' id='page_3'>
        |<span class='ocrx_word' title='bbox 1 2 3'>threecoords</span>
        |<span class='ocrx_word' title='bbox a b c d'>nonints</span>
        |<span class='ocrx_word'>notitle</span>
        |<span class='ocrx_word' title='textangle 0; bbox 1 2 3 4'>bboxnotfirst</span>
        |<span class='ocrx_word' title='bbox 5 6 7 8'>good</span>
        |</div>
        |<span class='ocrx_word' title='bbox 9 9 9 9'>orphan</span>""".stripMargin
    // orphan has no page ancestor and its parent (none) has no id → skipped
    assert(parse(hocr) == IndexedSeq(Span(3, 5, 6, 7, 8, "good")))
  }

  test("reference fallback: page from direct parent id's last underscore token") {
    val hocr =
      """<div id='sheet_7'>
        |<span class='ocrx_word' title='bbox 1 2 3 4'>w</span>
        |</div>""".stripMargin
    assert(parse(hocr) == IndexedSeq(Span(7, 1, 2, 3, 4, "w")))
  }

  test("class list matching is word-exact; nested markup and entities in words") {
    val hocr =
      """<div class='ocr_page' id='page_1'>
        |<span class='xocrx_words' title='bbox 0 0 1 1'>notaword</span>
        |<span class='ocr_line ocrx_word' title='bbox 1 1 2 2'>multi<strong>class</strong></span>
        |<span class='ocrx_word' title='bbox 2 2 3 3'>a&amp;b</span>
        |</div>""".stripMargin
    assert(parse(hocr) == IndexedSeq(
      Span(1, 1, 1, 2, 2, "multiclass"),
      Span(1, 2, 2, 3, 3, "a&b")))
  }

  test("totality: junk, truncated tags, empty input never throw") {
    assert(parse("") == IndexedSeq.empty)
    assert(parse("<span class='ocrx_word' title='bbox 1 2 3 4'>unclosed") == IndexedSeq.empty)
    assert(HocrParse.spans(Array[Byte](0x1f, -0x80, 0x00, 0x3c)) == IndexedSeq.empty)
    val deep = "<div id='page_1'>" + ("<span>" * 2000) +
      "<span class='ocrx_word' title='bbox 1 2 3 4'>deep</span>" + ("</span>" * 2000) + "</div>"
    assert(parse(deep) == IndexedSeq(Span(1, 1, 2, 3, 4, "deep")))
  }

  test("attr names inside OTHER attributes' quoted values do not shadow real attrs") {
    // the title value contains "id=9" — id must still resolve to page_1
    val hocr =
      """<div class="ocr_page" title="image id=9; bbox 0 0 100 100" id="page_1">
        |<span class='ocrx_word' title='bbox 1 2 3 4'>w</span>
        |</div>""".stripMargin
    assert(parse(hocr) == IndexedSeq(Span(1, 1, 2, 3, 4, "w")))
  }

  test("self-closed inner span and span-prefixed tag names do not derail nesting") {
    val hocr =
      """<div id='page_1'>
        |<span class='ocrx_word' title='bbox 0 0 1 1'><span/>hi</span>
        |<span class='ocrx_word' title='bbox 2 0 3 1'><spanner>x</spanner>world</span>
        |</div>""".stripMargin
    assert(parse(hocr) == IndexedSeq(
      Span(1, 0, 0, 1, 1, "hi"),
      Span(1, 2, 0, 3, 1, "xworld")))
  }

  test("negative coordinates parse (scanner skew can yield negatives)") {
    val hocr = "<div id='page_1'><span class='ocrx_word' title='bbox -5 -2 10 4'>neg</span></div>"
    assert(parse(hocr) == IndexedSeq(Span(1, -5, -2, 10, 4, "neg")))
  }
}
