package graft.media

import org.scalatest.funsuite.AnyFunSuite

class ImageSniffSpec extends AnyFunSuite {

  test("BMP: little-endian dims from BITMAPINFOHEADER; top-down height abs'd") {
    val i = MediaSniff.sniff(ImageEncode.bmp(640, 480))
    assert(i == MediaSniff.Info("bmp", 640, 480))
    // top-down BMP stores negative height
    val td = ImageEncode.bmp(640, -480)
    assert(MediaSniff.sniff(td) == MediaSniff.Info("bmp", 640, 480))
  }

  test("TIFF: both byte orders, SHORT width and LONG height entries") {
    assert(MediaSniff.sniff(ImageEncode.tiff(1234, 77, littleEndian = true)) ==
      MediaSniff.Info("tiff", 1234, 77))
    assert(MediaSniff.sniff(ImageEncode.tiff(1234, 70000, littleEndian = false)) ==
      MediaSniff.Info("tiff", 1234, 70000))
  }

  test("WebP: VP8X canvas, VP8 key frame, VP8L packed dims") {
    assert(MediaSniff.sniff(ImageEncode.webpVp8x(16384, 9000)) ==
      MediaSniff.Info("webp", 16384, 9000))
    assert(MediaSniff.sniff(ImageEncode.webpVp8(1920, 1080)) ==
      MediaSniff.Info("webp", 1920, 1080))
    assert(MediaSniff.sniff(ImageEncode.webpVp8l(4097, 3001)) ==
      MediaSniff.Info("webp", 4097, 3001))
  }

  test("AVIF/HEIF: ispe dims through meta/iprp/ipco; brand picks the format") {
    assert(MediaSniff.sniff(ImageEncode.avifIspe(800, 600)) ==
      MediaSniff.Info("avif", 800, 600))
    assert(MediaSniff.sniff(ImageEncode.avifIspe(320, 240, brand = "heic")) ==
      MediaSniff.Info("heif", 320, 240))
    // plain mp4 brand still reads mp4, no ispe walk
    assert(MediaSniff.sniff(AvEncode.mp4Video(64, 64, 1L, 1L)).format == "mp4")
  }

  test("SVG: width/height attrs (px or unit-less), viewBox fallback, html wins when first") {
    def s(x: String) = MediaSniff.sniff(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(s("""<svg width="24" height="16" xmlns="http://www.w3.org/2000/svg"/>""") ==
      MediaSniff.Info("svg", 24, 16))
    assert(s("""<?xml version="1.0"?><svg width="32px" height="32px"/>""") ==
      MediaSniff.Info("svg", 32, 32))
    assert(s("""<svg viewBox="0 0 48 36"/>""") == MediaSniff.Info("svg", 48, 36))
    assert(s("""<svg width="100%" height="100%" viewBox="0,0,12.5,10"/>""") ==
      MediaSniff.Info("svg", 13, 10)) // percent falls through to viewBox, rounded
    assert(s("""<svg/>""") == MediaSniff.Info("svg", -1, -1))
    assert(s("""<!DOCTYPE html><html><body><svg width="1" height="1"/></body>""").format == "html")
    assert(s("""<div>plain markup</div>""").format == "html")
    assert(s("""<svgfoo width="9" height="9"></svgfoo>""").format == "html") // custom element
    assert(s("""<svg
      width="5" height="5"/>""") == MediaSniff.Info("svg", 5, 5)) // newline ends the name
  }

  test("totality: truncations never throw, fall to -1 dims or other formats") {
    val fixtures = Seq(ImageEncode.bmp(10, 10), ImageEncode.tiff(10, 10, littleEndian = true),
      ImageEncode.tiff(10, 10, littleEndian = false), ImageEncode.webpVp8x(10, 10),
      ImageEncode.webpVp8(10, 10), ImageEncode.webpVp8l(10, 10),
      ImageEncode.avifIspe(10, 10), ImageEncode.icoBmp24Flat(10, 10, 1, 2, 3))
    for (f <- fixtures; n <- 0 until f.length) MediaSniff.sniff(f.take(n))
  }
}
