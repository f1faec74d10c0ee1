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

  test("totality: truncations never throw, fall to -1 dims or other formats") {
    val fixtures = Seq(ImageEncode.bmp(10, 10), ImageEncode.tiff(10, 10, littleEndian = true),
      ImageEncode.tiff(10, 10, littleEndian = false), ImageEncode.webpVp8x(10, 10),
      ImageEncode.webpVp8(10, 10), ImageEncode.webpVp8l(10, 10))
    for (f <- fixtures; n <- 0 until f.length) MediaSniff.sniff(f.take(n))
  }
}
