package graft.media

import org.scalatest.funsuite.AnyFunSuite

class BmpDecodeSpec extends AnyFunSuite {

  test("flat BMP round-trips exactly, including odd widths (row padding)") {
    for ((w, h) <- Seq((16, 8), (17, 9), (1, 1))) {
      val p = BmpDecode.decode(ImageEncode.bmpFlat(w, h, 10, 200, 77)).get
      assert(p.width == w && p.height == h && p.channels == 3)
      assert(p.samples.grouped(3).forall(px =>
        (px(0) & 0xff) == 10 && (px(1) & 0xff) == 200 && (px(2) & 0xff) == 77), s"$w x $h")
    }
  }

  test("bottom-up storage flips to top-down output; BGR becomes RGB") {
    // 1x2 image: TOP pixel red, BOTTOM pixel blue — stored bottom row first
    val header = ImageEncode.bmp(1, 2)
    val out = new java.io.ByteArrayOutputStream()
    out.write(header, 0, header.length)
    out.write(Array[Byte](255.toByte, 0, 0, 0))   // bottom row: BGR blue + pad
    out.write(Array[Byte](0, 0, 255.toByte, 0))   // top row: BGR red + pad
    val p = BmpDecode.decode(out.toByteArray).get
    assert((p.samples(0) & 0xff) == 255 && (p.samples(2) & 0xff) == 0, "top = red")
    assert((p.samples(3) & 0xff) == 0 && (p.samples(5) & 0xff) == 255, "bottom = blue")
  }

  test("out-of-scope variants fall back: RLE, 8-bit palette, core header") {
    val good = ImageEncode.bmpFlat(8, 8, 1, 2, 3)
    val rle = good.clone(); rle(30) = 1 // compression = BI_RLE8
    assert(BmpDecode.decode(rle).isEmpty)
    val pal = good.clone(); pal(28) = 8 // bpp = 8
    assert(BmpDecode.decode(pal).isEmpty)
  }

  test("totality: truncation never throws; header-only yields None") {
    val good = ImageEncode.bmpFlat(16, 8, 9, 9, 9)
    (0 until good.length by 3).foreach(n => BmpDecode.decode(good.take(n)))
    assert(BmpDecode.decode(ImageEncode.bmp(16, 8)).isEmpty)
  }

  test("MediaSniff.features: flat BMP yields exact channel means, zero variance") {
    val f = MediaSniff.features(ImageEncode.bmpFlat(16, 8, 10, 200, 77))
    assert(f(0) == 10f && f(1) == 200f && f(2) == 77f)
    assert(f(4) == 0f && f(5) == 0f && f(6) == 0f)
  }
}
