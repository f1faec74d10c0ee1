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

  test("paletted 1/4/8-bit: index resolves through the BGRA palette quads") {
    for (bpp <- Seq(1, 4, 8); (w, h) <- Seq((16, 8), (17, 9), (3, 1))) {
      val idx = if (bpp == 1) 1 else (1 << bpp) - 3
      val p = BmpDecode.decode(ImageEncode.bmpPalettedFlat(w, h, bpp, idx, 10, 200, 77)).get
      assert(p.width == w && p.height == h && p.channels == 3, s"bpp=$bpp $w x $h")
      assert(p.samples.grouped(3).forall(px =>
        (px(0) & 0xff) == 10 && (px(1) & 0xff) == 200 && (px(2) & 0xff) == 77),
        s"bpp=$bpp $w x $h")
    }
  }

  test("RLE8/RLE4: encoded runs, absolute mode, EOL/EOF escapes") {
    for ((w, h) <- Seq((16, 8), (300, 3), (17, 9))) { // >255 exercises run splitting
      val p8 = BmpDecode.decode(ImageEncode.bmpRle8Flat(w, h, 42, 10, 200, 77)).get
      assert(p8.width == w && p8.height == h)
      assert(p8.samples.grouped(3).forall(px =>
        (px(0) & 0xff) == 10 && (px(1) & 0xff) == 200 && (px(2) & 0xff) == 77), s"rle8 $w x $h")
      val p4 = BmpDecode.decode(ImageEncode.bmpRle4Flat(w, h, 7, 1, 2, 3)).get
      assert(p4.samples.grouped(3).forall(px =>
        (px(0) & 0xff) == 1 && (px(1) & 0xff) == 2 && (px(2) & 0xff) == 3), s"rle4 $w x $h")
    }
  }

  test("RLE delta escape skips pixels (left as zero), never loops") {
    // 4x2: delta (2, 1) from bottom-left jumps to top row x=2, then a run of 2
    val o = new java.io.ByteArrayOutputStream()
    val header = ImageEncode.bmpRle8Flat(4, 2, 5, 9, 9, 9).take(54 + 256 * 4)
    o.write(header.toArray, 0, header.length)
    o.write(Array[Byte](0, 2, 2, 1, 2, 5, 0, 1), 0, 8) // delta(2,1), run 2 of idx5, EOF
    val p = BmpDecode.decode(o.toByteArray).get
    assert((p.samples((0 * 4 + 2) * 3) & 0xff) == 9, "pixel after delta written")
    assert((p.samples(0) & 0xff) == 0, "skipped pixels stay zero")
  }

  test("out-of-scope variants fall back: RLE on wrong depth, 16-bit, core header") {
    val good = ImageEncode.bmpFlat(8, 8, 1, 2, 3)
    val rle = good.clone(); rle(30) = 1 // BI_RLE8 with bpp 24: invalid combo
    assert(BmpDecode.decode(rle).isEmpty)
    val sixteen = good.clone(); sixteen(28) = 16
    assert(BmpDecode.decode(sixteen).isEmpty)
  }

  test("totality: truncation never throws; header-only yields None") {
    val good = ImageEncode.bmpFlat(16, 8, 9, 9, 9)
    (0 until good.length by 3).foreach(n => BmpDecode.decode(good.take(n)))
    assert(BmpDecode.decode(ImageEncode.bmp(16, 8)).isEmpty)
  }

  test("RLE stream that decodes zero pixels falls to the sketch, not a black image") {
    // truncated right after the header/palette (no opcode bytes at all) and
    // an immediate EOF escape: neither writes a pixel, so claiming a decode
    // would fabricate an all-black image with confident mean/variance stats
    val full = ImageEncode.bmpRle8Flat(16, 8, 5, 1, 2, 3)
    val dataOff = (full(10) & 0xff) | ((full(11) & 0xff) << 8) |
      ((full(12) & 0xff) << 16) | ((full(13) & 0xff) << 24)
    assert(BmpDecode.decode(full.take(dataOff)).isEmpty)
    val eofOnly = full.take(dataOff) ++ Array[Byte](0, 1) // escape: end of bitmap
    assert(BmpDecode.decode(eofOnly).isEmpty)
    // one real run before EOF still decodes
    val oneRun = full.take(dataOff) ++ Array[Byte](3, 5, 0, 1)
    assert(BmpDecode.decode(oneRun).isDefined)
  }

  test("totality: paletted/RLE variants survive truncation and byte mutation") {
    val fixtures = Seq(
      ImageEncode.bmpPalettedFlat(16, 8, 8, 5, 1, 2, 3),
      ImageEncode.bmpPalettedFlat(17, 9, 4, 5, 1, 2, 3),
      ImageEncode.bmpRle8Flat(16, 8, 5, 1, 2, 3),
      ImageEncode.bmpRle4Flat(17, 9, 5, 1, 2, 3))
    for (f <- fixtures) {
      (0 until f.length by 2).foreach(n => BmpDecode.decode(f.take(n))) // never throws/hangs
      var seed = 0x9e3779b97f4a7c15L
      for (_ <- 0 until 200) { // deterministic byte-flip fuzz
        seed = seed * 6364136223846793005L + 1442695040888963407L
        val m = f.clone()
        m((((seed >>> 33) % f.length).toInt + f.length) % f.length) = (seed & 0xff).toByte
        BmpDecode.decode(m)
      }
    }
  }

  test("MediaSniff.features: flat BMP yields exact channel means, zero variance") {
    val f = MediaSniff.features(ImageEncode.bmpFlat(16, 8, 10, 200, 77))
    assert(f(0) == 10f && f(1) == 200f && f(2) == 77f)
    assert(f(4) == 0f && f(5) == 0f && f(6) == 0f)
  }
}
