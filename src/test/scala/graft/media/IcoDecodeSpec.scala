package graft.media

import org.scalatest.funsuite.AnyFunSuite

class IcoDecodeSpec extends AnyFunSuite {

  private def rgba(p: IcoDecode.Pixels): Iterator[(Int, Int, Int, Int)] =
    p.samples.grouped(4).map(px => (px(0) & 0xff, px(1) & 0xff, px(2) & 0xff, px(3) & 0xff))

  test("24-bit DIB entry round-trips flat with an all-opaque AND mask") {
    for ((w, h) <- Seq((16, 16), (17, 9), (1, 1))) {
      val p = IcoDecode.decode(ImageEncode.icoBmp24Flat(w, h, 10, 200, 77)).get
      assert(p.width == w && p.height == h && p.channels == 4, s"$w x $h")
      assert(rgba(p).forall(_ == ((10, 200, 77, 255))), s"$w x $h")
    }
  }

  test("AND mask becomes the alpha channel: right half transparent") {
    val w = 16
    val p = IcoDecode.decode(ImageEncode.icoBmp24Masked(w, 8, 10, 200, 77)).get
    var i = 0
    rgba(p).foreach { case (r, g, b, a) =>
      assert((r, g, b) == ((10, 200, 77)))
      assert(a == (if (i % w < w / 2) 255 else 0), s"pixel $i")
      i += 1
    }
  }

  test("32-bit entry: alpha rides the XOR plane, not the AND mask") {
    val w = 16
    val p = IcoDecode.decode(ImageEncode.icoBmp32AlphaHalf(w, 8, 10, 200, 77)).get
    var i = 0
    rgba(p).foreach { case (r, g, b, a) =>
      assert((r, g, b) == ((10, 200, 77)))
      assert(a == (if (i % w < w / 2) 255 else 0), s"pixel $i")
      i += 1
    }
  }

  test("4-bit paletted entry resolves through the in-ICO palette") {
    val p = IcoDecode.decode(ImageEncode.icoPaletted4Flat(16, 16, 7, 10, 200, 77)).get
    assert(p.width == 16 && p.height == 16 && p.channels == 4)
    assert(rgba(p).forall(_ == ((10, 200, 77, 255))))
  }

  test("PNG entry delegates to PngDecode (modern high-res favicon layout)") {
    val p = IcoDecode.decode(ImageEncode.icoPngGrayFlat(16, 16, 123)).get
    assert(p.width == 16 && p.height == 16 && p.channels == 1)
    assert(p.samples.forall(s => (s & 0xff) == 123))
  }

  test("multi-entry directory: decode picks the largest entry") {
    val p = IcoDecode.decode(ImageEncode.icoMulti(16, 16, 10, 200, 77)).get
    assert(p.width == 16 && p.height == 16)
    assert(rgba(p).forall(_ == ((10, 200, 77, 255))))
  }

  test("sniff reports format ico with the largest directory entry's dims") {
    assert(MediaSniff.sniff(ImageEncode.icoBmp24Flat(16, 8, 1, 2, 3)) ==
      MediaSniff.Info("ico", 16, 8))
    assert(MediaSniff.sniff(ImageEncode.icoMulti(16, 16, 1, 2, 3)) ==
      MediaSniff.Info("ico", 16, 16))
  }

  test("media_features path: flat icon means are exact, alpha included") {
    val f = MediaSniff.features(ImageEncode.icoBmp24Masked(16, 8, 10, 200, 77))
    assert(f(0) == 10f && f(1) == 200f && f(2) == 77f)
    assert(f(3) == 127.5f)       // half opaque, half transparent
    assert(f(7) == 16256.25f)    // alpha variance = 127.5^2
    assert(f(4) == 0f && f(5) == 0f && f(6) == 0f)
  }

  test("total on hostile bytes: truncations, lying offsets, and garbage") {
    val good = ImageEncode.icoBmp24Flat(16, 16, 10, 200, 77)
    for (n <- 0 until good.length by 7)
      IcoDecode.decode(java.util.Arrays.copyOf(good, n)) // must not throw
    // entry offset far past the file
    val lying = good.clone()
    lying(21) = 0x7f // offset high byte
    assert(IcoDecode.decode(lying).isEmpty)
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val junk = new Array[Byte](4 + rnd.nextInt(300))
      rnd.nextBytes(junk)
      junk(0) = 0; junk(1) = 0; junk(2) = 1; junk(3) = 0 // force the ICO path
      IcoDecode.decode(junk) // must not throw
    }
  }

  test("truncated mask leaves the image opaque RGB rather than failing") {
    val full = ImageEncode.icoBmp24Flat(16, 8, 10, 200, 77)
    val maskBytes = 4 * 8 // ((16+31)/32)*4 per row × 8 rows
    val cut = java.util.Arrays.copyOf(full, full.length - maskBytes)
    val newSize = cut.length - 22 // payload starts after ICONDIR + 1 entry
    cut(14) = (newSize & 0xff).toByte // patch the directory's size field
    cut(15) = ((newSize >> 8) & 0xff).toByte
    val p = IcoDecode.decode(cut)
    assert(p.isDefined && p.get.channels == 3)
    assert(p.get.samples.grouped(3).forall(px =>
      (px(0) & 0xff) == 10 && (px(1) & 0xff) == 200 && (px(2) & 0xff) == 77))
  }
}
