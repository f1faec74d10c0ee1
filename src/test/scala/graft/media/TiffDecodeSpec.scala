package graft.media

import org.scalatest.funsuite.AnyFunSuite

class TiffDecodeSpec extends AnyFunSuite {

  test("flat gray round-trips in both byte orders") {
    for (le <- Seq(true, false)) {
      val p = TiffDecode.decode(ImageEncode.tiffFlat(20, 10, Seq(97), le)).get
      assert(p.width == 20 && p.height == 10 && p.channels == 1, s"le=$le")
      assert(p.samples.forall(b => (b & 0xff) == 97), s"le=$le")
    }
  }

  test("RGB with offset-indirected BitsPerSample array") {
    val p = TiffDecode.decode(ImageEncode.tiffFlat(8, 8, Seq(10, 200, 77), littleEndian = true)).get
    assert(p.channels == 3)
    assert(p.samples.grouped(3).forall(px =>
      (px(0) & 0xff) == 10 && (px(1) & 0xff) == 200 && (px(2) & 0xff) == 77))
  }

  test("WhiteIsZero photometric inverts samples") {
    val p = TiffDecode.decode(
      ImageEncode.tiffFlat(8, 8, Seq(97), littleEndian = true, whiteIsZero = true)).get
    assert(p.samples.forall(b => (b & 0xff) == 255 - 97))
  }

  test("multi-strip layout: offset-indirected StripOffsets/ByteCounts") {
    val p = TiffDecode.decode(
      ImageEncode.tiffFlat(16, 10, Seq(42), littleEndian = false, rowsPerStrip = 3)).get
    assert(p.width == 16 && p.height == 10)
    assert(p.samples.forall(b => (b & 0xff) == 42))
  }

  test("out-of-scope variants fall to None (compression, 16-bit)") {
    val good = ImageEncode.tiffFlat(8, 8, Seq(1), littleEndian = true)
    // compression tag (259) is the 4th entry: value field at 8 + 2 + 3*12 + 8
    val compOff = 8 + 2 + 3 * 12 + 8
    val lzw = good.clone(); lzw(compOff) = 5 // LZW
    assert(TiffDecode.decode(lzw).isEmpty)
    val deep = good.clone()
    val bpsOff = 8 + 2 + 2 * 12 + 8
    deep(bpsOff) = 16 // 16 bits/sample
    assert(TiffDecode.decode(deep).isEmpty)
  }

  test("totality: truncation never throws; sniff dims still work on full files") {
    val good = ImageEncode.tiffFlat(16, 10, Seq(42), littleEndian = true)
    (0 until good.length by 3).foreach(n => TiffDecode.decode(good.take(n)))
    assert(MediaSniff.sniff(good) == MediaSniff.Info("tiff", 16, 10))
  }

  test("MediaSniff.features: flat TIFF yields exact means, zero variance") {
    val f = MediaSniff.features(ImageEncode.tiffFlat(16, 8, Seq(10, 200, 77), littleEndian = false))
    assert(f(0) == 10f && f(1) == 200f && f(2) == 77f)
    assert(f(4) == 0f && f(5) == 0f && f(6) == 0f)
  }
}
