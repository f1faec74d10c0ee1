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

  test("LZW strips round-trip, gray and RGB, both byte orders") {
    for (le <- Seq(true, false); s <- Seq(Seq(42), Seq(10, 200, 77))) {
      val p = TiffDecode.decode(
        ImageEncode.tiffFlat(17, 9, s, littleEndian = le, compression = 5)).get
      assert(p.width == 17 && p.height == 9 && p.channels == s.length, s"le=$le spp=${s.length}")
      assert(p.samples.grouped(s.length).forall(px =>
        px.zip(s).forall { case (b, v) => (b & 0xff) == v }), s"le=$le spp=${s.length}")
    }
  }

  test("LZW + horizontal-differencing predictor (tag 317 = 2) round-trips") {
    for (s <- Seq(Seq(42), Seq(10, 200, 77))) {
      val p = TiffDecode.decode(ImageEncode.tiffFlat(16, 8, s, littleEndian = true,
        compression = 5, predictor = 2)).get
      assert(p.samples.grouped(s.length).forall(px =>
        px.zip(s).forall { case (b, v) => (b & 0xff) == v }), s"spp=${s.length}")
    }
  }

  test("multi-strip LZW: each strip decompresses independently") {
    val p = TiffDecode.decode(ImageEncode.tiffFlat(16, 10, Seq(7, 8, 9),
      littleEndian = false, rowsPerStrip = 3, compression = 5, predictor = 2)).get
    assert(p.width == 16 && p.height == 10)
    assert(p.samples.grouped(3).forall(px =>
      (px(0) & 0xff) == 7 && (px(1) & 0xff) == 8 && (px(2) & 0xff) == 9))
  }

  test("LZW codec is the spec inverse across dict-growth boundaries") {
    // non-flat data: enough distinct pairs to push the dict past the 511
    // early-change boundary, locking encoder/decoder width agreement
    val data = Array.tabulate(40000)(i => ((i * 31 + i / 7) % 251).toByte)
    val round = graft.pdf.PdfExtract.lzwDecode(ImageEncode.lzwEncode(data))
    assert(java.util.Arrays.equals(round, data))
    val rle = Array.fill(10000)(9.toByte) // degenerate repeat data (KwKwK path)
    assert(java.util.Arrays.equals(graft.pdf.PdfExtract.lzwDecode(ImageEncode.lzwEncode(rle)), rle))
  }

  test("PackBits strips round-trip; encoder emits repeat and literal runs") {
    val p = TiffDecode.decode(ImageEncode.tiffFlat(17, 9, Seq(10, 200, 77),
      littleEndian = true, compression = 32773)).get
    assert(p.samples.grouped(3).forall(px =>
      (px(0) & 0xff) == 10 && (px(1) & 0xff) == 200 && (px(2) & 0xff) == 77))
    // the encoder must emit BOTH modes: literal segments for mixed bytes,
    // repeat runs (with 128-length splitting) for the long tail
    val mixed = Array[Byte](1, 2, 3, 3, 3, 3, 4, 5) ++ Array.fill(300)(6.toByte)
    val enc = ImageEncode.packBitsEncode(mixed)
    assert(enc.length < mixed.length / 4, "run coding must compress the repeat tail")
  }

  test("out-of-scope variants fall to None (JPEG compression, 16-bit)") {
    val good = ImageEncode.tiffFlat(8, 8, Seq(1), littleEndian = true)
    // compression tag (259) is the 4th entry: value field at 8 + 2 + 3*12 + 8
    val compOff = 8 + 2 + 3 * 12 + 8
    val jpegC = good.clone(); jpegC(compOff) = 7 // JPEG-in-TIFF
    assert(TiffDecode.decode(jpegC).isEmpty)
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

  test("totality: LZW/predictor/PackBits variants survive truncation and mutation") {
    val fixtures = Seq(
      ImageEncode.tiffFlat(16, 8, Seq(42), littleEndian = true, compression = 5),
      ImageEncode.tiffFlat(16, 8, Seq(1, 2, 3), littleEndian = false,
        compression = 5, predictor = 2, rowsPerStrip = 3),
      ImageEncode.tiffFlat(17, 9, Seq(7), littleEndian = true, compression = 32773))
    for (f <- fixtures) {
      (0 until f.length by 2).foreach(n => TiffDecode.decode(f.take(n))) // never throws/hangs
      var seed = 0x2545f4914f6cdd1dL
      for (_ <- 0 until 200) { // deterministic byte-flip fuzz
        seed = seed * 6364136223846793005L + 1442695040888963407L
        val m = f.clone()
        m((((seed >>> 33) % f.length).toInt + f.length) % f.length) = (seed & 0xff).toByte
        TiffDecode.decode(m)
      }
    }
  }

  test("hostile LZW expansion is capped at the plaintext size, no huge allocation") {
    // a highly-compressible plaintext: lzwEncode shrinks 1 MB of zeros ~500×;
    // decoding with a small maxOut must stop at the cap (±1 dict entry), not
    // materialize the full megabyte — the guard that keeps a crafted
    // compression=5 strip from forcing a multi-GB allocation
    val bomb = ImageEncode.lzwEncode(new Array[Byte](1 << 20))
    assert(bomb.length < (1 << 17), s"fixture not compressible: ${bomb.length}")
    val capped = graft.pdf.PdfExtract.lzwDecode(bomb, maxOut = 1024)
    assert(capped.length >= 1024 && capped.length <= 1024 + 4096, capped.length.toString)
    assert(capped.forall(_ == 0))
    // the uncapped default still round-trips real strips exactly
    val strip = Array.tabulate[Byte](4096)(i => (i % 251).toByte)
    assert(graft.pdf.PdfExtract.lzwDecode(ImageEncode.lzwEncode(strip)).toSeq == strip.toSeq)
  }

  test("MediaSniff.features: flat TIFF yields exact means, zero variance") {
    val f = MediaSniff.features(ImageEncode.tiffFlat(16, 8, Seq(10, 200, 77), littleEndian = false))
    assert(f(0) == 10f && f(1) == 200f && f(2) == 77f)
    assert(f(4) == 0f && f(5) == 0f && f(6) == 0f)
  }
}
