package graft.media

import org.scalatest.funsuite.AnyFunSuite

/**
 * VP8L decoder against independent bit-level encoders (WebpEncode writes
 * the public bitstream spec directly — no shared tables with the decoder).
 * The 1×1 anchor bytes are hand-derived in-comment, pinning BOTH sides to
 * the spec's bit layout, not merely to each other.
 */
class WebpDecodeSpec extends AnyFunSuite {

  private def rgba(p: WebpDecode.Pixels): Seq[(Int, Int, Int, Int)] =
    p.samples.grouped(4).map(q => ((q(0) & 0xff), (q(1) & 0xff), (q(2) & 0xff), (q(3) & 0xff))).toSeq

  test("hand-derived 1x1 anchor: exact encoder bytes AND their decode") {
    // VP8L payload, LSB-first bits: 0x2F; 14+14+1+3 zero bits (w=h=1, no
    // alpha, version 0) = four 0x00; then [transforms 0][cache 0][meta 0],
    // five simple codes g=5, r=3, b=7, a=255, d=0:
    //   1,0,1,<5:10100000> 1,0,1,<3:11000000> 1,0,1,<7:11100000>
    //   1,0,1,<255:11111111> 1,0,0,<0:0>
    // bytes: 104, 65, 7, 122, 208, 255, 0
    val payload = Array(0x2f, 0, 0, 0, 0, 104, 65, 7, 122, 208, 255, 0).map(_.toByte)
    val expect = ("RIFF".getBytes.toSeq :+ 24.toByte :+ 0.toByte :+ 0.toByte :+ 0.toByte) ++
      "WEBPVP8L".getBytes.toSeq ++ Seq(12.toByte, 0.toByte, 0.toByte, 0.toByte) ++ payload.toSeq
    val enc = WebpEncode.vp8lFlat(1, 1, r = 3, g = 5, b = 7)
    assert(enc.toSeq == expect)
    val p = WebpDecode.decode(enc).get
    assert(p.width == 1 && p.height == 1 && p.channels == 4)
    assert(rgba(p) == Seq((3, 5, 7, 255)))
  }

  test("flat image round-trips (simple 1-symbol codes, zero pixel bits)") {
    for ((r, g, b) <- Seq((0, 0, 0), (1, 0, 1), (200, 60, 120), (255, 255, 255))) {
      val p = WebpDecode.decode(WebpEncode.vp8lFlat(16, 8, r, g, b)).get
      assert(p.width == 16 && p.height == 8)
      assert(rgba(p).forall(_ == ((r, g, b, 255))), s"($r,$g,$b)")
    }
  }

  test("SUBTRACT_GREEN inverse restores the stored deltas") {
    val p = WebpDecode.decode(WebpEncode.vp8lSubGreenFlat(16, 8, r = 30, g = 200, b = 5)).get
    assert(rgba(p).forall(_ == ((30, 200, 5, 255))))
  }

  test("normal (code-length-coded) red code: column-parity stripes") {
    val p = WebpDecode.decode(WebpEncode.vp8lStripes(16, 8, rA = 40, rB = 45, g = 9, b = 200)).get
    rgba(p).zipWithIndex.foreach { case ((r, g, b, a), i) =>
      val want = if (i % 16 % 2 == 0) 40 else 45
      assert((r, g, b, a) == ((want, 9, 200, 255)), s"pixel $i")
    }
  }

  test("LZ77 copy through the distance plane map replicates row 0") {
    for (direct <- Seq(false, true)) {
      val p = WebpDecode.decode(
        WebpEncode.vp8lLz77Stripes(16, 8, rA = 10, rB = 250, g = 77, b = 3, direct = direct)).get
      rgba(p).zipWithIndex.foreach { case ((r, g, b, a), i) =>
        val want = if (i % 16 % 2 == 0) 10 else 250
        assert((r, g, b, a) == ((want, 77, 3, 255)), s"direct=$direct pixel $i")
      }
    }
  }

  test("color cache: one literal then cache hits everywhere") {
    for (bits <- Seq(1, 4, 11)) {
      val p = WebpDecode.decode(WebpEncode.vp8lCacheFlat(16, 8, 123, 45, 67, cacheBits = bits)).get
      assert(rgba(p).forall(_ == ((123, 45, 67, 255))), s"bits=$bits")
    }
  }

  test("PREDICTOR transform: mode-T sub-image + left-delta first row") {
    val p = WebpDecode.decode(
      WebpEncode.vp8lPredictorStripes(16, 8, rA = 100, rB = 105, g = 0, b = 255)).get
    rgba(p).zipWithIndex.foreach { case ((r, g, b, a), i) =>
      val want = if (i % 16 % 2 == 0) 100 else 105
      assert((r, g, b, a) == ((want, 0, 255, 255)), s"pixel $i")
    }
  }

  test("META prefix image: two tree groups split the canvas") {
    val p = WebpDecode.decode(WebpEncode.vp8lMetaHalves(16, 8, rA = 11, rB = 222, g = 1, b = 2)).get
    rgba(p).zipWithIndex.foreach { case ((r, g, b, a), i) =>
      val want = if (i % 16 < 8) 11 else 222
      assert((r, g, b, a) == ((want, 1, 2, 255)), s"pixel $i")
    }
  }

  test("COLOR_INDEXING with 1-bit pixel bundling: palette stripes") {
    val p = WebpDecode.decode(WebpEncode.vp8lPalettedStripes(16, 8, rA = 0, rB = 255, g = 128, b = 64)).get
    rgba(p).zipWithIndex.foreach { case ((r, g, b, a), i) =>
      val want = if (i % 16 % 2 == 0) 0 else 255
      assert((r, g, b, a) == ((want, 128, 64, 255)), s"pixel $i")
    }
  }

  test("cross-COLOR transform: green_to_red delta pre-compensated") {
    for ((t, g) <- Seq((0x35, 100), (0xd0, 200), (0x7f, 255))) { // +/- int8 deltas
      val p = WebpDecode.decode(WebpEncode.vp8lColorTransformFlat(16, 8, 90, g, 10, t = t)).get
      assert(rgba(p).forall(_ == ((90, g, 10, 255))), s"t=$t g=$g")
    }
  }

  test("odd width exercises bundling and stripe parity together") {
    // w=16 keeps builders' constraints; vary h instead and a 2x2 image
    val p = WebpDecode.decode(WebpEncode.vp8lStripes(2, 2, rA = 1, rB = 2, g = 3, b = 4)).get
    assert(rgba(p) == Seq((1, 3, 4, 255), (2, 3, 4, 255), (1, 3, 4, 255), (2, 3, 4, 255)))
  }

  test("dispatch: MediaSniff.features and dhash64 see VP8L images") {
    val f = MediaSniff.features(WebpEncode.vp8lFlat(16, 8, 10, 20, 30))
    assert(f(0) == 10.0f && f(1) == 20.0f && f(2) == 30.0f && f(3) == 255.0f)
    assert(f(4) == 0.0f && f(5) == 0.0f && f(6) == 0.0f && f(7) == 0.0f)
    assert(MediaSniff.dhash64(WebpEncode.vp8lFlat(16, 8, 10, 20, 30)).contains(0L))
    assert(MediaSniff.dhash64(WebpEncode.vp8lFlat(8, 8, 10, 20, 30)).isEmpty) // < 9 wide
  }

  test("total on hostile bytes: truncations, bit flips, random garbage") {
    val good = WebpEncode.vp8lLz77Stripes(16, 8, 10, 250, 77, 3)
    (0 until good.length).foreach { n =>
      WebpDecode.decode(good.take(n)) // must not throw or hang
    }
    val rnd = new scala.util.Random(42)
    (0 until 300).foreach { _ =>
      val junk = good.clone()
      junk(20 + rnd.nextInt(junk.length - 20)) = rnd.nextInt(256).toByte
      WebpDecode.decode(junk) // arbitrary corruption stays total
    }
    (0 until 100).foreach { _ =>
      val junk = new Array[Byte](64)
      rnd.nextBytes(junk)
      assert(WebpDecode.decode(junk).isEmpty)
    }
    assert(WebpDecode.decode(null).isEmpty)
    assert(WebpDecode.decode(Array[Byte]()).isEmpty)
    // header-only sniff fixture (no VP8L body bits) falls through cleanly
    assert(WebpDecode.decode(ImageEncode.webpVp8l(100, 60)).isEmpty)
    assert(WebpDecode.decode(ImageEncode.webpVp8x(100, 60)).isEmpty)
  }
}
