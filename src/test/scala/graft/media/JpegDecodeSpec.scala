package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** Baseline-JPEG decode correctness. The encoder quantizes at q ≡ 1, so
  * decode(encode(img)) must match img up to DCT coefficient rounding — ±2
  * levels for arbitrary content, EXACT for flat blocks (DC-only). The IDCT is
  * additionally checked against an independent direct cosine-sum evaluation. */
class JpegDecodeSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int)(f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(i => f(i % w, i / w) & 0xff)

  private def maxAbsDiff(a: Array[Int], dec: JpegDecode.Pixels): Int =
    a.indices.map(i => math.abs(a(i) - (dec.samples(i) & 0xff))).max

  test("flat images round-trip EXACTLY at every level") {
    for (v <- Seq(0, 1, 37, 127, 128, 200, 254, 255)) {
      val img = Array.fill(16 * 16)(v)
      val dec = JpegDecode.decode(JpegEncode.gray(img, 16, 16)).get
      assert(dec.width == 16 && dec.height == 16 && dec.channels == 1)
      assert(dec.samples.forall(b => (b & 0xff) == v), s"flat $v not exact")
    }
  }

  test("gradients and textures round-trip within DCT rounding (±2)") {
    val cases = Seq(
      gradient(24, 16)((x, y) => x * 10 + y),
      gradient(16, 24)((x, y) => (x * x + 3 * y) % 256),
      gradient(32, 32)((x, y) => 128 + (if (((x / 4) + (y / 4)) % 2 == 0) 40 else -40)),
      gradient(8, 8)((x, y) => (x * 31 + y * 17) % 256))
    val dims = Seq((24, 16), (16, 24), (32, 32), (8, 8))
    cases.zip(dims).foreach { case (img, (w, h)) =>
      val dec = JpegDecode.decode(JpegEncode.gray(img, w, h)).get
      assert(dec.width == w && dec.height == h)
      val d = maxAbsDiff(img, dec)
      assert(d <= 2, s"${w}x$h max abs diff $d")
    }
  }

  test("IDCT matches an independent direct cosine-sum evaluation") {
    val rnd = new scala.util.Random(7)
    val coef = Array.fill(64)((rnd.nextInt(201) - 100).toDouble)
    val fast = JpegDecode.idct(coef)
    def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        s += 0.25 * c(u) * c(v) * coef(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16) * math.cos((2 * y + 1) * v * math.Pi / 16)
      assert(math.abs(s - fast(y * 8 + x)) < 1e-9, s"($x,$y)")
    }
  }

  test("fdct ∘ idct is identity (orthonormal basis)") {
    val rnd = new scala.util.Random(11)
    val block = Array.fill(64)(rnd.nextDouble() * 255 - 128)
    val rt = JpegDecode.idct(JpegDecode.fdct(block))
    block.indices.foreach(i => assert(math.abs(block(i) - rt(i)) < 1e-9))
  }

  test("non-multiple-of-8 dimensions clip edge blocks correctly") {
    val img = gradient(13, 11)((x, y) => 50 + x * 7 + y * 3)
    val dec = JpegDecode.decode(JpegEncode.gray(img, 13, 11)).get
    assert(dec.width == 13 && dec.height == 11)
    assert(dec.samples.length == 13 * 11)
    assert(maxAbsDiff(img, dec) <= 2)
  }

  test("restart markers: DC predictors reset per interval, bytes re-aligned") {
    val img = gradient(40, 8)((x, y) => (x * 6 + y) % 256) // 5 MCUs
    val plain = JpegDecode.decode(JpegEncode.gray(img, 40, 8)).get
    val rst = JpegDecode.decode(JpegEncode.gray(img, 40, 8, restartInterval = 2)).get
    assert(maxAbsDiff(img, rst) <= 2)
    assert(plain.samples.toSeq == rst.samples.toSeq,
      "restart-coded scan must decode identically to the plain scan")
  }

  test("0xFF byte stuffing in the entropy stream survives the round-trip") {
    // brute-force a set of images large/noisy enough that stuffed 0xFF bytes
    // appear in the scan; the decoder must de-stuff every one
    val rnd = new scala.util.Random(3)
    var sawStuffed = false
    (0 until 10).foreach { _ =>
      val img = Array.fill(32 * 32)(rnd.nextInt(256))
      val jpg = JpegEncode.gray(img, 32, 32)
      // count FF 00 pairs strictly inside the scan (after SOS at FFDA)
      val sos = jpg.indices.dropWhile(i => !(i + 1 < jpg.length &&
        (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xda)).head
      var i = sos + 2
      while (i + 1 < jpg.length) {
        if ((jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0x00) sawStuffed = true
        i += 1
      }
      val dec = JpegDecode.decode(jpg).get
      assert(maxAbsDiff(img, dec) <= 3) // pure noise: worst-case rounding
    }
    assert(sawStuffed, "test corpus never produced a stuffed byte — weaken RNG seed assumptions")
  }

  test("MediaSniff.features: flat JPEG yields exact mean and zero variance") {
    val f = MediaSniff.features(JpegEncode.flatGray(16, 16, 77))
    assert(f(0) == 77.0f)
    assert(f(4) == 0.0f)
    assert(f(1) == 0f && f(2) == 0f && f(3) == 0f && f(5) == 0f && f(6) == 0f && f(7) == 0f)
  }

  test("out-of-scope shapes fall back to None (progressive, 12-bit)") {
    val base = JpegEncode.flatGray(8, 8, 100)
    // progressive: rewrite SOF0 (FFC0) marker to SOF2 (FFC2)
    val prog = base.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(JpegDecode.decode(prog).isEmpty)
    // grayscale declaring 2x2 sampling (byte at sof+11 = component hv):
    // single-component scans are NON-interleaved (T.81), so the factors don't
    // change the MCU structure — this now decodes instead of stubbing out
    val sub = base.clone()
    assert((sub(sof + 11) & 0xff) == 0x11)
    sub(sof + 11) = 0x22.toByte
    val subDec = JpegDecode.decode(sub).get
    assert(subDec.samples.forall(b => (b & 0xff) == 100))
    // 12-bit precision
    val p12 = base.clone()
    p12(sof + 4) = 12.toByte
    assert(JpegDecode.decode(p12).isEmpty)
  }

  test("4:2:0 flat color round-trips exactly, including edge-clipped MCUs") {
    for ((w, h) <- Seq((16, 16), (20, 12), (17, 9), (8, 8))) {
      val dec = JpegDecode.decode(JpegEncode.flatColor(w, h, 90, 120, 200)).get
      assert(dec.width == w && dec.height == h && dec.channels == 3)
      var i = 0
      while (i < dec.samples.length) {
        assert((dec.samples(i) & 0xff) == 90, s"Y at $i ($w x $h)")
        assert((dec.samples(i + 1) & 0xff) == 120, s"Cb at $i")
        assert((dec.samples(i + 2) & 0xff) == 200, s"Cr at $i")
        i += 3
      }
    }
  }

  test("4:2:2 and 1x2 sampling layouts decode through the same MCU walk") {
    for ((hY, vY) <- Seq((2, 1), (1, 2), (1, 1))) {
      val dec = JpegDecode.decode(JpegEncode.flatColor(24, 16, 60, 110, 140, hY, vY)).get
      assert(dec.width == 24 && dec.height == 16 && dec.channels == 3, s"$hY x $vY")
      assert(dec.samples.grouped(3).forall(p =>
        (p(0) & 0xff) == 60 && (p(1) & 0xff) == 110 && (p(2) & 0xff) == 140), s"$hY x $vY")
    }
  }

  test("totality: truncated subsampled scans never throw") {
    val jpg = JpegEncode.flatColor(32, 32, 10, 20, 30)
    (1 until jpg.length by 5).foreach(n => JpegDecode.decode(jpg.take(n)))
  }

  test("totality: truncation and corruption never throw") {
    val jpg = JpegEncode.gray(gradient(24, 24)((x, y) => x * y % 256), 24, 24)
    (1 until jpg.length by 7).foreach { n =>
      JpegDecode.decode(jpg.take(n)) // must not throw
    }
    val rnd = new scala.util.Random(5)
    (0 until 500).foreach { _ =>
      val m = jpg.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      JpegDecode.decode(m) // must not throw
    }
    assert(JpegDecode.decode(Array.emptyByteArray).isEmpty)
    assert(JpegDecode.decode(Array.fill(100)(0xff.toByte)).isEmpty)
  }
}
