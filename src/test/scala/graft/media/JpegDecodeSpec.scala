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

  test("out-of-scope shapes fall back to None (malformed progressive scan, 12-bit)") {
    val base = JpegEncode.flatGray(8, 8, 100)
    // a BASELINE stream relabeled SOF2 carries an Ss=0/Se=63 scan — illegal
    // in progressive (DC scans are DC-only, G.1.1.1.1) → rejected, not garbage
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

  test("progressive: DC successive approximation + EOB runs round-trip exactly") {
    for (v <- Seq(0, 77, 128, 131, 255)) {
      val dec = JpegDecode.decode(JpegEncode.progressiveFlat(24, 24, Array(v))).get
      assert(dec.width == 24 && dec.height == 24 && dec.channels == 1)
      assert(dec.samples.forall(b => (b & 0xff) == v), s"progressive flat $v not exact")
    }
  }

  test("progressive: 4-level DC refinement pushes real bits through every plane") {
    // dc = 8·(v−128): v−128 odd ⇒ bit 3 set, so Al=4 first pass loses real
    // bits that only the refinement scans can restore
    for (v <- Seq(117, 131, 255, 1)) {
      val dec = JpegDecode.decode(JpegEncode.progressiveFlat(16, 16, Array(v), dcAl = 4)).get
      assert(dec.samples.forall(b => (b & 0xff) == v), s"dcAl=4 flat $v not exact")
    }
  }

  test("progressive: 4:2:0 color with non-interleaved AC scans over padded grids") {
    // w=20, hY=2 ⇒ allocBW(Y)=4 ≠ bW(Y)=3: the AC block raster must use the
    // component raster inside the MCU-padded allocation
    val dec = JpegDecode.decode(JpegEncode.progressiveFlat(20, 12, Array(90, 120, 200))).get
    assert(dec.width == 20 && dec.height == 12 && dec.channels == 3)
    assert(dec.samples.grouped(3).forall(p =>
      (p(0) & 0xff) == 90 && (p(1) & 0xff) == 120 && (p(2) & 0xff) == 200))
  }

  test("progressive: truncation before the AC scans still renders the DC image") {
    val jpg = JpegEncode.progressiveFlat(16, 16, Array(77))
    // find the LAST SOS (the AC scan) and cut just before it
    val lastSos = jpg.indices.reverse
      .find(i => i + 1 < jpg.length && (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xda).get
    val dec = JpegDecode.decode(jpg.take(lastSos)).get
    assert(dec.samples.forall(b => (b & 0xff) == 77), "flat image is DC-complete")
    (1 until jpg.length by 3).foreach(n => JpegDecode.decode(jpg.take(n))) // never throws
  }

  test("progressive: AC refinement correction bits (hand-assembled scans)") {
    // one 8x8 block: AC first pass at Al=1 places coef k=1 value 1<<1, a
    // refinement scan at Al=0 adds the correction bit → final coefficient 3
    val out = new java.io.ByteArrayOutputStream()
    def m(x: Int): Unit = { out.write(0xff); out.write(x) }
    def u16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    m(0xd8); m(0xdb); u16(67); out.write(0); (0 until 64).foreach(_ => out.write(1))
    m(0xc2); u16(11); out.write(8); u16(8); u16(8); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    m(0xc4); u16(2 + 1 + 16 + 12); out.write(0x00)
    (1 to 16).foreach(l => out.write(if (l == 4) 12 else 0)); (0 until 12).foreach(out.write)
    // AC table: all 162 baseline symbols + EOBn at length 8 (canonical code = index)
    val acSyms = (0x00 +: (for (r <- 0 until 16; s <- 1 to 10) yield (r << 4) | s) :+ 0xF0) ++
      (1 to 14).map(_ << 4)
    m(0xc4); u16(2 + 1 + 16 + acSyms.length); out.write(0x10)
    (1 to 16).foreach(l => out.write(if (l == 8) acSyms.length else 0)); acSyms.foreach(out.write)
    var bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def putBits(v: Int, n: Int): Unit = (n - 1 to 0 by -1).foreach(k => bits += ((v >> k) & 1))
    def flushScan(): Unit = {
      while (bits.length % 8 != 0) bits += 1
      bits.grouped(8).foreach { g =>
        val byte = g.foldLeft(0)((a, b) => (a << 1) | b)
        out.write(byte)
        if (byte == 0xff) out.write(0x00) // entropy-stream byte stuffing
      }
      bits.clear()
    }
    m(0xda); u16(8); out.write(1); out.write(1); out.write(0x00) // DC first, Al=0
    out.write(0); out.write(0); out.write(0x00)
    putBits(0, 4) // category 0: diff 0
    flushScan()
    m(0xda); u16(8); out.write(1); out.write(1); out.write(0x00) // AC first, Ss=1 Se=63 Al=1
    out.write(1); out.write(63); out.write(0x01)
    putBits(acSyms.indexOf(0x01), 8); putBits(1, 1) // (r=0,s=1), value +1 → coef 1<<1
    putBits(acSyms.indexOf(0x00), 8)                // EOB0
    flushScan()
    m(0xda); u16(8); out.write(1); out.write(1); out.write(0x00) // AC refine, Ah=1 Al=0
    out.write(1); out.write(63); out.write(0x10)
    putBits(acSyms.indexOf(0x00), 8) // EOB0 → tail-refine existing coefs
    putBits(1, 1)                    // correction bit for coef k=1 → +1
    flushScan()
    m(0xd9)
    val dec = JpegDecode.decode(out.toByteArray).get
    // expected: dequantized F at zigzag index 1 (natural position 1) = 3
    val coef = new Array[Double](64)
    coef(1) = 3.0
    val px = JpegDecode.idct(coef)
    (0 until 64).foreach { i =>
      val want = Math.round(px(i) + 128.0).toInt.max(0).min(255)
      assert((dec.samples(i) & 0xff) == want, s"pixel $i")
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
