package graft.media

/**
 * Deterministic baseline-JPEG ENCODER (grayscale, 8-bit, SOF0) for fixtures
 * and oracles — the production decode path is JpegDecode; this exists so
 * specs and oracle queries can construct valid JPEGs whose decoded statistics
 * are statable in closed form (the same role PngDecode's in-query stored-
 * deflate PNG plays for q40). Quality is fixed at quantizer ≡ 1 (lossless up
 * to DCT rounding: a FLAT block round-trips exactly), and the Huffman tables
 * are self-consistent canonical tables written into DHT: 12 DC categories at
 * code length 4, all 162 AC run/size symbols at code length 8.
 */
object JpegEncode {

  // AC symbol order for the canonical length-8 table: EOB, all (run,size)
  // combos run-major, ZRL — the DHT segment and the encoder share this list
  private val AcSymbols: Array[Int] =
    (0x00 +: (for (r <- 0 until 16; s <- 1 to 10) yield (r << 4) | s) :+ 0xF0).toArray
  private val AcCode: Map[Int, Int] = AcSymbols.zipWithIndex.toMap

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def write(bits: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        buf = (buf << 1) | ((bits >> k) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        k -= 1
      }
    }
    def pad(): Unit = if (cnt > 0) write((1 << (8 - cnt)) - 1, 8 - cnt) // 1-fill
  }

  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode an 8-bit grayscale image (row-major, values 0..255). */
  def gray(pixels: Array[Int], w: Int, h: Int, restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h, "pixels must be w*h")
    val out = new java.io.ByteArrayOutputStream(256 + pixels.length / 4)
    def m(marker: Int): Unit = { out.write(0xff); out.write(marker) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xdb); u16(67); out.write(0x00) // DQT table 0, all-ones quantizer
    (0 until 64).foreach(_ => out.write(1))
    m(0xc0); u16(11) // SOF0: 8-bit, 1 component, 1x1 sampling
    out.write(8); u16(h); u16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    // DHT DC (class 0, id 0): 12 symbols (categories 0..11) at length 4
    m(0xc4); u16(2 + 1 + 16 + 12); out.write(0x00)
    (1 to 16).foreach(l => out.write(if (l == 4) 12 else 0))
    (0 until 12).foreach(out.write)
    // DHT AC (class 1, id 0): all 162 symbols at length 8
    m(0xc4); u16(2 + 1 + 16 + 162); out.write(0x10)
    (1 to 16).foreach(l => out.write(if (l == 8) 162 else 0))
    AcSymbols.foreach(out.write)
    if (restartInterval > 0) { m(0xdd); u16(4); u16(restartInterval) }
    m(0xda); u16(8) // SOS
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)

    val bw = new BitWriter(out)
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    var pred = 0
    var mcu = 0
    val block = new Array[Double](64)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.pad()
          m(0xd0 + ((mcu / restartInterval - 1) % 8))
          pred = 0
        }
        // edge blocks replicate the last row/column (standard padding)
        var y = 0
        while (y < 8) {
          val py = math.min(h - 1, my * 8 + y)
          var x = 0
          while (x < 8) {
            val px = math.min(w - 1, mx * 8 + x)
            block(y * 8 + x) = pixels(py * w + px).toDouble - 128.0
            x += 1
          }
          y += 1
        }
        val coef = JpegDecode.fdct(block)
        val qz = new Array[Int](64) // quantized, zigzag order (q ≡ 1)
        var k = 0
        while (k < 64) { qz(k) = Math.round(coef(JpegDecode.Zigzag(k))).toInt; k += 1 }
        // DC: category code (length 4, canonical code == category) + diff bits
        val diff = qz(0) - pred
        pred = qz(0)
        val t = category(diff)
        bw.write(t, 4)
        if (t > 0) bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        // AC: run-length of zeros in zigzag order; ZRL for runs >= 16; EOB
        var run = 0
        k = 1
        while (k < 64) {
          if (qz(k) == 0) run += 1
          else {
            while (run >= 16) { bw.write(AcCode(0xF0), 8); run -= 16 }
            // sizes cap at 10 (like the standard tables): a basis-aligned
            // amplitude-128 pattern can quantize to ±1024 — clamp to ±1023
            val v0 = qz(k)
            val v = if (v0 > 1023) 1023 else if (v0 < -1023) -1023 else v0
            val s = category(v)
            bw.write(AcCode((run << 4) | s), 8)
            bw.write(if (v < 0) v + (1 << s) - 1 else v, s)
            run = 0
          }
          k += 1
        }
        if (run > 0) bw.write(AcCode(0x00), 8) // EOB
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.pad()
    m(0xd9) // EOI
    out.toByteArray
  }

  /** Flat grayscale fixture: every pixel = value (decodes back exactly). */
  def flatGray(w: Int, h: Int, value: Int): Array[Byte] =
    gray(Array.fill(w * h)(value & 0xff), w, h)

  // progressive AC table: the baseline symbols plus EOBn (r<<4, r=1..14) —
  // EOB runs only exist in progressive scans
  private val AcSymbolsProg: Array[Int] = AcSymbols ++ (1 to 14).map(_ << 4)
  private val AcCodeProg: Map[Int, Int] = AcSymbolsProg.zipWithIndex.toMap

  /**
   * Progressive (SOF2) flat fixture, grayscale (`vals` length 1) or color
   * (length 3, luma sampled `hY`×`vY`): scan 1 = interleaved DC first pass at
   * Al=`dcAl`, then `dcAl` DC refinement scans (successive approximation,
   * one bit plane each — a flat block's DC is 8·(v−128), so dcAl=4 pushes
   * real 1-bits through the refinement path for odd v−128), then one AC
   * first-pass scan per component consisting entirely of EOB runs. Flat
   * blocks are DC-only, so every pixel decodes back exactly.
   */
  def progressiveFlat(w: Int, h: Int, vals: Array[Int], hY: Int = 2, vY: Int = 2,
                      dcAl: Int = 1): Array[Byte] = {
    val n = vals.length
    require(w > 0 && h > 0 && (n == 1 || n == 3))
    val fh = if (n == 1) Array(1) else Array(hY, 1, 1)
    val fv = if (n == 1) Array(1) else Array(vY, 1, 1)
    val maxHf = fh.max
    val maxVf = fv.max
    val out = new java.io.ByteArrayOutputStream(512)
    def m(marker: Int): Unit = { out.write(0xff); out.write(marker) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8)
    m(0xdb); u16(67); out.write(0x00)
    (0 until 64).foreach(_ => out.write(1))
    m(0xc2); u16(8 + 3 * n) // SOF2
    out.write(8); u16(h); u16(w); out.write(n)
    var c = 0
    while (c < n) {
      out.write(c + 1); out.write((fh(c) << 4) | fv(c)); out.write(0)
      c += 1
    }
    m(0xc4); u16(2 + 1 + 16 + 12); out.write(0x00)
    (1 to 16).foreach(l => out.write(if (l == 4) 12 else 0))
    (0 until 12).foreach(out.write)
    m(0xc4); u16(2 + 1 + 16 + AcSymbolsProg.length); out.write(0x10)
    (1 to 16).foreach(l => out.write(if (l == 8) AcSymbolsProg.length else 0))
    AcSymbolsProg.foreach(out.write)

    val mcusX = (w + 8 * maxHf - 1) / (8 * maxHf)
    val mcusY = (h + 8 * maxVf - 1) / (8 * maxVf)
    val dc = vals.map(v => 8 * ((v & 0xff) - 128))
    def sosHeader(compIdxs: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      m(0xda); u16(6 + 2 * compIdxs.length)
      out.write(compIdxs.length)
      compIdxs.foreach { ci => out.write(ci + 1); out.write(0x00) }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    def perMcuUnits(body: (Int, Boolean) => Unit): Unit = {
      // interleaved MCU walk: fh(ci)*fv(ci) data units per component per MCU
      val first = Array.fill(n)(true)
      var mcu = 0
      while (mcu < mcusX * mcusY) {
        var ci = 0
        while (ci < n) {
          var bk = 0
          while (bk < fh(ci) * fv(ci)) {
            body(ci, first(ci)); first(ci) = false
            bk += 1
          }
          ci += 1
        }
        mcu += 1
      }
    }
    // scan 1: DC first pass at Al=dcAl (diff of dc >> dcAl on each
    // component's first unit; two's complement makes shift+bit-OR exact)
    sosHeader(0 until n, 0, 0, 0, dcAl)
    var bw = new BitWriter(out)
    perMcuUnits { (ci, first) =>
      val diff = if (first) dc(ci) >> dcAl else 0
      val t = category(diff)
      bw.write(t, 4)
      if (t > 0) bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
    }
    bw.pad()
    // DC refinement scans: one bit plane per pass, Al = dcAl-1 .. 0
    var al = dcAl - 1
    while (al >= 0) {
      sosHeader(0 until n, 0, 0, al + 1, al)
      bw = new BitWriter(out)
      perMcuUnits { (ci, _) => bw.write((dc(ci) >> al) & 1, 1) }
      bw.pad()
      al -= 1
    }
    // per-component AC first pass: all-zero bands as pure EOB runs
    c = 0
    while (c < n) {
      val cwc = (w * fh(c) + maxHf - 1) / maxHf
      val chc = (h * fv(c) + maxVf - 1) / maxVf
      var blocks = ((cwc + 7) / 8) * ((chc + 7) / 8)
      sosHeader(Seq(c), 1, 63, 0, 0)
      bw = new BitWriter(out)
      while (blocks > 0) {
        var r = 0
        while ((1 << (r + 1)) <= blocks && r < 14) r += 1
        val run = math.min(blocks, (1 << (r + 1)) - 1)
        bw.write(AcCodeProg(r << 4), 8)
        if (r > 0) bw.write(run - (1 << r), r)
        blocks -= run
      }
      bw.pad()
      c += 1
    }
    m(0xd9)
    out.toByteArray
  }

  /** Flat-color SUBSAMPLED fixture (default 4:2:0 — luma `hY`×`vY`, chroma
    * 1×1): every pixel decodes to exactly (yv, cbv, crv) — a flat block is
    * DC-only under q ≡ 1, and flat chroma upsamples to itself, so the
    * closed-form oracle survives the subsampled path too. */
  def flatColor(w: Int, h: Int, yv: Int, cbv: Int, crv: Int,
                hY: Int = 2, vY: Int = 2): Array[Byte] = {
    require(w > 0 && h > 0 && hY >= 1 && hY <= 4 && vY >= 1 && vY <= 4)
    val out = new java.io.ByteArrayOutputStream(512)
    def m(marker: Int): Unit = { out.write(0xff); out.write(marker) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xdb); u16(67); out.write(0x00) // DQT table 0, all-ones quantizer
    (0 until 64).foreach(_ => out.write(1))
    m(0xc0); u16(8 + 3 * 3) // SOF0: 8-bit, 3 components, luma subsampled
    out.write(8); u16(h); u16(w); out.write(3)
    out.write(1); out.write((hY << 4) | vY); out.write(0)
    out.write(2); out.write(0x11); out.write(0)
    out.write(3); out.write(0x11); out.write(0)
    m(0xc4); u16(2 + 1 + 16 + 12); out.write(0x00) // DHT DC (as in gray)
    (1 to 16).foreach(l => out.write(if (l == 4) 12 else 0))
    (0 until 12).foreach(out.write)
    m(0xc4); u16(2 + 1 + 16 + 162); out.write(0x10) // DHT AC (as in gray)
    (1 to 16).foreach(l => out.write(if (l == 8) 162 else 0))
    AcSymbols.foreach(out.write)
    m(0xda); u16(6 + 2 * 3) // SOS: 3 components, shared tables
    out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x00)
    out.write(3); out.write(0x00)
    out.write(0); out.write(63); out.write(0)

    val bw = new BitWriter(out)
    val mcusX = (w + 8 * hY - 1) / (8 * hY)
    val mcusY = (h + 8 * vY - 1) / (8 * vY)
    val dc = Array(8 * (yv - 128), 8 * (cbv - 128), 8 * (crv - 128)) // flat block: DC-only
    val blocksPer = Array(hY * vY, 1, 1)
    val first = Array(true, true, true)
    def block(ci: Int): Unit = {
      val diff = if (first(ci)) { first(ci) = false; dc(ci) } else 0
      val t = category(diff)
      bw.write(t, 4)
      if (t > 0) bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      bw.write(AcCode(0x00), 8) // EOB
    }
    var mcu = 0
    while (mcu < mcusX * mcusY) {
      var ci = 0
      while (ci < 3) {
        var bk = 0
        while (bk < blocksPer(ci)) { block(ci); bk += 1 }
        ci += 1
      }
      mcu += 1
    }
    bw.pad()
    m(0xd9) // EOI
    out.toByteArray
  }
}
