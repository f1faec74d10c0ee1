package graft.media

import scala.collection.mutable.ArrayBuffer

/**
 * Minimal VP8L (WebP lossless) encoders for fixtures — the q40/q44/q66
 * pattern: payloads whose decoded statistics are closed-form, each variant
 * exercising a distinct decoder path (simple prefix codes; normal
 * code-length-coded codes; the SUBTRACT_GREEN, PREDICTOR and color-cache
 * machinery; LZ77 back-references through the distance plane map). Every
 * builder is an independent bit-level writer of the public bitstream spec,
 * NOT a call into the decoder's tables, so a round-trip is evidence.
 *
 * Fixture-scoped constraints (not spec limits): symbols in simple codes
 * ≤ 255 (spec stores them in 8 bits); normal-code lengths ≤ 3 via one fixed
 * complete code-length code {0:2, 1:2, 2:3, 3:3, 17:3, 18:3}.
 */
object WebpEncode {

  /** LSB-first bit writer (VP8L bit order). */
  final class BitWriter {
    private val buf = new ArrayBuffer[Byte]()
    private var acc = 0L
    private var n = 0
    def put(v: Int, bits: Int): Unit = {
      require(bits <= 24 && (v & ~((1 << bits) - 1)) == 0, s"value $v too wide for $bits bits")
      acc |= v.toLong << n
      n += bits
      while (n >= 8) { buf += (acc & 0xff).toByte; acc >>>= 8; n -= 8 }
    }
    /** code emitted MSB-first (canonical prefix-code wire order). */
    def putCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { put((code >> i) & 1, 1); i -= 1 }
    }
    def bytes: Array[Byte] = {
      val out = buf.toArray
      if (n > 0) out :+ (acc & 0xff).toByte else out
    }
  }

  private def header(bw: BitWriter, w: Int, h: Int): Unit = {
    bw.put(0x2f, 8)
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1) // alpha hint
    bw.put(0, 3) // version
  }

  /** Simple prefix code, 1 symbol (0 bits per read). */
  private def simple1(bw: BitWriter, sym: Int): Unit = {
    require(sym >= 0 && sym <= 255)
    bw.put(1, 1) // simple
    bw.put(0, 1) // num_symbols - 1
    if (sym > 1) { bw.put(1, 1); bw.put(sym, 8) } else { bw.put(0, 1); bw.put(sym, 1) }
  }

  /** Simple prefix code, 2 symbols: s0 ↦ bit 0, s1 ↦ bit 1 (read order). */
  private def simple2(bw: BitWriter, s0: Int, s1: Int): Unit = {
    require(s0 >= 0 && s0 <= 255 && s1 >= 0 && s1 <= 255 && s0 != s1)
    bw.put(1, 1); bw.put(1, 1)
    bw.put(1, 1); bw.put(s0, 8) // first symbol in 8 bits
    bw.put(s1, 8)
  }

  /** 1-or-2 distinct symbols ≤ 255 → simple code; returns sym → (code, len). */
  private def simpleFor(bw: BitWriter, syms: Seq[Int]): Map[Int, (Int, Int)] = {
    val d = syms.distinct
    d match {
      case Seq(s) => simple1(bw, s); Map(s -> ((0, 0)))
      case Seq(s0, s1) => simple2(bw, s0, s1); Map(s0 -> ((0, 1)), s1 -> ((1, 1)))
      case _ => throw new IllegalArgumentException("simpleFor wants 1-2 symbols")
    }
  }

  // fixed, Kraft-complete code-length code used by every normal code here:
  // lengths {0:2, 1:2, 2:3, 3:3, 17:3, 18:3} → canonical codes below.
  private val ClLens = Map(0 -> 2, 1 -> 2, 2 -> 3, 3 -> 3, 17 -> 3, 18 -> 3)
  private val ClCodes = Map(0 -> 0, 1 -> 1, 2 -> 4, 3 -> 5, 17 -> 6, 18 -> 7)

  /** Canonical (code, len) per symbol from lengths — DEFLATE assignment:
    * ascending (length, symbol), MSB first on the wire. */
  private def canonical(lens: Map[Int, Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var prevLen = 0
    lens.toSeq.sortBy { case (s, l) => (l, s) }.map { case (s, l) =>
      code <<= (l - prevLen)
      prevLen = l
      val out = s -> ((code, l))
      code += 1
      out
    }.toMap
  }

  /** Normal prefix code over `alphabet` with the given symbol lengths
    * (1..3, Kraft-complete): code-length tokens with 17/18 zero-runs and a
    * max_symbol cap ending the description right after the last nonzero. */
  private def writeNormal(bw: BitWriter, lens: Map[Int, Int], alphabet: Int): Map[Int, (Int, Int)] = {
    require(lens.nonEmpty && lens.valuesIterator.forall(l => l >= 1 && l <= 3))
    require(lens.keysIterator.forall(s => s >= 0 && s < alphabet))
    require(lens.valuesIterator.map(l => 1.0 / (1 << l)).sum == 1.0, "Kraft-incomplete code")
    bw.put(0, 1) // not simple
    bw.put(2, 4) // num_code_lengths = 6: order prefix [17, 18, 0, 1, 2, 3]
    Seq(17, 18, 0, 1, 2, 3).foreach(s => bw.put(ClLens(s), 3))
    // tokens: (clSym, extraBits, extraVal)
    val tokens = ArrayBuffer[(Int, Int, Int)]()
    var pos = 0
    lens.toSeq.sortBy(_._1).foreach { case (sym, len) =>
      var gap = sym - pos
      while (gap > 0) {
        if (gap >= 11) { val r = math.min(gap, 138); tokens += ((18, 7, r - 11)); gap -= r }
        else if (gap >= 3) { tokens += ((17, 3, gap - 3)); gap = 0 }
        else { tokens += ((0, 0, 0)); gap -= 1 }
      }
      tokens += ((len, 0, 0))
      pos = sym + 1
    }
    require(tokens.length >= 2 && tokens.length <= 257)
    bw.put(1, 1) // use max_symbol
    bw.put(3, 3) // length_nbits = 2 + 2*3 = 8
    bw.put(tokens.length - 2, 8)
    tokens.foreach { case (s, eb, ev) =>
      bw.putCode(ClCodes(s), ClLens(s))
      if (eb > 0) bw.put(ev, eb)
    }
    canonical(lens)
  }

  /** LZ77 prefix for value v ≥ 1 → (prefixCode, extraBits, extraVal). */
  private def lz77Prefix(v: Int): (Int, Int, Int) = {
    require(v >= 1)
    if (v <= 4) (v - 1, 0, 0)
    else {
      var p = 4
      while (p < 40) {
        val e = (p - 2) >> 1
        val lo = ((2 + (p & 1)) << e) + 1
        val hi = lo + (1 << e) - 1
        if (v >= lo && v <= hi) return (p, e, v - lo)
        p += 1
      }
      throw new IllegalArgumentException(s"lz77 value $v out of range")
    }
  }

  private def wrap(bw: BitWriter): Array[Byte] = ImageEncode.webpContainer("VP8L", bw.bytes)

  /** Flat (r, g, b, 255): five 1-symbol codes, zero bits per pixel. */
  def vp8lFlat(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val bw = new BitWriter
    header(bw, w, h)
    bw.put(0, 1) // no transforms
    bw.put(0, 1) // no color cache
    bw.put(0, 1) // no meta prefix
    simple1(bw, g); simple1(bw, r); simple1(bw, b); simple1(bw, 255); simple1(bw, 0)
    wrap(bw)
  }

  /** Flat via SUBTRACT_GREEN: stores (r−g, b−g) mod 256; decodes to (r, g, b). */
  def vp8lSubGreenFlat(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val bw = new BitWriter
    header(bw, w, h)
    bw.put(1, 1); bw.put(2, 2) // transform: SUBTRACT_GREEN (no payload)
    bw.put(0, 1) // end transforms
    bw.put(0, 1); bw.put(0, 1)
    simple1(bw, g); simple1(bw, (r - g) & 0xff); simple1(bw, (b - g) & 0xff)
    simple1(bw, 255); simple1(bw, 0)
    wrap(bw)
  }

  /** Column-parity stripes on red (rA even x, rB odd x), green/blue/alpha
    * flat — red is a NORMAL 2-symbol code, so the code-length-code path is
    * under the closed-form oracle, 1 bit per pixel. */
  def vp8lStripes(w: Int, h: Int, rA: Int, rB: Int, g: Int, b: Int): Array[Byte] = {
    require(rA != rB)
    val bw = new BitWriter
    header(bw, w, h)
    bw.put(0, 1); bw.put(0, 1); bw.put(0, 1)
    simple1(bw, g)
    val redC = writeNormal(bw, Map(rA -> 1, rB -> 1), 256)
    simple1(bw, b); simple1(bw, 255); simple1(bw, 0)
    var i = 0
    while (i < w * h) {
      val (c, l) = redC(if (i % w % 2 == 0) rA else rB)
      bw.putCode(c, l)
      i += 1
    }
    wrap(bw)
  }

  /** Row 0 as red stripes, rows 1..h−1 as ONE LZ77 copy (length (h−1)·w,
    * distance = w): exercises length/distance prefix values and — per
    * `direct` — either the neighborhood plane map (distance code 1 →
    * (0, 1)) or a direct distance code (120 + w). */
  def vp8lLz77Stripes(w: Int, h: Int, rA: Int, rB: Int, g: Int, b: Int,
                      direct: Boolean = false): Array[Byte] = {
    require(h >= 2 && rA != rB)
    val bw = new BitWriter
    header(bw, w, h)
    bw.put(0, 1); bw.put(0, 1); bw.put(0, 1)
    val len = (h - 1) * w
    val (lp, le, lv) = lz77Prefix(len)
    val greenC = writeNormal(bw, Map(g -> 1, (256 + lp) -> 1), 256 + 24)
    val redC = simpleFor(bw, Seq(rA, rB))
    simple1(bw, b); simple1(bw, 255)
    val (dp, de, dv) = if (direct) lz77Prefix(120 + w) else (0, 0, 0)
    simple1(bw, dp) // plane: value 1 → (0, 1) → dist = w; direct: 120+w → w
    var x = 0
    while (x < w) { // row 0 literals: green sym + red bit
      val (gc, gl) = greenC(g)
      bw.putCode(gc, gl)
      val (rc, rl) = redC(if (x % 2 == 0) rA else rB)
      bw.putCode(rc, rl)
      x += 1
    }
    val (lc, ll) = greenC(256 + lp)
    bw.putCode(lc, ll)
    if (le > 0) bw.put(lv, le)
    if (de > 0) bw.put(dv, de) // distance symbol itself is a 0-bit code
    wrap(bw)
  }

  /** Left/right halves through the META PREFIX image: two tree groups (red
    * rA / rB), group index from the (red<<8|green) of a coarse sub-image —
    * all five codes in both groups are 1-symbol, so pixels cost 0 bits. */
  def vp8lMetaHalves(w: Int, h: Int, rA: Int, rB: Int, g: Int, b: Int): Array[Byte] = {
    val metaBits = 2
    val bs = 1 << metaBits
    require(w % (2 * bs) == 0 && rA != rB, "width must split into whole blocks")
    val bw = new BitWriter
    header(bw, w, h)
    bw.put(0, 1) // no transforms
    bw.put(0, 1) // no color cache
    bw.put(1, 1); bw.put(metaBits - 2, 3) // meta prefix image
    val metaW = (w + bs - 1) >> metaBits
    val metaH = (h + bs - 1) >> metaBits
    // meta sub-image (level0=false): no cache; group idx in GREEN channel
    bw.put(0, 1)
    val gC = simpleFor(bw, Seq(0, 1))
    simple1(bw, 0); simple1(bw, 0); simple1(bw, 0); simple1(bw, 0)
    var i = 0
    while (i < metaW * metaH) {
      val (c, l) = gC(if (i % metaW < metaW / 2) 0 else 1)
      bw.putCode(c, l)
      i += 1
    }
    // two groups of five codes
    Seq(rA, rB).foreach { r =>
      simple1(bw, g); simple1(bw, r); simple1(bw, b); simple1(bw, 255); simple1(bw, 0)
    }
    wrap(bw)
  }

  /** Column-parity stripes through COLOR_INDEXING with pixel bundling: a
    * 2-entry delta-coded palette, 8 one-bit indices per green byte (0xAA),
    * packed width ⌈w/8⌉ — exercises palette decode, delta accumulation,
    * and bundled index extraction. */
  def vp8lPalettedStripes(w: Int, h: Int, rA: Int, rB: Int, g: Int, b: Int): Array[Byte] = {
    require(w % 8 == 0 && rA != rB)
    val bw = new BitWriter
    header(bw, w, h)
    bw.put(1, 1); bw.put(3, 2) // transform: COLOR_INDEXING
    bw.put(1, 8) // color_table_size − 1 = 1 → two colors, xbits = 3
    // palette sub-image 2×1 (level0=false): first entry absolute, second delta
    bw.put(0, 1) // no cache
    val dR = (rB - rA) & 0xff
    val gC = simpleFor(bw, Seq(g, 0))
    val rC = simpleFor(bw, Seq(rA, dR))
    val bC = simpleFor(bw, Seq(b, 0))
    val aC = simpleFor(bw, Seq(255, 0))
    simple1(bw, 0) // distance
    def px(gs: Int, rs: Int, bs2: Int, as: Int): Unit = {
      val (gc, gl) = gC(gs); bw.putCode(gc, gl)
      val (rc, rl) = rC(rs); bw.putCode(rc, rl)
      val (bc, bl) = bC(bs2); bw.putCode(bc, bl)
      val (ac, al) = aC(as); bw.putCode(ac, al)
    }
    px(g, rA, b, 255) // palette[0] = (255, rA, g, b)
    px(0, dR, 0, 0)   // palette[1] − palette[0]
    bw.put(0, 1) // end transforms
    bw.put(0, 1); bw.put(0, 1) // no cache, no meta (main stream)
    // packed image ⌈w/8⌉×h: every green byte 0xAA = indices 0,1,0,1,… (low bits first)
    simple1(bw, 0xaa); simple1(bw, 0); simple1(bw, 0); simple1(bw, 0); simple1(bw, 0)
    wrap(bw)
  }

  /** Flat (r, g, b) through the cross-COLOR transform: one transform
    * element with green_to_red = `t`; the stored red pre-compensates the
    * decoder's (int8(t)·int8(green)) >> 5 delta. */
  def vp8lColorTransformFlat(w: Int, h: Int, r: Int, g: Int, b: Int,
                             t: Int = 0x35): Array[Byte] = {
    require(w <= 16 && h <= 16)
    val bw = new BitWriter
    header(bw, w, h)
    bw.put(1, 1); bw.put(1, 2) // transform: COLOR
    bw.put(2, 3) // size_bits − 2 = 2 → 16×16 blocks → 1×1 element image
    // element sub-image: g2r sits in the BLUE channel
    bw.put(0, 1)
    simple1(bw, 0); simple1(bw, 0); simple1(bw, t & 0xff); simple1(bw, 0); simple1(bw, 0)
    bw.put(0, 1) // end transforms
    bw.put(0, 1); bw.put(0, 1)
    val delta = (t.toByte * g.toByte) >> 5
    val storedRed = (r - delta) & 0xff
    simple1(bw, g); simple1(bw, storedRed); simple1(bw, b); simple1(bw, 255); simple1(bw, 0)
    wrap(bw)
  }

  /** Flat color via the color cache: one literal, then w·h−1 cache hits
    * (index = (0x1e35a7bd·argb) >>> (32−bits), spec hash). */
  def vp8lCacheFlat(w: Int, h: Int, r: Int, g: Int, b: Int, cacheBits: Int = 4): Array[Byte] = {
    require(cacheBits >= 1 && cacheBits <= 11)
    val argb = 0xff000000 | (r << 16) | (g << 8) | b
    val idx = (0x1e35a7bd * argb) >>> (32 - cacheBits)
    val bw = new BitWriter
    header(bw, w, h)
    bw.put(0, 1) // no transforms
    bw.put(1, 1); bw.put(cacheBits, 4) // color cache
    bw.put(0, 1) // no meta prefix
    val cacheSym = 256 + 24 + idx
    val greenC = writeNormal(bw, Map(g -> 1, cacheSym -> 1), 256 + 24 + (1 << cacheBits))
    simple1(bw, r); simple1(bw, b); simple1(bw, 255); simple1(bw, 0)
    val (gc, gl) = greenC(g)
    bw.putCode(gc, gl) // first pixel literal (red/blue/alpha are 0-bit codes)
    val (cc, cl) = greenC(cacheSym)
    var i = 1
    while (i < w * h) { bw.putCode(cc, cl); i += 1 }
    wrap(bw)
  }

  /** Stripes through the PREDICTOR transform: a 1×1 mode sub-image selects
    * mode 2 (T); row 0 carries the stripes as left-delta residuals, every
    * other row is all-zero residual — exercises sub-image decode, the
    * implicit L/black edge rules, and mod-256 residual addition.
    * Needs rA, rB, and their mod-256 deltas pairwise distinct and nonzero. */
  def vp8lPredictorStripes(w: Int, h: Int, rA: Int, rB: Int, g: Int, b: Int): Array[Byte] = {
    require(w <= 16 && h <= 16 && h >= 2 && w >= 2)
    val d1 = (rB - rA) & 0xff
    val d2 = (rA - rB) & 0xff
    require(Seq(rA, d1, d2, 0).distinct.size == 4, "need 4 distinct red residuals")
    val bw = new BitWriter
    header(bw, w, h)
    bw.put(1, 1); bw.put(0, 2) // transform: PREDICTOR
    bw.put(2, 3) // size_bits − 2 = 2 → 16×16 blocks → 1×1 mode image
    // mode sub-image stream (level0=false): no cache; 5 codes; 0 pixel bits
    bw.put(0, 1)
    simple1(bw, 2) // mode 2 = T, stored in green
    simple1(bw, 0); simple1(bw, 0); simple1(bw, 0); simple1(bw, 0)
    bw.put(0, 1) // end transforms
    bw.put(0, 1); bw.put(0, 1) // no cache, no meta
    val greenC = simpleFor(bw, Seq(g, 0)) // (0,0) literal g, then zero residuals
    val redC = writeNormal(bw, Map(0 -> 1, d1 -> 2, d2 -> 3, rA -> 3), 256)
    val blueC = simpleFor(bw, Seq(b, 0))
    simple1(bw, 0) // alpha residual: (0,0) is 255−black(255) = 0, rest 0
    simple1(bw, 0) // distance (unused)
    def emit(m: Map[Int, (Int, Int)], s: Int): Unit = { val (c, l) = m(s); bw.putCode(c, l) }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (y == 0 && x == 0) { emit(greenC, g); emit(redC, rA); emit(blueC, b) }
        else if (y == 0) { // pred = L: red delta alternates, green/blue zero
          emit(greenC, 0); emit(redC, if (x % 2 == 1) d1 else d2); emit(blueC, 0)
        } else { emit(greenC, 0); emit(redC, 0); emit(blueC, 0) }
        x += 1
      }
      y += 1
    }
    wrap(bw)
  }
}
