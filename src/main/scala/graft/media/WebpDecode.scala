package graft.media

import scala.util.control.NonFatal

/**
 * WebP lossless (VP8L) decoder for the feature-extraction path — the web's
 * third image codec family after JPEG/PNG (~10% of crawled images). Built
 * from the public "WebP Lossless Bitstream Specification" (the format whose
 * entropy codes are carried IN the bitstream, so — unlike MP3/VP8-lossy,
 * whose codecs are fixed spec tables — it is implementable from the wire
 * format alone):
 *
 *  - LSB-first bit reader over the VP8L chunk payload (RIFF walk finds it)
 *  - prefix codes: "simple" (1-2 literal symbols, read-order code
 *    assignment) and "normal" (canonical codes from code lengths, which are
 *    themselves prefix-coded with the 19-symbol code-length code in the
 *    fixed kCodeLengthCodeOrder, 16/17/18 repeat symbols, optional
 *    max_symbol cap); canonical assignment is DEFLATE's — MSB of the code
 *    first on the wire, completeness (Kraft sum == 1) enforced
 *  - spatial coding: ARGB literals (green/red/blue/alpha trees), LZ77
 *    back-references (length/distance prefix values, the 120-entry
 *    close-neighborhood distance→(dx,dy) plane map, codes >120 direct),
 *    and the color cache (index = (0x1e35a7bd·argb) >>> (32−bits); every
 *    literal and copied pixel inserted, cache hits not re-inserted)
 *  - optional meta prefix image: per-block tree-group index from
 *    (red<<8|green) of the entropy sub-image
 *  - transforms, each at most once, inverse-applied in reverse read order
 *    at the width current when each was read: PREDICTOR (14 modes; (0,0)
 *    is opaque black, row 0 uses L, column 0 uses T, the last column's TR
 *    wraps to the current row's first pixel), COLOR (per-block
 *    green_to_red/green_to_blue/red_to_blue signed-8-bit deltas, t·c >> 5),
 *    SUBTRACT_GREEN, and COLOR_INDEXING (delta-coded palette, pixel
 *    bundling at ≤16 colors packs 2/4/8 indices per green byte, low bits
 *    first; out-of-range index decodes to transparent black)
 *
 * Output is interleaved RGBA (4 channels). Total on hostile bytes: the bit
 * reader throws on EOF (caught → None), every copy/index is bounds-checked,
 * dimensions and pixel counts are capped, and sub-image recursion depth is
 * structurally ≤ 2 (transform/meta/palette images cannot nest transforms).
 *
 * Reference behavior (what to extract, not how): the reference pipeline
 * shells out to image tooling for raster metadata (ocr-processor
 * processors/image_preflight.py:16-42); this build decodes in-JVM so the
 * 100 TB path needs no native sidecar.
 */
object WebpDecode {

  final case class Pixels(width: Int, height: Int, channels: Int, samples: Array[Byte])

  private final class Eof extends RuntimeException("vp8l: eof")

  /** LSB-first bit reader (VP8L bit order): bit n of the stream is bit
    * (n & 7) of byte (n >> 3). */
  private final class Bits(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bit = 0
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= end) throw new Eof
        v |= ((b(pos) >> bit) & 1) << i
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
  }

  /** A decoded prefix code. `single` ≥ 0 marks the 0-bit one-symbol code;
    * otherwise canonical: `count`/`first`/`syms` indexed by code length
    * 1..15, symbols in canonical order — except simple 2-symbol codes,
    * whose read-order assignment the spec mandates (symbols[0] ↦ code 0). */
  private final class Code(val single: Int, val count: Array[Int],
                           val first: Array[Int], val syms: Array[Array[Int]])

  private val MaxLen = 15

  private def oneSym(s: Int): Code = new Code(s, null, null, null)

  private def twoSym(s0: Int, s1: Int): Code = {
    val count = new Array[Int](MaxLen + 1)
    val first = new Array[Int](MaxLen + 1)
    val syms = new Array[Array[Int]](MaxLen + 1)
    count(1) = 2; first(1) = 0; syms(1) = Array(s0, s1) // read order, NOT sorted
    new Code(-1, count, first, syms)
  }

  /** Canonical code from per-symbol lengths; requires Kraft completeness
    * (hostile under/over-full codes fail); one nonzero length → 0-bit code. */
  private def buildCode(lengths: Array[Int]): Code = {
    var nz = 0
    var single = -1
    var maxLen = 0
    var s = 0
    while (s < lengths.length) {
      val l = lengths(s)
      if (l < 0 || l > MaxLen) throw new Eof
      if (l > 0) { nz += 1; single = s; if (l > maxLen) maxLen = l }
      s += 1
    }
    if (nz == 0) throw new Eof
    if (nz == 1) return oneSym(single)
    val count = new Array[Int](MaxLen + 1)
    s = 0
    while (s < lengths.length) { if (lengths(s) > 0) count(lengths(s)) += 1; s += 1 }
    // completeness: sum over lengths of 2^(maxLen - l) must fill 2^maxLen
    var space = 0L
    var l = 1
    while (l <= maxLen) { space += count(l).toLong << (maxLen - l); l += 1 }
    if (space != (1L << maxLen)) throw new Eof
    val first = new Array[Int](MaxLen + 1)
    var code = 0
    l = 1
    while (l <= MaxLen) { code = (code + (if (l >= 2) count(l - 1) else 0)) << 1; first(l) = code; l += 1 }
    val syms = new Array[Array[Int]](MaxLen + 1)
    val fill = new Array[Int](MaxLen + 1)
    l = 1
    while (l <= MaxLen) { if (count(l) > 0) syms(l) = new Array[Int](count(l)); l += 1 }
    s = 0
    while (s < lengths.length) { // ascending symbol order == canonical order
      val sl = lengths(s)
      if (sl > 0) { syms(sl)(fill(sl)) = s; fill(sl) += 1 }
      s += 1
    }
    new Code(-1, count, first, syms)
  }

  private def readSym(br: Bits, c: Code): Int = {
    if (c.single >= 0) return c.single
    var code = 0
    var len = 0
    while (len < MaxLen) {
      code = (code << 1) | br.read(1) // MSB of the canonical code arrives first
      len += 1
      val cnt = c.count(len)
      if (cnt > 0 && code >= c.first(len) && code < c.first(len) + cnt)
        return c.syms(len)(code - c.first(len))
    }
    throw new Eof
  }

  // spec order for code-length code lengths
  private val ClOrder = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 15, 7, 14, 8, 13, 9, 12, 10, 11)

  private def readCode(br: Bits, alphabet: Int): Code = {
    if (br.read(1) == 1) { // simple: 1-2 symbols stored literally
      val n = br.read(1) + 1
      val s0 = if (br.read(1) == 1) br.read(8) else br.read(1)
      if (s0 >= alphabet) throw new Eof
      if (n == 1) oneSym(s0)
      else {
        val s1 = br.read(8)
        if (s1 >= alphabet) throw new Eof
        twoSym(s0, s1)
      }
    } else {
      val numCl = br.read(4) + 4
      if (numCl > ClOrder.length) throw new Eof
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.read(3); i += 1 }
      val clCode = buildCode(clLens)
      val lengths = new Array[Int](alphabet)
      var budget = // max_symbol: cap on code-length tokens READ, not symbols filled
        if (br.read(1) == 1) { val nb = 2 + 2 * br.read(3); 2 + br.read(nb) } else alphabet
      var sym = 0
      var prev = 8 // spec default repeat length
      while (sym < alphabet && budget > 0) {
        budget -= 1
        val cl = readSym(br, clCode)
        if (cl < 16) {
          lengths(sym) = cl; sym += 1
          if (cl != 0) prev = cl
        } else {
          val (extra, base, v) =
            if (cl == 16) (2, 3, prev) else if (cl == 17) (3, 3, 0) else (7, 11, 0)
          val rep = base + br.read(extra)
          if (sym + rep > alphabet) throw new Eof
          var k = 0
          while (k < rep) { lengths(sym) = v; sym += 1; k += 1 }
        }
      }
      buildCode(lengths)
    }
  }

  /** LZ77 length/distance prefix decoding (value ≥ 1). */
  private def lz77Value(br: Bits, prefix: Int): Int =
    if (prefix < 4) prefix + 1
    else {
      val extra = (prefix - 2) >> 1
      if (extra > 30) throw new Eof
      val offset = (2 + (prefix & 1)) << extra
      offset + br.read(extra) + 1
    }

  /** Distance codes 1..120 map to a close 2-D neighborhood (dx, dy) — the
    * spec's distance-mapping list, transcribed; codes >120 are direct. */
  private val Plane: Array[Int] = { // packed (dy << 8) | (dx + 8)
    val t = Array(
      (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
      (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
      (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
      (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
      (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
      (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
      (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
      (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
      (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
      (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
      (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
      (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
      (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
      (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))
    t.map { case (dx, dy) => (dy << 8) | (dx + 8) }
  }

  private def planeToDist(code: Int, w: Int): Int =
    if (code > 120) code - 120
    else {
      val p = Plane(code - 1)
      val d = (p >> 8) * w + ((p & 0xff) - 8)
      if (d >= 1) d else 1
    }

  private def cacheHash(argb: Int, bits: Int): Int = (0x1e35a7bd * argb) >>> (32 - bits)

  private def sub(size: Int, bits: Int): Int = (size + (1 << bits) - 1) >> bits

  /** One transform as read: `w` is the image width current at read time
    * (the width its inverse applies at). */
  private final class Transform(val ttype: Int, val bits: Int, val w: Int,
                                val data: Array[Int], val tableSize: Int)

  /** Entropy-coded image stream (spec "decoding image data"): transforms
    * and the meta prefix image exist only at level 0. Returns the packed
    * pixel array plus, at level 0, the transform list and packed width. */
  private def decodeStream(br: Bits, xsize: Int, ysize: Int, level0: Boolean,
                           transformsOut: java.util.ArrayList[Transform]): Array[Int] = {
    var curW = xsize
    if (level0) {
      var seen = 0
      while (br.read(1) == 1) {
        val t = br.read(2)
        if ((seen & (1 << t)) != 0) throw new Eof // each transform at most once
        seen |= 1 << t
        t match {
          case 0 | 1 =>
            val bits = br.read(3) + 2
            val data = decodeStream(br, sub(curW, bits), sub(ysize, bits), level0 = false, null)
            transformsOut.add(new Transform(t, bits, curW, data, 0))
          case 2 =>
            transformsOut.add(new Transform(2, 0, curW, null, 0))
          case _ =>
            val n = br.read(8) + 1
            val pal = decodeStream(br, n, 1, level0 = false, null)
            var i = 1
            while (i < n) { pal(i) = addPixels(pal(i), pal(i - 1)); i += 1 } // delta-coded
            val xbits = if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
            transformsOut.add(new Transform(3, xbits, curW, pal, n))
            curW = sub(curW, xbits) // pixel bundling narrows everything downstream
        }
      }
    }
    val cacheBits = if (br.read(1) == 1) {
      val cb = br.read(4)
      if (cb < 1 || cb > 11) throw new Eof
      cb
    } else 0
    var metaData: Array[Int] = null
    var metaBits = 0
    var metaW = 0
    var numGroups = 1
    if (level0 && br.read(1) == 1) {
      metaBits = br.read(3) + 2
      metaW = sub(curW, metaBits)
      metaData = decodeStream(br, metaW, sub(ysize, metaBits), level0 = false, null)
      var i = 0
      var mx = 0
      while (i < metaData.length) { // group index = (red << 8) | green
        metaData(i) = (metaData(i) >> 8) & 0xffff
        if (metaData(i) > mx) mx = metaData(i)
        i += 1
      }
      numGroups = mx + 1
    }
    val greenAlpha = 256 + 24 + (if (cacheBits > 0) 1 << cacheBits else 0)
    val green = new Array[Code](numGroups)
    val red = new Array[Code](numGroups)
    val blue = new Array[Code](numGroups)
    val alpha = new Array[Code](numGroups)
    val dist = new Array[Code](numGroups)
    var gi = 0
    while (gi < numGroups) {
      green(gi) = readCode(br, greenAlpha)
      red(gi) = readCode(br, 256)
      blue(gi) = readCode(br, 256)
      alpha(gi) = readCode(br, 256)
      dist(gi) = readCode(br, 40)
      gi += 1
    }
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    val total = curW * ysize
    val out = new Array[Int](total)
    var pos = 0
    while (pos < total) {
      val g = if (metaData == null) 0
      else {
        val idx = metaData(((pos / curW) >> metaBits) * metaW + ((pos % curW) >> metaBits))
        if (idx >= numGroups) throw new Eof
        idx
      }
      val s = readSym(br, green(g))
      if (s < 256) {
        val r = readSym(br, red(g)) // stream order: green, red, blue, alpha
        val bl = readSym(br, blue(g))
        val a = readSym(br, alpha(g))
        val px = (a << 24) | (r << 16) | (s << 8) | bl
        out(pos) = px
        if (cache != null) cache(cacheHash(px, cacheBits)) = px
        pos += 1
      } else if (s < 280) {
        val len = lz77Value(br, s - 256)
        val d = planeToDist(lz77Value(br, readSym(br, dist(g))), curW)
        if (d > pos || len > total - pos) throw new Eof
        var k = 0
        while (k < len) {
          val px = out(pos - d)
          out(pos) = px
          if (cache != null) cache(cacheHash(px, cacheBits)) = px
          pos += 1
          k += 1
        }
      } else { // color cache reference (no re-insert)
        out(pos) = cache(s - 280)
        pos += 1
      }
    }
    out
  }

  private def addPixels(a: Int, b: Int): Int = // per-channel add mod 256
    ((((a >>> 24) + (b >>> 24)) & 0xff) << 24) |
      (((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16) |
      (((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8) |
      (((a & 0xff) + (b & 0xff)) & 0xff)

  private def avg2(a: Int, b: Int): Int =
    (((((a >>> 24) + (b >>> 24)) >> 1) & 0xff) << 24) |
      ((((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) >> 1) & 0xff) << 16) |
      ((((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) >> 1) & 0xff) << 8) |
      ((((a & 0xff) + (b & 0xff)) >> 1) & 0xff)

  /** Select(T, L, TL): T when Σ_c |L_c − TL_c| ≤ Σ_c |T_c − TL_c|, else L. */
  private def select(t: Int, l: Int, tl: Int): Int = {
    def ch(v: Int, s: Int): Int = (v >>> s) & 0xff
    var diff = 0
    var s = 0
    while (s < 32) {
      diff += math.abs(ch(l, s) - ch(tl, s)) - math.abs(ch(t, s) - ch(tl, s))
      s += 8
    }
    if (diff <= 0) t else l
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0
    var s = 0
    while (s < 32) {
      val v = clamp255(((l >>> s) & 0xff) + ((t >>> s) & 0xff) - ((tl >>> s) & 0xff))
      out |= v << s
      s += 8
    }
    out
  }

  private def clampAddSubHalf(l: Int, t: Int, tl: Int): Int = {
    var out = 0
    var s = 0
    while (s < 32) {
      val ave = (((l >>> s) & 0xff) + ((t >>> s) & 0xff)) >> 1
      val v = clamp255(ave + (ave - ((tl >>> s) & 0xff)) / 2) // C truncating divide
      out |= v << s
      s += 8
    }
    out
  }

  private def predictorInverse(img: Array[Int], w: Int, h: Int, tr: Transform): Unit = {
    val modes = tr.data
    val modesW = sub(w, tr.bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) img(i - 1) // row 0: L
          else if (x == 0) img(i - w) // column 0: T
          else {
            val mode = (modes((y >> tr.bits) * modesW + (x >> tr.bits)) >> 8) & 0xff
            if (mode > 13) throw new Eof
            val l = img(i - 1)
            val t = img(i - w)
            val tl = img(i - w - 1)
            val trr = img(i - w + 1) // last column: wraps to this row's first pixel
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => trr
              case 4 => tl
              case 5 => avg2(avg2(l, trr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, trr)
              case 10 => avg2(avg2(l, tl), avg2(t, trr))
              case 11 => select(t, l, tl)
              case 12 => clampAddSubFull(l, t, tl)
              case _ => clampAddSubHalf(l, t, tl)
            }
          }
        img(i) = addPixels(img(i), pred)
        x += 1
      }
      y += 1
    }
  }

  /** Cross-color inverse: deltas are signed 8-bit, t·c >> 5 arithmetic;
    * red updates first and the UPDATED red feeds red_to_blue. */
  private def colorInverse(img: Array[Int], w: Int, h: Int, tr: Transform): Unit = {
    val tw = sub(w, tr.bits)
    def delta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val ct = tr.data((y >> tr.bits) * tw + (x >> tr.bits))
        val g2r = ct & 0xff
        val g2b = (ct >> 8) & 0xff
        val r2b = (ct >> 16) & 0xff
        val px = img(i)
        val green = (px >> 8) & 0xff
        val newRed = (((px >> 16) & 0xff) + delta(g2r, green)) & 0xff
        var newBlue = (px & 0xff) + delta(g2b, green)
        newBlue = (newBlue + delta(r2b, newRed)) & 0xff
        img(i) = (px & 0xff00ff00) | (newRed << 16) | newBlue
        x += 1
      }
      y += 1
    }
  }

  private def subtractGreenInverse(img: Array[Int]): Unit = {
    var i = 0
    while (i < img.length) {
      val px = img(i)
      val g = (px >> 8) & 0xff
      img(i) = (px & 0xff00ff00) |
        (((((px >> 16) & 0xff) + g) & 0xff) << 16) | (((px & 0xff) + g) & 0xff)
      i += 1
    }
  }

  private def colorIndexInverse(packed: Array[Int], fullW: Int, h: Int, tr: Transform): Array[Int] = {
    val xbits = tr.bits
    val packedW = sub(fullW, xbits)
    val bpp = 8 >> xbits
    val mask = (1 << bpp) - 1
    val inByteMask = (1 << xbits) - 1
    val out = new Array[Int](fullW * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < fullW) {
        val g = (packed(y * packedW + (x >> xbits)) >> 8) & 0xff
        val idx = (g >> (bpp * (x & inByteMask))) & mask
        out(y * fullW + x) = if (idx < tr.tableSize) tr.data(idx) else 0 // OOR → transparent black
        x += 1
      }
      y += 1
    }
    out
  }

  /** RIFF walk to the VP8L chunk payload (chunks even-padded). */
  private def vp8lSpan(b: Array[Byte]): Option[(Int, Int)] = {
    def u32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    if (b.length < 20 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P') return None
    var pos = 12
    while (pos + 8 <= b.length) {
      val size = u32(pos + 4)
      val start = pos + 8
      if (size < 0 || size > b.length - start) return None
      if (b(pos) == 'V' && b(pos + 1) == 'P' && b(pos + 2) == '8' && b(pos + 3) == 'L')
        return Some((start, start + size.toInt))
      val next = start.toLong + size + (size & 1)
      if (next <= pos || next > Int.MaxValue) return None
      pos = next.toInt
    }
    None
  }

  def decode(b: Array[Byte]): Option[Pixels] = {
    try {
      val span = vp8lSpan(b).getOrElse(return None)
      val br = new Bits(b, span._1, span._2)
      if (br.read(8) != 0x2f) return None // signature
      val w = br.read(14) + 1
      val h = br.read(14) + 1
      br.read(1) // alpha-is-used hint
      if (br.read(3) != 0) return None // version
      if (w.toLong * h * 4 > (1L << 28)) return None
      val transforms = new java.util.ArrayList[Transform]()
      var img = decodeStream(br, w, h, level0 = true, transforms)
      var i = transforms.size() - 1
      while (i >= 0) { // inverses in reverse read order, each at its read-time width
        val tr = transforms.get(i)
        tr.ttype match {
          case 0 => predictorInverse(img, tr.w, h, tr)
          case 1 => colorInverse(img, tr.w, h, tr)
          case 2 => subtractGreenInverse(img)
          case _ => img = colorIndexInverse(img, tr.w, h, tr)
        }
        i -= 1
      }
      if (img.length != w * h) return None
      val samples = new Array[Byte](w * h * 4)
      i = 0
      while (i < img.length) {
        val px = img(i)
        samples(i * 4) = ((px >> 16) & 0xff).toByte
        samples(i * 4 + 1) = ((px >> 8) & 0xff).toByte
        samples(i * 4 + 2) = (px & 0xff).toByte
        samples(i * 4 + 3) = (px >>> 24).toByte
        i += 1
      }
      Some(Pixels(w, h, 4, samples))
    } catch { case NonFatal(_) => None }
  }
}
