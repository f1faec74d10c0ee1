package graft.media

import scala.util.control.NonFatal

/**
 * Pure-JVM baseline-JPEG decoder (ITU-T T.81) for the feature-extraction
 * path: marker walk → DQT/DHT/SOF0/SOS parse → Huffman entropy decode (with
 * 0xFF00 de-stuffing and RSTn restarts) → dequantize → de-zigzag → 2D IDCT →
 * level shift. Supports the shapes the pipeline needs real statistics for:
 * 8-bit baseline (SOF0), 1 component (grayscale) or 3 interleaved components
 * with ANY sampling factors 1-4 — incl. 4:2:0 / 4:2:2 chroma subsampling,
 * by far the most common web-JPEG layouts (per-component planes, MCU block
 * loops per T.81 A.2.3, nearest-neighbor chroma upsample; stored as Y/Cb/Cr
 * channels). Progressive (SOF2), arithmetic coding, and 12-bit precision
 * return None — the caller's declared-stub fallback handles those.
 *
 * Robustness for crawl data: a truncated scan decodes the MCUs present and
 * returns None only when nothing decodes; hostile dimensions are
 * allocation-guarded like PngDecode.
 */
object JpegDecode {

  /** 8-bit samples, row-major, channel-interleaved (gray: 1ch; color: Y,Cb,Cr). */
  final case class Pixels(width: Int, height: Int, channels: Int, samples: Array[Byte])

  /** Zigzag scan order (T.81 Figure A.6): scan position → row-major index. */
  private[media] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Orthonormal DCT-II basis: B(u)(x) = ½·C(u)·cos((2x+1)uπ/16). Rows are
    * orthonormal, so the same matrix serves forward and inverse transforms. */
  private[media] val Basis: Array[Double] = {
    val b = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        b(u * 8 + x) = 0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    b
  }

  /** 2D IDCT: coef (row-major F[v][u]) → spatial f[y][x], separable two-pass. */
  private[media] def idct(coef: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // tmp[v][x] = Σu B[u][x]·F[v][u]
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += Basis(u * 8 + x) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) { // f[y][x] = Σv B[v][y]·tmp[v][x]
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += Basis(vv * 8 + y) * tmp(vv * 8 + x); vv += 1 }
        out(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    out
  }

  /** 2D forward DCT (the encoder's half — same orthonormal basis). */
  private[media] def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // tmp[v][x] = Σy B[v][y]·f[y][x]
      var x = 0
      while (x < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += Basis(v * 8 + y) * block(y * 8 + x); y += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    val out = new Array[Double](64)
    var vv = 0
    while (vv < 8) { // F[v][u] = Σx B[u][x]·tmp[v][x]
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += Basis(u * 8 + x) * tmp(vv * 8 + x); x += 1 }
        out(vv * 8 + u) = s
        u += 1
      }
      vv += 1
    }
    out
  }

  /** Canonical Huffman table from a DHT segment's 16 counts + symbols
    * (T.81 Annex C): per-length min/max codes and a value pointer. */
  private final class Huff(counts: Array[Int], val symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** MSB-first bit reader over entropy-coded data: de-stuffs 0xFF00 and stops
    * (markerHit) at any real marker so a truncated scan terminates cleanly. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    var markerHit: Int = -1
    def nextBit(): Int = {
      if (markerHit >= 0) return 0
      if (bitCnt == 0) {
        if (pos >= b.length) { markerHit = 0xd9; return 0 }
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          val nxt = if (pos < b.length) b(pos) & 0xff else 0xd9
          if (nxt == 0x00) pos += 1
          else { markerHit = nxt; pos -= 1; return 0 }
        }
        bitBuf = v; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) { v = (v << 1) | nextBit(); k += 1 }
      v
    }
    def alignAndRestart(): Boolean = {
      // byte-align, then consume an RSTn marker if present
      bitCnt = 0
      markerHit = -1
      if (pos + 1 < b.length && (b(pos) & 0xff) == 0xff && ((b(pos + 1) & 0xf8) == 0xd0)) {
        pos += 2
        true
      } else false
    }
    def decode(h: Huff): Int = {
      var code = nextBit()
      var l = 1
      while (l <= 16 && (h.maxCode(l) < 0 || code > h.maxCode(l))) {
        code = (code << 1) | nextBit()
        l += 1
      }
      if (l > 16 || markerHit >= 0) -1
      else h.symbols(h.valPtr(l) + code - h.minCode(l))
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  def decode(b: Array[Byte]): Option[Pixels] = {
    try {
      if (b == null || b.length < 16) return None
      if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
      def u8(i: Int): Int = b(i) & 0xff
      def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)

      val quant = new Array[Array[Int]](4) // per-table, in ZIGZAG order (as stored)
      val dcTables = new Array[Huff](4)
      val acTables = new Array[Huff](4)
      var w = 0
      var h = 0
      var nComp = 0
      val compQ = new Array[Int](3) // quant table per component
      val compDc = new Array[Int](3)
      val compAc = new Array[Int](3)
      val compH = new Array[Int](3) // sampling factors (4:2:0 etc.)
      val compV = new Array[Int](3)
      var restartInterval = 0
      var scanAt = -1

      var i = 2
      while (scanAt < 0 && i + 4 <= b.length) {
        if (u8(i) != 0xff) i += 1
        else {
          val marker = u8(i + 1)
          if (marker == 0xff) i += 1 // fill byte
          else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2 // standalone
          else {
            val len = u16(i + 2)
            if (len < 2 || i + 2 + len > b.length) return None
            val seg = i + 4
            val segEnd = i + 2 + len
            marker match {
              case 0xdb => // DQT: one or more (PqTq, 64 values) tables
                var p = seg
                while (p < segEnd) {
                  val pq = u8(p) >> 4
                  val tq = u8(p) & 15
                  if (pq != 0 || tq > 3) return None // 16-bit tables: out of scope
                  if (p + 65 > segEnd) return None
                  val t = new Array[Int](64)
                  var k = 0
                  while (k < 64) { t(k) = u8(p + 1 + k); k += 1 }
                  quant(tq) = t
                  p += 65
                }
              case 0xc4 => // DHT: one or more (TcTh, 16 counts, symbols)
                var p = seg
                while (p + 17 <= segEnd) {
                  val tc = u8(p) >> 4
                  val th = u8(p) & 15
                  val counts = new Array[Int](16)
                  var total = 0
                  var k = 0
                  while (k < 16) { counts(k) = u8(p + 1 + k); total += counts(k); k += 1 }
                  if (th > 3 || total > 256 || p + 17 + total > segEnd) return None
                  val syms = new Array[Int](total)
                  k = 0
                  while (k < total) { syms(k) = u8(p + 17 + k); k += 1 }
                  val huff = new Huff(counts, syms)
                  if (tc == 0) dcTables(th) = huff else acTables(th) = huff
                  p += 17 + total
                }
              case 0xc0 | 0xc1 => // SOF0/1: baseline (extended-sequential shares the decode path)
                if (u8(seg) != 8) return None // 12-bit precision: out of scope
                h = u16(seg + 1); w = u16(seg + 3)
                nComp = u8(seg + 5)
                if (nComp != 1 && nComp != 3) return None
                var c = 0
                while (c < nComp) {
                  val hv = u8(seg + 7 + c * 3)
                  compH(c) = hv >> 4
                  compV(c) = hv & 15
                  if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 || compV(c) > 4) return None
                  compQ(c) = u8(seg + 8 + c * 3)
                  c += 1
                }
                if (nComp == 1) { compH(0) = 1; compV(0) = 1 } // single-component scans are non-interleaved: MCU = one data unit
              case 0xc2 =>
                return decodeProgressive(b) // SOF2: multi-scan path (own walk)
              case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
                return None // arithmetic / hierarchical / lossless: out of scope
              case 0xdd => restartInterval = u16(seg)
              case 0xda => // SOS
                val ns = u8(seg)
                if (ns != nComp) return None
                var c = 0
                while (c < ns) {
                  compDc(c) = u8(seg + 2 + c * 2) >> 4
                  compAc(c) = u8(seg + 2 + c * 2) & 15
                  c += 1
                }
                scanAt = segEnd
              case _ => () // APPn, COM, others: skip
            }
            i = segEnd
          }
        }
      }
      if (scanAt < 0 || w <= 0 || h <= 0 || nComp == 0) return None
      if (w > (1 << 14) || h > (1 << 14)) return None
      if (w.toLong * h * nComp > (1L << 28)) return None // hostile-dimension guard
      var c = 0
      while (c < nComp) {
        if (quant(compQ(c)) == null || dcTables(compDc(c)) == null || acTables(compAc(c)) == null)
          return None
        c += 1
      }

      // decode into per-component planes at each component's own resolution
      // (T.81 A.1.1: comp dims = ceil(dim·factor/maxFactor)), then upsample
      // nearest-neighbor at interleave time — 1×1-everywhere degenerates to
      // the old single-resolution path, 4:2:0/4:2:2 get real chroma decode
      var maxH = 1
      var maxV = 1
      var c0 = 0
      while (c0 < nComp) {
        if (compH(c0) > maxH) maxH = compH(c0)
        if (compV(c0) > maxV) maxV = compV(c0)
        c0 += 1
      }
      val cw = Array.tabulate(nComp)(c => (w * compH(c) + maxH - 1) / maxH)
      val chh = Array.tabulate(nComp)(c => (h * compV(c) + maxV - 1) / maxV)
      val planes = Array.tabulate(nComp)(c => new Array[Byte](cw(c) * chh(c)))
      val br = new BitReader(b, scanAt)
      val pred = new Array[Int](3)
      val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
      val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
      val coef = new Array[Double](64)
      var mcu = 0
      var my = 0
      var decodedAny = false
      var halted = false
      while (my < mcusY && !halted) {
        var mx = 0
        while (mx < mcusX && !halted) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            if (br.alignAndRestart()) java.util.Arrays.fill(pred, 0)
          }
          var ci = 0
          while (ci < nComp && !halted) {
            // compV×compH data units per component per MCU, raster order
            var by = 0
            while (by < compV(ci) && !halted) {
              var bx = 0
              while (bx < compH(ci) && !halted) {
                java.util.Arrays.fill(coef, 0.0)
                val q = quant(compQ(ci))
                val t = br.decode(dcTables(compDc(ci)))
                if (t < 0) halted = true
                else {
                  pred(ci) += extend(br.receive(t), t)
                  coef(0) = pred(ci).toDouble * q(0)
                  var k = 1
                  while (k < 64 && !halted) {
                    val rs = br.decode(acTables(compAc(ci)))
                    if (rs < 0) halted = true
                    else {
                      val r = rs >> 4
                      val s = rs & 15
                      if (s == 0) { if (r == 15) k += 16 else k = 64 } // ZRL | EOB
                      else {
                        k += r
                        if (k > 63) halted = true // corrupt run length
                        else {
                          coef(Zigzag(k)) = extend(br.receive(s), s).toDouble * q(k)
                          k += 1
                        }
                      }
                    }
                  }
                  if (!halted) {
                    val px = idct(coef)
                    val baseY = (my * compV(ci) + by) * 8
                    val baseX = (mx * compH(ci) + bx) * 8
                    var y = 0
                    while (y < 8) {
                      val py = baseY + y
                      if (py < chh(ci)) {
                        var x = 0
                        while (x < 8) {
                          val pxx = baseX + x
                          if (pxx < cw(ci)) {
                            val v = Math.round(px(y * 8 + x) + 128.0).toInt
                            planes(ci)(py * cw(ci) + pxx) =
                              (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                          }
                          x += 1
                        }
                      }
                      y += 1
                    }
                    decodedAny = true
                  }
                }
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
      if (!decodedAny) return None
      Some(interleave(w, h, nComp, compH, compV, maxH, maxV, cw, chh, planes))
    } catch { case NonFatal(_) => None }
  }

  /** Nearest-neighbor upsample of per-component planes into interleaved samples. */
  private def interleave(w: Int, h: Int, nComp: Int, compH: Array[Int], compV: Array[Int],
                         maxH: Int, maxV: Int, cw: Array[Int], chh: Array[Int],
                         planes: Array[Array[Byte]]): Pixels = {
    val samples = new Array[Byte](w * h * nComp)
    var py = 0
    while (py < h) {
      var px = 0
      while (px < w) {
        var ci = 0
        while (ci < nComp) {
          val sy = py * compV(ci) / maxV
          val sx = px * compH(ci) / maxH
          samples((py * w + px) * nComp + ci) = planes(ci)(sy * cw(ci) + sx)
          ci += 1
        }
        px += 1
      }
      py += 1
    }
    Pixels(w, h, nComp, samples)
  }

  /**
   * Progressive JPEG (SOF2, T.81 Annex G): coefficients accumulate across
   * scans in per-block zigzag-ordered buffers — DC first + refinement scans
   * (successive approximation), AC first scans with EOB runs, AC refinement
   * scans with correction bits — then ONE dequantize + IDCT pass at the end.
   * Interleaved DC scans walk MCUs; AC scans are per-component
   * non-interleaved (spec requires ns=1), indexed on the component's own
   * block raster inside the MCU-padded allocation grid. A truncated stream
   * renders whatever scans arrived — progressive's defining property.
   */
  private def decodeProgressive(b: Array[Byte]): Option[Pixels] = {
    try {
      def u8(i: Int): Int = b(i) & 0xff
      def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      val quant = new Array[Array[Int]](4)
      val dcTables = new Array[Huff](4)
      val acTables = new Array[Huff](4)
      var w = 0
      var h = 0
      var nComp = 0
      val compId = new Array[Int](3)
      val compQ = new Array[Int](3)
      val compH = new Array[Int](3)
      val compV = new Array[Int](3)
      var maxH = 1
      var maxV = 1
      var restartInterval = 0
      var mcusX = 0
      var mcusY = 0
      var allocBW: Array[Int] = null // blocks per row in the MCU-padded grid
      var bW: Array[Int] = null      // real block raster (ceil(compDim/8))
      var bH: Array[Int] = null
      var cw: Array[Int] = null
      var chh: Array[Int] = null
      var coefs: Array[Array[Int]] = null // per comp: allocBW*allocBH blocks × 64, zigzag order
      var sawScan = false

      var i = 2
      var eoi = false
      while (!eoi && i + 2 <= b.length) {
        if (u8(i) != 0xff) i += 1
        else {
          val marker = u8(i + 1)
          if (marker == 0xff) i += 1
          else if (marker == 0xd9) eoi = true
          else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) i += 2
          else if (i + 4 > b.length) eoi = true
          else {
            val len = u16(i + 2)
            if (len < 2 || i + 2 + len > b.length) return None
            val seg = i + 4
            val segEnd = i + 2 + len
            var nextI = segEnd
            marker match {
              case 0xdb =>
                var p = seg
                while (p < segEnd) {
                  val pq = u8(p) >> 4
                  val tq = u8(p) & 15
                  if (pq != 0 || tq > 3 || p + 65 > segEnd) return None
                  val t = new Array[Int](64)
                  var k = 0
                  while (k < 64) { t(k) = u8(p + 1 + k); k += 1 }
                  quant(tq) = t
                  p += 65
                }
              case 0xc4 =>
                var p = seg
                while (p + 17 <= segEnd) {
                  val tc = u8(p) >> 4
                  val th = u8(p) & 15
                  val counts = new Array[Int](16)
                  var total = 0
                  var k = 0
                  while (k < 16) { counts(k) = u8(p + 1 + k); total += counts(k); k += 1 }
                  if (th > 3 || total > 256 || p + 17 + total > segEnd) return None
                  val syms = new Array[Int](total)
                  k = 0
                  while (k < total) { syms(k) = u8(p + 17 + k); k += 1 }
                  val huff = new Huff(counts, syms)
                  if (tc == 0) dcTables(th) = huff else acTables(th) = huff
                  p += 17 + total
                }
              case 0xc2 =>
                if (u8(seg) != 8) return None
                h = u16(seg + 1); w = u16(seg + 3)
                nComp = u8(seg + 5)
                if (nComp != 1 && nComp != 3) return None
                if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
                var c = 0
                while (c < nComp) {
                  compId(c) = u8(seg + 6 + c * 3)
                  val hv = u8(seg + 7 + c * 3)
                  compH(c) = hv >> 4
                  compV(c) = hv & 15
                  if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 || compV(c) > 4) return None
                  compQ(c) = u8(seg + 8 + c * 3)
                  c += 1
                }
                if (nComp == 1) { compH(0) = 1; compV(0) = 1 }
                c = 0
                while (c < nComp) {
                  if (compH(c) > maxH) maxH = compH(c)
                  if (compV(c) > maxV) maxV = compV(c)
                  c += 1
                }
                mcusX = (w + 8 * maxH - 1) / (8 * maxH)
                mcusY = (h + 8 * maxV - 1) / (8 * maxV)
                cw = Array.tabulate(nComp)(c => (w * compH(c) + maxH - 1) / maxH)
                chh = Array.tabulate(nComp)(c => (h * compV(c) + maxV - 1) / maxV)
                bW = Array.tabulate(nComp)(c => (cw(c) + 7) / 8)
                bH = Array.tabulate(nComp)(c => (chh(c) + 7) / 8)
                allocBW = Array.tabulate(nComp)(c => mcusX * compH(c))
                val allocBH = Array.tabulate(nComp)(c => mcusY * compV(c))
                var total = 0L
                c = 0
                while (c < nComp) { total += allocBW(c).toLong * allocBH(c) * 64; c += 1 }
                if (total > (1L << 26)) return None // hostile-dimension guard
                coefs = Array.tabulate(nComp)(c => new Array[Int](allocBW(c) * allocBH(c) * 64))
              case 0xdd => restartInterval = u16(seg)
              case 0xda =>
                if (coefs == null) return None
                val ns = u8(seg)
                if (ns < 1 || ns > nComp) return None
                val scanComp = new Array[Int](ns)
                val scanDc = new Array[Int](ns)
                val scanAc = new Array[Int](ns)
                var s = 0
                while (s < ns) {
                  val id = u8(seg + 1 + s * 2)
                  var ci = 0
                  while (ci < nComp && compId(ci) != id) ci += 1
                  if (ci == nComp) return None
                  scanComp(s) = ci
                  scanDc(s) = u8(seg + 2 + s * 2) >> 4
                  scanAc(s) = u8(seg + 2 + s * 2) & 15
                  s += 1
                }
                val ss = u8(seg + 1 + ns * 2)
                val se = u8(seg + 2 + ns * 2)
                val ah = u8(seg + 3 + ns * 2) >> 4
                val al = u8(seg + 3 + ns * 2) & 15
                if (ss > 63 || se > 63 || se < ss) return None
                if (ss == 0 && se != 0) return None // progressive DC scans carry ONLY the DC band (G.1.1.1.1)
                if (ss > 0 && ns != 1) return None // AC scans are single-component
                val br = new BitReader(b, segEnd)
                decodeProgScan(b, br, coefs, scanComp, scanDc, scanAc, ss, se, ah, al,
                  dcTables, acTables, compH, compV, allocBW, bW, bH, mcusX, mcusY,
                  restartInterval)
                sawScan = true
                nextI = br.pos
              case _ => ()
            }
            i = nextI
          }
        }
      }
      if (!sawScan || coefs == null) return None
      // single dequantize + IDCT pass over every real block
      val planes = Array.tabulate(nComp)(c => new Array[Byte](cw(c) * chh(c)))
      val coef = new Array[Double](64)
      var ci = 0
      while (ci < nComp) {
        val q = quant(compQ(ci))
        if (q == null) return None
        var by = 0
        while (by < bH(ci)) {
          var bx = 0
          while (bx < bW(ci)) {
            val off = (by * allocBW(ci) + bx) * 64
            var k = 0
            while (k < 64) { coef(Zigzag(k)) = coefs(ci)(off + k).toDouble * q(k); k += 1 }
            val px = idct(coef)
            var y = 0
            while (y < 8) {
              val py = by * 8 + y
              if (py < chh(ci)) {
                var x = 0
                while (x < 8) {
                  val pxx = bx * 8 + x
                  if (pxx < cw(ci)) {
                    val v = Math.round(px(y * 8 + x) + 128.0).toInt
                    planes(ci)(py * cw(ci) + pxx) =
                      (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                  }
                  x += 1
                }
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      Some(interleave(w, h, nComp, compH, compV, maxH, maxV, cw, chh, planes))
    } catch { case NonFatal(_) => None }
  }

  /** One progressive scan's entropy decode, accumulating into `coefs`. */
  private def decodeProgScan(b: Array[Byte], br: BitReader, coefs: Array[Array[Int]],
                             scanComp: Array[Int], scanDc: Array[Int], scanAc: Array[Int],
                             ss: Int, se: Int, ah: Int, al: Int,
                             dcTables: Array[Huff], acTables: Array[Huff],
                             compH: Array[Int], compV: Array[Int],
                             allocBW: Array[Int], bW: Array[Int], bH: Array[Int],
                             mcusX: Int, mcusY: Int, restartInterval: Int): Unit = {
    val preds = new Array[Int](3)
    var eobrun = 0
    var halted = false

    def dcBlock(ci: Int, si: Int, off: Int): Unit = {
      val cf = coefs(ci)
      if (ah == 0) {
        val t = br.decode(dcTables(scanDc(si)))
        if (t < 0 || br.markerHit >= 0) { halted = true; return }
        preds(ci) += extend(br.receive(t), t)
        cf(off) = preds(ci) << al
      } else {
        if (br.nextBit() == 1) cf(off) |= (1 << al)
        if (br.markerHit >= 0) halted = true
      }
    }

    def acFirstBlock(ci: Int, si: Int, off: Int): Unit = {
      val cf = coefs(ci)
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se && !halted) {
        val rs = br.decode(acTables(scanAc(si)))
        if (rs < 0 || br.markerHit >= 0) { halted = true; return }
        val r = rs >> 4
        val s = rs & 15
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0) - 1
            return
          }
        } else {
          k += r
          if (k > se) { halted = true; return }
          cf(off + k) = extend(br.receive(s), s) << al
          k += 1
        }
      }
    }

    def acRefineBlock(ci: Int, si: Int, off: Int): Unit = {
      val cf = coefs(ci)
      val p1 = 1 << al
      var k = ss
      if (eobrun == 0) {
        var break = false
        while (k <= se && !break && !halted) {
          val rs = br.decode(acTables(scanAc(si)))
          if (rs < 0 || br.markerHit >= 0) { halted = true; return }
          var r = rs >> 4
          val s = rs & 15
          var newval = 0
          if (s == 0) {
            if (r < 15) {
              eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
              break = true // tail refinement below, then eobrun covers this block
            }
            // r == 15 (ZRL): skip 16 zero-history coefs, refining nonzeros passed
          } else {
            newval = if (br.nextBit() == 1) p1 else -p1
          }
          if (!break) {
            var placed = false
            while (k <= se && !placed && !halted) {
              if (cf(off + k) != 0) {
                if (br.nextBit() == 1 && (cf(off + k) & p1) == 0)
                  cf(off + k) += (if (cf(off + k) >= 0) p1 else -p1)
                if (br.markerHit >= 0) halted = true
              } else {
                if (r == 0) {
                  if (newval != 0) cf(off + k) = newval
                  placed = true
                }
                r -= 1
              }
              k += 1
            }
            if (!placed && newval != 0) halted = true // ran off the band
          }
        }
      }
      if (eobrun > 0 && !halted) {
        while (k <= se) {
          if (cf(off + k) != 0) {
            if (br.nextBit() == 1 && (cf(off + k) & p1) == 0)
              cf(off + k) += (if (cf(off + k) >= 0) p1 else -p1)
            if (br.markerHit >= 0) { halted = true; return }
          }
          k += 1
        }
        eobrun -= 1
      }
    }

    def unit(ci: Int, si: Int, blockIdx: Int): Unit = {
      val off = blockIdx * 64
      if (ss == 0) dcBlock(ci, si, off)
      else if (ah == 0) acFirstBlock(ci, si, off)
      else acRefineBlock(ci, si, off)
    }

    def restart(count: Int): Unit =
      if (restartInterval > 0 && count > 0 && count % restartInterval == 0) {
        if (br.alignAndRestart()) { java.util.Arrays.fill(preds, 0); eobrun = 0 }
      }

    if (scanComp.length == 1) {
      // ns=1 ⇒ non-interleaved (T.81 A.2.2): walk the component's own block raster
      val ci = scanComp(0)
      var blk = 0
      val total = bW(ci) * bH(ci)
      while (blk < total && !halted) {
        restart(blk)
        unit(ci, 0, (blk / bW(ci)) * allocBW(ci) + blk % bW(ci))
        blk += 1
      }
    } else {
      // interleaved MCU walk (DC scans over several components)
      var mcu = 0
      var my = 0
      while (my < mcusY && !halted) {
        var mx = 0
        while (mx < mcusX && !halted) {
          restart(mcu)
          var si = 0
          while (si < scanComp.length && !halted) {
            val ci = scanComp(si)
            var by = 0
            while (by < compV(ci) && !halted) {
              var bx = 0
              while (bx < compH(ci) && !halted) {
                unit(ci, si, (my * compV(ci) + by) * allocBW(ci) + (mx * compH(ci) + bx))
                bx += 1
              }
              by += 1
            }
            si += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    }
  }
}
