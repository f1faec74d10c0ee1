package graft.media

import scala.util.control.NonFatal

/**
 * ICO (favicon) decoder for the feature-extraction path. Favicons are the
 * one image family a web crawl sees for essentially EVERY host, and the
 * format is a thin directory over codecs this build already owns: an
 * ICONDIR of 16-byte entries, each pointing at either a complete PNG or a
 * BMP-style DIB with its height field doubled (XOR color plane + 1-bpp AND
 * transparency mask, both bottom-up, no BITMAPFILEHEADER).
 *
 * Decode picks the LARGEST directory entry (what a pipeline would extract
 * as "the" icon), then:
 *  - PNG payload (0x89 'P' 'N' 'G') → `PngDecode` unchanged;
 *  - DIB payload → a 14-byte BITMAPFILEHEADER is synthesized around it
 *    (height halved, pixel offset = header + palette) so `BmpDecode`'s
 *    palette/stride/bottom-up logic stays the single implementation — then
 *    transparency is attached as a 4th channel: from the XOR plane's alpha
 *    byte when the entry is 32-bit (the modern layout; the AND mask is
 *    vestigial there), else from the AND mask (1 = transparent). A
 *    truncated/absent mask leaves the image opaque RGB rather than failing
 *    the decode.
 *
 * Total on hostile bytes: entry offsets/sizes validated against the file,
 * dimensions capped, height must be even/positive, compression must be
 * BI_RGB (ICO's DIBs are never RLE), and any thrown bounds/EOF lands in
 * None.
 *
 * Reference behavior (what to extract, not how): the reference pipeline
 * shells out to image tooling for raster metadata (ocr-processor
 * processors/image_preflight.py:16-42); this build decodes in-JVM.
 */
object IcoDecode {

  final case class Pixels(width: Int, height: Int, channels: Int, samples: Array[Byte])

  def decode(b: Array[Byte]): Option[Pixels] = {
    try {
      if (b == null || b.length < 22) return None
      def u8(i: Int): Int = b(i) & 0xff
      def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def i32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      if (u16(0) != 0 || u16(2) != 1) return None // reserved, type=icon
      val count = u16(4)
      if (count < 1 || count > 64 || 6 + 16 * count > b.length) return None
      // largest entry by directory-claimed area (byte 0 encodes 256 as 0)
      var best = -1
      var bestArea = -1L
      var i = 0
      while (i < count) {
        val e = 6 + 16 * i
        val w = { val v = u8(e); if (v == 0) 256 else v }
        val h = { val v = u8(e + 1); if (v == 0) 256 else v }
        val size = i32(e + 8)
        val off = i32(e + 12)
        if (size > 0 && off >= 6 + 16 * count && off.toLong + size <= b.length) {
          val area = w.toLong * h
          if (area > bestArea) { bestArea = area; best = e }
        }
        i += 1
      }
      if (best < 0) return None
      val off = i32(best + 12)
      val size = i32(best + 8)
      val d = java.util.Arrays.copyOfRange(b, off, off + size)
      if (d.length >= 8 && (d(0) & 0xff) == 0x89 && d(1) == 'P' && d(2) == 'N' && d(3) == 'G')
        PngDecode.decode(d).map(p => Pixels(p.width, p.height, p.channels, p.samples))
      else decodeDib(d)
    } catch { case NonFatal(_) => None }
  }

  private def decodeDib(d: Array[Byte]): Option[Pixels] = {
    if (d.length < 40) return None
    def u8(i: Int): Int = d(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def i32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    val hdrSize = i32(0)
    if (hdrSize < 40 || hdrSize > d.length) return None
    val w = i32(4)
    val h2 = i32(8) // XOR + AND planes stacked: always doubled, bottom-up
    if (w <= 0 || w > 1024 || h2 <= 0 || h2 > 2048 || (h2 & 1) != 0) return None
    val h = h2 / 2
    val bpp = u16(14)
    if (i32(16) != 0) return None // ICO DIBs are BI_RGB only
    val palBytes =
      if (bpp >= 1 && bpp <= 8) {
        val declared = i32(32)
        val full = 1 << bpp
        (if (declared > 0 && declared <= full) declared else full) * 4
      } else 0

    // synthesize a standalone BMP (height halved) around the same bytes
    val bmp = new Array[Byte](14 + d.length)
    bmp(0) = 'B'; bmp(1) = 'M'
    def putLe32(arr: Array[Byte], i: Int, v: Int): Unit = {
      arr(i) = (v & 0xff).toByte; arr(i + 1) = ((v >> 8) & 0xff).toByte
      arr(i + 2) = ((v >> 16) & 0xff).toByte; arr(i + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe32(bmp, 2, 14 + d.length)
    putLe32(bmp, 10, 14 + hdrSize + palBytes) // pixel data right after palette
    System.arraycopy(d, 0, bmp, 14, d.length)
    putLe32(bmp, 14 + 8, h) // un-double the height

    BmpDecode.decode(bmp).map { px =>
      val xorStride = ((w * bpp + 31) / 32) * 4
      val xorOff = hdrSize + palBytes
      val maskOff = xorOff + xorStride.toLong * h
      val maskStride = ((w + 31) / 32) * 4
      val out = new Array[Byte](w * h * 4)
      var wrote = false
      if (bpp == 32 && maskOff <= d.length) {
        // 32-bit: per-pixel alpha rides the XOR plane's 4th byte
        var y = 0
        while (y < h) {
          val row = xorOff + (h - 1 - y).toLong * xorStride
          var x = 0
          while (x < w) {
            val so = (y * w + x) * 3
            val oo = (y * w + x) * 4
            out(oo) = px.samples(so); out(oo + 1) = px.samples(so + 1); out(oo + 2) = px.samples(so + 2)
            out(oo + 3) = d((row + x * 4 + 3).toInt)
            x += 1
          }
          y += 1
        }
        wrote = true
      } else if (maskOff + maskStride.toLong * h <= d.length) {
        var y = 0
        while (y < h) {
          val row = maskOff + (h - 1 - y).toLong * maskStride
          var x = 0
          while (x < w) {
            val bit = (u8((row + (x >> 3)).toInt) >> (7 - (x & 7))) & 1
            val so = (y * w + x) * 3
            val oo = (y * w + x) * 4
            out(oo) = px.samples(so); out(oo + 1) = px.samples(so + 1); out(oo + 2) = px.samples(so + 2)
            out(oo + 3) = if (bit == 1) 0 else 0xff.toByte
            x += 1
          }
          y += 1
        }
        wrote = true
      }
      if (wrote) Pixels(w, h, 4, out) else px2(px)
    }
  }

  private def px2(p: BmpDecode.Pixels): Pixels = Pixels(p.width, p.height, p.channels, p.samples)
}
