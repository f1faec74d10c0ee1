package graft.media

import scala.util.control.NonFatal

/**
 * Uncompressed BMP decoder for the feature-extraction path: BITMAPINFOHEADER,
 * BI_RGB 24/32-bit only (the overwhelmingly common stored layout), rows
 * bottom-up (negative height = top-down), stride padded to 4 bytes, BGR(A)
 * storage order emitted as interleaved RGB. RLE/16-bit/paletted variants
 * return None — the declared sketch fallback.
 */
object BmpDecode {

  final case class Pixels(width: Int, height: Int, channels: Int, samples: Array[Byte])

  def decode(b: Array[Byte]): Option[Pixels] = {
    try {
      if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
      def u8(i: Int): Int = b(i) & 0xff
      def i32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      val dataOff = i32(10)
      val hdrSize = i32(14)
      if (hdrSize < 40) return None // BITMAPCOREHEADER: out of scope
      val w = i32(18)
      val hRaw = i32(22)
      val topDown = hRaw < 0
      val h = math.abs(hRaw)
      val bpp = u16(28)
      val compression = i32(30)
      if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
      if (compression != 0 || (bpp != 24 && bpp != 32)) return None
      if (w.toLong * h * 3 > (1L << 28)) return None
      val bytesPer = bpp / 8
      val stride = ((w * bytesPer + 3) / 4) * 4
      val out = new Array[Byte](w * h * 3)
      var y = 0
      var any = false
      while (y < h) {
        val srcRow = dataOff + (if (topDown) y else h - 1 - y).toLong * stride
        if (srcRow + w.toLong * bytesPer <= b.length) {
          var x = 0
          while (x < w) {
            val s = (srcRow + x * bytesPer).toInt
            val o = (y * w + x) * 3
            out(o) = b(s + 2)     // R (stored BGR)
            out(o + 1) = b(s + 1) // G
            out(o + 2) = b(s)     // B
            x += 1
          }
          any = true
        }
        y += 1
      }
      if (!any) None else Some(Pixels(w, h, 3, out))
    } catch { case NonFatal(_) => None }
  }
}
