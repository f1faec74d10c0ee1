package graft.media

import scala.util.control.NonFatal

/**
 * BMP decoder for the feature-extraction path: BITMAPINFOHEADER (or larger
 * V4/V5 headers), rows bottom-up (negative height = top-down), stride padded
 * to 4 bytes. Layouts:
 *  - BI_RGB 24/32-bit (BGR(A) storage order emitted as interleaved RGB)
 *  - BI_RGB paletted 1/4/8-bit (BGRA quads after the header; clrUsed honored)
 *  - BI_RLE8 / BI_RLE4 (escape codes 0=EOL, 1=EOF, 2=delta, n≥3=absolute
 *    run word-aligned; encoded runs n>0; always bottom-up per spec)
 * 16-bit bitfields and BI_BITFIELDS return None — the declared sketch
 * fallback. Total on hostile bytes: every cursor move is bounds-checked and
 * monotone.
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
      if (w.toLong * h * 3 > (1L << 28)) return None
      if (dataOff < 0 || dataOff > b.length) return None

      // palette (BGRA quads) sits between the info header and the pixel data
      def palette(nBits: Int): Array[Int] = {
        val declared = i32(46) // biClrUsed; 0 = full 2^n
        val full = 1 << nBits
        val used = if (declared > 0 && declared <= full) declared else full
        val base = 14 + hdrSize
        Array.tabulate(full) { k =>
          val p = base + k * 4
          if (k < used && p + 4 <= b.length)
            (u8(p + 2) << 16) | (u8(p + 1) << 8) | u8(p) // RGB packed
          else 0
        }
      }
      val out = new Array[Byte](w * h * 3)
      def put(x: Int, y: Int, rgb: Int): Unit =
        if (x >= 0 && x < w && y >= 0 && y < h) {
          val o = (y * w + x) * 3
          out(o) = ((rgb >> 16) & 0xff).toByte
          out(o + 1) = ((rgb >> 8) & 0xff).toByte
          out(o + 2) = (rgb & 0xff).toByte
        }

      (compression, bpp) match {
        case (0, 24) | (0, 32) =>
          val bytesPer = bpp / 8
          val stride = ((w * bytesPer + 3) / 4) * 4
          var y = 0
          var any = false
          while (y < h) {
            val srcRow = dataOff + (if (topDown) y else h - 1 - y).toLong * stride
            if (srcRow + w.toLong * bytesPer <= b.length) {
              var x = 0
              while (x < w) {
                val s = (srcRow + x * bytesPer).toInt
                put(x, y, (u8(s + 2) << 16) | (u8(s + 1) << 8) | u8(s))
                x += 1
              }
              any = true
            }
            y += 1
          }
          if (!any) None else Some(Pixels(w, h, 3, out))

        case (0, 1) | (0, 4) | (0, 8) =>
          val pal = palette(bpp)
          val pixPerByte = 8 / bpp
          val stride = ((w * bpp + 31) / 32) * 4
          var y = 0
          var any = false
          while (y < h) {
            val srcRow = dataOff + (if (topDown) y else h - 1 - y).toLong * stride
            if (srcRow + ((w + pixPerByte - 1) / pixPerByte).toLong <= b.length) {
              var x = 0
              while (x < w) {
                val byte = u8((srcRow + x / pixPerByte).toInt)
                val shift = (pixPerByte - 1 - x % pixPerByte) * bpp
                put(x, y, pal((byte >> shift) & ((1 << bpp) - 1)))
                x += 1
              }
              any = true
            }
            y += 1
          }
          if (!any) None else Some(Pixels(w, h, 3, out))

        case (1, 8) | (2, 4) =>
          // RLE streams are bottom-up by spec; the cursor starts at the
          // bottom-left and escape codes move it — unwritten pixels stay 0
          val rle4 = compression == 2
          val pal = palette(bpp)
          var x = 0
          var y = h - 1
          var i = dataOff
          var done = false
          var any = false // like the other branches: a stream that never
          //                 writes a pixel must fall to the sketch, not
          //                 fabricate an all-black image
          while (!done && i + 2 <= b.length) {
            val n = u8(i)
            val v = u8(i + 1)
            i += 2
            if (n > 0) { // encoded run: n pixels of v (RLE4: two alternating nibbles)
              var k = 0
              while (k < n) {
                val idx = if (!rle4) v else if ((k & 1) == 0) v >> 4 else v & 0xf
                put(x, y, pal(idx)); any = true; x += 1; k += 1
              }
            } else v match {
              case 0 => x = 0; y -= 1            // end of line
              case 1 => done = true              // end of bitmap
              case 2 =>                          // delta (dx, dy): dy moves UP
                if (i + 2 > b.length) done = true
                else { x += u8(i); y -= u8(i + 1); i += 2 }
              case cnt =>                        // absolute run, word-aligned
                val nBytes = if (rle4) (cnt + 1) / 2 else cnt
                val padded = nBytes + (nBytes & 1)
                if (i + padded > b.length) done = true
                else {
                  var k = 0
                  while (k < cnt) {
                    val byte = u8(i + (if (rle4) k / 2 else k))
                    val idx = if (!rle4) byte else if ((k & 1) == 0) byte >> 4 else byte & 0xf
                    put(x, y, pal(idx)); any = true; x += 1; k += 1
                  }
                  i += padded
                }
            }
            if (y < 0) done = true
          }
          if (!any) None else Some(Pixels(w, h, 3, out))

        case _ => None // 16-bit / BI_BITFIELDS / huffman: sketch fallback
      }
    } catch { case NonFatal(_) => None }
  }
}
