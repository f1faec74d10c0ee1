package graft.media

import scala.util.control.NonFatal

/**
 * TIFF decoder for the feature path: endian-aware IFD walk (multi-value
 * entries followed through their offset indirection), 8 bits per sample,
 * 1 or 3 samples per pixel, strip layout (RowsPerStrip defaulting to the
 * full image), PhotometricInterpretation 0 (WhiteIsZero → inverted),
 * 1 (BlackIsZero), or 2 (RGB). Compression: 1 (none), 5 (LZW — TIFF 6.0 §13,
 * the identical MSB-first early-change variant PDF's /LZWDecode names after
 * it, shared via graft.pdf.PdfExtract.lzwDecode) with Predictor 1 or 2
 * (horizontal differencing, §14), and 32773 (PackBits, §9). JPEG-in-TIFF and
 * other bit depths return None — the sketch fallback.
 */
object TiffDecode {

  final case class Pixels(width: Int, height: Int, channels: Int, samples: Array[Byte])

  def decode(b: Array[Byte]): Option[Pixels] = {
    try {
      if (b == null || b.length < 8) return None
      val le =
        if (b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 0x2a && b(3) == 0) true
        else if (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xff) == 0x2a) false
        else return None
      def u8(i: Int): Int = b(i) & 0xff
      def u16(i: Int): Int = if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
      def u32(i: Int): Long =
        if (le) u16(i).toLong | (u16(i + 2).toLong << 16) else (u16(i).toLong << 16) | u16(i + 2)

      val ifd = u32(4)
      if (ifd < 8 || ifd + 2 > b.length) return None
      val n = u16(ifd.toInt)
      // tag → values (SHORT/LONG arrays, offset-indirected beyond 4 bytes)
      val tags = scala.collection.mutable.HashMap.empty[Int, Array[Long]]
      var e = 0
      while (e < n && ifd + 2 + (e + 1) * 12 <= b.length) {
        val off = ifd.toInt + 2 + e * 12
        val tag = u16(off)
        val typ = u16(off + 2)
        val cnt = u32(off + 4)
        if ((typ == 3 || typ == 4) && cnt >= 1 && cnt <= (1 << 16)) {
          val width = if (typ == 3) 2 else 4
          val inline = cnt * width <= 4
          val base = if (inline) off + 8 else u32(off + 8).toInt
          if (base >= 0 && base + cnt * width <= b.length) {
            tags(tag) = Array.tabulate(cnt.toInt)(k =>
              if (typ == 3) u16(base + k * 2).toLong else u32(base + k * 4))
          }
        }
        e += 1
      }
      def one(tag: Int, default: Long = -1L): Long = tags.get(tag).map(_.head).getOrElse(default)

      val w = one(256).toInt
      val h = one(257).toInt
      if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
      val compression = one(259, 1L).toInt
      if (compression != 1 && compression != 5 && compression != 32773) return None
      val predictor = one(317, 1L).toInt
      if (predictor != 1 && predictor != 2) return None
      if (predictor == 2 && compression != 5) return None // §14: predictor rides LZW
      val photometric = one(262, 1L).toInt
      if (photometric != 0 && photometric != 1 && photometric != 2) return None
      val spp = one(277, 1L).toInt
      if (spp != 1 && spp != 3) return None
      if (!tags.get(258).forall(_.forall(_ == 8L))) return None // 8 bits/sample only
      if (w.toLong * h * spp > (1L << 28)) return None
      val rps = math.min(one(278, h.toLong), h.toLong).toInt
      val offsets = tags.getOrElse(273, return None)
      val counts = tags.getOrElse(279, Array.fill(offsets.length)(Long.MaxValue))
      val out = new Array[Byte](w * h * spp)
      val rowBytes = w * spp
      var any = false
      var strip = 0
      while (strip < offsets.length) {
        val y0 = strip * rps
        val rows = math.min(rps, h - y0)
        if (rows > 0) {
          val src = offsets(strip)
          val avail = math.min(counts(strip), b.length - src)
          if (avail > 0 && src >= 0 && src < b.length) {
            // strip bytes → decoded rows (each strip compresses independently)
            val raw: Array[Byte] = compression match {
              case 1 =>
                val len = math.min(avail, rows.toLong * rowBytes).toInt
                java.util.Arrays.copyOfRange(b, src.toInt, src.toInt + len)
              case 5 =>
                // cap at the strip's plaintext size: without it a crafted
                // compression=5 strip expands ~3,640× and OOMs the executor
                // (the sibling packBits path carries the identical cap)
                graft.pdf.PdfExtract.lzwDecode(
                  java.util.Arrays.copyOfRange(b, src.toInt, (src + avail).toInt),
                  maxOut = rows * rowBytes)
              case _ =>
                packBits(b, src.toInt, avail.toInt, rows * rowBytes)
            }
            // horizontal differencing predictor: each sample is a delta
            // against the previous PIXEL's same sample, reset per row (§14)
            if (predictor == 2) {
              var r = 0
              while ((r + 1) * rowBytes <= raw.length) {
                var x = spp
                while (x < rowBytes) {
                  raw(r * rowBytes + x) = (raw(r * rowBytes + x) + raw(r * rowBytes + x - spp)).toByte
                  x += 1
                }
                r += 1
              }
            }
            var r = 0
            while (r < rows && (r + 1) * rowBytes <= raw.length) {
              var x = 0
              while (x < rowBytes) {
                val v = raw(r * rowBytes + x) & 0xff
                out((y0 + r) * rowBytes + x) = (if (photometric == 0) 255 - v else v).toByte
                x += 1
              }
              any = true
              r += 1
            }
          }
        }
        strip += 1
      }
      if (!any) None else Some(Pixels(w, h, spp, out))
    } catch { case NonFatal(_) => None }
  }

  /** PackBits (TIFF 6.0 §9, the Apple RLE): control byte n in [0,127] copies
    * n+1 literals; n in [-127,-1] repeats the next byte 1-n times; -128 is a
    * no-op. Total decoder: bounds-checked, output capped at `maxOut`. */
  private def packBits(b: Array[Byte], off: Int, len: Int, maxOut: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(maxOut, 1 << 20))
    var i = off
    val end = off + len
    while (i < end && out.size < maxOut) {
      val c = b(i)
      i += 1
      if (c >= 0) {
        val k = math.min(c + 1, end - i)
        out.write(b, i, math.max(0, k))
        i += k
      } else if (c != -128 && i < end) {
        val v = b(i)
        i += 1
        var r = 1 - c
        while (r > 0 && out.size < maxOut) { out.write(v); r -= 1 }
      }
    }
    out.toByteArray
  }
}
