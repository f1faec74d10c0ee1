package graft.media

import scala.util.control.NonFatal

/**
 * Pure-JVM PNG decoder for the feature-extraction path: chunk walk → IDAT
 * concat → raw-deflate inflate (java.util.zip.Inflater) → per-scanline
 * un-filter (None/Sub/Up/Average/Paeth, PNG spec §9). Supports the common
 * web shapes: 8-bit depth, color types 0 (gray), 2 (rgb), 4 (gray+alpha),
 * 6 (rgba); palette and interlaced images return None (fallback path).
 *
 * Robustness choices for crawl data: chunk CRCs are not verified (a flipped
 * CRC bit shouldn't discard otherwise-decodable pixels) and the zlib adler32
 * trailer is not checked (the 2-byte zlib header is skipped and the stream
 * inflated raw) — truncated/corrupt streams still return None because the
 * unfiltered byte count must match exactly.
 */
object PngDecode {

  /** Un-filtered 8-bit samples, row-major, channel-interleaved. */
  final case class Pixels(width: Int, height: Int, channels: Int, samples: Array[Byte])

  // per-thread raw (nowrap) Inflater — JNI construction costs tens of µs
  private val rawInflaterTL: ThreadLocal[java.util.zip.Inflater] =
    new ThreadLocal[java.util.zip.Inflater] {
      override def initialValue(): java.util.zip.Inflater = new java.util.zip.Inflater(true)
    }

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  def decode(b: Array[Byte]): Option[Pixels] = {
    try {
      if (b == null || b.length < 45) return None
      if ((b(0) & 0xff) != 0x89 || b(1) != 'P' || b(2) != 'N' || b(3) != 'G') return None
      var i = 8
      var w = 0
      var h = 0
      var bitDepth = -1
      var colorType = -1
      var interlace = -1
      val idat = new java.io.ByteArrayOutputStream(b.length)
      var sawEnd = false
      while (i + 8 <= b.length && !sawEnd) {
        val len = be32(b, i)
        if (len < 0 || i + 8 + len + 4 > b.length) return None // truncated chunk
        val typ = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        typ match {
          case "IHDR" if len >= 13 =>
            w = be32(b, i + 8); h = be32(b, i + 12)
            bitDepth = b(i + 16) & 0xff; colorType = b(i + 17) & 0xff
            interlace = b(i + 20) & 0xff
          case "IDAT" => idat.write(b, i + 8, len)
          case "IEND" => sawEnd = true
          case _ => () // ancillary chunks skipped (CRC not verified)
        }
        i += 8 + len + 4
      }
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
        case _ => return None // palette (3) needs PLTE handling — fallback
      }
      if (bitDepth != 8 || interlace != 0) return None
      if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
      // total-allocation guard: a hostile IHDR must not allocate gigabytes
      if ((w.toLong * channels + 1) * h > (1L << 28)) return None
      val z = idat.toByteArray
      if (z.length < 3) return None
      val stride = w * channels
      val raw = new Array[Byte]((stride + 1) * h)
      val inf = rawInflaterTL.get() // raw deflate: skip zlib header, ignore adler
      inf.reset()
      inf.setInput(z, 2, z.length - 2)
      var off = 0
      var stuck = false
      while (!inf.finished() && off < raw.length && !stuck) {
        val k = inf.inflate(raw, off, raw.length - off)
        if (k == 0 && inf.needsInput()) stuck = true
        off += k
      }
      if (off < raw.length) return None // truncated pixel data
      // un-filter scanlines in place into the output (filters reference the
      // RECONSTRUCTED left/up bytes, so this must go top-down, left-right)
      val out = new Array[Byte](stride * h)
      val bpp = channels
      var y = 0
      while (y < h) {
        val f = raw(y * (stride + 1)) & 0xff
        val rs = y * (stride + 1) + 1
        val os = y * stride
        var x = 0
        while (x < stride) {
          val rv = raw(rs + x) & 0xff
          val a = if (x >= bpp) out(os + x - bpp) & 0xff else 0
          val up = if (y > 0) out(os - stride + x) & 0xff else 0
          val c = if (x >= bpp && y > 0) out(os - stride + x - bpp) & 0xff else 0
          val v = f match {
            case 0 => rv
            case 1 => rv + a
            case 2 => rv + up
            case 3 => rv + ((a + up) >> 1)
            case 4 => rv + paeth(a, up, c)
            case _ => return None // undefined filter type
          }
          out(os + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some(Pixels(w, h, channels, out))
    } catch { case NonFatal(_) => None }
  }

  /** Paeth predictor (PNG spec §9.4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }
}
