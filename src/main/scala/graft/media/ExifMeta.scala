package graft.media

import scala.util.control.NonFatal

/**
 * EXIF metadata walker for crawl images — the fields a curation pipeline
 * acts on:
 *
 *  - `has_gps`: a GPS IFD present in a user-uploaded photo is location PII
 *    (the image-side analog of the text PII pass, CurationOps.redactPii) —
 *    corpora strip or flag it;
 *  - `orientation` (tag 0x0112): without it, rotated photos hash/embed
 *    differently from their upright re-encodes;
 *  - `make` (0x010F) and `datetime` (0x0132, falling back to the Exif
 *    sub-IFD's DateTimeOriginal 0x9003): provenance/recency signals.
 *
 * Accepts a JPEG (marker walk to the APP1 "Exif\0\0" segment — stops at
 * SOS, metadata never follows scan data) or a bare TIFF body. The TIFF IFD
 * walk (both byte orders, SHORT/LONG/ASCII, inline-or-offset values per
 * TIFF 6.0 §2) is bounds-checked everywhere and total on hostile bytes;
 * absent fields read -1 / false / null.
 *
 * Reference behavior (what to extract, not how): the reference shells out
 * to image tooling for raster metadata (ocr-processor
 * processors/image_preflight.py:16-42); this build walks EXIF in-JVM.
 */
object ExifMeta {

  final case class Info(orientation: Int, hasGps: Boolean, make: String, dateTime: String)

  private val absent = Info(-1, hasGps = false, null, null)

  def parse(b: Array[Byte]): Info = {
    try {
      if (b == null || b.length < 8) return absent
      if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) jpegApp1(b)
      else tiffIfd(b, 0, b.length)
    } catch { case NonFatal(_) => absent }
  }

  /** JPEG marker walk to APP1/"Exif\0\0"; SOS ends the metadata region. */
  private def jpegApp1(b: Array[Byte]): Info = {
    var pos = 2
    while (pos + 4 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return absent
      val marker = b(pos + 1) & 0xff
      if (marker == 0xff) pos += 1 // fill byte
      else if (marker >= 0xd0 && marker <= 0xd9) pos += 2 // standalone
      else {
        val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
        if (len < 2 || pos + 2 + len > b.length) return absent
        if (marker == 0xe1 && len >= 10 &&
          b(pos + 4) == 'E' && b(pos + 5) == 'x' && b(pos + 6) == 'i' &&
          b(pos + 7) == 'f' && b(pos + 8) == 0 && b(pos + 9) == 0)
          return tiffIfd(b, pos + 10, pos + 2 + len)
        if (marker == 0xda) return absent // SOS
        pos += 2 + len
      }
    }
    absent
  }

  /** One parsed IFD: tag → (SHORT/LONG first value) and tag → ASCII text. */
  private final class Ifd {
    val nums = scala.collection.mutable.HashMap.empty[Int, Long]
    val strs = scala.collection.mutable.HashMap.empty[Int, String]
  }

  private def tiffIfd(b: Array[Byte], base: Int, end: Int): Info = {
    if (end - base < 8 || end > b.length) return absent
    val le =
      if (b(base) == 'I' && b(base + 1) == 'I' && (b(base + 2) & 0xff) == 0x2a && b(base + 3) == 0) true
      else if (b(base) == 'M' && b(base + 1) == 'M' && b(base + 2) == 0 && (b(base + 3) & 0xff) == 0x2a) false
      else return absent
    def u8(i: Int): Int = b(i) & 0xff
    def u16(i: Int): Int = if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le) u16(i).toLong | (u16(i + 2).toLong << 16) else (u16(i).toLong << 16) | u16(i + 2)

    /** Read one IFD at a TIFF-relative offset; None when out of bounds. */
    def readIfd(relOff: Long): Option[Ifd] = {
      val at = base.toLong + relOff
      if (relOff < 8 || at + 2 > end) return None
      val off = at.toInt
      val n = u16(off)
      if (n < 1 || n > 512) return None
      val ifd = new Ifd
      var e = 0
      while (e < n && off + 2 + (e + 1) * 12 <= end) {
        val eo = off + 2 + e * 12
        val tag = u16(eo)
        val typ = u16(eo + 2)
        val cnt = u32(eo + 4)
        val width = typ match {
          case 1 | 2 => 1L
          case 3 => 2L
          case 4 => 4L
          case _ => 0L
        }
        if (width > 0 && cnt >= 1 && cnt <= 4096) {
          val vb = if (cnt * width <= 4) eo + 8L else base.toLong + u32(eo + 8)
          if (vb >= 0 && vb + cnt * width <= end) {
            val vi = vb.toInt
            typ match {
              case 2 => // ASCII, NUL-terminated
                var l = 0
                while (l < cnt && b(vi + l) != 0) l += 1
                ifd.strs(tag) = new String(b, vi, l, java.nio.charset.StandardCharsets.US_ASCII)
              case 3 => ifd.nums(tag) = u16(vi).toLong
              case 4 => ifd.nums(tag) = u32(vi)
              case _ => () // BYTE values: presence only (GPS version etc.)
            }
            if (typ == 1) ifd.nums(tag) = u8(vi).toLong
          }
        }
        e += 1
      }
      Some(ifd)
    }

    readIfd(u32(base + 4)) match {
      case None => absent
      case Some(ifd0) =>
        val orientation = ifd0.nums.get(0x0112).map(_.toInt).filter(o => o >= 1 && o <= 8).getOrElse(-1)
        val make = ifd0.strs.get(0x010f).map(_.trim).filter(_.nonEmpty).orNull
        var dateTime = ifd0.strs.get(0x0132).orNull
        if (dateTime == null)
          dateTime = ifd0.nums.get(0x8769).flatMap(readIfd)
            .flatMap(_.strs.get(0x9003)).orNull
        val hasGps = ifd0.nums.get(0x8825).flatMap(readIfd).isDefined
        Info(orientation, hasGps, make, dateTime)
    }
  }
}
