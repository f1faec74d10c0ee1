package graft.media

import scala.util.control.NonFatal

/**
 * Pure-JVM GIF decoder (GIF87a/89a) for the feature-extraction path: logical
 * screen descriptor → global/local color table → first image descriptor →
 * GIF-variant LZW (LSB-first variable-width codes, CLEAR/END, 12-bit cap) →
 * optional 4-pass de-interlace → palette mapping to interleaved RGB samples.
 * First frame only (animation frames beyond the first carry no additional
 * signal for per-channel statistics). Corrupt/truncated data returns None.
 *
 * Note the bit order: GIF LZW packs codes LSB-first — the opposite of PDF's
 * /LZWDecode (MSB-first) already in PdfExtract; the two cannot share a reader.
 */
object GifDecode {

  /** 8-bit RGB samples, row-major, channel-interleaved (3 channels). */
  final case class Pixels(width: Int, height: Int, channels: Int, samples: Array[Byte])

  def decode(b: Array[Byte]): Option[Pixels] = {
    try {
      if (b == null || b.length < 14) return None
      if (!(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
            (b(4) == '7' || b(4) == '9') && b(5) == 'a')) return None
      def u8(i: Int): Int = b(i) & 0xff
      def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      val screenPacked = u8(10)
      var pos = 13
      var globalPal: Array[Byte] = null
      if ((screenPacked & 0x80) != 0) {
        val n = 2 << (screenPacked & 7)
        if (pos + 3 * n > b.length) return None
        globalPal = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
        pos += 3 * n
      }
      // block walk to the first image descriptor
      while (pos < b.length && u8(pos) != 0x2c) {
        u8(pos) match {
          case 0x21 => // extension: label byte then length-prefixed sub-blocks
            pos += 2
            while (pos < b.length && u8(pos) != 0) pos += 1 + u8(pos)
            pos += 1
          case _ => return None // trailer (0x3b) or junk before any image
        }
      }
      if (pos + 10 > b.length) return None
      val iw = u16(pos + 5)
      val ih = u16(pos + 7)
      val ipacked = u8(pos + 9)
      pos += 10
      if (iw <= 0 || ih <= 0 || iw > (1 << 14) || ih > (1 << 14)) return None
      if (iw.toLong * ih * 3 > (1L << 28)) return None // hostile-dimension guard
      var pal = globalPal
      if ((ipacked & 0x80) != 0) { // local color table overrides
        val n = 2 << (ipacked & 7)
        if (pos + 3 * n > b.length) return None
        pal = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
        pos += 3 * n
      }
      if (pal == null) return None
      val interlaced = (ipacked & 0x40) != 0
      val minCode = u8(pos)
      pos += 1
      if (minCode < 2 || minCode > 8) return None
      // concatenate the length-prefixed data sub-blocks
      val data = new java.io.ByteArrayOutputStream(b.length - pos)
      while (pos < b.length && u8(pos) != 0) {
        val len = u8(pos)
        if (pos + 1 + len > b.length) return None
        data.write(b, pos + 1, len)
        pos += 1 + len
      }
      val indices = lzw(minCode, data.toByteArray, iw * ih)
      if (indices == null || indices.length < iw * ih) return None
      // de-interlace: pass rows 0,8,16… / 4,12… / 2,6,10… / 1,3,5…
      val rowOf: Int => Int =
        if (!interlaced) identity
        else {
          val order = new Array[Int](ih)
          var r = 0
          for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); y <- start until ih by step) {
            order(r) = y; r += 1
          }
          val inv = new Array[Int](ih)
          order.zipWithIndex.foreach { case (dst, src) => inv(dst) = src }
          inv
        }
      val nColors = pal.length / 3
      val out = new Array[Byte](iw * ih * 3)
      var y = 0
      while (y < ih) {
        val srcRow = rowOf(y)
        var x = 0
        while (x < iw) {
          val idx = indices(srcRow * iw + x) & 0xff
          if (idx >= nColors) return None // index outside the palette
          out((y * iw + x) * 3) = pal(idx * 3)
          out((y * iw + x) * 3 + 1) = pal(idx * 3 + 1)
          out((y * iw + x) * 3 + 2) = pal(idx * 3 + 2)
          x += 1
        }
        y += 1
      }
      Some(Pixels(iw, ih, 3, out))
    } catch { case NonFatal(_) => None }
  }

  /** GIF-variant LZW: LSB-first codes, width grows when the dict fills the
    * current code space (12-bit cap), CLEAR resets. Returns null on corrupt
    * streams; a truncated stream returns the pixels decoded so far. */
  private def lzw(minCode: Int, data: Array[Byte], maxPixels: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](maxPixels)
    var outLen = 0
    var dictSize = end + 1
    var codeSize = minCode + 1
    var prev = -1
    var bitBuf = 0
    var bitCnt = 0
    var pos = 0
    var done = false
    while (!done && outLen < maxPixels) {
      while (bitCnt < codeSize && pos < data.length) {
        bitBuf |= (data(pos) & 0xff) << bitCnt
        bitCnt += 8
        pos += 1
      }
      if (bitCnt < codeSize) done = true // truncated
      else {
        val code = bitBuf & ((1 << codeSize) - 1)
        bitBuf >>>= codeSize
        bitCnt -= codeSize
        if (code == clear) { dictSize = end + 1; codeSize = minCode + 1; prev = -1 }
        else if (code == end) done = true
        else if (prev < 0) {
          if (code >= clear) return null // first code must be a literal
          out(outLen) = code.toByte; outLen += 1
          prev = code
        } else {
          if (code > dictSize || (code == dictSize && dictSize >= 4096)) return null
          // expand code (or prev+firstChar(prev) for the just-about-to-exist code)
          var sp = 0
          var c = if (code == dictSize) prev else code
          while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
          val first = c.toByte
          stack(sp) = first; sp += 1
          // emit reversed stack; the KwKwK case (code == dictSize) appends
          // firstChar(prev) — which equals `first` — after the base string
          while (sp > 0 && outLen < maxPixels) { sp -= 1; out(outLen) = stack(sp); outLen += 1 }
          if (code == dictSize && outLen < maxPixels) { out(outLen) = first; outLen += 1 }
          if (dictSize < 4096) {
            prefix(dictSize) = prev
            suffix(dictSize) = first
            dictSize += 1
            if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = code
        }
      }
    }
    out
  }
}
