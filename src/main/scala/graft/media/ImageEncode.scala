package graft.media

import java.io.ByteArrayOutputStream

/**
 * Minimal header builders for the sniff-level image formats (BMP, TIFF,
 * WebP) — the q29/q53 fixture pattern: enough valid structure that the
 * dimensions are statable in closed form. Fixtures only.
 */
object ImageEncode {

  private def le16(o: ByteArrayOutputStream, v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
  private def le32(o: ByteArrayOutputStream, v: Int): Unit = { le16(o, v & 0xffff); le16(o, (v >>> 16) & 0xffff) }
  private def be16(o: ByteArrayOutputStream, v: Int): Unit = { o.write((v >> 8) & 0xff); o.write(v & 0xff) }
  private def be32(o: ByteArrayOutputStream, v: Int): Unit = { be16(o, (v >>> 16) & 0xffff); be16(o, v & 0xffff) }

  /** BMP file header + BITMAPINFOHEADER (no pixel data — header-complete). */
  def bmp(w: Int, h: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write('B'); o.write('M')
    le32(o, 54); le32(o, 0); le32(o, 54) // size, reserved, pixel offset
    le32(o, 40); le32(o, w); le32(o, h)  // header size, width, height
    le16(o, 1); le16(o, 24)              // planes, bpp
    le32(o, 0); le32(o, 0); le32(o, 0); le32(o, 0); le32(o, 0); le32(o, 0)
    o.toByteArray
  }

  /** Complete flat-color 24-bit BMP (BI_RGB, bottom-up, 4-byte row padding):
    * every pixel decodes to exactly (r, g, b). */
  def bmpFlat(w: Int, h: Int, r: Int, g: Int, bl: Int): Array[Byte] = {
    val header = bmp(w, h)
    val stride = ((w * 3 + 3) / 4) * 4
    val o = new ByteArrayOutputStream(header.length + stride * h)
    o.write(header, 0, header.length)
    val row = new Array[Byte](stride)
    var x = 0
    while (x < w) { row(x * 3) = bl.toByte; row(x * 3 + 1) = g.toByte; row(x * 3 + 2) = r.toByte; x += 1 }
    (0 until h).foreach(_ => o.write(row, 0, stride))
    o.toByteArray
  }

  /** TIFF header + one IFD: ImageWidth (SHORT) + ImageLength (LONG). */
  def tiff(w: Int, h: Int, littleEndian: Boolean): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    def u16(v: Int): Unit = if (littleEndian) le16(o, v) else be16(o, v)
    def u32(v: Int): Unit = if (littleEndian) le32(o, v) else be32(o, v)
    if (littleEndian) { o.write('I'); o.write('I'); o.write(0x2a); o.write(0) }
    else { o.write('M'); o.write('M'); o.write(0); o.write(0x2a) }
    u32(8)  // IFD offset
    u16(2)  // two entries
    u16(256); u16(3); u32(1); u16(w); u16(0) // ImageWidth, SHORT — value in first 2 bytes
    u16(257); u16(4); u32(1); u32(h)         // ImageLength, LONG
    u32(0)  // next IFD
    o.toByteArray
  }

  private def webpContainer(tag: String, payload: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write("RIFF".getBytes, 0, 4)
    le32(o, 4 + 8 + payload.length)
    o.write("WEBP".getBytes, 0, 4)
    o.write(tag.getBytes, 0, 4)
    le32(o, payload.length)
    o.write(payload, 0, payload.length)
    o.toByteArray
  }

  /** Extended (VP8X) WebP: canvas dims as 24-bit minus-one fields. */
  def webpVp8x(w: Int, h: Int): Array[Byte] = {
    val p = new ByteArrayOutputStream()
    p.write(0); p.write(0); p.write(0); p.write(0) // flags + reserved
    val wm = w - 1; val hm = h - 1
    p.write(wm & 0xff); p.write((wm >> 8) & 0xff); p.write((wm >> 16) & 0xff)
    p.write(hm & 0xff); p.write((hm >> 8) & 0xff); p.write((hm >> 16) & 0xff)
    webpContainer("VP8X", p.toByteArray)
  }

  /** Lossy (VP8) WebP: key-frame tag + start code + 14-bit dims. */
  def webpVp8(w: Int, h: Int): Array[Byte] = {
    val p = new ByteArrayOutputStream()
    p.write(0); p.write(0); p.write(0)            // frame tag (key frame)
    p.write(0x9d); p.write(0x01); p.write(0x2a)   // start code
    le16(p, w & 0x3fff); le16(p, h & 0x3fff)
    webpContainer("VP8 ", p.toByteArray)
  }

  /** Lossless (VP8L) WebP: 0x2F signature + packed 14-bit minus-one dims. */
  def webpVp8l(w: Int, h: Int): Array[Byte] = {
    val p = new ByteArrayOutputStream()
    p.write(0x2f)
    val wm = w - 1; val hm = h - 1
    p.write(wm & 0xff)
    p.write(((wm >> 8) & 0x3f) | ((hm & 0x03) << 6))
    p.write((hm >> 2) & 0xff)
    p.write((hm >> 10) & 0x0f)
    webpContainer("VP8L", p.toByteArray)
  }
}
