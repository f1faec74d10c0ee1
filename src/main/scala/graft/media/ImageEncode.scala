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

  /** Complete uncompressed TIFF: 8-bit gray (1 value) or RGB (3 values),
    * every pixel = `sample`, either byte order, optional WhiteIsZero
    * photometric and multi-strip layout (offset-indirected value arrays). */
  def tiffFlat(w: Int, h: Int, sample: Seq[Int], littleEndian: Boolean,
               whiteIsZero: Boolean = false, rowsPerStrip: Int = 0): Array[Byte] = {
    val spp = sample.length
    require(spp == 1 || spp == 3)
    val rps = if (rowsPerStrip <= 0) h else rowsPerStrip
    val strips = (h + rps - 1) / rps
    val rowBytes = w * spp
    val nEntries = 9
    val ifdStart = 8
    var aux = ifdStart + 2 + nEntries * 12 + 4
    val bpsOff = if (spp == 3) { val o = aux; aux += 6; o } else -1
    val soOff = if (strips > 1) { val o = aux; aux += strips * 4; o } else -1
    val scOff = if (strips > 1) { val o = aux; aux += strips * 4; o } else -1
    val dataOff = aux
    def stripRows(i: Int): Int = math.min(rps, h - i * rps)
    def stripOff(i: Int): Int = dataOff + i * rps * rowBytes

    val o = new ByteArrayOutputStream()
    def u16(v: Int): Unit = if (littleEndian) le16(o, v) else be16(o, v)
    def u32(v: Int): Unit = if (littleEndian) le32(o, v) else be32(o, v)
    if (littleEndian) { o.write('I'); o.write('I'); o.write(0x2a); o.write(0) }
    else { o.write('M'); o.write('M'); o.write(0); o.write(0x2a) }
    u32(ifdStart)
    u16(nEntries)
    def short1(tag: Int, v: Int): Unit = { u16(tag); u16(3); u32(1); u16(v); u16(0) }
    def long1(tag: Int, v: Int): Unit = { u16(tag); u16(4); u32(1); u32(v) }
    short1(256, w)
    short1(257, h)
    if (spp == 1) short1(258, 8) else { u16(258); u16(3); u32(3); u32(bpsOff) }
    short1(259, 1)                                 // uncompressed
    short1(262, if (whiteIsZero) 0 else if (spp == 3) 2 else 1)
    if (strips == 1) long1(273, dataOff) else { u16(273); u16(4); u32(strips); u32(soOff) }
    short1(277, spp)
    long1(278, rps)
    if (strips == 1) long1(279, h * rowBytes) else { u16(279); u16(4); u32(strips); u32(scOff) }
    u32(0)                                         // next IFD
    if (spp == 3) { u16(8); u16(8); u16(8) }
    if (strips > 1) {
      (0 until strips).foreach(i => u32(stripOff(i)))
      (0 until strips).foreach(i => u32(stripRows(i) * rowBytes))
    }
    val row = new Array[Byte](rowBytes)
    var x = 0
    while (x < w) { sample.indices.foreach(c => row(x * spp + c) = sample(c).toByte); x += 1 }
    (0 until h).foreach(_ => o.write(row, 0, rowBytes))
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
