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

  /** Complete 24-bit BMP of VERTICAL STRIPES on the dHash 9-column grid:
    * pixel column x takes color `a` when bit `x*9/w` of `pattern` is 1,
    * else color `b`. With w a multiple of 9 the stripes land exactly on the
    * 9×8 difference-hash cells, so the hash is closed-form from `pattern`
    * alone (see MediaSniff.dhash64) — and the SAME pattern at different
    * resolutions yields the SAME hash, the resolution-invariance fixture. */
  def bmpVStripes(w: Int, h: Int, pattern: Int,
                  a: (Int, Int, Int), b: (Int, Int, Int)): Array[Byte] = {
    val header = bmp(w, h)
    val stride = ((w * 3 + 3) / 4) * 4
    val o = new ByteArrayOutputStream(header.length + stride * h)
    o.write(header, 0, header.length)
    val row = new Array[Byte](stride)
    var x = 0
    while (x < w) {
      val (r, g, bl) = if (((pattern >> (x * 9 / w)) & 1) == 1) a else b
      row(x * 3) = bl.toByte; row(x * 3 + 1) = g.toByte; row(x * 3 + 2) = r.toByte
      x += 1
    }
    (0 until h).foreach(_ => o.write(row, 0, stride))
    o.toByteArray
  }

  /** bmpVStripes generalized to one stripe pattern PER dHash grid row
    * (`rowPatterns`, 8 entries, h a multiple of 8): pixel row y takes pattern
    * `rowPatterns(y*8/h)`. Lets a fixture place a controlled 1-2 bit Hamming
    * perturbation in a single grid row — the near-dup (not just exact-dup)
    * fixture for the fingerprint Hamming join. BMP rows are stored bottom-up,
    * so file rows are written in reverse image order. */
  def bmpRowStripes(w: Int, h: Int, rowPatterns: Seq[Int],
                    a: (Int, Int, Int), b: (Int, Int, Int)): Array[Byte] = {
    require(rowPatterns.length == 8 && h % 8 == 0, "8 patterns, h multiple of 8")
    val header = bmp(w, h)
    val stride = ((w * 3 + 3) / 4) * 4
    val o = new ByteArrayOutputStream(header.length + stride * h)
    o.write(header, 0, header.length)
    val row = new Array[Byte](stride)
    var fileRow = 0
    while (fileRow < h) {
      val y = h - 1 - fileRow // bottom-up storage
      val p = rowPatterns(y * 8 / h)
      var x = 0
      while (x < w) {
        val (r, g, bl) = if (((p >> (x * 9 / w)) & 1) == 1) a else b
        row(x * 3) = bl.toByte; row(x * 3 + 1) = g.toByte; row(x * 3 + 2) = r.toByte
        x += 1
      }
      o.write(row, 0, stride)
      fileRow += 1
    }
    o.toByteArray
  }

  /** BMP file header + BITMAPINFOHEADER + palette for the indexed layouts.
    * `idx` fills the image; the palette maps it (and only it) to (r, g, b). */
  private def bmpIndexedHeader(w: Int, h: Int, bpp: Int, compression: Int,
                               idx: Int, r: Int, g: Int, bl: Int,
                               imageBytes: Int): ByteArrayOutputStream = {
    val palEntries = 1 << bpp
    val dataOff = 54 + palEntries * 4
    val o = new ByteArrayOutputStream(dataOff + imageBytes)
    o.write('B'); o.write('M')
    le32(o, dataOff + imageBytes); le32(o, 0); le32(o, dataOff)
    le32(o, 40); le32(o, w); le32(o, h)
    le16(o, 1); le16(o, bpp)
    le32(o, compression); le32(o, imageBytes)
    le32(o, 0); le32(o, 0); le32(o, palEntries); le32(o, 0)
    (0 until palEntries).foreach { k =>
      if (k == idx) { o.write(bl); o.write(g); o.write(r); o.write(0) } // BGRA quad
      else { o.write((k * 3) & 0xff); o.write((k * 5) & 0xff); o.write((k * 7) & 0xff); o.write(0) }
    }
    o
  }

  /** Flat paletted BI_RGB BMP (1/4/8-bit): every pixel is palette index
    * `idx` → decodes to exactly (r, g, b). Odd widths exercise both the
    * nibble packing and the 4-byte row padding. */
  def bmpPalettedFlat(w: Int, h: Int, bpp: Int, idx: Int, r: Int, g: Int, bl: Int): Array[Byte] = {
    require(bpp == 1 || bpp == 4 || bpp == 8)
    require(idx >= 0 && idx < (1 << bpp))
    val stride = ((w * bpp + 31) / 32) * 4
    val o = bmpIndexedHeader(w, h, bpp, 0, idx, r, g, bl, stride * h)
    val row = new Array[Byte](stride)
    val pixPerByte = 8 / bpp
    var x = 0
    while (x < w) {
      val shift = (pixPerByte - 1 - x % pixPerByte) * bpp
      row(x / pixPerByte) = (row(x / pixPerByte) | (idx << shift)).toByte
      x += 1
    }
    (0 until h).foreach(_ => o.write(row, 0, stride))
    o.toByteArray
  }

  /** Flat BI_RLE8 BMP: each row as encoded runs (max 255 per run) with one
    * word-aligned ABSOLUTE segment on the first row to exercise that mode,
    * EOL after each row, EOF at the end. Decodes to exactly (r, g, b). */
  def bmpRle8Flat(w: Int, h: Int, idx: Int, r: Int, g: Int, bl: Int): Array[Byte] = {
    val o = bmpIndexedHeader(w, h, 8, 1, idx, r, g, bl, 0)
    val body = new ByteArrayOutputStream()
    var y = 0
    while (y < h) {
      var left = w
      if (y == 0 && w >= 3) { // absolute run of 3 (word-aligned to 4 bytes)
        body.write(0); body.write(3)
        body.write(idx); body.write(idx); body.write(idx); body.write(0)
        left -= 3
      }
      while (left > 0) {
        val n = math.min(255, left)
        body.write(n); body.write(idx)
        left -= n
      }
      body.write(0); body.write(0) // EOL
      y += 1
    }
    body.write(0); body.write(1) // EOF
    // patch biSizeImage (offset 34) now the RLE stream length is known
    val bytes = o.toByteArray ++ body.toByteArray
    val sz = body.size()
    bytes(34) = (sz & 0xff).toByte; bytes(35) = ((sz >> 8) & 0xff).toByte
    bytes(36) = ((sz >> 16) & 0xff).toByte; bytes(37) = ((sz >> 24) & 0xff).toByte
    bytes
  }

  /** Flat BI_RLE4 BMP: encoded runs of the doubled nibble. */
  def bmpRle4Flat(w: Int, h: Int, idx: Int, r: Int, g: Int, bl: Int): Array[Byte] = {
    require(idx >= 0 && idx < 16)
    val o = bmpIndexedHeader(w, h, 4, 2, idx, r, g, bl, 0)
    val body = new ByteArrayOutputStream()
    val packed = (idx << 4) | idx
    var y = 0
    while (y < h) {
      var left = w
      while (left > 0) {
        val n = math.min(254, left)
        body.write(n); body.write(packed)
        left -= n
      }
      body.write(0); body.write(0) // EOL
      y += 1
    }
    body.write(0); body.write(1) // EOF
    o.write(body.toByteArray, 0, body.size())
    o.toByteArray
  }

  /** TIFF/PDF LZW encoder (MSB-first variable-width codes, 256=Clear,
    * 257=EOD, greedy longest-match): the exact inverse of
    * graft.pdf.PdfExtract.lzwDecode — the encoder widens when its dict
    * reaches 2^bits, which lands one code EARLIER than table-full on the
    * decoder side (TIFF 6.0 §13 "early change"; round-trip is spec-locked
    * by TiffDecodeSpec). */
  def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2 + 16)
    var acc = 0L
    var nBits = 0
    var codeBits = 9
    var dictSize = 258
    val dict = new java.util.HashMap[Integer, Integer]()
    def emit(code: Int): Unit = {
      acc = (acc << codeBits) | code
      nBits += codeBits
      while (nBits >= 8) { out.write(((acc >>> (nBits - 8)) & 0xff).toInt); nBits -= 8 }
    }
    emit(256) // ClearTable
    var prev = -1
    var i = 0
    while (i < data.length) {
      val cur = data(i) & 0xff
      if (prev < 0) prev = cur
      else {
        val key = (prev << 8) | cur
        val hit = dict.get(key)
        if (hit != null) prev = hit
        else {
          emit(prev)
          if (dictSize < 4096) {
            dict.put(key, dictSize)
            dictSize += 1
            if (dictSize >= (1 << codeBits) && codeBits < 12) codeBits += 1
          }
          prev = cur
        }
      }
      i += 1
    }
    if (prev >= 0) emit(prev)
    emit(257) // EOD
    if (nBits > 0) out.write(((acc << (8 - nBits)) & 0xff).toInt)
    out.toByteArray
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

  /** Complete TIFF: 8-bit gray (1 value) or RGB (3 values), every pixel =
    * `sample`, either byte order, optional WhiteIsZero photometric,
    * multi-strip layout (offset-indirected value arrays), and compression
    * 1 (none) / 5 (LZW, optional horizontal-differencing predictor 2) /
    * 32773 (PackBits) — each strip compressed independently per TIFF 6.0. */
  def tiffFlat(w: Int, h: Int, sample: Seq[Int], littleEndian: Boolean,
               whiteIsZero: Boolean = false, rowsPerStrip: Int = 0,
               compression: Int = 1, predictor: Int = 1): Array[Byte] = {
    val spp = sample.length
    require(spp == 1 || spp == 3)
    require(compression == 1 || compression == 5 || compression == 32773)
    require(predictor == 1 || (predictor == 2 && compression == 5))
    val rps = if (rowsPerStrip <= 0) h else rowsPerStrip
    val strips = (h + rps - 1) / rps
    val rowBytes = w * spp
    val row = new Array[Byte](rowBytes)
    var x = 0
    while (x < w) { sample.indices.foreach(c => row(x * spp + c) = sample(c).toByte); x += 1 }
    def stripRows(i: Int): Int = math.min(rps, h - i * rps)
    // per-strip payloads first — compressed sizes decide the offsets
    val payloads: Array[Array[Byte]] = Array.tabulate(strips) { i =>
      val raw = new Array[Byte](stripRows(i) * rowBytes)
      (0 until stripRows(i)).foreach(r => System.arraycopy(row, 0, raw, r * rowBytes, rowBytes))
      if (predictor == 2) { // delta each row right-to-left against the prior pixel
        var r = 0
        while (r < stripRows(i)) {
          var k = rowBytes - 1
          while (k >= spp) { raw(r * rowBytes + k) = (raw(r * rowBytes + k) - raw(r * rowBytes + k - spp)).toByte; k -= 1 }
          r += 1
        }
      }
      compression match {
        case 1 => raw
        case 5 => lzwEncode(raw)
        case _ => packBitsEncode(raw)
      }
    }

    val hasPredictorTag = predictor == 2
    val nEntries = 9 + (if (hasPredictorTag) 1 else 0)
    val ifdStart = 8
    var aux = ifdStart + 2 + nEntries * 12 + 4
    val bpsOff = if (spp == 3) { val o = aux; aux += 6; o } else -1
    val soOff = if (strips > 1) { val o = aux; aux += strips * 4; o } else -1
    val scOff = if (strips > 1) { val o = aux; aux += strips * 4; o } else -1
    val dataOff = aux
    val stripOffs = payloads.scanLeft(dataOff)((acc, p) => acc + p.length)

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
    short1(259, compression)
    short1(262, if (whiteIsZero) 0 else if (spp == 3) 2 else 1)
    if (strips == 1) long1(273, dataOff) else { u16(273); u16(4); u32(strips); u32(soOff) }
    short1(277, spp)
    long1(278, rps)
    if (strips == 1) long1(279, payloads(0).length) else { u16(279); u16(4); u32(strips); u32(scOff) }
    if (hasPredictorTag) short1(317, 2)            // tags in ascending order
    u32(0)                                         // next IFD
    if (spp == 3) { u16(8); u16(8); u16(8) }
    if (strips > 1) {
      (0 until strips).foreach(i => u32(stripOffs(i)))
      (0 until strips).foreach(i => u32(payloads(i).length))
    }
    payloads.foreach(p => o.write(p, 0, p.length))
    o.toByteArray
  }

  /** PackBits (TIFF 6.0 §9) encoder: maximal repeat runs (2-128) as
    * (1-n, byte), leftover literals (1-128) as (n-1, bytes). */
  def packBitsEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 8)
    var i = 0
    while (i < data.length) {
      var run = 1
      while (run < 128 && i + run < data.length && data(i + run) == data(i)) run += 1
      if (run >= 2) {
        out.write(1 - run); out.write(data(i)); i += run
      } else {
        var lit = 1
        while (lit < 128 && i + lit < data.length &&
               !(i + lit + 1 < data.length && data(i + lit) == data(i + lit + 1))) lit += 1
        out.write(lit - 1); out.write(data, i, lit); i += lit
      }
    }
    out.toByteArray
  }

  private[media] def webpContainer(tag: String, payload: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write("RIFF".getBytes, 0, 4)
    le32(o, 4 + 8 + payload.length)
    o.write("WEBP".getBytes, 0, 4)
    o.write(tag.getBytes, 0, 4)
    le32(o, payload.length)
    o.write(payload, 0, payload.length)
    o.toByteArray
  }

  // ---- ICO (favicon) fixtures: ICONDIR + DIB-with-doubled-height or PNG ----

  /** ICONDIR wrapper: entries are (declaredW, declaredH, payload); payloads
    * land in listed order right after the directory. */
  private def icoContainer(entries: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    le16(o, 0); le16(o, 1); le16(o, entries.length)
    var off = 6 + 16 * entries.length
    entries.foreach { case (w, h, payload) =>
      o.write(if (w >= 256) 0 else w); o.write(if (h >= 256) 0 else h)
      o.write(0); o.write(0)  // colorCount, reserved
      le16(o, 1); le16(o, 0)  // planes, bitcount (informational)
      le32(o, payload.length); le32(o, off)
      off += payload.length
    }
    entries.foreach { case (_, _, p) => o.write(p, 0, p.length) }
    o.toByteArray
  }

  /** BITMAPINFOHEADER with the ICO height-doubling convention. */
  private def icoDibHeader(o: ByteArrayOutputStream, w: Int, h: Int, bpp: Int, clrUsed: Int): Unit = {
    le32(o, 40); le32(o, w); le32(o, 2 * h)
    le16(o, 1); le16(o, bpp); le32(o, 0) // planes, bpp, BI_RGB
    le32(o, 0); le32(o, 0); le32(o, 0); le32(o, clrUsed); le32(o, 0)
  }

  /** 24-bit flat-color DIB entry payload; `maskRightHalf` sets the AND mask
    * over x ≥ w/2 (1 = transparent), else the mask is all-opaque zeros. */
  private def icoDib24(w: Int, h: Int, r: Int, g: Int, bl: Int, maskRightHalf: Boolean): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    icoDibHeader(o, w, h, 24, 0)
    val stride = ((w * 3 + 3) / 4) * 4
    val row = new Array[Byte](stride)
    var x = 0
    while (x < w) { row(x * 3) = bl.toByte; row(x * 3 + 1) = g.toByte; row(x * 3 + 2) = r.toByte; x += 1 }
    for (_ <- 0 until h) o.write(row, 0, stride)
    val maskStride = ((w + 31) / 32) * 4
    val mrow = new Array[Byte](maskStride)
    if (maskRightHalf) {
      var mx = w / 2
      while (mx < w) { mrow(mx >> 3) = (mrow(mx >> 3) | (1 << (7 - (mx & 7)))).toByte; mx += 1 }
    }
    for (_ <- 0 until h) o.write(mrow, 0, maskStride)
    o.toByteArray
  }

  /** Single-entry 24-bit flat icon, all-opaque mask. */
  def icoBmp24Flat(w: Int, h: Int, r: Int, g: Int, bl: Int): Array[Byte] =
    icoContainer(Seq((w, h, icoDib24(w, h, r, g, bl, maskRightHalf = false))))

  /** 24-bit flat icon whose AND mask blanks the right half (alpha 255/0). */
  def icoBmp24Masked(w: Int, h: Int, r: Int, g: Int, bl: Int): Array[Byte] =
    icoContainer(Seq((w, h, icoDib24(w, h, r, g, bl, maskRightHalf = true))))

  /** 32-bit flat icon: per-pixel alpha in the XOR plane (255 left half, 0
    * right half); the AND mask present but vestigial (all zeros). */
  def icoBmp32AlphaHalf(w: Int, h: Int, r: Int, g: Int, bl: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    icoDibHeader(o, w, h, 32, 0)
    val row = new Array[Byte](w * 4)
    var x = 0
    while (x < w) {
      row(x * 4) = bl.toByte; row(x * 4 + 1) = g.toByte; row(x * 4 + 2) = r.toByte
      row(x * 4 + 3) = (if (x < w / 2) 0xff else 0).toByte
      x += 1
    }
    for (_ <- 0 until h) o.write(row, 0, row.length)
    val maskStride = ((w + 31) / 32) * 4
    o.write(new Array[Byte](maskStride * h), 0, maskStride * h)
    icoContainer(Seq((w, h, o.toByteArray)))
  }

  /** 4-bit paletted flat icon: palette slot `idx` carries the color, every
    * nibble points at it, mask all-opaque. */
  def icoPaletted4Flat(w: Int, h: Int, idx: Int, r: Int, g: Int, bl: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    icoDibHeader(o, w, h, 4, 0)
    for (k <- 0 until 16) {
      if (k == idx) { o.write(bl); o.write(g); o.write(r); o.write(0) }
      else { o.write(0); o.write(0); o.write(0); o.write(0) }
    }
    val stride = ((w * 4 + 31) / 32) * 4
    val row = new Array[Byte](stride)
    var x = 0
    while (x < (w + 1) / 2) { row(x) = ((idx << 4) | idx).toByte; x += 1 }
    for (_ <- 0 until h) o.write(row, 0, stride)
    val maskStride = ((w + 31) / 32) * 4
    o.write(new Array[Byte](maskStride * h), 0, maskStride * h)
    icoContainer(Seq((w, h, o.toByteArray)))
  }

  /** Complete flat-gray PNG (stored-deflate, CRCs/adler zeroed — the
    * decoder inflates raw and ignores them). */
  def pngGrayStored(w: Int, h: Int, v: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(0x89); o.write('P'); o.write('N'); o.write('G')
    o.write(0x0d); o.write(0x0a); o.write(0x1a); o.write(0x0a)
    def chunk(typ: String, body: Array[Byte]): Unit = {
      be32(o, body.length); o.write(typ.getBytes, 0, 4)
      o.write(body, 0, body.length); be32(o, 0)
    }
    val ihdr = new ByteArrayOutputStream()
    be32(ihdr, w); be32(ihdr, h)
    ihdr.write(8); ihdr.write(0); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    val raw = new Array[Byte]((1 + w) * h)
    for (y <- 0 until h; x <- 0 until w) raw(y * (1 + w) + 1 + x) = v.toByte
    val idat = new ByteArrayOutputStream()
    idat.write(0x78); idat.write(0x01) // zlib header (skipped by the decoder)
    idat.write(0x01); le16(idat, raw.length); le16(idat, raw.length ^ 0xffff)
    idat.write(raw, 0, raw.length)
    be32(idat, 0) // adler (unchecked: raw inflate)
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    o.toByteArray
  }

  /** PNG-entry icon (the modern high-res favicon layout). */
  def icoPngGrayFlat(w: Int, h: Int, v: Int): Array[Byte] =
    icoContainer(Seq((w, h, pngGrayStored(w, h, v))))

  /** Two entries — a 4×4 decoy in a wrong color first, then the real w×h
    * icon: decode must pick the larger. */
  def icoMulti(w: Int, h: Int, r: Int, g: Int, bl: Int): Array[Byte] =
    icoContainer(Seq(
      (4, 4, icoDib24(4, 4, (r + 90) % 256, (g + 90) % 256, (bl + 90) % 256, maskRightHalf = false)),
      (w, h, icoDib24(w, h, r, g, bl, maskRightHalf = false))))

  /** Minimal AVIF/HEIF still: ftyp(brand) + meta{FullBox}{iprp{ipco{ispe}}}
    * — the ISO-BMFF structure `media_sniff` walks for dimensions. */
  def avifIspe(w: Int, h: Int, brand: String = "avif"): Array[Byte] = {
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val bo = new ByteArrayOutputStream()
      be32(bo, 8 + body.length); bo.write(typ.getBytes, 0, 4); bo.write(body, 0, body.length)
      bo.toByteArray
    }
    val ispeBody = new ByteArrayOutputStream()
    be32(ispeBody, 0); be32(ispeBody, w); be32(ispeBody, h) // version/flags, dims
    val metaBody = new ByteArrayOutputStream()
    be32(metaBody, 0) // meta is a FullBox
    val iprp = box("iprp", box("ipco", box("ispe", ispeBody.toByteArray)))
    metaBody.write(iprp, 0, iprp.length)
    val ftypBody = new ByteArrayOutputStream()
    ftypBody.write(brand.getBytes, 0, 4); be32(ftypBody, 0)
    ftypBody.write("mif1".getBytes, 0, 4)
    val o = new ByteArrayOutputStream()
    val ftyp = box("ftyp", ftypBody.toByteArray)
    val meta = box("meta", metaBody.toByteArray)
    o.write(ftyp, 0, ftyp.length); o.write(meta, 0, meta.length)
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

  /** Multi-chunk RIFF/WEBP container (even-padded chunks). */
  private[media] def webpChunks(chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write("RIFF".getBytes, 0, 4)
    le32(o, 4 + chunks.map(c => 8 + c._2.length + (c._2.length & 1)).sum)
    o.write("WEBP".getBytes, 0, 4)
    for ((tag, body) <- chunks) {
      o.write(tag.getBytes, 0, 4)
      le32(o, body.length)
      o.write(body, 0, body.length)
      if ((body.length & 1) == 1) o.write(0)
    }
    o.toByteArray
  }

  /** Animated WebP: VP8X (animation flag, canvas dims) + ANIM + `frames`
    * ANMF headers each carrying a 24-bit millisecond duration — the
    * structure `av_meta` walks for frame count and Σ-duration. */
  def webpAnim(w: Int, h: Int, frames: Int, frameMs: Int): Array[Byte] = {
    require(w > 0 && h > 0 && frames > 0)
    def u24(o: ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff); o.write((v >> 16) & 0xff)
    }
    val vp8x = new ByteArrayOutputStream()
    vp8x.write(0x02) // animation flag
    vp8x.write(0); vp8x.write(0); vp8x.write(0)
    u24(vp8x, w - 1); u24(vp8x, h - 1)
    val anim = new ByteArrayOutputStream()
    le32(anim, 0) // background color
    le16(anim, 0) // loop count: forever
    val anmf = {
      val a = new ByteArrayOutputStream()
      u24(a, 0); u24(a, 0)         // frame x, y
      u24(a, w - 1); u24(a, h - 1) // frame dims minus one
      u24(a, frameMs)              // duration, ms
      a.write(0)                   // flags
      a.toByteArray
    }
    webpChunks(("VP8X", vp8x.toByteArray) +: ("ANIM", anim.toByteArray) +:
      Seq.fill(frames)(("ANMF", anmf)))
  }

  /** Minimal EXIF body (little-endian TIFF): IFD0 carries Make,
    * Orientation, and DateTime — or, with `dtInSub`, relocates the
    * timestamp into an Exif sub-IFD as DateTimeOriginal (0x9003); `withGps`
    * appends a one-entry GPS IFD behind the 0x8825 pointer. ASCII values
    * inline when ≤4 bytes, offset-indirected otherwise (TIFF 6.0 §2). */
  def exifTiffBody(orientation: Int, make: String, dateTime: String,
                   withGps: Boolean, dtInSub: Boolean): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16(v >>> 16) }
    val makeB = (make + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val dtB = (dateTime + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val n = 2 + 1 + (if (withGps) 1 else 0) // make, orientation, dt-or-exifptr [, gps]
    val ifd0End = 8 + 2 + n * 12 + 4
    val makeInline = makeB.length <= 4
    val makeOff = ifd0End
    val dtOff = makeOff + (if (makeInline) 0 else makeB.length)
    val exifOff = dtOff + (if (dtInSub || dtB.length <= 4) 0 else dtB.length)
    val exifLen = if (dtInSub) 2 + 12 + 4 + dtB.length else 0
    val gpsOff = exifOff + exifLen
    o.write('I'); o.write('I'); w16(0x2a); w32(8)
    w16(n)
    def entry(tag: Int, typ: Int, cnt: Int, inlineOrOff: Either[Array[Byte], Int]): Unit = {
      w16(tag); w16(typ); w32(cnt)
      inlineOrOff match {
        case Left(v) => o.write(v, 0, v.length); (v.length until 4).foreach(_ => o.write(0))
        case Right(off) => w32(off)
      }
    }
    entry(0x010f, 2, makeB.length, if (makeInline) Left(makeB) else Right(makeOff))
    entry(0x0112, 3, 1, Left(Array((orientation & 0xff).toByte, ((orientation >> 8) & 0xff).toByte)))
    if (dtInSub) entry(0x8769, 4, 1, Right(exifOff))
    else entry(0x0132, 2, dtB.length,
      if (dtB.length <= 4) Left(dtB) else Right(dtOff))
    if (withGps) entry(0x8825, 4, 1, Right(gpsOff))
    w32(0) // next IFD
    if (!makeInline) o.write(makeB, 0, makeB.length)
    if (!dtInSub && dtB.length > 4) o.write(dtB, 0, dtB.length)
    if (dtInSub) { // Exif sub-IFD: one DateTimeOriginal entry, data right after
      w16(1)
      entry(0x9003, 2, dtB.length, Right(exifOff + 2 + 12 + 4))
      w32(0)
      o.write(dtB, 0, dtB.length)
    }
    if (withGps) { // GPS IFD: GPSVersionID, 4 inline BYTEs
      w16(1)
      entry(0x0000, 1, 4, Left(Array[Byte](2, 3, 0, 0)))
      w32(0)
    }
    o.toByteArray
  }

  /** The same EXIF body wrapped as a JPEG APP1 segment (SOI + APP1 + EOI). */
  def exifJpeg(orientation: Int, make: String, dateTime: String,
               withGps: Boolean, dtInSub: Boolean = false): Array[Byte] = {
    val tiff = exifTiffBody(orientation, make, dateTime, withGps, dtInSub)
    val o = new ByteArrayOutputStream()
    o.write(0xff); o.write(0xd8) // SOI
    o.write(0xff); o.write(0xe1) // APP1
    val len = 2 + 6 + tiff.length
    o.write((len >> 8) & 0xff); o.write(len & 0xff)
    o.write("Exif".getBytes, 0, 4); o.write(0); o.write(0)
    o.write(tiff, 0, tiff.length)
    o.write(0xff); o.write(0xd9) // EOI
    o.toByteArray
  }

  /** APNG over the stored-deflate gray still: acTL after IHDR, an fcTL per
    * frame (delay = delayCs/100 s), frame 1's data in IDAT and the rest as
    * fdAT shells — `av_meta` reads frames + Σ-delay structurally while
    * `PngDecode` still renders frame 1 (ancillary chunks are skipped). */
  def apngFlat(w: Int, h: Int, frames: Int, delayCs: Int, v: Int): Array[Byte] = {
    require(w > 0 && h > 0 && frames > 0 && delayCs >= 0 && delayCs <= 255)
    val o = new ByteArrayOutputStream()
    o.write(0x89); o.write('P'); o.write('N'); o.write('G')
    o.write(0x0d); o.write(0x0a); o.write(0x1a); o.write(0x0a)
    def chunk(typ: String, body: Array[Byte]): Unit = {
      be32(o, body.length); o.write(typ.getBytes, 0, 4)
      o.write(body, 0, body.length); be32(o, 0) // CRC unchecked by the walkers
    }
    val ihdr = new ByteArrayOutputStream()
    be32(ihdr, w); be32(ihdr, h)
    ihdr.write(8); ihdr.write(0); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    val actl = new ByteArrayOutputStream()
    be32(actl, frames); be32(actl, 0) // num_frames, num_plays (forever)
    chunk("acTL", actl.toByteArray)
    var seq = 0
    def fctl(): Unit = {
      val f = new ByteArrayOutputStream()
      be32(f, seq); seq += 1
      be32(f, w); be32(f, h); be32(f, 0); be32(f, 0)
      f.write(0); f.write(delayCs) // delay_num u16be
      f.write(0); f.write(100)     // delay_den u16be = 100
      f.write(0); f.write(0)       // dispose, blend
      chunk("fcTL", f.toByteArray)
    }
    fctl()
    val raw = new Array[Byte]((1 + w) * h)
    for (y <- 0 until h; x <- 0 until w) raw(y * (1 + w) + 1 + x) = v.toByte
    val idat = new ByteArrayOutputStream()
    idat.write(0x78); idat.write(0x01)
    idat.write(0x01); le16(idat, raw.length); le16(idat, raw.length ^ 0xffff)
    idat.write(raw, 0, raw.length)
    be32(idat, 0)
    chunk("IDAT", idat.toByteArray)
    for (_ <- 1 until frames) {
      fctl()
      val fdat = new ByteArrayOutputStream()
      be32(fdat, seq); seq += 1
      chunk("fdAT", fdat.toByteArray)
    }
    chunk("IEND", Array.emptyByteArray)
    o.toByteArray
  }
}
