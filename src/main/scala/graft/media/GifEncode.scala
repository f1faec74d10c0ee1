package graft.media

/**
 * Deterministic GIF ENCODER for fixtures and oracles (the production decode
 * path is GifDecode). Writes a 256-entry grayscale palette and the classic
 * "uncompressed GIF" LZW stream: min code size 8, every pixel emitted as its
 * own 9-bit literal, with a CLEAR code re-issued before the decoder's dict
 * would force a width change — valid LZW that any conformant decoder accepts,
 * with zero encoder-side dictionary state. Supports the interlace flag (rows
 * stored in 4-pass order) so de-interlacing is testable.
 */
object GifEncode {

  /** Encode 8-bit grayscale (palette index i = color (i,i,i)), row-major. */
  def gray(pixels: Array[Int], w: Int, h: Int, interlace: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h, "pixels must be w*h")
    val out = new java.io.ByteArrayOutputStream(1024 + pixels.length * 2)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u16(w); u16(h)
    out.write(0xf7) // global color table, 8 bits/color-res, 256 entries
    out.write(0); out.write(0) // background, aspect
    (0 until 256).foreach { i => out.write(i); out.write(i); out.write(i) }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    out.write(if (interlace) 0x40 else 0x00)
    out.write(8) // LZW min code size

    // rows in storage order (4-pass interlace order when flagged)
    val rows: Seq[Int] =
      if (!interlace) 0 until h
      else Seq((0, 8), (4, 8), (2, 4), (1, 2)).flatMap { case (s, st) => s until h by st }

    // 9-bit LSB-first code stream: CLEAR, then literals; re-CLEAR every 250
    // pixels (decoder dict grows 1/code after the first post-clear code and
    // would widen at 512 entries = 254 codes)
    val codes = new java.io.ByteArrayOutputStream(pixels.length * 2)
    var bitBuf = 0
    var bitCnt = 0
    def emit(code: Int): Unit = {
      bitBuf |= (code & 0x1ff) << bitCnt
      bitCnt += 9
      while (bitCnt >= 8) { codes.write(bitBuf & 0xff); bitBuf >>>= 8; bitCnt -= 8 }
    }
    emit(256) // CLEAR
    var sinceClear = 0
    rows.foreach { y =>
      var x = 0
      while (x < w) {
        if (sinceClear == 250) { emit(256); sinceClear = 0 }
        emit(pixels(y * w + x) & 0xff)
        sinceClear += 1
        x += 1
      }
    }
    emit(257) // END
    if (bitCnt > 0) codes.write(bitBuf & 0xff)
    // wrap in <=255-byte sub-blocks
    val cb = codes.toByteArray
    var p = 0
    while (p < cb.length) {
      val len = math.min(255, cb.length - p)
      out.write(len)
      out.write(cb, p, len)
      p += len
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Flat grayscale fixture: every pixel = value (decodes back exactly). */
  def flatGray(w: Int, h: Int, value: Int): Array[Byte] =
    gray(Array.fill(w * h)(value & 0xff), w, h)

  /** Animated flat-color fixture: NETSCAPE loop extension, then `frames`
    * repetitions of [GCE(delayCs) + full-frame image] — AvMeta reads the
    * frame count and Σ-delay duration structurally; GifDecode still renders
    * frame 1. Same 3-bit clear-per-literal stream as flatColor. */
  def animFlat(w: Int, h: Int, frames: Int, delayCs: Int, r: Int, g: Int, bl: Int): Array[Byte] = {
    require(w > 0 && h > 0 && frames > 0)
    val out = new java.io.ByteArrayOutputStream(96 + frames * (16 + w * h))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u16(w); u16(h)
    out.write(0x91) // global color table, 4 entries
    out.write(0); out.write(0)
    out.write(r); out.write(g); out.write(bl)
    (0 until 9).foreach(_ => out.write(0))
    // NETSCAPE 2.0 application extension: loop forever
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(3); out.write(1); u16(0); out.write(0)
    for (_ <- 0 until frames) {
      out.write(0x21); out.write(0xf9); out.write(4) // GCE
      out.write(0); u16(delayCs); out.write(0); out.write(0)
      out.write(0x2c)
      u16(0); u16(0); u16(w); u16(h)
      out.write(0x00)
      out.write(2) // LZW min code size 2: clear=4, end=5
      val codes = new java.io.ByteArrayOutputStream(w * h)
      var bitBuf = 0
      var bitCnt = 0
      def emit(code: Int): Unit = {
        bitBuf |= (code & 7) << bitCnt
        bitCnt += 3
        while (bitCnt >= 8) { codes.write(bitBuf & 0xff); bitBuf >>>= 8; bitCnt -= 8 }
      }
      (0 until w * h).foreach { _ => emit(4); emit(0) }
      emit(5)
      if (bitCnt > 0) codes.write(bitBuf & 0xff)
      val cb = codes.toByteArray
      var p = 0
      while (p < cb.length) {
        val len = math.min(255, cb.length - p)
        out.write(len)
        out.write(cb, p, len)
        p += len
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Tiny flat-COLOR fixture: 4-entry palette with entry 0 = (r,g,bl), all
    * pixels index 0, and a CLEAR before every 3-bit literal so the dict never
    * grows — ~70 bytes total, compact enough to embed hundreds of variants
    * as plan literals (the q45 oracle pattern). */
  def flatColor(w: Int, h: Int, r: Int, g: Int, bl: Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val out = new java.io.ByteArrayOutputStream(96 + w * h)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u16(w); u16(h)
    out.write(0x91) // global color table, 4 entries
    out.write(0); out.write(0)
    out.write(r); out.write(g); out.write(bl)
    (0 until 9).foreach(_ => out.write(0)) // 3 black filler entries
    out.write(0x2c)
    u16(0); u16(0); u16(w); u16(h)
    out.write(0x00)
    out.write(2) // LZW min code size 2: clear=4, end=5
    val codes = new java.io.ByteArrayOutputStream(w * h)
    var bitBuf = 0
    var bitCnt = 0
    def emit(code: Int): Unit = {
      bitBuf |= (code & 7) << bitCnt
      bitCnt += 3
      while (bitCnt >= 8) { codes.write(bitBuf & 0xff); bitBuf >>>= 8; bitCnt -= 8 }
    }
    (0 until w * h).foreach { _ => emit(4); emit(0) }
    emit(5)
    if (bitCnt > 0) codes.write(bitBuf & 0xff)
    val cb = codes.toByteArray
    var p = 0
    while (p < cb.length) {
      val len = math.min(255, cb.length - p)
      out.write(len)
      out.write(cb, p, len)
      p += len
    }
    out.write(0)
    out.write(0x3b)
    out.toByteArray
  }
}
