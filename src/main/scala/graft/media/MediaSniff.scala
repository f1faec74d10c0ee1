package graft.media

/**
 * Multimodal binary-column support: image/audio/video payloads are opaque
 * `binary` columns with typed metadata extracted by header inspection.
 *
 * REAL: container detection + dimensions from headers (PNG IHDR, GIF logical
 * screen descriptor, JPEG SOF scan, RIFF/WAVE, ISO-BMFF/mp4, FLAC, MP3,
 * %PDF, HTML); content decode with per-channel mean/variance features for
 * PNG (PngDecode: inflate + un-filter), baseline AND progressive JPEG incl.
 * 4:2:0/4:2:2 chroma subsampling (JpegDecode: Huffman + dequant + IDCT, MCU
 * block walk, multi-scan successive approximation), GIF (GifDecode: LZW +
 * palette), WAV PCM audio (WavDecode), and FLAC audio (FlacDecode: Rice
 * residuals, fixed/LPC predictors, channel decorrelation); audio/video
 * duration/rate/dims via AvMeta.
 * STUB: feature extraction for formats whose codecs genuinely aren't in this
 * build environment (lossy-codec audio payloads — MP3/AAC — and video
 * frames) — those fall back to a deterministic byte-hash sketch with the
 * real schema/batching plumbing.
 */
object MediaSniff {

  final case class Info(format: String, width: Int, height: Int)

  def sniff(b: Array[Byte]): Info = {
    if (b == null || b.length < 4) return Info("unknown", -1, -1)
    def u(i: Int): Int = b(i) & 0xff
    // PNG: 89 50 4E 47 0D 0A 1A 0A, IHDR width/height at 16..23 (big-endian)
    if (b.length >= 24 && u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' && u(3) == 'G') {
      val w = (u(16) << 24) | (u(17) << 16) | (u(18) << 8) | u(19)
      val h = (u(20) << 24) | (u(21) << 16) | (u(22) << 8) | u(23)
      Info("png", w, h)
    } else if (b.length >= 10 && u(0) == 'G' && u(1) == 'I' && u(2) == 'F') {
      // GIF: logical screen descriptor, little-endian u16 at 6/8
      Info("gif", u(6) | (u(7) << 8), u(8) | (u(9) << 8))
    } else if (u(0) == 0xff && u(1) == 0xd8 && u(2) == 0xff) {
      // JPEG: scan segments for SOF0/1/2 (C0/C1/C2): height/width big-endian
      var i = 2
      var res = Info("jpeg", -1, -1)
      var done = false
      while (!done && i + 8 < b.length) {
        if (u(i) != 0xff) { i += 1 }
        else {
          val marker = u(i + 1)
          if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
            res = Info("jpeg", (u(i + 7) << 8) | u(i + 8), (u(i + 5) << 8) | u(i + 6))
            done = true
          } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
          else if (i + 3 < b.length) i += 2 + ((u(i + 2) << 8) | u(i + 3))
          else done = true
        }
      }
      res
    } else if (b.length >= 12 && u(0) == 'R' && u(1) == 'I' && u(2) == 'F' && u(3) == 'F' &&
        u(8) == 'W' && u(9) == 'A' && u(10) == 'V' && u(11) == 'E') {
      Info("wav", -1, -1)
    } else if (b.length >= 12 && u(0) == 'R' && u(1) == 'I' && u(2) == 'F' && u(3) == 'F' &&
        u(8) == 'W' && u(9) == 'E' && u(10) == 'B' && u(11) == 'P') {
      webpDims(b)
    } else if (b.length >= 26 && u(0) == 'B' && u(1) == 'M') {
      // BITMAPINFOHEADER: i32 LE width at 18, height at 22 (negative = top-down)
      def i32le(i: Int): Int = u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)
      Info("bmp", i32le(18), math.abs(i32le(22)))
    } else if (b.length >= 8 &&
        ((u(0) == 'I' && u(1) == 'I' && u(2) == 0x2a && u(3) == 0) ||
         (u(0) == 'M' && u(1) == 'M' && u(2) == 0 && u(3) == 0x2a))) {
      tiffDims(b)
    } else if (u(0) == '%' && u(1) == 'P' && u(2) == 'D' && u(3) == 'F') {
      Info("pdf", -1, -1)
    } else if (b.length >= 12 && u(4) == 'f' && u(5) == 't' && u(6) == 'y' && u(7) == 'p') {
      // ISO-BMFF: AVIF/HEIC stills carry dims in meta/iprp/ipco/ispe; the
      // mp4/mov video family keeps them in moov/trak boxes (AvMeta's job)
      val brand = new String(b, 8, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (brand == "avif" || brand == "avis") ispeDims(b, "avif")
      else if (brand == "heic" || brand == "heix" || brand == "mif1") ispeDims(b, "heif")
      else Info("mp4", -1, -1)
    } else if (u(0) == 'f' && u(1) == 'L' && u(2) == 'a' && u(3) == 'C') {
      Info("flac", -1, -1)
    } else if (u(0) == 'O' && u(1) == 'g' && u(2) == 'g' && u(3) == 'S') {
      Info("ogg", -1, -1)
    } else if ((u(0) == 'I' && u(1) == 'D' && u(2) == '3') ||
               (u(0) == 0xff && (u(1) & 0xe0) == 0xe0)) {
      Info("mp3", -1, -1)
    } else if (b.length >= 22 && u(0) == 0 && u(1) == 0 && u(2) == 1 && u(3) == 0) {
      icoDims(b)
    } else if (u(0) == '<') {
      svgOrHtml(b)
    } else Info("unknown", -1, -1)
  }

  /** '<'-led payloads: SVG when an `<svg` tag appears in the first 1 KiB
    * before any `<html`/`<!doctype` (vector favicons and inline icons are a
    * large crawl family); dims from the svg tag's width/height attributes
    * (unit-less or px; percent/em → -1) with a viewBox fallback. */
  // precompiled: sniff runs per row over whole corpora
  private val SvgWidthRe = "width\\s*=\\s*[\"']([0-9]+(?:\\.[0-9]+)?)(?:px)?[\"']".r
  private val SvgHeightRe = "height\\s*=\\s*[\"']([0-9]+(?:\\.[0-9]+)?)(?:px)?[\"']".r
  private val SvgViewBoxRe =
    "viewbox\\s*=\\s*[\"']\\s*[-0-9.]+[\\s,]+[-0-9.]+[\\s,]+([0-9.]+)[\\s,]+([0-9.]+)".r

  private def svgOrHtml(b: Array[Byte]): Info = {
    val n = math.min(b.length, 1024)
    val head = new String(b, 0, n, java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
    // tag boundary: "<svg" must end the tag name ("<svgfoo>" is a custom
    // element, not a vector image)
    val iSvg = {
      val i = head.indexOf("<svg")
      if (i >= 0 && i + 4 < head.length && Character.isLetterOrDigit(head.charAt(i + 4))) -1 else i
    }
    val iHtml = {
      val a = head.indexOf("<html"); val d = head.indexOf("<!doctype")
      if (a < 0) d else if (d < 0) a else math.min(a, d)
    }
    if (iSvg < 0 || (iHtml >= 0 && iHtml < iSvg)) return Info("html", -1, -1)
    val tagEnd = { val e = head.indexOf('>', iSvg); if (e < 0) head.length else e }
    val tag = head.substring(iSvg, tagEnd)
    var w = SvgWidthRe.findFirstMatchIn(tag).map(_.group(1).toDouble.round.toInt).getOrElse(-1)
    var h = SvgHeightRe.findFirstMatchIn(tag).map(_.group(1).toDouble.round.toInt).getOrElse(-1)
    if (w < 0 || h < 0) {
      SvgViewBoxRe.findFirstMatchIn(tag).foreach { m =>
        if (w < 0) w = m.group(1).toDouble.round.toInt
        if (h < 0) h = m.group(2).toDouble.round.toInt
      }
    }
    Info("svg", w, h)
  }

  /** AVIF/HEIF still-image dims: top-level `meta` (FullBox: 4-byte
    * version/flags) → `iprp` → `ipco` → first `ispe` (version/flags,
    * u32 width, u32 height). 64-bit and to-end box sizes bail to -1. */
  private def ispeDims(b: Array[Byte], fmt: String): Info = {
    def u32(i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    def find(start: Int, end: Int, typ: String): Option[(Int, Int)] = {
      var pos = start
      while (pos + 8 <= end) {
        val size = u32(pos)
        if (size < 8 || pos + size > end) return None
        if (b(pos + 4) == typ(0) && b(pos + 5) == typ(1) && b(pos + 6) == typ(2) && b(pos + 7) == typ(3))
          return Some((pos + 8, pos + size.toInt))
        pos += size.toInt
      }
      None
    }
    val dims = for {
      meta <- find(0, b.length, "meta")
      iprp <- find(meta._1 + 4, meta._2, "iprp") // meta is a FullBox
      ipco <- find(iprp._1, iprp._2, "ipco")
      ispe <- find(ipco._1, ipco._2, "ispe") if ispe._2 - ispe._1 >= 12
    } yield (u32(ispe._1 + 4).toInt, u32(ispe._1 + 8).toInt)
    dims match {
      case Some((w, h)) => Info(fmt, w, h)
      case None => Info(fmt, -1, -1)
    }
  }

  /** ICO dimensions: the LARGEST directory entry's declared size (byte
    * value 0 encodes 256, per ICONDIRENTRY). */
  private def icoDims(b: Array[Byte]): Info = {
    def u(i: Int): Int = b(i) & 0xff
    val count = u(4) | (u(5) << 8)
    if (count < 1 || count > 64 || 6 + 16 * count > b.length) return Info("unknown", -1, -1)
    var bw = -1
    var bh = -1
    var i = 0
    while (i < count) {
      val e = 6 + 16 * i
      val w = { val v = u(e); if (v == 0) 256 else v }
      val h = { val v = u(e + 1); if (v == 0) 256 else v }
      if (w.toLong * h > bw.toLong * bh) { bw = w; bh = h }
      i += 1
    }
    Info("ico", bw, bh)
  }

  /** WebP dimensions from the first chunk: VP8X canvas (24-bit LE minus-one
    * fields), VP8 lossy key frame (start code 9D 01 2A, 14-bit dims), or VP8L
    * lossless (0x2F signature, packed 14-bit minus-one dims). */
  private def webpDims(b: Array[Byte]): Info = {
    def u(i: Int): Int = b(i) & 0xff
    if (b.length < 20) return Info("webp", -1, -1)
    val tag = new String(b, 12, 4, java.nio.charset.StandardCharsets.US_ASCII)
    val p = 20 // chunk payload
    tag match {
      case "VP8X" if b.length >= p + 10 =>
        val w = 1 + (u(p + 4) | (u(p + 5) << 8) | (u(p + 6) << 16))
        val h = 1 + (u(p + 7) | (u(p + 8) << 8) | (u(p + 9) << 16))
        Info("webp", w, h)
      case "VP8 " if b.length >= p + 10 &&
          u(p + 3) == 0x9d && u(p + 4) == 0x01 && u(p + 5) == 0x2a =>
        Info("webp", (u(p + 6) | (u(p + 7) << 8)) & 0x3fff, (u(p + 8) | (u(p + 9) << 8)) & 0x3fff)
      case "VP8L" if b.length >= p + 5 && u(p) == 0x2f =>
        val w = 1 + (u(p + 1) | ((u(p + 2) & 0x3f) << 8))
        val h = 1 + ((u(p + 2) >> 6) | (u(p + 3) << 2) | ((u(p + 4) & 0x0f) << 10))
        Info("webp", w, h)
      case _ => Info("webp", -1, -1)
    }
  }

  /** TIFF dimensions: endian-aware IFD walk for ImageWidth (256) and
    * ImageLength (257); SHORT values sit in the value field's FIRST two bytes
    * in the file's byte order. */
  private def tiffDims(b: Array[Byte]): Info = {
    def u(i: Int): Int = b(i) & 0xff
    val le = b(0) == 'I'
    def u16(i: Int): Int = if (le) u(i) | (u(i + 1) << 8) else (u(i) << 8) | u(i + 1)
    def u32(i: Int): Long =
      if (le) u16(i).toLong | (u16(i + 2).toLong << 16) else (u16(i).toLong << 16) | u16(i + 2)
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return Info("tiff", -1, -1)
    val n = u16(ifd.toInt)
    var w = -1
    var h = -1
    var e = 0
    while (e < n && ifd + 2 + (e + 1) * 12 <= b.length) {
      val off = ifd.toInt + 2 + e * 12
      val tag = u16(off)
      val typ = u16(off + 2)
      if (tag == 256 || tag == 257) {
        val v = if (typ == 3) u16(off + 8) else u32(off + 8).toInt
        if (tag == 256) w = v else h = v
      }
      e += 1
    }
    Info("tiff", w, h)
  }

  /** 8-dim feature vector: [mean(ch0..ch3), variance(ch0..ch3)], absent
    * channels zero (population variance via E[x²] − mean², double
    * accumulators). REAL decode paths: PNG (inflate + un-filter), baseline
    * JPEG baseline AND progressive (Huffman + dequant + IDCT; gray or YCbCr
    * incl. 4:2:0/4:2:2 subsampling), GIF (LZW + palette → RGB), BMP, TIFF,
    * WebP lossless (VP8L: in-stream prefix codes, LZ77, color cache, all
    * four transforms), WAV PCM (8/16-bit, frames as the unit), FLAC. The
    * deterministic byte-hash sketch remains ONLY for lossy-codec payloads
    * (MP3/AAC audio, VP8-lossy WebP) and video frames — codecs defined by
    * fixed ISO/spec table data with no in-stream description. */
  /** The ONE image-decoder dispatch (PNG/JPEG/GIF/BMP/TIFF/WebP-lossless/
    * ICO) shared by features() and dhash64 — a new decoder wired here
    * reaches both, so the two can never disagree on which payloads are
    * images.
    * Returns (w, h, channels, interleaved u8 samples, isYcc); isYcc marks
    * JPEG's raw YCbCr 3-channel layout (every other decoder emits gray,
    * RGB, or RGBA). */
  private def decodeImage(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte], Boolean)] = {
    if (b == null) return None
    PngDecode.decode(b).map(p => (p.width, p.height, p.channels, p.samples, false))
      .orElse(JpegDecode.decode(b).map(p =>
        (p.width, p.height, p.channels, p.samples, p.channels == 3)))
      .orElse(GifDecode.decode(b).map(p => (p.width, p.height, p.channels, p.samples, false)))
      .orElse(BmpDecode.decode(b).map(p => (p.width, p.height, p.channels, p.samples, false)))
      .orElse(TiffDecode.decode(b).map(p => (p.width, p.height, p.channels, p.samples, false)))
      .orElse(WebpDecode.decode(b).map(p => (p.width, p.height, p.channels, p.samples, false)))
      .orElse(IcoDecode.decode(b).map(p => (p.width, p.height, p.channels, p.samples, false)))
  }

  def features(b: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    if (b == null) return out
    // (unit count, channels, interleaved u8 samples) — pixels for images,
    // frames for audio
    val decoded: Option[(Long, Int, Array[Byte])] =
      decodeImage(b).map { case (w, h, ch, s, _) => (w.toLong * h, ch, s) }
        .orElse(WavDecode.decode(b).map(s => (s.frames.toLong, s.channels, s.data)))
        .orElse(FlacDecode.decode(b).map(s => (s.frames.toLong, s.channels, s.data)))
        .orElse(VorbisDecode.decode(b).map(p => (p.frames, p.channels, p.data)))
    decoded match {
      case Some((n, channels, samples)) =>
        val sums = new Array[Double](4)
        val sqs = new Array[Double](4)
        var i = 0
        while (i < samples.length) {
          val v = (samples(i) & 0xff).toDouble
          val c = i % channels
          sums(c) += v
          sqs(c) += v * v
          i += 1
        }
        var c = 0
        while (c < channels) {
          val mean = sums(c) / n
          out(c) = mean.toFloat
          out(4 + c) = (sqs(c) / n - mean * mean).toFloat
          c += 1
        }
        out
      case None => hashSketch(b)
    }
  }

  /** 64-bit difference hash (dHash) for perceptual image dedup — the
    * classic crawl-pipeline near-dup key (same photo re-encoded, resized, or
    * recompressed hashes identically or within a few bits; Hamming distance
    * buckets then group near-dups without pairwise pixel comparison).
    *
    * Definition (fixed, so oracles can state it in closed form):
    * gray = per-pixel channel mean; the image is block-averaged onto a 9×8
    * grid (cell cx covers x ∈ [⌊cx·w/9⌋, ⌊(cx+1)·w/9⌋), likewise 8 rows);
    * bit cy·8+cx is set iff cell(cx,cy) > cell(cx+1,cy). Block-averaging IS
    * the resize step — the hash is invariant across resolutions of the same
    * composition by construction.
    *
    * Gray is BT.601 LUMA, not a channel mean: JPEG decode emits raw YCbCr
    * planes, so its gray is the Y plane directly, and RGB formats apply the
    * SAME 0.299/0.587/0.114 matrix JPEG itself uses — a chromatic
    * composition therefore hashes identically whether it arrives as
    * PNG/BMP/GIF/TIFF or as a JPEG re-encode (a naive channel mean would
    * hash JPEGs in YCbCr space and RGB formats in RGB space, splitting the
    * same photo across groups).
    *
    * Images only (PNG/JPEG/GIF/BMP/TIFF dispatch); None for audio, undecodable
    * payloads, or images smaller than the 9×8 grid. */
  def dhash64(b: Array[Byte]): Option[Long] = {
    decodeImage(b).flatMap { case (w, h, ch, s, isYcc) =>
      if (w < 9 || h < 8 || ch < 1) None
      else {
        // integer luma in [0, 255*256): (77,150,29)/256 ≈ BT.601, exact sums
        def luma(o: Int): Long =
          if (ch < 3 || isYcc) (s(o) & 0xff).toLong << 8 // gray(+alpha) / Y plane
          else 77L * (s(o) & 0xff) + 150L * (s(o + 1) & 0xff) + 29L * (s(o + 2) & 0xff)
        val means = new Array[Double](72) // row-major 8×9
        var cy = 0
        while (cy < 8) {
          val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
          var cx = 0
          while (cx < 9) {
            val x0 = cx * w / 9; val x1 = (cx + 1) * w / 9
            var sum = 0L; var cnt = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) { sum += luma((y * w + x) * ch); x += 1 }
              cnt += (x1 - x0).toLong
              y += 1
            }
            means(cy * 9 + cx) = sum.toDouble / cnt // w≥9, h≥8 ⇒ cnt > 0
            cx += 1
          }
          cy += 1
        }
        var hash = 0L
        cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 8) {
            if (means(cy * 9 + cx) > means(cy * 9 + cx + 1)) hash |= 1L << (cy * 8 + cx)
            cx += 1
          }
          cy += 1
        }
        Some(hash)
      }
    }
  }

  /** STUB fallback: deterministic 8-dim byte-hash sketch standing in for a
    * real embedding model (codec libs absent for lossy audio payloads and
    * video frames). The Spark-side schema, partitioning and batch shape are
    * the real contract. */
  private def hashSketch(b: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    var h = 0x9e3779b97f4a7c15L
    while (i < b.length) {
      h = (h ^ (b(i) & 0xffL)) * 0x100000001b3L
      out(i % 8) += ((h >>> 40).toInt & 0xffff) / 65536.0f - 0.5f
      i += 1
    }
    out
  }
}
