package graft.media

import scala.util.control.NonFatal

/**
 * Typed audio/video metadata from opaque binary columns — the multimodal
 * analog of `pdf_preflight`: a 100 TB pipeline needs duration / sample-rate /
 * dimensions for corpus stats, filtering and balancing long before (and
 * usually instead of) any frame decode. Header/frame-structure parsing only,
 * all pure JVM:
 *
 *  - MP4 / ISO-BMFF (ISO 14496-12): box walk → `mvhd` timescale+duration,
 *    first video `tkhd` 16.16 fixed-point dimensions, `hdlr` track kinds.
 *  - MP3 (ISO 11172-3 frame headers): ID3v2 skip → Layer III frame walk
 *    (bitrate/samplerate tables, padding), duration from the frame count.
 *  - FLAC: STREAMINFO bit-packed sample rate / channels / bits / total
 *    samples.
 *  - WAV: RIFF `fmt ` + `data` chunk lengths (no sample copy).
 *
 * Codec payload decode for these containers stays the declared stub in
 * `MediaSniff.features` — metadata is the part with closed-form semantics.
 */
object AvMeta {

  /** -1 marks fields the container does not carry (or the parse could not
    * establish); durationMs is floor(units * 1000 / timescale). `frames` is
    * the animation frame count (GIF); -1 for containers that don't expose
    * one structurally. */
  final case class AvInfo(format: String, durationMs: Long, sampleRate: Int,
                          channels: Int, width: Int, height: Int, frames: Int = -1)

  private val unknown = AvInfo("unknown", -1L, -1, -1, -1, -1)

  def parse(b: Array[Byte]): AvInfo = {
    try {
      if (b == null || b.length < 8) unknown
      else if (b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') mp4(b)
      else if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') flac(b)
      else if (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S') ogg(b)
      else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
               b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') wav(b)
      else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
               b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') webp(b)
      else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') png(b)
      else if ((b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
               ((b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0)) mp3(b)
      else if (b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') gif(b)
      else unknown
    } catch { case NonFatal(_) => unknown }
  }

  // ---------------------------------------------------------------- MP4

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u64(b: Array[Byte], i: Int): Long = (u32(b, i) << 32) | u32(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def mp4(b: Array[Byte]): AvInfo = {
    var durationMs = -1L
    var width = -1
    var height = -1
    var pendingW = -1 // dims of the trak currently open, claimed when its hdlr says "vide"
    var pendingH = -1

    // one flat walk: container boxes (moov/trak/mdia) are descended into by
    // pushing their payload range; leaves are parsed in place
    final case class Range(from: Long, until: Long)
    var stack = List(Range(0L, b.length.toLong))
    while (stack.nonEmpty) {
      val r = stack.head
      stack = stack.tail
      var pos = r.from
      while (pos + 8 <= r.until) {
        val size0 = u32(b, pos.toInt)
        val typ = fourcc(b, pos.toInt + 4)
        val (size, hdr) =
          if (size0 == 1 && pos + 16 <= r.until) (u64(b, pos.toInt + 8), 16)
          else if (size0 == 0) (r.until - pos, 8) // box runs to end of enclosing range
          else (size0, 8)
        if (size < hdr || pos + size > r.until) pos = r.until // malformed: stop this range
        else {
          val body = pos + hdr
          val blen = (size - hdr).toInt
          typ match {
            case "moov" | "trak" | "mdia" =>
              if (typ == "trak") { pendingW = -1; pendingH = -1 }
              stack = Range(body, pos + size) :: stack
            case "mvhd" if blen >= 20 =>
              val v = b(body.toInt) & 0xff
              val (ts, dur) =
                if (v == 1 && blen >= 32) (u32(b, body.toInt + 20), u64(b, body.toInt + 24))
                else (u32(b, body.toInt + 12), u32(b, body.toInt + 16))
              if (ts > 0) durationMs = dur * 1000L / ts
            case "tkhd" if blen >= 84 =>
              val v = b(body.toInt) & 0xff
              val dimOff = if (v == 1) 88 else 76 // v1: +12 bytes of 64-bit times
              if (blen >= dimOff + 8) {
                pendingW = (u32(b, body.toInt + dimOff) >>> 16).toInt     // 16.16 fixed
                pendingH = (u32(b, body.toInt + dimOff + 4) >>> 16).toInt
              }
            case "hdlr" if blen >= 12 =>
              if (fourcc(b, body.toInt + 8) == "vide" && width < 0) {
                width = pendingW; height = pendingH
              }
            case _ => ()
          }
          pos += size
        }
      }
    }
    AvInfo("mp4", durationMs, -1, -1, width, height)
  }

  // ---------------------------------------------------------------- MP3

  private val srMpeg1 = Array(44100, 48000, 32000)
  private val srMpeg2 = Array(22050, 24000, 16000)
  private val srMpeg25 = Array(11025, 12000, 8000)
  private val brL3Mpeg1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val brL3Mpeg2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** Layer III frame walk. Other layers / free-format bitrate → unknown
    * (falls to the declared stub path, like non-PCM WAV). */
  private def mp3(b: Array[Byte]): AvInfo = {
    var pos = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // ID3v2: 4 syncsafe size bytes (7 bits each) after the 6-byte header
      val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) | ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      pos = 10 + sz
    }
    var sampleRate = -1
    var channels = -1
    var totalSamples = 0L
    var frames = 0
    var done = false
    while (!done && pos + 4 <= b.length) {
      val h0 = b(pos) & 0xff; val h1 = b(pos + 1) & 0xff
      val h2 = b(pos + 2) & 0xff; val h3 = b(pos + 3) & 0xff
      if (h0 != 0xff || (h1 & 0xe0) != 0xe0) done = true
      else {
        val version = (h1 >> 3) & 3  // 0=2.5, 2=MPEG2, 3=MPEG1
        val layer = (h1 >> 1) & 3    // 1=III
        val brIdx = (h2 >> 4) & 0xf
        val srIdx = (h2 >> 2) & 3
        val padding = (h2 >> 1) & 1
        if (layer != 1 || version == 1 || brIdx == 0 || brIdx == 15 || srIdx == 3) done = true
        else {
          val mpeg1 = version == 3
          val sr = (if (mpeg1) srMpeg1 else if (version == 2) srMpeg2 else srMpeg25)(srIdx)
          val br = (if (mpeg1) brL3Mpeg1 else brL3Mpeg2)(brIdx) * 1000
          val frameLen = (if (mpeg1) 144 else 72) * br / sr + padding
          if (frameLen < 4 || pos + frameLen > b.length) done = true
          else {
            if (frames == 0) {
              sampleRate = sr
              channels = if (((h3 >> 6) & 3) == 3) 1 else 2
              // VBR: a "Xing"/"Info" tag rides the FIRST frame after the side
              // info (offset by version/channel-mode); its frame count beats
              // walking — the walk undercounts whenever a crawl pipeline has
              // truncated the payload, and VBR frame lengths vary anyway
              val side = if (mpeg1) { if (channels == 1) 17 else 32 }
                         else { if (channels == 1) 9 else 17 }
              val x = pos + 4 + side
              if (x + 12 <= b.length &&
                  ((b(x) == 'X' && b(x + 1) == 'i' && b(x + 2) == 'n' && b(x + 3) == 'g') ||
                   (b(x) == 'I' && b(x + 1) == 'n' && b(x + 2) == 'f' && b(x + 3) == 'o')) &&
                  (b(x + 7) & 1) == 1) { // flags bit 0: frame count present
                val nFrames = u32(b, x + 8)
                if (nFrames > 0)
                  return AvInfo("mp3",
                    nFrames * (if (mpeg1) 1152L else 576L) * 1000L / sr, sr, channels, -1, -1)
              }
            }
            totalSamples += (if (mpeg1) 1152 else 576)
            frames += 1
            pos += frameLen
          }
        }
      }
    }
    if (frames == 0) unknown
    else AvInfo("mp3", totalSamples * 1000L / sampleRate, sampleRate, channels, -1, -1)
  }

  // ---------------------------------------------------------------- FLAC

  private def flac(b: Array[Byte]): AvInfo = {
    // METADATA_BLOCK_HEADER at 4: [last:1][type:7] + 24-bit length;
    // STREAMINFO (type 0) is mandatory-first per spec
    if (b.length < 4 + 4 + 34 || (b(4) & 0x7f) != 0) return unknown
    val s = 8 // STREAMINFO payload start
    // [min_bs:16][max_bs:16][min_fs:24][max_fs:24][sr:20][ch-1:3][bps-1:5][total:36]
    val p = s + 10
    val sampleRate = ((b(p) & 0xff) << 12) | ((b(p + 1) & 0xff) << 4) | ((b(p + 2) & 0xff) >> 4)
    val channels = (((b(p + 2) & 0xff) >> 1) & 0x7) + 1
    val totalSamples = ((b(p + 3) & 0x0fL) << 32) |
      ((b(p + 4) & 0xffL) << 24) | ((b(p + 5) & 0xffL) << 16) |
      ((b(p + 6) & 0xffL) << 8) | (b(p + 7) & 0xffL)
    if (sampleRate <= 0) unknown
    else AvInfo("flac", totalSamples * 1000L / sampleRate, sampleRate, channels, -1, -1)
  }

  // ---------------------------------------------------------------- Ogg

  /** Ogg container (RFC 3533) page walk: sample rate / channels from the
    * first page's Vorbis identification header (or OpusHead), duration from
    * the LAST page's granule position (PCM sample count for Vorbis; 48 kHz
    * units for Opus, per RFC 7845). */
  private def ogg(b: Array[Byte]): AvInfo = {
    def u32le(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    var pos = 0
    var sampleRate = -1
    var channels = -1
    var granuleRate = -1L // granule units per second
    var lastGranule = -1L
    var firstPage = true
    while (pos + 27 <= b.length &&
           b(pos) == 'O' && b(pos + 1) == 'g' && b(pos + 2) == 'g' && b(pos + 3) == 'S') {
      var granule = 0L
      var k = 7
      while (k >= 0) { granule = (granule << 8) | (b(pos + 6 + k) & 0xffL); k -= 1 }
      val nSegs = b(pos + 26) & 0xff
      if (pos + 27 + nSegs > b.length) return AvInfo("ogg", -1, sampleRate, channels, -1, -1)
      var bodyLen = 0
      var s = 0
      while (s < nSegs) { bodyLen += b(pos + 27 + s) & 0xff; s += 1 }
      val body = pos + 27 + nSegs
      if (firstPage && body + 30 <= b.length) {
        if ((b(body) & 0xff) == 1 && fourcc(b, body + 1) == "vorb") {
          // 0x01 "vorbis" version(4) channels(1) rate(4 LE) ...
          channels = b(body + 11) & 0xff
          sampleRate = u32le(body + 12).toInt
          granuleRate = sampleRate.toLong
        } else if (body + 19 <= b.length && fourcc(b, body) == "Opus") {
          // "OpusHead" version(1) channels(1) preskip(2) input-rate(4 LE)
          channels = b(body + 9) & 0xff
          sampleRate = u32le(body + 12).toInt
          granuleRate = 48000L // Opus granules are 48 kHz regardless of rate
        }
        firstPage = false
      }
      if (granule >= 0) lastGranule = granule
      pos = body + bodyLen
    }
    val durationMs =
      if (lastGranule >= 0 && granuleRate > 0) lastGranule * 1000L / granuleRate else -1L
    AvInfo("ogg", durationMs, sampleRate, channels, -1, -1)
  }

  // ---------------------------------------------------------------- PNG (APNG)

  /** APNG animation structure (public APNG spec, now PNG third edition):
    * frames from acTL's num_frames, duration = Σ fcTL delays
    * (delay_num/delay_den seconds; den 0 reads as 100 per spec). A PNG
    * without acTL is a still: frames=1, duration 0. Dims from IHDR. CRCs
    * are not verified (same stance as PngDecode); truncation keeps what
    * was walked. */
  private def png(b: Array[Byte]): AvInfo = {
    def u32be(i: Int): Long = u32(b, i)
    def u16be(i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    var pos = 8
    var w = -1
    var h = -1
    var frames = -1
    var durMs = 0L
    var done = false
    while (!done && pos + 8 <= b.length) {
      val len = u32be(pos)
      val start = pos + 8
      if (len > b.length - start) done = true // truncated chunk: keep what we have
      else {
        val t0 = b(pos + 4); val t1 = b(pos + 5); val t2 = b(pos + 6); val t3 = b(pos + 7)
        if (t0 == 'I' && t1 == 'H' && t2 == 'D' && t3 == 'R') {
          if (len >= 8) { w = u32be(start).toInt; h = u32be(start + 4).toInt }
        } else if (t0 == 'a' && t1 == 'c' && t2 == 'T' && t3 == 'L') {
          if (len >= 8) frames = u32be(start).toInt
        } else if (t0 == 'f' && t1 == 'c' && t2 == 'T' && t3 == 'L') {
          if (len >= 24) {
            val num = u16be(start + 20)
            val den0 = u16be(start + 22)
            val den = if (den0 == 0) 100 else den0
            durMs += num.toLong * 1000L / den
          }
        } else if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') done = true
        val next = start.toLong + len + 4L // + CRC
        if (next <= pos || next > Int.MaxValue) done = true else pos = next.toInt
      }
    }
    AvInfo("png", if (frames > 0) durMs else 0L, -1, -1, w, h,
      frames = if (frames > 0) frames else 1)
  }

  // ---------------------------------------------------------------- WebP

  /** Animated-WebP structure: canvas dims from VP8X, frames = ANMF chunks,
    * duration = Σ ANMF 24-bit millisecond durations. A still (no ANMF)
    * reads frames=1, duration 0. */
  private def webp(b: Array[Byte]): AvInfo = {
    def u24le(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
    def u32le(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    var pos = 12
    var w = -1
    var h = -1
    var frames = 0
    var durMs = 0L
    var walking = true
    while (walking && pos + 8 <= b.length) {
      val len = u32le(pos + 4)
      val start = pos + 8
      if (len > b.length - start) walking = false // truncated: keep what we have
      else {
        val t0 = b(pos); val t1 = b(pos + 1); val t2 = b(pos + 2); val t3 = b(pos + 3)
        if (t0 == 'V' && t1 == 'P' && t2 == '8' && t3 == 'X') {
          if (len >= 10) { w = u24le(start + 4) + 1; h = u24le(start + 7) + 1 }
        } else if (t0 == 'A' && t1 == 'N' && t2 == 'M' && t3 == 'F') {
          if (len >= 16) { frames += 1; durMs += u24le(start + 12) }
        }
        val next = start.toLong + len + (len & 1L) // even-padded chunks
        if (next <= pos || next > Int.MaxValue) walking = false else pos = next.toInt
      }
    }
    AvInfo("webp", if (frames > 0) durMs else 0L, -1, -1, w, h,
      frames = if (frames > 0) frames else 1)
  }

  // ---------------------------------------------------------------- GIF

  /** Animation structure without decoding a pixel: frame count = image
    * descriptors, duration = Σ Graphic Control Extension delays (1/100 s
    * units → ms). A static GIF reads frames=1, duration 0. Truncated or
    * malformed block lists keep whatever was walked so far. */
  private def gif(b: Array[Byte]): AvInfo = {
    def u16le(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    val w = u16le(6)
    val h = u16le(8)
    val flags = b(10) & 0xff
    var pos = 13 + (if ((flags & 0x80) != 0) 3 * (1 << ((flags & 7) + 1)) else 0)
    var frames = 0
    var delayCs = 0L
    def skipSubBlocks(p0: Int): Int = {
      var p = p0
      while (p < b.length && (b(p) & 0xff) != 0) p += 1 + (b(p) & 0xff)
      p + 1
    }
    var done = false
    while (!done && pos + 1 < b.length) {
      (b(pos) & 0xff) match {
        case 0x3b => done = true // trailer
        case 0x21 => // extension: GCE (0xF9) carries the frame delay
          if ((b(pos + 1) & 0xff) == 0xf9 && pos + 6 < b.length && (b(pos + 2) & 0xff) >= 4)
            delayCs += u16le(pos + 4)
          pos = skipSubBlocks(pos + 2)
        case 0x2c => // image descriptor
          if (pos + 10 > b.length) done = true
          else {
            frames += 1
            val lf = b(pos + 9) & 0xff
            val p = pos + 10 +
              (if ((lf & 0x80) != 0) 3 * (1 << ((lf & 7) + 1)) else 0) + 1 // + LZW min code size
            pos = skipSubBlocks(p)
          }
        case _ => done = true // malformed block stream: keep what we have
      }
    }
    AvInfo("gif", if (frames > 0) delayCs * 10 else -1L, -1, -1, w, h,
      frames = if (frames > 0) frames else -1)
  }

  // ---------------------------------------------------------------- WAV

  /** Chunk lengths only — duration without touching the sample bytes. */
  private def wav(b: Array[Byte]): AvInfo = {
    def u16le(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32le(i: Int): Long = u16le(i).toLong | (u16le(i + 2).toLong << 16)
    var pos = 12
    var sampleRate = -1
    var channels = -1
    var bytesPerFrame = 0
    var dataLen = -1L
    var walking = true
    while (walking && pos + 8 <= b.length && (sampleRate < 0 || dataLen < 0)) {
      val id = fourcc(b, pos)
      val len = u32le(pos + 4)
      val body = pos + 8
      if (id == "fmt " && len >= 16 && body + 16 <= b.length) {
        channels = u16le(body + 2)
        sampleRate = u32le(body + 4).toInt
        bytesPerFrame = u16le(body + 12) // block align
      } else if (id == "data") {
        dataLen = math.min(len, (b.length - body).toLong)
      }
      // next offset in LONG arithmetic: a crafted 32-bit length like
      // 0xFFFFFFF8 would wrap `body + len.toInt` back to pos (no exception,
      // so the NonFatal wrapper never fires) and spin this walk forever —
      // hostile crawl bytes must never hang an executor task
      val next = body.toLong + len + (len & 1L)
      if (next <= pos || next > Int.MaxValue) walking = false
      else pos = next.toInt
    }
    if (sampleRate <= 0 || bytesPerFrame <= 0 || dataLen < 0) unknown
    else AvInfo("wav", (dataLen / bytesPerFrame) * 1000L / sampleRate, sampleRate, channels, -1, -1)
  }
}
