package graft.media

import java.io.ByteArrayOutputStream

/**
 * Deterministic minimal-container builders for the AV-metadata fixtures —
 * the q44/q45 pattern (`JpegEncode`/`GifEncode`): build a tiny valid payload
 * whose parsed metadata is statable in closed form, so the oracle needs no
 * media dialect at all. Fixtures only; the pipeline never encodes media.
 */
object AvEncode {

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val total = 8 + payload.map(_.length).sum
    out.write(be32(total), 0, 4)
    out.write(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII), 0, 4)
    payload.foreach(p => out.write(p, 0, p.length))
    out.toByteArray
  }

  /** Minimal ISO-BMFF movie: ftyp + moov(mvhd, trak(tkhd, mdia(mdhd, hdlr
    * "vide"))). No mdat — metadata-complete is all the parser needs. */
  def mp4Video(width: Int, height: Int, durationUnits: Long, timescale: Long): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes, be32(0x200), "isom".getBytes)
    val mvhd = box("mvhd",
      new Array[Byte](4),                 // version 0 + flags
      new Array[Byte](8),                 // creation + modification
      be32(timescale), be32(durationUnits),
      be32(0x00010000), be16(0x0100),     // rate 1.0, volume 1.0
      new Array[Byte](10),                // reserved
      identityMatrix, new Array[Byte](24), // matrix + predefined
      be32(2))                            // next track id
    val tkhd = box("tkhd",
      Array[Byte](0, 0, 0, 7),            // version 0, flags: enabled|in-movie|in-preview
      new Array[Byte](8),                 // creation + modification
      be32(1), new Array[Byte](4),        // track id, reserved
      be32(durationUnits),
      new Array[Byte](8),                 // reserved
      be16(0), be16(0), be16(0), be16(0), // layer, group, volume, reserved
      identityMatrix,
      be32(width.toLong << 16), be32(height.toLong << 16)) // 16.16 fixed
    val mdhd = box("mdhd",
      new Array[Byte](4), new Array[Byte](8),
      be32(timescale), be32(durationUnits),
      be16(0x55c4), be16(0))              // language "und", predefined
    val hdlr = box("hdlr",
      new Array[Byte](4), new Array[Byte](4),
      "vide".getBytes, new Array[Byte](12),
      Array[Byte](0))                     // empty name
    val out = new ByteArrayOutputStream()
    out.write(ftyp, 0, ftyp.length)
    val moov = box("moov", mvhd, box("trak", tkhd, box("mdia", mdhd, hdlr)))
    out.write(moov, 0, moov.length)
    out.toByteArray
  }

  private def identityMatrix: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val m = Array(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
    m.foreach(v => out.write(be32(v), 0, 4))
    out.toByteArray
  }

  /** MPEG1 Layer III mono 128 kbps @ 44100: header FF FB 90 C0, frame length
    * 144·128000/44100 = 417 bytes, 1152 samples/frame. Payload zeros — the
    * frame WALK (not audio decode) is what the parser reads. */
  def mp3Silent(frames: Int): Array[Byte] = {
    val frameLen = 144 * 128000 / 44100 // 417, no padding
    val out = new Array[Byte](frames * frameLen)
    var f = 0
    while (f < frames) {
      val o = f * frameLen
      out(o) = 0xff.toByte; out(o + 1) = 0xfb.toByte
      out(o + 2) = 0x90.toByte; out(o + 3) = 0xc0.toByte
      f += 1
    }
    out
  }

  /** Complete decodable FLAC fixture: STREAMINFO + CONSTANT-subframe frames
    * (8000 Hz, mono, 8-bit signed `value`, fixed 4096-sample blocks with a
    * short tail) — a flat signal, so the decoded u8 statistics are
    * `value + 128` exactly (FlacDecode's normalization). */
  def flacConstant(totalSamples: Int, value: Int): Array[Byte] = {
    require(totalSamples > 0 && value >= -128 && value <= 127)
    val out = new ByteArrayOutputStream()
    val si = flacStreamInfo(totalSamples.toLong)
    out.write(si, 0, si.length)
    var done = 0
    var frame = 0
    while (done < totalSamples) {
      val bs = math.min(4096, totalSamples - done)
      out.write(0xff); out.write(0xf8)       // sync + fixed blocking
      out.write(0x70)                        // bsCode 7 (16-bit follows), srCode 0
      out.write(0x02)                        // mono, 8 bps (ssCode 001), reserved 0
      out.write(frame & 0x7f)                // UTF-8 frame number (< 128)
      out.write(be16(bs - 1), 0, 2)
      out.write(0)                           // CRC-8 (decoder parses past)
      out.write(0x00)                        // subframe: CONSTANT, no wasted bits
      out.write(value & 0xff)                // the constant sample
      out.write(0); out.write(0)             // CRC-16
      done += bs
      frame += 1
    }
    out.toByteArray
  }

  /** Minimal Ogg/Vorbis fixture (RFC 3533 pages): a BOS page carrying the
    * Vorbis identification header, then an EOS page whose granule position is
    * `totalSamples` — duration and rate/channels are closed-form. Page CRCs
    * are zero (the parser walks past them). */
  def oggVorbis(sampleRate: Int, channels: Int, totalSamples: Long): Array[Byte] = {
    def page(headerType: Int, granule: Long, seq: Int, body: Array[Byte]): Array[Byte] = {
      require(body.length < 255)
      val out = new ByteArrayOutputStream()
      out.write("OggS".getBytes, 0, 4)
      out.write(0)               // version
      out.write(headerType)      // 0x02 BOS / 0x04 EOS
      var g = granule
      (0 until 8).foreach { _ => out.write((g & 0xff).toInt); g >>= 8 }
      out.write(Array[Byte](1, 0, 0, 0), 0, 4)  // serial
      out.write(Array[Byte](seq.toByte, 0, 0, 0), 0, 4)
      out.write(new Array[Byte](4), 0, 4)       // CRC (unverified)
      out.write(1)                              // one segment
      out.write(body.length)
      out.write(body, 0, body.length)
      out.toByteArray
    }
    val id = new ByteArrayOutputStream()
    id.write(1); id.write("vorbis".getBytes, 0, 6)
    id.write(new Array[Byte](4), 0, 4)          // version 0
    id.write(channels)
    (0 until 4).foreach(k => id.write((sampleRate >> (8 * k)) & 0xff)) // rate LE
    id.write(new Array[Byte](12), 0, 12)        // bitrates
    id.write(0xb8)                              // blocksizes
    id.write(1)                                 // framing bit
    val out = new ByteArrayOutputStream()
    val p0 = page(0x02, 0, 0, id.toByteArray)
    val p1 = page(0x04, totalSamples, 1, Array[Byte](0))
    out.write(p0, 0, p0.length); out.write(p1, 0, p1.length)
    out.toByteArray
  }

  /** fLaC + STREAMINFO only: 8000 Hz, mono, 8-bit, `totalSamples` frames. */
  def flacStreamInfo(totalSamples: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes, 0, 4)
    out.write(Array[Byte](0x80.toByte, 0, 0, 34), 0, 4) // last-block, type 0, len 34
    out.write(be16(4096), 0, 2) // min blocksize
    out.write(be16(4096), 0, 2) // max blocksize
    out.write(new Array[Byte](6), 0, 6) // min/max framesize unknown
    // [sr:20][ch-1:3][bps-1:5][total:36] — sr 8000, ch 1, bps 8
    val sr = 8000
    out.write(Array(
      ((sr >> 12) & 0xff).toByte,
      ((sr >> 4) & 0xff).toByte,
      (((sr & 0xf) << 4) | 0 /*ch-1=0 + bps high bit 0*/).toByte,
      ((0x7 << 4) | ((totalSamples >> 32) & 0xf).toInt).toByte), 0, 4)
    out.write(be32(totalSamples & 0xffffffffL), 0, 4)
    out.write(new Array[Byte](16), 0, 16) // md5 of unencoded audio (unused)
    out.toByteArray
  }
}
