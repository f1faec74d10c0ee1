package graft.media

import scala.util.control.NonFatal

/**
 * Pure-JVM WAV (RIFF/WAVE) decoder for the feature-extraction path:
 * chunk walk → fmt → data. Formats: 1 (integer PCM, 8 or 16 bits), 3
 * (IEEE float32 in [-1,1], mapped round(f·32768) with clamp), and 6/7
 * (G.711 A-law/μ-law — the companded telephony codings whose expansion is
 * pure closed-form segment arithmetic: μ-law magnitude ((2·mant + 33) « exp
 * − 33)·4, A-law even-bit inversion and segment shifts), all decoded to
 * 16-bit PCM then normalized. 1-4 channels. Samples are normalized to
 * unsigned 8-bit (16-bit paths: (s >> 8) + 128) so audio shares the image
 * features' per-channel mean/variance layout — 8-bit PCM passes through
 * exactly, which is what the closed-form oracles use. Other codecs (ADPCM —
 * step tables are table data — and MP3/AAC, needing ISO Huffman/window
 * tables) return None — the declared sketch fallback.
 */
object WavDecode {

  /** G.711 μ-law byte → linear 16-bit PCM (±32124 full scale). */
  def mulawToPcm(b0: Int): Int = {
    val u = ~b0 & 0xff
    val exp = (u >> 4) & 7
    val mant = u & 0xf
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -mag else mag // MSB of the COMPLEMENTED byte = negative
  }

  /** G.711 A-law byte → linear 16-bit PCM (±32256 full scale). */
  def alawToPcm(b0: Int): Int = {
    val a = (b0 ^ 0x55) & 0xff
    val exp = (a >> 4) & 7
    val mant = a & 0xf
    val mag = if (exp == 0) (mant << 4) + 8 else ((mant << 4) + 0x108) << (exp - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  /** Per-channel interleaved unsigned-8-bit samples (n frames × channels). */
  final case class Samples(frames: Int, channels: Int, data: Array[Byte])

  def decode(b: Array[Byte]): Option[Samples] = {
    try {
      if (b == null || b.length < 44) return None
      if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
            b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
      def u8(i: Int): Int = b(i) & 0xff
      def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
      var pos = 12
      var channels = 0
      var bits = 0
      var format = 0
      var fmtOk = false
      var walking = true
      var data: (Int, Int) = null // (offset, length)
      while (walking && pos + 8 <= b.length && (data == null || !fmtOk)) {
        val id = new String(b, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val len = u32(pos + 4)
        if (len < 0 || len > Int.MaxValue) return None
        val body = pos + 8
        id match {
          case "fmt " if len >= 16 && body + 16 <= b.length =>
            format = u16(body)
            channels = u16(body + 2)
            bits = u16(body + 14)
            fmtOk = channels >= 1 && channels <= 4 &&
              ((format == 1 && (bits == 8 || bits == 16)) ||
               ((format == 6 || format == 7) && bits == 8) || // G.711 A-law / μ-law
               (format == 3 && bits == 32))                   // IEEE float PCM
            if (!fmtOk) return None // ADPCM/exotic layout: stub fallback
          case "data" =>
            val avail = math.min(len, (b.length - body).toLong).toInt // tolerate truncation
            data = (body, avail)
          case _ => ()
        }
        // word-aligned next chunk, computed in Long arithmetic: an Int sum
        // near 2^31 would wrap negative-or-backwards and spin the walk (the
        // AvMeta.wav hostile-length pattern) — stop instead of looping
        val next = body.toLong + len + (len & 1L)
        if (next <= pos || next > Int.MaxValue) walking = false
        else pos = next.toInt
      }
      if (!fmtOk || data == null) return None
      val (off, dlen) = data
      val bytesPer = bits / 8
      val frames = dlen / (channels * bytesPer)
      if (frames <= 0 || frames.toLong * channels > (1L << 28)) return None
      val out = new Array[Byte](frames * channels)
      var i = 0
      while (i < frames * channels) {
        out(i) =
          if (format == 7) (((mulawToPcm(u8(off + i)) >> 8) + 128)).toByte
          else if (format == 6) (((alawToPcm(u8(off + i)) >> 8) + 128)).toByte
          else if (format == 3) { // IEEE float32 LE in [-1,1] → s16 → unsigned 8
            val bits32 = u8(off + i * 4) | (u8(off + i * 4 + 1) << 8) |
              (u8(off + i * 4 + 2) << 16) | (u8(off + i * 4 + 3) << 24)
            val f = java.lang.Float.intBitsToFloat(bits32)
            val s = math.max(-32768, math.min(32767,
              math.round((if (f.isNaN) 0f else f) * 32768f))).toInt
            ((s >> 8) + 128).toByte
          }
          else if (bits == 8) b(off + i)
          else { // 16-bit signed LE → unsigned 8-bit
            val s = (u8(off + i * 2) | (u8(off + i * 2 + 1) << 8)).toShort
            ((s >> 8) + 128).toByte
          }
        i += 1
      }
      Some(Samples(frames, channels, out))
    } catch { case NonFatal(_) => None }
  }
}
