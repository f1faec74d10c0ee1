package graft.media

import scala.util.control.NonFatal

/**
 * Pure-JVM WAV (RIFF/WAVE) PCM decoder for the feature-extraction path:
 * chunk walk → fmt (PCM only, 1-4 channels, 8 or 16 bits/sample) → data.
 * Samples are normalized to unsigned 8-bit (16-bit PCM: (s >> 8) + 128) so
 * audio shares the image features' per-channel mean/variance layout — 8-bit
 * PCM passes through exactly, which is what the closed-form oracle uses.
 * Compressed codecs (MP3/AAC/float PCM) return None — the declared stub.
 */
object WavDecode {

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
            val audioFormat = u16(body)
            channels = u16(body + 2)
            bits = u16(body + 14)
            fmtOk = audioFormat == 1 && channels >= 1 && channels <= 4 && (bits == 8 || bits == 16)
            if (!fmtOk) return None // non-PCM / exotic layout: stub fallback
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
          if (bits == 8) b(off + i)
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
