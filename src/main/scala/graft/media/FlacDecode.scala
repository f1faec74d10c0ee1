package graft.media

import scala.util.control.NonFatal

/**
 * Pure-JVM FLAC audio decoder for the feature-extraction path: STREAMINFO →
 * frame walk (fixed/variable blocking, UTF-8 frame numbers, all block-size /
 * sample-rate codes) → per-channel subframes (CONSTANT, VERBATIM, FIXED
 * orders 0-4, LPC up to order 32) with Rice-coded residual partitions
 * (4- and 5-bit parameters, escape-to-raw) → inter-channel decorrelation
 * (left/side, right/side, mid/side). Samples normalize to unsigned 8-bit
 * ((s >> (bps−8)) + 128) so audio shares the image features' mean/variance
 * layout — the same convention as WavDecode's 16-bit path.
 *
 * CRCs are parsed past, not verified (a bit flip should degrade statistics,
 * not zero them); a truncated stream keeps the frames that decoded.
 */
object FlacDecode {

  /** Interleaved unsigned-8-bit samples (frames × channels). */
  final case class Samples(frames: Int, channels: Int, data: Array[Byte])

  private final class BitReader(b: Array[Byte], var bytePos: Int) {
    private var bitPos = 0 // within current byte, MSB first
    def atEnd: Boolean = bytePos >= b.length
    def bit(): Int = {
      if (bytePos >= b.length) throw new ArrayIndexOutOfBoundsException(bytePos)
      val v = (b(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    def bits(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    def signedBits(n: Int): Long = {
      val v = bits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    def unary(): Int = {
      var q = 0
      while (bit() == 0) { q += 1; if (q > (1 << 24)) throw new IllegalStateException("unary runaway") }
      q
    }
    def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  private val BlockSizes = Array(-1, 192, 576, 1152, 2304, 4608, -8, -16, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)

  def decode(b: Array[Byte]): Option[Samples] = {
    try {
      if (b == null || b.length < 4 + 4 + 34) return None
      if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return None
      // walk metadata blocks to the first frame
      var p = 4
      var last = false
      var streamChannels = -1
      var streamBps = -1
      var totalSamples = -1L
      var first = true
      while (!last && p + 4 <= b.length) {
        last = (b(p) & 0x80) != 0
        val typ = b(p) & 0x7f
        val len = ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
        if (first && typ != 0) return None // STREAMINFO is mandatory-first
        if (typ == 0 && len >= 34 && p + 4 + 34 <= b.length) {
          val s = p + 4 + 10
          streamChannels = (((b(s + 2) & 0xff) >> 1) & 0x7) + 1
          streamBps = ((((b(s + 2) & 0xff) & 1) << 4) | ((b(s + 3) & 0xff) >> 4)) + 1
          totalSamples = ((b(s + 3) & 0x0fL) << 32) |
            ((b(s + 4) & 0xffL) << 24) | ((b(s + 5) & 0xffL) << 16) |
            ((b(s + 6) & 0xffL) << 8) | (b(s + 7) & 0xffL)
        }
        first = false
        p += 4 + len
      }
      if (streamChannels < 1 || streamChannels > 8) return None
      if (streamBps < 4 || streamBps > 32) return None
      if (totalSamples <= 0 || totalSamples > (1L << 26)) return None
      val nCh = streamChannels
      val out = new Array[Byte](totalSamples.toInt * nCh)
      var written = 0L // frames written
      val br = new BitReader(b, p)

      while (written < totalSamples && !br.atEnd) {
        val before = written
        try {
          // ---- frame header
          if (br.bits(14) != 0x3ffe) throw new IllegalStateException("sync")
          br.bit() // reserved
          br.bit() // blocking strategy
          val bsCode = br.bits(4).toInt
          val srCode = br.bits(4).toInt
          val chAsgn = br.bits(4).toInt
          val ssCode = br.bits(3).toInt
          br.bit() // reserved
          // UTF-8 coded frame/sample number: count leading ones in first byte
          val b0 = br.bits(8).toInt
          var cont = 0
          var mask = 0x80
          while ((b0 & mask) != 0) { cont += 1; mask >>= 1 }
          if (cont == 1 || cont > 7) throw new IllegalStateException("utf8")
          var k = 1
          while (k < cont) { br.bits(8); k += 1 }
          val blockSize = bsCode match {
            case 0 => throw new IllegalStateException("reserved blocksize")
            case 6 => br.bits(8).toInt + 1
            case 7 => br.bits(16).toInt + 1
            case c => BlockSizes(c)
          }
          if (srCode == 12) br.bits(8)
          else if (srCode == 13 || srCode == 14) br.bits(16)
          else if (srCode == 15) throw new IllegalStateException("bad samplerate code")
          br.bits(8) // CRC-8 (unverified)
          val frameBps = ssCode match {
            case 0 => streamBps
            case 1 => 8
            case 2 => 12
            case 4 => 16
            case 5 => 20
            case 6 => 24
            case 7 => 32
            case _ => throw new IllegalStateException("reserved sample size")
          }
          val frameCh = if (chAsgn < 8) chAsgn + 1 else 2
          if (frameCh != nCh) throw new IllegalStateException("channel mismatch")
          if (blockSize <= 0 || blockSize > 65536) throw new IllegalStateException("blocksize")

          // ---- subframes
          val chans = Array.ofDim[Long](frameCh, blockSize)
          var c = 0
          while (c < frameCh) {
            // side channels carry one extra bit (left/side: ch1; right/side: ch0; mid/side: ch1)
            val extra = chAsgn match {
              case 8 => if (c == 1) 1 else 0  // left/side
              case 9 => if (c == 0) 1 else 0  // right/side
              case 10 => if (c == 1) 1 else 0 // mid/side
              case _ => 0
            }
            subframe(br, chans(c), blockSize, frameBps + extra)
            c += 1
          }
          // inter-channel decorrelation
          chAsgn match {
            case 8 => // left/side: right = left - side
              var i = 0
              while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
            case 9 => // right/side: left = right + side
              var i = 0
              while (i < blockSize) {
                val side = chans(0)(i)
                chans(0)(i) = chans(1)(i) + side
                i += 1
              }
            case 10 => // mid/side
              var i = 0
              while (i < blockSize) {
                val side = chans(1)(i)
                var mid = chans(0)(i) << 1
                mid |= side & 1
                chans(0)(i) = (mid + side) >> 1
                chans(1)(i) = (mid - side) >> 1
                i += 1
              }
            case _ => ()
          }
          br.align()
          br.bits(16) // CRC-16 (unverified)

          val take = math.min(blockSize.toLong, totalSamples - written).toInt
          var i = 0
          while (i < take) {
            var cc = 0
            while (cc < nCh) {
              val s = chans(cc)(i)
              val u = (if (frameBps > 8) s >> (frameBps - 8) else s << (8 - frameBps)) + 128
              out(((written + i).toInt * nCh) + cc) =
                (if (u < 0) 0 else if (u > 255) 255 else u).toInt.toByte
              cc += 1
            }
            i += 1
          }
          written += take
        } catch {
          case NonFatal(_) =>
            // a broken frame ends the walk; keep the frames that decoded
            return if (before == 0) None
                   else Some(Samples(before.toInt, nCh,
                     java.util.Arrays.copyOf(out, before.toInt * nCh)))
        }
      }
      if (written == 0) None
      else Some(Samples(written.toInt, nCh,
        if (written == totalSamples) out else java.util.Arrays.copyOf(out, written.toInt * nCh)))
    } catch { case NonFatal(_) => None }
  }

  /** One subframe into `dst` (blockSize samples at `bps` effective bits). */
  private def subframe(br: BitReader, dst: Array[Long], blockSize: Int, bps: Int): Unit = {
    if (br.bit() != 0) throw new IllegalStateException("subframe pad bit")
    val typ = br.bits(6).toInt
    val wasted = if (br.bit() == 1) br.unary() + 1 else 0
    val effBps = bps - wasted
    if (effBps <= 0 || effBps > 33) throw new IllegalStateException("bps")
    if (typ == 0) { // CONSTANT
      val v = br.signedBits(effBps)
      java.util.Arrays.fill(dst, v << wasted)
    } else if (typ == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { dst(i) = br.signedBits(effBps) << wasted; i += 1 }
    } else if (typ >= 8 && typ <= 12) { // FIXED, order = typ - 8
      val order = typ - 8
      var i = 0
      while (i < order) { dst(i) = br.signedBits(effBps); i += 1 }
      residuals(br, dst, blockSize, order)
      i = order
      while (i < blockSize) {
        dst(i) += (order match {
          case 0 => 0L
          case 1 => dst(i - 1)
          case 2 => 2 * dst(i - 1) - dst(i - 2)
          case 3 => 3 * dst(i - 1) - 3 * dst(i - 2) + dst(i - 3)
          case 4 => 4 * dst(i - 1) - 6 * dst(i - 2) + 4 * dst(i - 3) - dst(i - 4)
        })
        i += 1
      }
      if (wasted > 0) { i = 0; while (i < blockSize) { dst(i) <<= wasted; i += 1 } }
    } else if (typ >= 32) { // LPC, order = typ - 31
      val order = typ - 31
      if (order > blockSize) throw new IllegalStateException("lpc order")
      var i = 0
      while (i < order) { dst(i) = br.signedBits(effBps); i += 1 }
      val precision = br.bits(4).toInt + 1
      if (precision > 15) throw new IllegalStateException("lpc precision")
      val shift = br.signedBits(5).toInt
      if (shift < 0) throw new IllegalStateException("negative lpc shift")
      val coefs = new Array[Long](order)
      i = 0
      while (i < order) { coefs(i) = br.signedBits(precision); i += 1 }
      residuals(br, dst, blockSize, order)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j) * dst(i - 1 - j); j += 1 }
        dst(i) += acc >> shift
        i += 1
      }
      if (wasted > 0) { i = 0; while (i < blockSize) { dst(i) <<= wasted; i += 1 } }
    } else throw new IllegalStateException(s"reserved subframe type $typ")
  }

  /** Rice-coded residual partitions into dst(order until blockSize), ADDED to
    * the prediction later (dst holds raw residuals on return). */
  private def residuals(br: BitReader, dst: Array[Long], blockSize: Int, order: Int): Unit = {
    val method = br.bits(2).toInt // 0: 4-bit Rice, 1: 5-bit Rice
    if (method > 1) throw new IllegalStateException("residual method")
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val partOrder = br.bits(4).toInt
    val parts = 1 << partOrder
    if (blockSize % parts != 0) throw new IllegalStateException("partition size")
    var i = order
    var part = 0
    while (part < parts) {
      val n = (blockSize >> partOrder) - (if (part == 0) order else 0)
      if (n < 0) throw new IllegalStateException("partition underflow")
      val param = br.bits(pBits).toInt
      var k = 0
      if (param == escape) {
        val raw = br.bits(5).toInt
        while (k < n) { dst(i) = if (raw == 0) 0L else br.signedBits(raw); i += 1; k += 1 }
      } else {
        while (k < n) {
          val q = br.unary()
          val r = if (param == 0) 0L else br.bits(param)
          val u = (q.toLong << param) | r
          dst(i) = (u >>> 1) ^ -(u & 1L) // zigzag → signed
          i += 1; k += 1
        }
      }
      part += 1
    }
  }
}
