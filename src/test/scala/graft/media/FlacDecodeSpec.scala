package graft.media

import org.scalatest.funsuite.AnyFunSuite

class FlacDecodeSpec extends AnyFunSuite {

  /** MSB-first bit accumulator for hand-assembling frame payloads. */
  private final class Bits {
    val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def put(v: Long, n: Int): Unit = (n - 1 to 0 by -1).foreach(k => bits += ((v >> k) & 1L).toInt)
    def putSigned(v: Long, n: Int): Unit = put(v & ((1L << n) - 1), n)
    def unary(q: Int): Unit = { (0 until q).foreach(_ => bits += 0); bits += 1 }
    def bytes(): Array[Byte] = {
      while (bits.length % 8 != 0) bits += 0
      bits.grouped(8).map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
    }
  }

  /** STREAMINFO header (8 kHz mono 8-bit, n samples) + raw frame bytes. */
  private def stream(n: Long, frames: Array[Byte]): Array[Byte] =
    AvEncode.flacStreamInfo(n) ++ frames

  /** Frame header for one mono 8-bit frame of `bs` samples (bsCode 7). */
  private def frameHeader(b: Bits, bs: Int, chAsgn: Int = 0, ssBits: Int = 1): Unit = {
    b.put(0x3ffe, 14); b.put(0, 1); b.put(0, 1)
    b.put(7, 4); b.put(0, 4)             // blocksize follows as 16-bit; sr from STREAMINFO
    b.put(chAsgn, 4); b.put(ssBits, 3); b.put(0, 1)
    b.put(0, 8)                          // frame number 0 (UTF-8 single byte)
    b.put(bs - 1, 16)
    b.put(0, 8)                          // CRC-8
  }

  test("constant frames round-trip exactly, including multi-frame and negatives") {
    for (v <- Seq(-128, -1, 0, 57, 127)) {
      val s = FlacDecode.decode(AvEncode.flacConstant(5000, v)).get // 2 frames (4096 + 904)
      assert(s.frames == 5000 && s.channels == 1)
      assert(s.data.forall(b => (b & 0xff) == v + 128), s"constant $v")
    }
  }

  test("verbatim subframe carries raw samples") {
    val vals = Array.tabulate(16)(i => (i * 3 - 20).toLong)
    val b = new Bits
    frameHeader(b, 16)
    b.put(0, 1); b.put(1, 6); b.put(0, 1) // VERBATIM, no wasted bits
    vals.foreach(v => b.putSigned(v, 8))
    // byte-aligned already; CRC-16
    b.put(0, 16)
    val s = FlacDecode.decode(stream(16, b.bytes())).get
    assert(s.frames == 16)
    vals.zipWithIndex.foreach { case (v, i) => assert((s.data(i) & 0xff) == v + 128, s"i=$i") }
  }

  test("fixed order-1 with Rice residuals reconstructs a ramp") {
    // warmup s0 = 10, then residuals +1 each (zigzag 2) with Rice param 1:
    // u = 2 → quotient 1 (unary "01"), remainder 0 → samples 10,11,...,25
    val bs = 16
    val b = new Bits
    frameHeader(b, bs)
    b.put(0, 1); b.put(9, 6); b.put(0, 1)  // FIXED order 1
    b.putSigned(10, 8)                      // warmup
    b.put(0, 2)                             // 4-bit Rice method
    b.put(0, 4)                             // partition order 0 → 1 partition of bs-1
    b.put(1, 4)                             // Rice parameter 1
    (0 until bs - 1).foreach { _ => b.unary(1); b.put(0, 1) } // zigzag(+1)=2 → q=1, r=0
    b.put(0, 16)
    val s = FlacDecode.decode(stream(bs, b.bytes())).get
    (0 until bs).foreach(i => assert((s.data(i) & 0xff) == 10 + i + 128, s"i=$i"))
  }

  test("LPC order-1 (coef 1, shift 0) equals the fixed-order-1 prediction") {
    val bs = 8
    val b = new Bits
    frameHeader(b, bs)
    b.put(0, 1); b.put(32, 6); b.put(0, 1)  // LPC order 1 (type 32 = order-1+32 → order 1)
    b.putSigned(-5, 8)                       // warmup
    b.put(3, 4)                              // precision-1 = 3 → 4-bit coefficients
    b.putSigned(0, 5)                        // shift 0
    b.putSigned(1, 4)                        // coef = 1
    b.put(0, 2); b.put(0, 4)                 // Rice-4, one partition
    b.put(2, 4)                              // Rice parameter 2
    (0 until bs - 1).foreach { _ => b.unary(1); b.put(2, 2) } // u=(1<<2)|2=6 → zigzag→ +3
    b.put(0, 16)
    val s = FlacDecode.decode(stream(bs, b.bytes())).get
    // samples: -5, -2, 1, 4, ... (+3 per step)
    (0 until bs).foreach(i => assert((s.data(i) & 0xff) == -5 + 3 * i + 128, s"i=$i"))
  }

  test("mid/side stereo decorrelation reconstructs left and right") {
    val bs = 8
    val b = new Bits
    frameHeader(b, bs, chAsgn = 10) // mid/side
    // left = 20, right = 10 → mid = 15, side = 10 (side subframe gets 9 bits)
    b.put(0, 1); b.put(0, 6); b.put(0, 1); b.putSigned(15, 8) // ch0: CONSTANT mid
    b.put(0, 1); b.put(0, 6); b.put(0, 1); b.putSigned(10, 9) // ch1: CONSTANT side (+1 bit)
    b.put(0, 16)
    // a MONO STREAMINFO with this stereo frame must reject (channel mismatch)
    assert(FlacDecode.decode(stream(bs, b.bytes())).isEmpty)
    // stereo STREAMINFO: patch the channels-1 field
    val si = AvEncode.flacStreamInfo(bs)
    si(8 + 12) = (si(8 + 12) | (1 << 1)).toByte // channels-1 = 1
    val st = FlacDecode.decode(si ++ b.bytes()).get
    assert(st.channels == 2 && st.frames == bs)
    (0 until bs).foreach { i =>
      assert((st.data(2 * i) & 0xff) == 20 + 128, s"left $i")
      assert((st.data(2 * i + 1) & 0xff) == 10 + 128, s"right $i")
    }
  }

  test("totality: truncation keeps decoded frames, garbage never throws") {
    val good = AvEncode.flacConstant(5000, 57)
    (1 until good.length by 11).foreach(n => FlacDecode.decode(good.take(n)))
    // cut mid-second-frame: the first 4096-sample frame must survive
    val cut = FlacDecode.decode(good.take(good.length - 4))
    assert(cut.exists(_.frames == 4096))
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      FlacDecode.decode(m) // must not throw
    }
  }

  test("MediaSniff.features: constant FLAC yields exact mean, zero variance") {
    val f = MediaSniff.features(AvEncode.flacConstant(4096, 57))
    assert(f(0) == (57 + 128).toFloat && f(4) == 0f)
    assert(f(1) == 0f && f(5) == 0f)
  }
}
