package graft.media

import org.scalatest.funsuite.AnyFunSuite

class WavDecodeSpec extends AnyFunSuite {

  private def wav(fmt: Int, channels: Int, bits: Int, data: Array[Byte],
                  extraChunk: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    def tag(s: String): Unit = out.write(s.getBytes)
    tag("RIFF"); u32(36 + data.length); tag("WAVE")
    if (extraChunk) { tag("LIST"); u32(3); out.write("abc".getBytes); out.write(0) } // odd len → pad
    tag("fmt "); u32(16)
    u16(fmt); u16(channels); u32(8000); u32(8000 * channels * bits / 8); u16(channels * bits / 8); u16(bits)
    tag("data"); u32(data.length)
    out.write(data, 0, data.length)
    out.toByteArray
  }

  test("8-bit mono PCM passes samples through exactly") {
    val data = Array.tabulate(100)(i => (i * 2).toByte)
    val s = WavDecode.decode(wav(1, 1, 8, data)).get
    assert(s.frames == 100 && s.channels == 1)
    assert(s.data.toSeq == data.toSeq)
  }

  test("16-bit stereo PCM: channels interleaved, (s >> 8) + 128 conversion") {
    // frame i: left = i*256 (→ i+128), right = -i*256 (→ 128-i)
    val n = 50
    val data = new Array[Byte](n * 2 * 2)
    for (i <- 0 until n) {
      val l = (i * 256).toShort; val r = (-i * 256).toShort
      data(i * 4) = (l & 0xff).toByte; data(i * 4 + 1) = ((l >> 8) & 0xff).toByte
      data(i * 4 + 2) = (r & 0xff).toByte; data(i * 4 + 3) = ((r >> 8) & 0xff).toByte
    }
    val s = WavDecode.decode(wav(1, 2, 16, data)).get
    assert(s.frames == n && s.channels == 2)
    for (i <- 0 until n) {
      assert((s.data(i * 2) & 0xff) == i + 128)
      assert((s.data(i * 2 + 1) & 0xff) == 128 - i)
    }
  }

  test("chunk walk skips unknown (odd-length, word-aligned) chunks before fmt") {
    val data = Array.fill(32)(77.toByte)
    val s = WavDecode.decode(wav(1, 1, 8, data, extraChunk = true)).get
    assert(s.frames == 32 && (s.data(0) & 0xff) == 77)
  }

  test("non-PCM, exotic widths, junk, truncation → None, never a throw") {
    val data = Array.fill(16)(1.toByte)
    assert(WavDecode.decode(wav(3, 1, 8, data)).isEmpty)  // IEEE float fmt
    assert(WavDecode.decode(wav(1, 1, 24, data)).isEmpty) // 24-bit: stub
    assert(WavDecode.decode(wav(1, 9, 8, data)).isEmpty)  // 9 channels
    assert(WavDecode.decode(Array.emptyByteArray).isEmpty)
    assert(WavDecode.decode("RIFFxxxxWAVE".getBytes).isEmpty)
    val good = wav(1, 1, 8, data)
    (1 until good.length).foreach(n => WavDecode.decode(good.take(n)))
  }

  test("G.711 μ-law/A-law: canonical anchors, full-scale symmetry, WAV integration") {
    // canonical G.711 anchor points (ITU-T tables): μ-law 0x00/0x80 are the
    // negative/positive full-scale codes, 0xFF is zero; A-law 0x55/0xD5 are
    // ∓8 (the smallest magnitudes), 0x2A/0xAA the full scales
    assert(WavDecode.mulawToPcm(0x00) == -32124)
    assert(WavDecode.mulawToPcm(0x80) == 32124)
    assert(WavDecode.mulawToPcm(0xff) == 0)
    assert(WavDecode.alawToPcm(0x55) == -8)
    assert(WavDecode.alawToPcm(0xd5) == 8)
    assert(WavDecode.alawToPcm(0x2a) == -32256)
    assert(WavDecode.alawToPcm(0xaa) == 32256)
    // byte b and b^0x80 decode to exact negatives of each other in both laws
    for (b <- 0 until 128) {
      assert(WavDecode.mulawToPcm(b) == -WavDecode.mulawToPcm(b | 0x80), s"mu $b")
      assert(WavDecode.alawToPcm(b) == -WavDecode.alawToPcm(b | 0x80), s"a $b")
    }
    // WAV integration: format tags 7/6 expand then normalize like PCM16
    val mu = WavDecode.decode(wav(7, 1, 8, Array.fill(64)(0.toByte))).get
    assert(mu.frames == 64 && mu.data.forall(b => (b & 0xff) == (-32124 >> 8) + 128))
    val al = WavDecode.decode(wav(6, 2, 8, Array.fill(64)(0x55.toByte))).get
    assert(al.frames == 32 && al.data.forall(b => (b & 0xff) == (-8 >> 8) + 128))
    // ADPCM (format 2) still falls to the sketch
    assert(WavDecode.decode(wav(2, 1, 8, Array.fill(16)(1.toByte))).isEmpty)
  }

  test("IEEE float32 PCM (format 3): round(f*32768) clamp, NaN to silence") {
    def fbytes(f: Float): Array[Byte] = {
      val v = java.lang.Float.floatToIntBits(f)
      Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    }
    val fs = Seq(0f, 1f, -1f, 0.5f, (71 / 128.0f), Float.NaN, 2f) // 2f clamps
    val data = fs.flatMap(fbytes).toArray
    val s = WavDecode.decode(wav(3, 1, 32, data)).get
    assert(s.frames == fs.length)
    val got = s.data.map(_ & 0xff).toSeq
    // round(f*32768) >> 8 then +128: 0→128, 1→clamp 32767→255, -1→0,
    // 0.5→16384→192, 71/128→199, NaN→128, 2→clamp→255
    assert(got == Seq(128, 255, 0, 192, 199, 128, 255))
  }

  test("hostile chunk length near 2^32 terminates the walk (no hang, no throw)") {
    // unknown chunk with length 0xFFFFFFF8: guarded Int arithmetic would
    // either spin in place or wrap pos negative — the Long-guard must stop
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes); out.write(Array[Byte](36, 0, 0, 0), 0, 4); out.write("WAVE".getBytes)
    out.write("junk".getBytes); out.write(Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte), 0, 4)
    out.write(new Array[Byte](64), 0, 64)
    assert(WavDecode.decode(out.toByteArray).isEmpty)
  }

  test("MediaSniff.features: flat 8-bit PCM yields exact mean, zero variance") {
    val f = MediaSniff.features(wav(1, 1, 8, Array.fill(256)(123.toByte)))
    assert(f(0) == 123f && f(4) == 0f)
    assert(f(1) == 0f && f(5) == 0f)
  }
}
