package graft.media

import org.scalatest.funsuite.AnyFunSuite
import VorbisEncode.Frame

class VorbisDecodeSpec extends AnyFunSuite {

  // ---- codeword assignment: the Vorbis I spec §3.2.1 worked example ----

  test("huffman codewords match the spec §3.2.1 example tree") {
    val lengths = Array(2, 4, 4, 4, 4, 2, 3, 3)
    val (map, maxLen) = VorbisDecode.buildCodewords(lengths)
    assert(map != null && maxLen == 4)
    val expected = Map( // entry -> (codeword, length)
      0 -> (0x0, 2), 1 -> (0x4, 4), 2 -> (0x5, 4), 3 -> (0x6, 4),
      4 -> (0x7, 4), 5 -> (0x2, 2), 6 -> (0x6, 3), 7 -> (0x7, 3))
    expected.foreach { case (e, (w, l)) =>
      val got = map.get((l.toLong << 32) | w)
      assert(got != null && got.intValue() == e, s"entry $e at ($w,$l): $got")
    }
  }

  test("over- and under-specified trees are rejected; single entry gets word 0") {
    assert(VorbisDecode.buildCodewords(Array(1, 1, 1))._1 == null) // over
    assert(VorbisDecode.buildCodewords(Array(1, 2))._1 == null)    // under
    val (single, len) = VorbisDecode.buildCodewords(Array(0, 3, 0))
    assert(single != null && len == 3 && single.get((3L << 32) | 0L).intValue() == 1)
  }

  // ---- silent fixtures: full machinery, closed-form output ----

  test("silent mono short-block stream: exact length, zero PCM, floor Y evidence") {
    val plan = Seq(Frame(false, 10, 20, 3), Frame(false, 30, 40, 1),
      Frame(false, 50, 60, 2), Frame(false, 70, 80, 0))
    val b = VorbisEncode.stream(8000, 1, 64, 256, plan)
    val p = VorbisDecode.decode(b).get
    assert(p.sampleRate == 8000 && p.channels == 1)
    assert(p.nPackets == 4)
    // 3 frame joins × (16 + 16) samples
    assert(p.frames == 96L)
    assert(p.frames == VorbisEncode.emittedSamples(plan, 64, 256))
    assert(p.sumAbsMicro == 0L && p.peakMicro == 0L)
    assert(p.data.length == 96 && p.data.forall(_ == (128 & 0xff).toByte))
    assert(p.floorYSum == VorbisEncode.floorYSum(plan, 1))
    assert(p.floorYSum == (10 + 20 + 3) + (30 + 40 + 1) + (50 + 60 + 2) + (70 + 80 + 0))
  }

  test("window switching: long/short plan emits the lapped sample count") {
    // short, long(prev=0,next=1), long(prev=1,next=0), short
    val plan = Seq(Frame(false, 1, 2, 0), Frame(true, 3, 4, 1),
      Frame(true, 5, 6, 2), Frame(false, 7, 8, 3))
    val b = VorbisEncode.stream(44100, 1, 64, 256, plan)
    val p = VorbisDecode.decode(b).get
    // joins: 16+64, 64+64, 64+16 = 288
    assert(p.frames == 288L)
    assert(p.frames == VorbisEncode.emittedSamples(plan, 64, 256))
    assert(p.sumAbsMicro == 0L)
    assert(p.floorYSum == VorbisEncode.floorYSum(plan, 1))
  }

  test("stereo: interleaved output, per-channel floor evidence") {
    val plan = Seq(Frame(false, 9, 9, 1), Frame(false, 9, 9, 1), Frame(false, 9, 9, 1))
    val b = VorbisEncode.stream(16000, 2, 64, 256, plan)
    val p = VorbisDecode.decode(b).get
    assert(p.channels == 2 && p.frames == 64L)
    assert(p.data.length == 128)
    assert(p.floorYSum == VorbisEncode.floorYSum(plan, 2))
    assert(p.floorYSum == 3 * 2 * (9 + 9 + 1))
  }

  test("end-granule truncation clamps the emitted tail") {
    val plan = Seq(Frame(false, 1, 1, 0), Frame(false, 1, 1, 0), Frame(false, 1, 1, 0))
    val full = VorbisDecode.decode(VorbisEncode.stream(8000, 1, 64, 256, plan)).get
    assert(full.frames == 64L)
    val clamped = VorbisDecode.decode(
      VorbisEncode.stream(8000, 1, 64, 256, plan, granuleOverride = 50L)).get
    assert(clamped.frames == 50L && clamped.data.length == 50)
  }

  // ---- nonzero residue: the full floor×residue→iMDCT→window path ----

  test("flat floor + unit residue reproduces the direct lapped-MDCT formula") {
    // y0 = y1 = 200, y2 = 0 (zero offset → flat curve): every spectral line
    // = inverse_db(200); VQ delta 1.0 makes the residue all-ones, so the
    // decoder's PCM must equal an independently computed windowed
    // overlap-add of the direct iMDCT of a CONSTANT spectrum
    val plan = Seq(Frame(false, 200, 200, 0), Frame(false, 200, 200, 0),
      Frame(false, 200, 200, 0))
    val b = VorbisEncode.stream(8000, 1, 64, 256, plan, deltaPack = (1, 0))
    val p = VorbisDecode.decode(b).get
    assert(p.frames == 64L)
    assert(p.sumAbsMicro > 0L, "unit residue must produce nonzero PCM")
    // independent reference: A = 10^(7(200-255)/256); frames all short (n=64)
    val n = 64
    val amp = StrictMath.pow(10.0, 7.0 * (200 - 255) / 256.0)
    val spec = Array.fill(n / 2)(amp.toFloat)
    val frame = VorbisDecode.imdctDirect(spec, n)
    // full-sine window of a short block
    val win = Array.tabulate(n) { j =>
      val s = StrictMath.sin((j + 0.5) / n * StrictMath.PI)
      StrictMath.sin(StrictMath.PI / 2.0 * s * s)
    }
    val w = Array.tabulate(n)(j => (frame(j) * win(j)).toFloat)
    // identical frames: emitted sample i of each join = w[n/2+i] + w[i]
    val expect = Array.tabulate(n / 2)(i => w(n / 2 + i) + w(i))
    val got = p.data.take(n / 2)
    var i = 0
    while (i < n / 2) {
      val e = math.max(0, math.min(255,
        StrictMath.round(math.max(-1.0, math.min(1.0, expect(i).toDouble)) * 127.0).toInt + 128))
      assert((got(i) & 0xff) == e, s"sample $i: got ${got(i) & 0xff}, want $e")
      i += 1
    }
    // second join must repeat the first (identical frames)
    assert(p.data.slice(n / 2, n).toSeq == p.data.take(n / 2).toSeq)
  }

  test("FFT iMDCT equals the direct formula at every legal block size") {
    val rnd = new scala.util.Random(77)
    Seq(64, 128, 256, 512, 2048, 8192).foreach { n =>
      val spec = Array.fill(n / 2)((rnd.nextDouble() * 2 - 1).toFloat)
      val direct = VorbisDecode.imdctDirect(spec, n)
      val fast = VorbisDecode.imdctFft(spec, n)
      var j = 0
      var maxAbs = 0.0
      while (j < n) { maxAbs = math.max(maxAbs, math.abs(direct(j).toDouble)); j += 1 }
      j = 0
      while (j < n) {
        assert(math.abs(fast(j) - direct(j)) <= 1e-4 * math.max(1.0, maxAbs),
          s"n=$n j=$j: fft ${fast(j)} vs direct ${direct(j)}")
        j += 1
      }
    }
  }

  // ---- totality on hostile bytes ----

  test("fuzz: random bytes and truncations never throw") {
    val rnd = new scala.util.Random(4242)
    (0 until 200).foreach { _ =>
      val junk = new Array[Byte](rnd.nextInt(600))
      rnd.nextBytes(junk)
      VorbisDecode.decode(junk) // must not throw
      // valid magic + junk tail
      if (junk.length >= 4) {
        junk(0) = 'O'; junk(1) = 'g'; junk(2) = 'g'; junk(3) = 'S'
        VorbisDecode.decode(junk)
      }
    }
    val valid = VorbisEncode.stream(8000, 1, 64, 256,
      Seq(Frame(false, 1, 2, 3), Frame(true, 4, 5, 0), Frame(false, 6, 7, 1)))
    (0 until valid.length by 7).foreach { cut =>
      VorbisDecode.decode(valid.take(cut)) // truncations: total, never throw
    }
  }

  test("AvMeta still reads rate/channels/duration from the real fixture") {
    val plan = Seq(Frame(false, 1, 1, 0), Frame(false, 1, 1, 0), Frame(false, 1, 1, 0))
    val b = VorbisEncode.stream(8000, 1, 64, 256, plan)
    val m = AvMeta.parse(b)
    assert(m.format == "ogg" && m.sampleRate == 8000 && m.channels == 1)
    assert(m.durationMs == 64 * 1000L / 8000)
  }
}
