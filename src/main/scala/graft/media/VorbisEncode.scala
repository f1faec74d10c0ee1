package graft.media

import java.io.ByteArrayOutputStream

/**
 * Deterministic minimal Vorbis-I encoder for fixtures — the AvEncode /
 * JpegEncode pattern: build a tiny COMPLETE stream (Ogg pages, ID/comment/
 * setup headers with in-band codebooks, audio packets) whose decoded
 * statistics are statable in closed form, so the DuckDB oracle needs no
 * audio dialect. Fixtures only; the pipeline never encodes media.
 *
 * The fixture grammar (one floor, three codebooks, two block sizes):
 *  - floor1: one partition, one class of dim 1 → three curve points; the
 *    packet carries Y0/Y1 raw (8 bits each under multiplier 1) and Y2 as a
 *    2-bit codeword from a 4-entry book — so every floor Y value is a
 *    fixture parameter and Σ(Y) replays in SQL.
 *  - residue type 2: one classbook (2 × 1-bit), one VQ book (2 entries,
 *    dim 4, lookup type 1, ONE multiplicand) whose vectors are
 *    [delta,delta,delta,delta]. delta = 0 makes the decoded PCM exactly
 *    silent while every Huffman/VQ read still happens; delta ≠ 0 exercises
 *    the full floor×residue→iMDCT→window path for spec anchors.
 *  - two modes: short (blockFlag 0) and long (blockFlag 1) over
 *    (bsShort, bsLong), so frame plans exercise window switching and the
 *    prev/next slope flags.
 */
object VorbisEncode {

  /** One audio frame of the fixture plan: block choice, the three floor Y
    * values (y2 is a 4-entry book index, 0..3), shared by every channel. */
  final case class Frame(long: Boolean, y0: Int, y1: Int, y2: Int)

  /** LSb-first bit packer (Vorbis bitpacking, spec §2). */
  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def write(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >>> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i += 1
      }
    }
    def writeLong(v: Long, n: Int): Unit = {
      write((v & 0xffffff).toInt, math.min(n, 24))
      if (n > 24) write((v >>> 24).toInt, n - 24)
    }
    /** Huffman codeword: bits leave MSB-first (tree walk from the root). */
    def writeCode(word: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { write((word >>> i) & 1, 1); i -= 1 }
    }
    def bytes: Array[Byte] = {
      if (nBits > 0) { out.write(cur); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** Vorbis packed float (spec §9.2.2): value = mantissa · 2^exp2. */
  private def float32Pack(mantissa: Int, exp2: Int): Long =
    ((788L + exp2) << 21) | (mantissa & 0x1fffff)

  /** Ogg page (RFC 3533) with proper lacing; `bodies` = whole packets. */
  private def page(headerType: Int, granule: Long, seq: Int,
                   bodies: Array[Array[Byte]]): Array[Byte] = {
    val laces = bodies.flatMap { b =>
      val full = b.length / 255
      (0 until full).map(_ => 255) :+ (b.length % 255)
    }
    require(laces.length <= 255, "fixture page overflow")
    val out = new ByteArrayOutputStream()
    out.write("OggS".getBytes, 0, 4)
    out.write(0)
    out.write(headerType)
    var g = granule
    (0 until 8).foreach { _ => out.write((g & 0xff).toInt); g >>= 8 }
    out.write(Array[Byte](1, 0, 0, 0), 0, 4) // serial
    out.write(Array[Byte]((seq & 0xff).toByte, ((seq >> 8) & 0xff).toByte, 0, 0), 0, 4)
    out.write(new Array[Byte](4), 0, 4) // CRC: unverified by the decoder
    out.write(laces.length)
    laces.foreach(out.write)
    bodies.foreach(b => out.write(b, 0, b.length))
    out.toByteArray
  }

  private def idPacket(sampleRate: Int, channels: Int, bsShort: Int, bsLong: Int): Array[Byte] = {
    val w = new BitWriter
    w.write(1, 8)
    "vorbis".getBytes.foreach(c => w.write(c, 8))
    w.writeLong(0L, 32) // version
    w.write(channels, 8)
    w.writeLong(sampleRate.toLong, 32)
    w.writeLong(0L, 32); w.writeLong(0L, 32); w.writeLong(0L, 32) // bitrates
    def log2(v: Int) = 31 - Integer.numberOfLeadingZeros(v)
    w.write(log2(bsShort) | (log2(bsLong) << 4), 8)
    w.write(1, 1) // framing
    w.bytes
  }

  private def commentPacket: Array[Byte] = {
    val w = new BitWriter
    w.write(3, 8)
    "vorbis".getBytes.foreach(c => w.write(c, 8))
    w.writeLong(0L, 32) // vendor length 0
    w.writeLong(0L, 32) // zero user comments
    w.write(1, 1)
    w.bytes
  }

  /** deltaPack = (mantissa, exp2) for the VQ delta; (0, 0) ⇒ silent PCM. */
  private def setupPacket(channels: Int, bsShort: Int, bsLong: Int,
                          deltaPack: (Int, Int)): Array[Byte] = {
    val w = new BitWriter
    w.write(5, 8)
    "vorbis".getBytes.foreach(c => w.write(c, 8))
    w.write(2, 8) // codebook_count - 1 = 2 → 3 books
    // book0: floor Y2 — dim 1, 4 entries, all length 2 (codewords 00..11)
    w.write(0x564342, 24)
    w.write(1, 16); w.write(4, 24)
    w.write(0, 1); w.write(0, 1) // unordered, non-sparse
    (0 until 4).foreach(_ => w.write(1, 5)) // length-1 = 1
    w.write(0, 4) // lookup none
    // book1: residue classbook — dim 1, 2 entries, lengths 1/1
    w.write(0x564342, 24)
    w.write(1, 16); w.write(2, 24)
    w.write(0, 1); w.write(0, 1)
    (0 until 2).foreach(_ => w.write(0, 5))
    w.write(0, 4)
    // book2: residue VQ — dim 4, 2 entries, lengths 1/1, lookup type 1
    w.write(0x564342, 24)
    w.write(4, 16); w.write(2, 24)
    w.write(0, 1); w.write(0, 1)
    (0 until 2).foreach(_ => w.write(0, 5))
    w.write(1, 4) // lookup type 1
    w.writeLong(0L, 32) // min = 0.0 (zero mantissa; exponent moot)
    w.writeLong(float32Pack(deltaPack._1, deltaPack._2), 32)
    w.write(0, 4) // value_bits - 1 = 0 → 1 bit
    w.write(0, 1) // sequence_p
    w.write(1, 1) // the single multiplicand (lookup1_values = 1): value 1
    // times
    w.write(0, 6); w.write(0, 16)
    // floors: one, type 1
    w.write(0, 6)
    w.write(1, 16)
    w.write(1, 5)  // partitions = 1
    w.write(0, 4)  // partition 0 → class 0
    w.write(0, 3)  // class 0 dims - 1 = 0 → dim 1
    w.write(0, 2)  // subclasses = 0
    w.write(0 + 1, 8) // subclass book (+1 on the wire) = book0
    w.write(0, 2)  // multiplier - 1 = 0 → 1
    w.write(6, 4)  // rangebits = 6
    w.write(32, 6) // the one extra X value: 32 (X list = [0, 64, 32])
    // residues: two (short, long), type 2
    w.write(1, 6)
    Seq(bsShort, bsLong).foreach { bs =>
      w.write(2, 16)
      w.write(0, 24)                       // begin
      w.write(channels * bs / 2, 24)       // end
      w.write(8 - 1, 24)                   // partition size 8
      w.write(2 - 1, 6)                    // classifications = 2
      w.write(1, 8)                        // classbook = book1
      // cascade: class 0 → 0 (decode nothing), class 1 → bit 0 (pass 0)
      w.write(0, 3); w.write(0, 1)
      w.write(1, 3); w.write(0, 1)
      // books for class 1 pass 0
      w.write(2, 8)                        // book2
    }
    // mappings: two (short → residue 0, long → residue 1), type 0
    w.write(1, 6)
    Seq(0, 1).foreach { resId =>
      w.write(0, 16)
      w.write(0, 1) // one submap
      w.write(0, 1) // no coupling
      w.write(0, 2) // reserved
      w.write(0, 8) // time placeholder
      w.write(0, 8) // floor 0
      w.write(resId, 8)
    }
    // modes: two — short uses mapping 0, long uses mapping 1
    w.write(1, 6)
    w.write(0, 1); w.write(0, 16); w.write(0, 16); w.write(0, 8)
    w.write(1, 1); w.write(0, 16); w.write(0, 16); w.write(1, 8)
    w.write(1, 1) // framing
    w.bytes
  }

  private def audioPacket(f: Frame, prevLong: Boolean, nextLong: Boolean,
                          channels: Int, bsShort: Int, bsLong: Int): Array[Byte] = {
    val w = new BitWriter
    w.write(0, 1)                 // audio
    w.write(if (f.long) 1 else 0, 1) // mode number (2 modes → 1 bit)
    if (f.long) {
      w.write(if (prevLong) 1 else 0, 1)
      w.write(if (nextLong) 1 else 0, 1)
    }
    // floor per channel: nonzero, Y0/Y1 raw 8-bit, Y2 via book0 (2 bits)
    var c = 0
    while (c < channels) {
      w.write(1, 1)
      w.write(f.y0 & 0xff, 8)
      w.write(f.y1 & 0xff, 8)
      w.writeCode(f.y2 & 3, 2)
      c += 1
    }
    // residue type 2: one interleaved vector of ch·n/2, partitions of 8,
    // every partition class 1 (classword '1'), then 2 VQ codewords each
    val n2 = (if (f.long) bsLong else bsShort) / 2
    val partitions = channels * n2 / 8
    var p = 0
    while (p < partitions) {
      w.writeCode(1, 1)           // class 1
      w.writeCode(p & 1, 1)       // VQ entry (both entries share the vector)
      w.writeCode((p >> 1) & 1, 1)
      p += 1
    }
    w.bytes
  }

  /** Emitted-PCM length of a frame plan (the decoder's lapping arithmetic):
    * frame i>0 contributes n(i−1)/4 + n(i)/4 samples. */
  def emittedSamples(plan: Seq[Frame], bsShort: Int, bsLong: Int): Long = {
    var total = 0L
    var i = 1
    while (i < plan.length) {
      val pn = if (plan(i - 1).long) bsLong else bsShort
      val n = if (plan(i).long) bsLong else bsShort
      total += pn / 4 + n / 4
      i += 1
    }
    total
  }

  /** Σ floor Y values over the plan (per channel ×channels). */
  def floorYSum(plan: Seq[Frame], channels: Int): Long =
    plan.map(f => (f.y0.toLong + f.y1 + f.y2) * channels).sum

  /** Build the complete Ogg/Vorbis stream. `granuleOverride` < 0 stamps the
    * true emitted total; ≥ 0 forces the final granule (truncation tests). */
  def stream(sampleRate: Int, channels: Int, bsShort: Int, bsLong: Int,
             plan: Seq[Frame], deltaPack: (Int, Int) = (0, 0),
             granuleOverride: Long = -1L): Array[Byte] = {
    require(plan.nonEmpty && channels >= 1)
    val out = new ByteArrayOutputStream()
    def put(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    put(page(0x02, 0L, 0, Array(idPacket(sampleRate, channels, bsShort, bsLong))))
    put(page(0x00, 0L, 1, Array(commentPacket, setupPacket(channels, bsShort, bsLong, deltaPack))))
    val total = emittedSamples(plan, bsShort, bsLong)
    var emitted = 0L
    var i = 0
    while (i < plan.length) {
      val f = plan(i)
      if (i > 0) {
        val pn = if (plan(i - 1).long) bsLong else bsShort
        val n = if (f.long) bsLong else bsShort
        emitted += pn / 4 + n / 4
      }
      val prevLong = i > 0 && plan(i - 1).long
      val nextLong = i + 1 < plan.length && plan(i + 1).long
      val last = i == plan.length - 1
      val g = if (last && granuleOverride >= 0) granuleOverride else emitted
      put(page(if (last) 0x04 else 0x00, g, 2 + i,
        Array(audioPacket(f, prevLong, nextLong, channels, bsShort, bsLong))))
      i += 1
    }
    out.toByteArray
  }
}
