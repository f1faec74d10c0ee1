package graft.media

import org.scalatest.funsuite.AnyFunSuite

class AvMetaSpec extends AnyFunSuite {

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(be32(8L + payload.map(_.length).sum), 0, 4)
    out.write(typ.getBytes, 0, 4)
    payload.foreach(p => out.write(p, 0, p.length))
    out.toByteArray
  }

  test("mp4: AvEncode round-trip recovers duration and video dimensions") {
    val i = AvMeta.parse(AvEncode.mp4Video(640, 360, 90000L, 1000L))
    assert(i.format == "mp4" && i.durationMs == 90000L)
    assert(i.width == 640 && i.height == 360)
    assert(i.sampleRate == -1 && i.channels == -1)
  }

  test("mp4: non-1000 timescale floors duration like Long division") {
    // 90000 units at timescale 600 → 150000 ms; 1001 units at 600 → 1668 ms
    assert(AvMeta.parse(AvEncode.mp4Video(1, 1, 90000L, 600L)).durationMs == 150000L)
    assert(AvMeta.parse(AvEncode.mp4Video(1, 1, 1001L, 600L)).durationMs == 1001L * 1000L / 600L)
  }

  test("mp4: version-1 mvhd/tkhd (64-bit times) parse through the v1 offsets") {
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    val mvhd = box("mvhd",
      Array[Byte](1, 0, 0, 0), be64(0), be64(0), // v1 + creation/mod 64-bit
      be32(1000), be64(42000L),                  // timescale, duration u64
      new Array[Byte](80))
    val tkhd = box("tkhd",
      Array[Byte](1, 0, 0, 7), be64(0), be64(0), // v1 + 64-bit times
      be32(1), new Array[Byte](4), be64(42000L), // id, reserved, duration u64
      new Array[Byte](8 + 2 + 2 + 2 + 2 + 36),
      be32(320L << 16), be32(240L << 16))
    val hdlr = box("hdlr", new Array[Byte](8), "vide".getBytes, new Array[Byte](13))
    val payload = box("ftyp", "isom".getBytes, be32(0), "isom".getBytes) ++
      box("moov", mvhd, box("trak", tkhd, box("mdia", hdlr)))
    val i = AvMeta.parse(payload)
    assert(i.durationMs == 42000L && i.width == 320 && i.height == 240)
  }

  test("mp4: audio trak before video trak — dimensions come from the video one") {
    val mvhd = box("mvhd", new Array[Byte](12), be32(1000), be32(5000), new Array[Byte](80))
    def tkhd(w: Int, h: Int) = box("tkhd",
      Array[Byte](0, 0, 0, 7), new Array[Byte](72),
      be32(w.toLong << 16), be32(h.toLong << 16))
    def trak(w: Int, h: Int, kind: String) =
      box("trak", tkhd(w, h), box("mdia",
        box("hdlr", new Array[Byte](8), kind.getBytes, new Array[Byte](13))))
    val payload = box("ftyp", "isom".getBytes, be32(0), "isom".getBytes) ++
      box("moov", mvhd, trak(0, 0, "soun"), trak(1280, 720, "vide"))
    val i = AvMeta.parse(payload)
    assert(i.width == 1280 && i.height == 720 && i.durationMs == 5000L)
  }

  test("mp3: frame walk counts samples; duration floors like Long division") {
    val i = AvMeta.parse(AvEncode.mp3Silent(10))
    assert(i.format == "mp3")
    assert(i.sampleRate == 44100 && i.channels == 1)
    assert(i.durationMs == 10L * 1152 * 1000 / 44100) // 261, floored
  }

  test("mp3: ID3v2 tag (syncsafe size) is skipped before the first frame") {
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 100) ++ new Array[Byte](100)
    val i = AvMeta.parse(id3 ++ AvEncode.mp3Silent(4))
    assert(i.format == "mp3" && i.durationMs == 4L * 1152 * 1000 / 44100)
  }

  test("mp3: Xing VBR frame count beats the walk (truncated payload still exact)") {
    // one MPEG1 mono frame carrying a Xing tag declaring 100 frames, then
    // nothing — the walk would report 1 frame, the tag knows the truth
    val base = AvEncode.mp3Silent(1)
    val b = base.clone()
    val x = 4 + 17 // MPEG1 mono side info
    b(x) = 'X'; b(x + 1) = 'i'; b(x + 2) = 'n'; b(x + 3) = 'g'
    b(x + 4) = 0; b(x + 5) = 0; b(x + 6) = 0; b(x + 7) = 1 // flags: frames
    b(x + 8) = 0; b(x + 9) = 0; b(x + 10) = 0; b(x + 11) = 100 // 100 frames BE
    val i = AvMeta.parse(b)
    assert(i.format == "mp3" && i.durationMs == 100L * 1152 * 1000 / 44100)
    // an "Info" tag (CBR encoders) works the same; absent flags bit → walk
    val c = b.clone(); c(x) = 'I'; c(x + 1) = 'n'; c(x + 2) = 'f'; c(x + 3) = 'o'
    assert(AvMeta.parse(c).durationMs == 100L * 1152 * 1000 / 44100)
    val noFlag = b.clone(); noFlag(x + 7) = 0
    assert(AvMeta.parse(noFlag).durationMs == 1L * 1152 * 1000 / 44100)
  }

  test("mp3: padding bit extends the frame length by one byte") {
    // two padded frames: header 0xFF 0xFB 0x92 0xC0 (brIdx 9, srIdx 0, pad 1)
    val frameLen = 144 * 128000 / 44100 + 1
    val b = new Array[Byte](2 * frameLen)
    for (o <- Seq(0, frameLen)) {
      b(o) = 0xff.toByte; b(o + 1) = 0xfb.toByte; b(o + 2) = 0x92.toByte; b(o + 3) = 0xc0.toByte
    }
    val i = AvMeta.parse(b)
    assert(i.format == "mp3" && i.durationMs == 2L * 1152 * 1000 / 44100)
  }

  test("flac: STREAMINFO round-trip, including totals above 2^32 (36-bit field)") {
    val i = AvMeta.parse(AvEncode.flacStreamInfo(12345L))
    assert(i.format == "flac" && i.sampleRate == 8000 && i.channels == 1)
    assert(i.durationMs == 12345L * 1000 / 8000)
    val big = AvMeta.parse(AvEncode.flacStreamInfo(1L << 33))
    assert(big.durationMs == (1L << 33) * 1000 / 8000)
  }

  test("wav: duration from chunk lengths without touching samples") {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    out.write("RIFF".getBytes); u32(36 + 4000); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); u32(16); u16(1); u16(2); u32(8000); u32(32000); u16(4); u16(16)
    out.write("data".getBytes); u32(4000); out.write(new Array[Byte](4000))
    val i = AvMeta.parse(out.toByteArray)
    assert(i.format == "wav" && i.sampleRate == 8000 && i.channels == 2)
    assert(i.durationMs == (4000 / 4) * 1000L / 8000) // 1000 frames at 8 kHz = 125 ms
  }

  test("ogg: Vorbis id header + last-page granule position give rate/channels/duration") {
    val i = AvMeta.parse(AvEncode.oggVorbis(44100, 2, 88200L))
    assert(i.format == "ogg" && i.sampleRate == 44100 && i.channels == 2)
    assert(i.durationMs == 2000L)
    // truncation after the first page: rate known, duration unknown
    val full = AvEncode.oggVorbis(8000, 1, 8000L)
    val firstPageLen = full.indexOfSlice("OggS".getBytes, 4)
    val cut = AvMeta.parse(full.take(firstPageLen))
    assert(cut.format == "ogg" && cut.sampleRate == 8000)
    assert(cut.durationMs == 0L) // BOS granule 0 is all we saw
    for (n <- 0 until full.length) AvMeta.parse(full.take(n)) // never throws
  }

  test("ogg: OpusHead uses 48 kHz granule units regardless of input rate") {
    // hand-build: BOS page with OpusHead, EOS page at granule 96000 → 2000 ms
    val head = new java.io.ByteArrayOutputStream()
    head.write("OpusHead".getBytes); head.write(1); head.write(2) // version, channels
    head.write(new Array[Byte](2), 0, 2)                          // pre-skip
    Seq(0, 1, 2, 3).foreach(k => head.write((16000 >> (8 * k)) & 0xff)) // input rate LE
    head.write(new Array[Byte](3), 0, 3)                          // gain + mapping
    def page(ht: Int, granule: Long, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write("OggS".getBytes); o.write(0); o.write(ht)
      var g = granule
      (0 until 8).foreach { _ => o.write((g & 0xff).toInt); g >>= 8 }
      o.write(new Array[Byte](8), 0, 8) // serial + seq
      o.write(new Array[Byte](4), 0, 4) // crc
      o.write(1); o.write(body.length); o.write(body, 0, body.length)
      o.toByteArray
    }
    val i = AvMeta.parse(page(2, 0, head.toByteArray) ++ page(4, 96000L, Array[Byte](0)))
    assert(i.format == "ogg" && i.sampleRate == 16000 && i.channels == 2)
    assert(i.durationMs == 2000L)
  }

  test("totality: truncations and garbage → unknown or best-effort, never a throw") {
    val fixtures = Seq(AvEncode.mp4Video(64, 64, 1000L, 1000L),
      AvEncode.mp3Silent(3), AvEncode.flacStreamInfo(100L))
    for (f <- fixtures; n <- 0 until f.length) AvMeta.parse(f.take(n))
    assert(AvMeta.parse(null).format == "unknown")
    assert(AvMeta.parse("plain text payload".getBytes).format == "unknown")
    // malformed box size inside moov must terminate, not loop
    val bad = AvEncode.mp4Video(64, 64, 1000L, 1000L)
    bad(24) = 0xff.toByte // corrupt the first moov child's size
    AvMeta.parse(bad)
  }

  test("wav: hostile chunk length 0xFFFFFFF8 terminates the walk (no hang)") {
    // len.toInt = -8 makes the Int-arithmetic next offset equal the old pos
    // with NO exception — the walk must detect the non-advance and stop
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes); out.write(Array[Byte](36, 0, 0, 0), 0, 4); out.write("WAVE".getBytes)
    out.write("junk".getBytes); out.write(Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte), 0, 4)
    out.write(new Array[Byte](64), 0, 64)
    val i = AvMeta.parse(out.toByteArray) // must return, not spin
    assert(i.format == "unknown" || i.format == "wav")
  }

  test("MediaSniff.sniff detects the new container formats") {
    assert(MediaSniff.sniff(AvEncode.mp4Video(64, 64, 1L, 1L)).format == "mp4")
    assert(MediaSniff.sniff(AvEncode.mp3Silent(1)).format == "mp3")
    assert(MediaSniff.sniff(AvEncode.flacStreamInfo(1L)).format == "flac")
  }

  test("gif: animation frame count and summed GCE delays, structurally") {
    val anim = AvMeta.parse(GifEncode.animFlat(16, 8, frames = 4, delayCs = 7, 10, 200, 77))
    assert(anim == AvMeta.AvInfo("gif", 280L, -1, -1, 16, 8, frames = 4)) // 4×70 ms
    val still = AvMeta.parse(GifEncode.flatColor(16, 8, 10, 200, 77))
    assert(still == AvMeta.AvInfo("gif", 0L, -1, -1, 16, 8, frames = 1))
    // the animated fixture still renders frame 1 through the pixel decoder
    val p = GifDecode.decode(GifEncode.animFlat(16, 8, frames = 3, delayCs = 5, 10, 200, 77)).get
    assert(p.width == 16 && p.height == 8)
    assert(p.samples.grouped(3).forall(px =>
      (px(0) & 0xff) == 10 && (px(1) & 0xff) == 200 && (px(2) & 0xff) == 77))
  }

  test("apng: acTL frame count, Σ fcTL delays; still PNG reads frames=1") {
    val anim = AvMeta.parse(ImageEncode.apngFlat(20, 10, frames = 5, delayCs = 3, v = 99))
    assert(anim == AvMeta.AvInfo("png", 150L, -1, -1, 20, 10, frames = 5)) // 5×30 ms
    val still = AvMeta.parse(ImageEncode.pngGrayStored(20, 10, 99))
    assert(still == AvMeta.AvInfo("png", 0L, -1, -1, 20, 10, frames = 1))
    // the APNG still renders frame 1 through the pixel decoder
    val p = PngDecode.decode(ImageEncode.apngFlat(20, 10, frames = 3, delayCs = 3, v = 99)).get
    assert(p.width == 20 && p.height == 10 && p.samples.forall(s => (s & 0xff) == 99))
  }

  test("animated webp: VP8X canvas + ANMF count and Σ-duration; still reads frames=1") {
    val anim = AvMeta.parse(ImageEncode.webpAnim(33, 21, frames = 4, frameMs = 70))
    assert(anim == AvMeta.AvInfo("webp", 280L, -1, -1, 33, 21, frames = 4))
    val still = AvMeta.parse(ImageEncode.webpVp8x(33, 21))
    assert(still == AvMeta.AvInfo("webp", 0L, -1, -1, 33, 21, frames = 1))
    // a VP8L still without VP8X has no canvas chunk: dims stay -1, frames 1
    assert(AvMeta.parse(ImageEncode.webpVp8l(9, 9)) ==
      AvMeta.AvInfo("webp", 0L, -1, -1, -1, -1, frames = 1))
  }

  test("apng/webp-anim: truncations keep what was walked, never throw") {
    for (full <- Seq(ImageEncode.apngFlat(20, 10, 5, 3, 99),
                     ImageEncode.webpAnim(33, 21, 4, 70));
         n <- 0 until full.length by 3) {
      val i = AvMeta.parse(java.util.Arrays.copyOf(full, n))
      assert(i.format == "png" || i.format == "webp" || i.format == "unknown")
    }
  }

  test("gif: truncated block streams keep the frames walked so far, never throw") {
    val full = GifEncode.animFlat(16, 8, frames = 4, delayCs = 7, 1, 2, 3)
    for (n <- 0 until full.length by 5) {
      val i = AvMeta.parse(java.util.Arrays.copyOf(full, n))
      assert(i.format == "gif" || i.format == "unknown")
    }
  }
}
