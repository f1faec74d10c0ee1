package graft.media

import java.io.ByteArrayOutputStream
import org.scalatest.funsuite.AnyFunSuite

class PngDecodeSpec extends AnyFunSuite {

  /** Test-side PNG encoder: real zlib (Deflater), per-row filter choice. */
  private def encodePng(w: Int, h: Int, channels: Int, px: (Int, Int, Int) => Int,
                        filterFor: Int => Int): Array[Byte] = {
    val colorType = channels match { case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6 }
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    // reconstructed image for filter computation
    val img = Array.tabulate(h, stride)((y, x) => px(x / channels, y, x % channels) & 0xff)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    (0 until h).foreach { y =>
      val f = filterFor(y)
      raw(y * (stride + 1)) = f.toByte
      (0 until stride).foreach { x =>
        val v = img(y)(x)
        val a = if (x >= channels) img(y)(x - channels) else 0
        val b = if (y > 0) img(y - 1)(x) else 0
        val c = if (x >= channels && y > 0) img(y - 1)(x - channels) else 0
        val filtered = f match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - ((a + b) >> 1)
          case 4 => v - paeth(a, b, c)
        }
        raw(y * (stride + 1) + 1 + x) = (filtered & 0xff).toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zbuf = new Array[Byte](raw.length * 2 + 64)
    val zlen = deflater.deflate(zbuf); deflater.end()
    val out = new ByteArrayOutputStream()
    def be32(v: Int): Unit = { out.write(v >>> 24); out.write((v >>> 16) & 0xff); out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    be32(13); out.write("IHDR".getBytes)
    be32(w); be32(h); out.write(8); out.write(colorType); out.write(0); out.write(0); out.write(0)
    be32(0) // CRC unchecked by the decoder
    be32(zlen); out.write("IDAT".getBytes); out.write(zbuf, 0, zlen); be32(0)
    be32(0); out.write("IEND".getBytes); be32(0)
    out.toByteArray
  }

  test("gray PNG with every filter type round-trips through real zlib") {
    val w = 7; val h = 10 // odd stride exercises the bpp offsets
    def pix(x: Int, y: Int, c: Int): Int = (x * 31 + y * 17) % 256
    val png = encodePng(w, h, 1, pix, y => y % 5) // filters 0,1,2,3,4 cycling
    val p = PngDecode.decode(png).get
    assert(p.width == w && p.height == h && p.channels == 1)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      assert((p.samples(y * w + x) & 0xff) == pix(x, y, 0), s"($x,$y)")
    })
  }

  test("rgb and rgba PNGs round-trip (interleaved channels, Paeth across pixels)") {
    def pix(x: Int, y: Int, c: Int): Int = (x * 11 + y * 7 + c * 101) % 256
    Seq(3, 4).foreach { ch =>
      val png = encodePng(5, 6, ch, pix, y => 4 - (y % 5))
      val p = PngDecode.decode(png).get
      assert(p.channels == ch)
      (0 until 6).foreach(y => (0 until 5).foreach(x => (0 until ch).foreach { c =>
        assert((p.samples((y * 5 + x) * ch + c) & 0xff) == pix(x, y, c), s"($x,$y,$c)")
      }))
    }
  }

  test("features: per-channel mean and population variance from decoded pixels") {
    // rows of constant value y*10 → channel mean = 45×... h=8: values 0,10..70
    val png = encodePng(4, 8, 1, (x, y, c) => y * 10, _ => 0)
    val f = MediaSniff.features(png)
    val vals = (0 until 8).map(_ * 10.0)
    val mean = vals.sum / 8
    val variance = vals.map(v => (v - mean) * (v - mean)).sum / 8
    assert(f(0) == mean.toFloat, f.mkString(","))
    assert(f(4) == variance.toFloat, f.mkString(","))
    assert(f(1) == 0f && f(5) == 0f) // absent channels stay zero
    // rgb: per-channel means differ by the channel offset
    val png3 = encodePng(4, 8, 3, (x, y, c) => y * 10 + c * 3, _ => 1)
    val f3 = MediaSniff.features(png3)
    assert(f3(0) == mean.toFloat && f3(1) == (mean + 3).toFloat && f3(2) == (mean + 6).toFloat)
  }

  test("totality: corrupt, truncated, palette, non-PNG never throw; fallback sketch") {
    assert(PngDecode.decode(null).isEmpty)
    assert(PngDecode.decode(Array.emptyByteArray).isEmpty)
    assert(PngDecode.decode("not a png at all, just bytes".getBytes).isEmpty)
    val good = encodePng(6, 6, 1, (x, y, c) => x + y, _ => 0)
    assert(PngDecode.decode(good).isDefined)
    assert(PngDecode.decode(good.take(40)).isEmpty)           // truncated chunk
    assert(PngDecode.decode(good.dropRight(20)).isEmpty)      // truncated IDAT
    (8 until good.length by 13).foreach { i =>
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x7f).toByte
      PngDecode.decode(bad) // must not throw
    }
    // non-PNG features fall back to the deterministic hash sketch
    val sketch1 = MediaSniff.features("hello world".getBytes)
    val sketch2 = MediaSniff.features("hello world".getBytes)
    assert(sketch1.toSeq == sketch2.toSeq && sketch1.exists(_ != 0f))
  }
}
