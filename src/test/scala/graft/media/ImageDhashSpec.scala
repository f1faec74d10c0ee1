package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** Perceptual difference hash (MediaSniff.dhash64): pinned definition,
  * closed-form agreement with the q71 oracle formula, and the property the
  * operator exists for — resolution invariance. */
class ImageDhashSpec extends AnyFunSuite {

  private val bright = (200, 150, 100) // gray 150
  private val dark = (10, 30, 5)       // gray 15

  private def expected(p: Int): Long = 0x0101010101010101L * ((p & ~(p >> 1)) & 0xff)

  test("stripe patterns hash to the closed form, identically at both resolutions") {
    for (p <- Seq(0, 1, 5, 42, 73, 99)) {
      val small = MediaSniff.dhash64(ImageEncode.bmpVStripes(18, 16, p, bright, dark))
      val large = MediaSniff.dhash64(ImageEncode.bmpVStripes(36, 32, p, bright, dark))
      assert(small.contains(expected(p)), s"p=$p small=$small")
      assert(small == large, s"p=$p resolution variance: $small vs $large")
    }
  }

  test("flat images hash to 0 across formats (no gradient, no bits)") {
    assert(MediaSniff.dhash64(ImageEncode.bmpFlat(16, 8, 9, 9, 9)).contains(0L))
    assert(MediaSniff.dhash64(ImageEncode.tiffFlat(16, 8, Seq(42), littleEndian = true)).contains(0L))
  }

  test("gray is BT.601 luma, not a channel mean (chromatic gradients survive)") {
    // pure green (0,255,0) and pure red (255,0,0) have the SAME channel mean
    // (85) — a channel-mean gray would hash these stripes to 0, erasing the
    // composition; luma sees green 150 > red 76, so the stripe pattern
    // yields the standard closed form with green as the bright tone. This is
    // what keeps a JPEG re-encode (decoded as raw YCbCr, gray = Y plane) in
    // the same hash group as the RGB original.
    for (p <- Seq(5, 42, 73)) {
      val got = MediaSniff.dhash64(
        ImageEncode.bmpVStripes(18, 16, p, (0, 255, 0), (255, 0, 0)))
      assert(got.contains(expected(p)), s"p=$p got=$got")
    }
    // flat chroma through the JPEG path: decodes to flat YCbCr planes, and
    // the Y-plane gray keeps the hash at 0 like every other flat image
    assert(MediaSniff.dhash64(JpegEncode.flatColor(16, 8, 90, 60, 30)).contains(0L))
  }

  test("distinct edge masks yield distinct hashes") {
    val hashes = Seq(1, 2, 4, 5, 21, 85).map(p =>
      MediaSniff.dhash64(ImageEncode.bmpVStripes(18, 16, p, bright, dark)).get)
    assert(hashes.distinct.size == hashes.size, hashes.toString)
  }

  test("non-image, sub-grid, and hostile payloads hash to None, never throw") {
    assert(MediaSniff.dhash64(null).isEmpty)
    assert(MediaSniff.dhash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaSniff.dhash64(ImageEncode.bmpFlat(8, 7, 1, 2, 3)).isEmpty) // under the 9x8 grid
    // audio decodes are deliberately not dispatched
    assert(MediaSniff.dhash64(AvEncode.mp3Silent(8000)).isEmpty)
    val f = ImageEncode.bmpVStripes(18, 16, 42, bright, dark)
    var seed = 0x5deece66dL
    for (_ <- 0 until 200) { // deterministic byte-flip fuzz: total, no throw
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val m = f.clone()
      m((((seed >>> 33) % f.length).toInt + f.length) % f.length) = (seed & 0xff).toByte
      MediaSniff.dhash64(m)
    }
  }
}
