package graft.media

import org.scalatest.funsuite.AnyFunSuite

class ExifMetaSpec extends AnyFunSuite {

  test("jpeg APP1: orientation, make, datetime, GPS presence") {
    val i = ExifMeta.parse(ImageEncode.exifJpeg(6, "CamCo", "2020:01:02 10:00:00", withGps = true))
    assert(i == ExifMeta.Info(6, hasGps = true, "CamCo", "2020:01:02 10:00:00"))
    val noGps = ExifMeta.parse(ImageEncode.exifJpeg(1, "X", "2021:12:31 23:59:59", withGps = false))
    assert(noGps == ExifMeta.Info(1, hasGps = false, "X", "2021:12:31 23:59:59"))
  }

  test("bare TIFF body; datetime falls back to the Exif sub-IFD's DateTimeOriginal") {
    val i = ExifMeta.parse(ImageEncode.exifTiffBody(3, "Maker", "2019:06:15 08:30:00",
      withGps = false, dtInSub = true))
    assert(i == ExifMeta.Info(3, hasGps = false, "Maker", "2019:06:15 08:30:00"))
    // short make exercises the inline-value path (≤4 bytes incl. NUL)
    val inl = ExifMeta.parse(ImageEncode.exifTiffBody(8, "Ab", "2019:06:15 08:30:00",
      withGps = true, dtInSub = false))
    assert(inl == ExifMeta.Info(8, hasGps = true, "Ab", "2019:06:15 08:30:00"))
  }

  test("absent and invalid fields degrade: bad orientation -1, plain JPEG all-absent") {
    assert(ExifMeta.parse(JpegEncode.flatGray(8, 8, 100)) ==
      ExifMeta.Info(-1, hasGps = false, null, null))
    val bad = ImageEncode.exifTiffBody(11, "M", "d", withGps = false, dtInSub = false)
    val i = ExifMeta.parse(bad)
    assert(i.orientation == -1 && i.make == "M" && i.dateTime == "d") // 11 out of 1..8
  }

  test("totality: truncations never throw; a GPS pointer past EOF is not has_gps") {
    val full = ImageEncode.exifJpeg(2, "CamCo", "2020:01:02 10:00:00", withGps = true,
      dtInSub = true)
    for (n <- 0 until full.length) {
      val i = ExifMeta.parse(java.util.Arrays.copyOf(full, n))
      assert(i.orientation >= -1)
    }
    // chop just past the IFD0 so the GPS offset dangles
    val tiff = ImageEncode.exifTiffBody(2, "CamCo", "2020:01:02 10:00:00",
      withGps = true, dtInSub = false)
    val cut = ExifMeta.parse(java.util.Arrays.copyOf(tiff, tiff.length - 18))
    assert(!cut.hasGps)
  }
}
