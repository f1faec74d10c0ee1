package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface test: functions registered via SparkSessionExtensions. */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // spark.sql.extensions is a static conf (bound at SparkContext creation), so
    // the shared-context test uses the direct registration path; the --conf
    // extensions path is exercised by spark-submit in the verify flow
    val s = SparkTestBase.session
    GraftExtensions.register(s)
    s
  }

  test("graft_* functions callable from SQL") {
    val df = spark.sql(
      """SELECT
        |  graft_extract_any_text(encode('<p>five small words right here</p>', 'UTF-8')) AS t,
        |  graft_simhash64('alpha beta gamma') AS sh,
        |  graft_rolling_fingerprint('alpha beta gamma delta') AS fp,
        |  size(graft_minhash_sig('alpha beta gamma delta epsilon')) AS nsig,
        |  size(graft_minhash_bands('alpha beta gamma delta epsilon')) AS nbands,
        |  graft_pdf_preflight(encode('%PDF-1.7 x', 'UTF-8')).is_pdf AS is_pdf,
        |  graft_minhash_sig_bands('alpha beta gamma delta epsilon') AS mh,
        |  graft_media_sniff(unhex('89504E470D0A1A0A0000000D494844520000001000000020')).format AS fmt,
        |  size(graft_media_features(encode('xy', 'UTF-8'))) AS nfeat
        |""".stripMargin)
    val r = df.collect()(0)
    assert(r.getString(0) == "five small words right here")
    assert(r.getLong(1) == graft.text.TextHash.simhash64("alpha beta gamma"))
    assert(r.getInt(3) == 64 && r.getInt(4) == 8)
    assert(r.getBoolean(5))
    val mh = r.getStruct(6)
    assert(mh.getSeq[Long](0).length == 64 && mh.getSeq[Long](1).length == 8)
    // fused struct agrees with the separate functions
    assert(mh.getSeq[Long](0) ==
      graft.text.TextHash.minhash("alpha beta gamma delta epsilon", 64, 3).toSeq)
    assert(r.getString(7) == "png" && r.getInt(8) == 8)
  }

  test("round-7 registrations: sitemap/robots/meta/langid/deflate reachable from SQL") {
    val df = spark.sql(
      """SELECT
        |  graft_sitemap_kind(encode('<urlset><url><loc>https://x/p</loc></url></urlset>', 'UTF-8')) AS sk,
        |  size(graft_sitemap_entries(encode('<urlset><url><loc>https://x/p</loc></url></urlset>', 'UTF-8'))) AS nsm,
        |  graft_robots_sitemaps('Sitemap: https://x/s.xml')[0] AS rs,
        |  size(graft_feed_items(encode('<rss><channel><item><title>t</title></item></channel></rss>', 'UTF-8'))) AS nfeed,
        |  graft_deflate_len(encode('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa', 'UTF-8')) AS dl,
        |  graft_html_meta(encode('<head><title>T</title></head>', 'UTF-8')).title AS title,
        |  graft_lang_id('the quick brown fox jumps over the lazy dog and runs away').lang AS lang,
        |  graft_pdf_decrypt(encode('not a pdf', 'UTF-8')) AS pd
        |""".stripMargin)
    val r = df.collect()(0)
    assert(r.getString(0) == "urlset" && r.getInt(1) == 1)
    assert(r.getString(2) == "https://x/s.xml" && r.getInt(3) == 1)
    assert(r.getLong(4) > 0 && r.getLong(4) < 32)
    assert(r.getString(5) == "T")
    assert(r.getString(6) == "en")
    assert(r.isNullAt(7)) // non-PDF: decrypt yields null, never a throw
  }

  test("graft_exif_meta and graft_image_dhash callable from SQL on real fixtures") {
    def hex(b: Array[Byte]) = b.map(x => f"$x%02x").mkString
    val exif = hex(graft.media.ImageEncode.exifJpeg(6, "maker", "2024:01:02 03:04:05",
      withGps = false))
    val png = hex(graft.media.ImageEncode.pngGrayStored(16, 8, 200)) // dhash needs w >= 9
    val r = spark.sql(
      s"""SELECT graft_exif_meta(unhex('$exif')).orientation AS o,
         |  graft_exif_meta(unhex('$exif')).make AS mk,
         |  graft_image_dhash(unhex('$png')) AS dh
         |""".stripMargin).collect()(0)
    assert(r.getInt(0) == 6 && r.getString(1) == "maker")
    assert(r.getLong(2) == 0L) // flat image: no gradient anywhere → dHash 0
  }
}
