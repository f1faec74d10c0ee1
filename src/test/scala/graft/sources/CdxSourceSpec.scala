package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CdxSourceSpec extends AnyFunSuite with SparkTestBase {

  private val good =
    """com,example)/a 20240101000000 {"url": "https://example.com/a", "mime": "text/html", "status": "200", "digest": "sha1:AAA", "length": "120", "offset": "0", "filename": "f.warc.gz"}"""
  private val good2 =
    """org,site)/b 20240102000000 {"url": "https://site.org/b", "status": "301", "length": "55", "offset": "120", "filename": "f.warc.gz"}"""

  private def row(r: org.apache.spark.sql.Row) =
    (r.getAs[String]("surt_key"), r.getAs[String]("ts"), r.getAs[String]("url"),
      Option(r.getAs[Integer]("status")).map(_.toInt),
      Option(r.getAs[java.lang.Long]("length")).map(_.toLong),
      Option(r.getAs[java.lang.Long]("offset")).map(_.toLong),
      r.getAs[String]("filename"))

  test("reads plain and gzipped CDXJ; header and blank lines dropped; typed columns") {
    val dir = Files.createTempDirectory("cdx").toString
    val content = s" CDX N b a\n$good\n\n$good2\n"
    Files.write(Paths.get(dir, "idx.cdxj"), content.getBytes(UTF_8))
    val gz = new GZIPOutputStream(Files.newOutputStream(Paths.get(dir, "idx2.cdxj.gz")))
    gz.write(good.getBytes(UTF_8)); gz.close()
    val got = CdxSource.entries(spark, dir).collect().map(row).toSeq
      .sortBy(r => (r._1, r._2))
    assert(got == Seq(
      ("com,example)/a", "20240101000000", "https://example.com/a",
        Some(200), Some(120L), Some(0L), "f.warc.gz"),
      ("com,example)/a", "20240101000000", "https://example.com/a",
        Some(200), Some(120L), Some(0L), "f.warc.gz"),
      ("org,site)/b", "20240102000000", "https://site.org/b",
        Some(301), Some(55L), Some(120L), "f.warc.gz")), got.toString)
  }

  test("hostile lines: malformed JSON, short lines, non-numeric numbers null out, never throw") {
    val dir = Files.createTempDirectory("cdx-bad").toString
    val content = Seq(
      "com,x)/a 2024 {not json at all",
      "only-one-field",
      "two fields",
      """com,y)/b 20240101000000 {"url": "https://y.com/b", "status": "abc", "length": "99999999999999999999", "offset": "-3"}"""
    ).mkString("\n")
    Files.write(Paths.get(dir, "bad.cdxj"), content.getBytes(UTF_8))
    val got = CdxSource.entries(spark, dir).collect().map(row).toSeq
      .sortBy(r => (r._1, Option(r._3).getOrElse("")))
    assert(got == Seq(
      ("com,x)/a", "2024", null, None, None, None, null),
      ("com,y)/b", "20240101000000", "https://y.com/b", None, None, Some(-3L), null),
      ("only-one-field", null, null, None, None, None, null),
      ("two", "fields", null, None, None, None, null)), got.toString)
  }

  test("int-range overflow status nulls out instead of throwing (ANSI cast guard)") {
    // 10-18 digit statuses passed the old long-guard rlike and then THREW
    // CAST_OVERFLOW on the long->int cast under Spark 4 ANSI mode, killing
    // the whole read — the totality contract says null, never a throw
    val dir = Files.createTempDirectory("cdx-overflow").toString
    val content = Seq(
      """com,a)/x 20240101000000 {"url": "https://a.com/x", "status": "9999999999"}""",
      """com,b)/y 20240101000000 {"url": "https://b.com/y", "status": "-9999999999"}""",
      """com,c)/z 20240101000000 {"url": "https://c.com/z", "status": "200"}"""
    ).mkString("\n")
    Files.write(Paths.get(dir, "over.cdxj"), content.getBytes(UTF_8))
    val got = CdxSource.entries(spark, dir).collect().map(row).toSeq.sortBy(_._1)
    assert(got.map(r => (r._1, r._4)) == Seq(
      ("com,a)/x", None), ("com,b)/y", None), ("com,c)/z", Some(200))), got.toString)
  }
}
