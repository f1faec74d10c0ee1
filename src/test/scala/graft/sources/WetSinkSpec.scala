package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class WetSinkSpec extends AnyFunSuite with SparkTestBase {

  test("roundtrip: WetSink writes, WarcSource.pages reads back byte-identical text") {
    import spark.implicits._
    val docs = Seq(
      ("https://w.example/a", "plain ascii text"),
      ("https://w.example/b", "unicode: шалом עולם — 中文 ✓"),
      ("https://w.example/c", "multi\nline\n\ntext with trailing newline\n"),
      (null.asInstanceOf[String], "skipped: null url"),
      ("https://w.example/d", null.asInstanceOf[String])
    ).toDF("url", "text").repartition(2)
    val dir = Files.createTempDirectory("wet-sink").toString
    val (files, records) = WetSink.write(docs, dir, "2026-01-02T03:04:05Z")
    assert(records == 3, s"$files files / $records records")
    // lazy creation: exactly the partitions that kept a row wrote a file,
    // and no zero-byte part litter exists
    val onDisk = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.wet.gz"))
    assert(onDisk.length.toLong == files && onDisk.forall(_.length > 0),
      onDisk.map(f => s"${f.getName}:${f.length}").mkString(","))
    // commit protocol: every attempt temp was renamed or deleted — nothing
    // but published part files (and Hadoop local-FS .crc sidecars) remains
    val leftovers = new java.io.File(dir).listFiles().filter(
      _.getName.contains(".attempt-"))
    assert(leftovers.isEmpty, leftovers.map(_.getName).mkString(","))
    val back = WarcSource.pages(spark, dir)
      .select("url", "text", "html").collect()
      .map(r => (r.getString(0), r.getString(1), r.get(2))).toList.sortBy(_._1)
    assert(back.map(_._1) == List("https://w.example/a", "https://w.example/b",
      "https://w.example/c"))
    assert(back.map(_._2) == List("plain ascii text",
      "unicode: шалом עולם — 中文 ✓", "multi\nline\n\ntext with trailing newline\n"))
    assert(back.forall(_._3 == null), "WET conversion records must land as text, not html")
  }

  test("re-run is byte-identical (deterministic record ids and dates)") {
    import spark.implicits._
    val docs = Seq(("https://w.example/x", "same text")).toDF("url", "text").coalesce(1)
    val d1 = Files.createTempDirectory("wet-a").toString
    val d2 = Files.createTempDirectory("wet-b").toString
    WetSink.write(docs, d1, "2026-01-02T03:04:05Z")
    WetSink.write(docs, d2, "2026-01-02T03:04:05Z")
    val b1 = Files.readAllBytes(java.nio.file.Paths.get(d1, "part-00000.warc.wet.gz"))
    val b2 = Files.readAllBytes(java.nio.file.Paths.get(d2, "part-00000.warc.wet.gz"))
    assert(java.util.Arrays.equals(b1, b2), "WET output must be reproducible byte-for-byte")
  }
}
