package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.fixtures.Corpus
import graft.functions.url_host

/** Skew evidence (FIXTURES.md §5 / SURVEY.md §4): zipfian hosts make
  * host-partitioning pathological; the salt bounds per-task volume. */
class SkewSpec extends AnyFunSuite with SparkTestBase {

  private val N = 4000
  private val parts = 16

  test("salting bounds the max/mean partition ratio under zipf hosts") {
    val pages = Corpus.pages(spark, N).withColumn("_host", url_host(col("url")))

    val byHost = pages
      .repartition(parts, col("_host"))
      .groupBy(spark_partition_id()).count().collect().map(_.getLong(1))
    val bySalted = pages
      .withColumn("_salt", pmod(xxhash64(col("url")), lit(8)))
      .repartition(parts, col("_host"), col("_salt"))
      .groupBy(spark_partition_id()).count().collect().map(_.getLong(1))

    def ratio(sizes: Seq[Long]): Double = {
      val nonEmpty = sizes.filter(_ > 0)
      nonEmpty.max.toDouble / (nonEmpty.sum.toDouble / parts)
    }
    val rHost = ratio(byHost.toSeq)
    val rSalt = ratio(bySalted.toSeq)
    info(f"max/mean by host: $rHost%.2f; with salt: $rSalt%.2f")
    // zipf head host holds >20% of rows → host partitioning leaves one task with
    // several times the mean; salting must cut that substantially
    assert(rHost > 2.0, f"expected skew without salting, got $rHost%.2f")
    assert(rSalt < rHost * 0.6, f"salting did not help: $rHost%.2f -> $rSalt%.2f")
    assert(rSalt < 2.0, f"salted ratio too high: $rSalt%.2f")
  }

  test("frequency-aware salting: only head hosts salted, tail stays co-located") {
    val pages = Corpus.pages(spark, N).withColumn("_host", url_host(col("url")))
    val headSalts = SkewSalting.headHostSalts(pages, col("_host"), targetPartitions = parts,
      sampleFraction = 0.5)
    assert(headSalts.nonEmpty && headSalts.size < 20,
      s"expected a small head-host set, got ${headSalts.size}")
    assert(headSalts.contains("host0.example.com")) // zipf head
    val salted = pages
      .withColumn("_salt", SkewSalting.saltColumn(col("url"), col("_host"), headSalts))
      .repartition(parts, col("_host"), col("_salt"))
      .groupBy(spark_partition_id()).count().collect().map(_.getLong(1))
    val nonEmpty = salted.filter(_ > 0)
    val ratio = nonEmpty.max.toDouble / (nonEmpty.sum.toDouble / parts)
    info(f"freq-aware salted max/mean: $ratio%.2f (head hosts: ${headSalts.size})")
    // with only 16 partitions and ~50 co-located tail hosts, weighted-balls
    // collisions bound what any salting can achieve; require a clear improvement
    // over unsalted host partitioning (5.2) and a sane absolute bound
    assert(ratio < 2.5, f"freq-aware salted ratio too high: $ratio%.2f")
    // tail hosts carry salt 0 (fully co-located)
    val tailSalts = pages
      .withColumn("_salt", SkewSalting.saltColumn(col("url"), col("_host"), headSalts))
      .filter(!col("_host").isin(headSalts.keys.toSeq: _*))
      .select(countDistinct(col("_salt"))).collect()(0).getLong(0)
    assert(tailSalts == 1)
  }

  test("the driver collect is the HEAD, not the distinct-host count") {
    import spark.implicits._
    // 10_000 one-row hosts + 2 heavy hosts: the unfiltered count frame has
    // 10_002 rows, but the share filter runs IN-FRAME, so the collected head
    // is bounded by 2·targetPartitions (shares sum to 1) — the invariant that
    // keeps the extraction hot path alive at 10^7-10^8 crawl hosts
    val tp = 8
    val rows =
      (0 until 10000).map(i => s"http://t$i.example/p") ++
        (0 until 4000).map(i => s"http://heavy-a.example/p$i") ++
        (0 until 4000).map(i => s"http://heavy-b.example/p$i")
    val df = rows.toDF("url").withColumn("_host", url_host(col("url")))
    val counts = SkewSalting.sampledHostCounts(df, col("_host"), 1.0, 7L)
    val total = counts.agg(sum(col("_c"))).first().getLong(0)
    assert(counts.count() == 10002L)
    val headRows = SkewSalting.headFrame(counts, total, tp).count()
    assert(headRows <= 2L * tp, s"head frame has $headRows rows — the share filter is not in-frame")
    assert(headRows >= 2L, "the two heavy hosts must be in the head")
    val salts = SkewSalting.headHostSalts(df, col("_host"), tp, sampleFraction = 1.0)
    assert(salts.contains("heavy-a.example") && salts.contains("heavy-b.example"))
    assert(salts.size <= 2 * tp)
  }
}
