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
}
