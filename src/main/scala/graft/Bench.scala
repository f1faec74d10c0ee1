package graft

import org.apache.spark.sql.SparkSession

/**
 * Per-round benchmark main (driver-run): times every SparkEntry query on
 * SPARK_GRAFT_SF_DIR, plus the extraction-pipeline headline (docs/sec over the
 * deterministic fixture corpus — the BASELINE.json metric). Prints ONE JSON line.
 *
 * Scaling evidence (local[8] vs local[32]) is produced by graft.tools.ScalingBench
 * and recorded in BASELINE.md.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // warm the JVM/codegen once on the smallest scale
    try SparkEntry.queries.values.foreach(q => q(spark, "/root/testdata/sf0.001").count())
    catch { case _: Throwable => }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try time(fn(spark, sfDir).count()) catch { case _: Throwable => -1.0 }
      name -> sec
    }

    // extraction headline: docs/sec from a materialized table (the BASELINE.json
    // metric shape) — corpus gen excluded from timing, one warmup pass for JIT
    val extractionDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "100000").toLong
    val corpusPath = s"/tmp/graft-bench-pages-$extractionDocs"
    import org.apache.spark.sql.functions.col
    if (!new java.io.File(corpusPath).exists())
      graft.fixtures.Corpus.pages(spark, extractionDocs).write.mode("overwrite").parquet(corpusPath)
    def extractPass(): Long =
      spark.read.parquet(corpusPath)
        .select(graft.functions.text_digest(graft.functions.extract_any_text(col("html"))).as("d"))
        .filter(col("d").isNotNull).count()
    extractPass() // warmup
    val extractSec = time(extractPass())
    val docsPerSec = extractionDocs / extractSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","extract_docs":$extractionDocs,"extract_sec":$extractSec%.3f,"extract_docs_per_sec":$docsPerSec%.1f,"cpus":"$cpus"}""")
    spark.stop()
  }
}
