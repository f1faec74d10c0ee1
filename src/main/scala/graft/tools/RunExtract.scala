package graft.tools

import org.apache.spark.sql.SparkSession

import graft.fixtures.Corpus
import graft.pipeline.ExtractPipeline

/**
 * spark-submit entry point: run the extraction pipeline over the deterministic
 * fixture corpus (or a parquet pages table) and print a run summary.
 *
 * Usage:
 *   RunExtract <outDir> [nPages=2000] [mode=force] [input=fixture:<seed>|parquet:<path>] [runId=run-0]
 */
object RunExtract {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(sys.error("usage: RunExtract <outDir> [nPages] [mode] [input] [runId]"))
    val nPages = args.lift(1).map(_.toLong).getOrElse(2000L)
    val mode = args.lift(2).getOrElse("force")
    val input = args.lift(3).getOrElse("fixture:42")
    val runId = args.lift(4).getOrElse("run-0")

    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pages =
      if (input.startsWith("parquet:")) spark.read.parquet(input.stripPrefix("parquet:"))
      else Corpus.pages(spark, nPages, input.stripPrefix("fixture:").toLong)

    val t0 = System.nanoTime()
    // mode-dependent output set (reference ocr_combined.py:208-214): cli = text
    // only; visual/force additionally persist word spans
    val res = ExtractPipeline.run(spark, pages, outDir,
      ExtractPipeline.Config(mode = mode, runId = runId, withSpans = mode != "cli"))
    val sec = (System.nanoTime() - t0) / 1e9
    val processed = res.extracted + res.skipped + res.errors + res.quarantined
    println(f"""{"run_id":"$runId","mode":"$mode","total":${res.totalIn},""" +
      f""""extracted":${res.extracted},"skipped":${res.skipped},"errors":${res.errors},"quarantined":${res.quarantined},""" +
      f""""resumed_buckets":${res.resumedBuckets},"wall_sec":$sec%.2f,"docs_per_sec":${processed / sec}%.1f}""")
    spark.stop()
  }
}
