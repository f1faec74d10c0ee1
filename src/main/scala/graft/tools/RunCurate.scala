package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.fixtures.Corpus
import graft.functions._
import graft.pipeline.CurationPipeline

/**
 * spark-submit entry point for the post-extraction curation stage: extract
 * (or read) a (id, url, text) table, run the CurationPipeline funnel, write
 * the curated table, print the one-row funnel as a JSON summary line.
 *
 * Usage:
 *   RunCurate <outDir> [input=fixture:42] [nPages=2000] [hostCapK=100000] [samplePct=100] [gates=gopher]
 *   input = fixture:<seed> (deterministic corpus, extracted inline) | parquet:<path>
 *           (a table already carrying url + text columns)
 *   gates = comma-joined subset of {gopher, c4}, or "none". The fixture
 *           default is "none": the synthetic corpus is deliberately NOT
 *           natural language (tech-word salad + Hebrew), so the Gopher
 *           stop-word rule and C4's terminal-punctuation rule correctly
 *           reject ~all of it — the gates are value-checked on constructed
 *           text by q55/q56/q60 instead. Pass gates explicitly for real
 *           corpora.
 */
object RunCurate {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(
      sys.error("usage: RunCurate <outDir> [input] [nPages] [hostCapK] [samplePct] [gates]"))
    val input = args.lift(1).getOrElse("fixture:42")
    val nPages = args.lift(2).map(_.toLong).getOrElse(2000L)
    val hostCapK = args.lift(3).map(_.toInt).getOrElse(100000)
    val samplePct = args.lift(4).map(_.toInt).getOrElse(100)
    val gates = args.lift(5).getOrElse("none")
      .split(",").map(_.trim).filter(g => g == "gopher" || g == "c4").toSet

    val spark = SparkSession.builder()
      .appName("graft-curate")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs =
      if (input.startsWith("parquet:"))
        spark.read.parquet(input.stripPrefix("parquet:"))
          .select(xxhash64(col("url")).as("id"), col("url"), col("text"))
          .filter(col("text").isNotNull)
      else
        Corpus.pages(spark, nPages, input.stripPrefix("fixture:").toLong)
          .select(xxhash64(col("url")).as("id"), col("url"),
            coalesce(col("text"), extract_any_text(col("html"))).as("text"))

    val t0 = System.nanoTime()
    // resumable surface: bucketed curated output + per-group lineage commits,
    // so a preempted run rerun over the same outDir skips committed buckets
    val r = CurationPipeline.runJob(spark, docs, outDir, "text", "id", "url",
      hostCapK = hostCapK, samplePct = samplePct, gates = gates,
      commitGroups = 4)
    val f = r.funnel
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"n_docs":${f(0)},"n_after_url_dedup":${f(1)},""" +
      f""""n_after_exact_dedup":${f(2)},"n_after_quality":${f(3)},""" +
      f""""n_after_host_cap":${f(4)},"n_curated":${f(5)},""" +
      f""""resumed_buckets":${r.resumedBuckets},"wall_sec":$sec%.2f}""")
    spark.stop()
  }
}
