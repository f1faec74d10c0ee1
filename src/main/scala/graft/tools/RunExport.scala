package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.fixtures.Corpus
import graft.functions._
import graft.ops.CurationOps
import graft.sources.WetSink

/**
 * spark-submit entry for the EXPORT stage — the last mile of the pipeline:
 * read a curated (url, text) table, build the training mixture under a
 * token budget (CurationOps.tokenBudgetMix, domains = hosts), and hand the
 * admitted docs off as WET conversion records (WetSink — the CC layout any
 * external consumer reads). Prints one JSON summary line.
 *
 * Usage:
 *   RunExport <outDir> [input=fixture:42] [nPages=2000] [budgetTokens=100000]
 *             [weights=uniform] [runTs=2026-01-01T00:00:00Z]
 *   input   = fixture:<seed> (deterministic corpus, extracted inline) |
 *             parquet:<path> (a table already carrying url + text)
 *   weights = "uniform" (every observed host an equal permille share —
 *             hosts are collected driver-side, a hosts-sized bounded list)
 *             or "host:permille,host:permille,..." explicit.
 *   runTs   = the WARC-Date stamped on every record (determinism: re-runs
 *             with the same runTs are byte-identical; never now() in data).
 */
object RunExport {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(
      sys.error("usage: RunExport <outDir> [input] [nPages] [budgetTokens] [weights] [runTs]"))
    val input = args.lift(1).getOrElse("fixture:42")
    val nPages = args.lift(2).map(_.toLong).getOrElse(2000L)
    val budget = args.lift(3).map(_.toLong).getOrElse(100000L)
    val weightsArg = args.lift(4).getOrElse("uniform")
    val runTs = args.lift(5).getOrElse("2026-01-01T00:00:00Z")

    val spark = SparkSession.builder()
      .appName("graft-export")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs =
      (if (input.startsWith("parquet:"))
        spark.read.parquet(input.stripPrefix("parquet:")).select(col("url"), col("text"))
      else
        Corpus.pages(spark, nPages, input.stripPrefix("fixture:").toLong)
          .select(col("url"), coalesce(col("text"), extract_any_text(col("html"))).as("text")))
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .withColumn("_dom", lower(url_host(col("url"))))
        .filter(col("_dom").isNotNull)
        .withColumn("_cost",
          size(filter(split(col("text"), "\\s+"), t => length(t) > 0)).cast("long"))
        // tokenBudgetMix permutes by splitmix64 of an INTEGRAL id — string
        // urls enter through their xxhash64
        .withColumn("_mixid", xxhash64(col("url")))

    val t0 = System.nanoTime()
    // one extraction/scan pass feeds the hosts collect, the mix, and the
    // doc count — without this, fixture input re-extracts the corpus 3x
    docs.persist()
    val weights: Seq[(String, Long)] =
      if (weightsArg == "uniform") {
        // hosts-sized driver list (the skew-sampler/bucket-id collect
        // class). Capped at 1000: beyond that the per-host permille would
        // floor at 1 and the SUMMED weights would exceed 1000‰ — admitting
        // up to nHosts/1000 × the stated budget. Wide-host corpora pass
        // explicit weights.
        val hosts = docs.select(col("_dom")).distinct().limit(1001)
          .collect().map(_.getString(0)).sorted
        require(hosts.length <= 1000,
          "uniform weights need <= 1000 hosts (permille floor would overshoot the budget); pass explicit weights")
        val per = 1000L / math.max(1, hosts.length)
        hosts.map(_ -> per).toSeq
      } else weightsArg.split(",").toSeq.map { kv =>
        val Array(h, p) = kv.split(":")
        h.trim -> p.trim.toLong
      }

    val mixed = CurationOps.tokenBudgetMix(docs, "_mixid", "_dom", "_cost", weights, budget)
    val kept = mixed.persist()
    val stats = kept.agg(count(lit(1)), coalesce(sum(col("_cost")), lit(0L))).collect()(0)
    val (files, records) = WetSink.write(kept, s"$outDir/wet", runTs)
    val sec = (System.nanoTime() - t0) / 1e9
    val nDocs = docs.count()
    docs.unpersist()
    println(f"""{"n_docs":$nDocs,"n_admitted":${stats.getLong(0)},""" +
      f""""tokens_admitted":${stats.getLong(1)},"budget_tokens":$budget,""" +
      f""""wet_files":$files,"wet_records":$records,"wall_sec":$sec%.2f}""")
    kept.unpersist()
    spark.stop()
  }
}
