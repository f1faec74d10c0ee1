package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._
import graft.pipeline.ExtractPipeline

/**
 * Structured-Streaming surface of the engine. The reference is batch-only
 * (SURVEY.md §2-H: its 30s metrics thread and job queue are operational, not
 * dataflow), but the extraction expressions are stateless row transforms, so the
 * same plan runs unchanged over a stream of pages — `readStream` on the pages
 * table (or Kafka-style source), extraction, `writeStream` to the extracted
 * table, with event-time windowed per-host throughput stats under a watermark.
 */
object StreamingExtract {

  /** Stateless extraction transform — valid on batch and streaming DataFrames. */
  def extractTransform(pages: DataFrame): DataFrame =
    pages
      .withColumn("_reasons", ExtractPipeline.validationReasons(ExtractPipeline.Config()))
      .filter(size(col("_reasons")) === 0)
      .drop("_reasons")
      .withColumn("text_out", extract_any_text(col("html")))
      .select(
        col("url"), col("warc_ts"), col("lang"),
        col("text_out").as("text"),
        text_digest(col("text_out")).as("text_sha256"))

  /** Event-time windowed per-host doc counts with a watermark on warc_ts
    * (late pages beyond the watermark are dropped, state is bounded). */
  def hostWindowCounts(pages: DataFrame, watermark: String = "1 hour",
                       windowLen: String = "1 hour"): DataFrame =
    pages
      .withColumn("host", url_host(col("url")))
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), windowLen), col("host"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("window.start").as("win_start"), col("host"), col("n_docs"))
}
