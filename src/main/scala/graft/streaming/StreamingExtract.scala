package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Streaming exact dedup: keep the FIRST arrival per extracted-content
    * digest (URL revisits and mirror copies are the dominant crawl
    * redundancy). `dropDuplicatesWithinWatermark` keys state on the digest
    * and EVICTS entries once they age past the watermark — bounded state,
    * where plain streaming dropDuplicates would hold every digest forever.
    * Trade-off (documented, inherent): a duplicate arriving after its
    * original aged out re-emits; the batch dedup pass downstream
    * (DedupOps.dropExactDups) remains the exactness backstop. */
  def dedupByDigest(pages: DataFrame, watermark: String = "1 hour"): DataFrame =
    pages
      .withColumn("text_sha256", text_digest(extract_any_text(col("html"))))
      .withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("text_sha256")

  /** A closed per-host crawl session: consecutive pages with gaps ≤ gap. */
  final case class HostSession(host: String, session_start: Timestamp,
                               session_end: Timestamp, n_docs: Long)

  /** Open-session state carried across micro-batches (per host key). */
  final case class SessState(startMs: Long, endMs: Long, n: Long)

  /**
   * Stateful gap-based crawl sessionization over the page stream —
   * `flatMapGroupsWithState` with custom state + event-time timeout: a host's
   * open session lives in GroupState; pages within `gap` of the session end
   * extend it, later pages close it (emitted) and open a new one; the timeout
   * fires once the watermark passes end+gap, flushing the open session. State
   * is one small struct per ACTIVE host, bounded by the watermark — the shape
   * that scales to a crawl's host cardinality.
   */
  def hostCrawlSessions(pages: DataFrame, gapMs: Long = 30L * 60 * 1000,
                        watermark: String = "1 hour"): Dataset[HostSession] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val keyed = pages
      .withColumn("host", url_host(col("url")))
      .withWatermark("warc_ts", watermark)
      .select(col("host"), col("warc_ts"))
      .as[(String, Timestamp)]
      .groupByKey(_._1)
    keyed.flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
      sessionizeHost(gapMs))
  }

  private def sessionizeHost(gapMs: Long)(
      host: String, events: Iterator[(String, Timestamp)],
      state: GroupState[SessState]): Iterator[HostSession] = {
    def close(s: SessState) =
      HostSession(host, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n)
    if (state.hasTimedOut) {
      val out = state.getOption.map(close).iterator
      state.remove()
      out
    } else {
      val ts = events.map(_._2.getTime).toArray.sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[HostSession]
      var cur = state.getOption.orNull
      // stragglers more than a gap BEFORE the open session sessionize among
      // THEMSELVES (a late batch can carry a whole old session's events) and
      // close at end of batch — only the newest session survives in state
      var past: SessState = null
      ts.foreach { t =>
        cur =
          if (cur == null) SessState(t, t, 1)
          // in-gap on EITHER side: flatMapGroupsWithState still delivers rows
          // older than the open session (watermark-late rows are dropped
          // upstream, but within-watermark stragglers are not) — they must
          // extend the session backwards, not inherit its later start
          else if (t <= cur.endMs + gapMs && t >= cur.startMs - gapMs)
            SessState(math.min(cur.startMs, t), math.max(cur.endMs, t), cur.n + 1)
          else if (t > cur.endMs + gapMs) { out += close(cur); SessState(t, t, 1) }
          else {
            past =
              if (past == null) SessState(t, t, 1)
              else if (t <= past.endMs + gapMs)
                SessState(past.startMs, math.max(past.endMs, t), past.n + 1)
              else { out += close(past); SessState(t, t, 1) }
            cur
          }
      }
      if (past != null) out += close(past)
      if (cur != null) {
        state.update(cur)
        // event-time timeout must be beyond the current watermark
        state.setTimeoutTimestamp(math.max(cur.endMs + gapMs, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }
  }
}
