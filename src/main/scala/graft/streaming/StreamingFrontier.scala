package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions._

/**
 * Continuous crawl discovery — the streaming counterpart of
 * `ops.FrontierOps`: pages arrive as a stream, candidate targets leave as
 * one, first-seen-deduplicated per TARGET HOST with bounded state. A
 * crawler in steady state is exactly this loop (fetch → discover → fetch),
 * and the batch anti-join against a seen table can't run inside it — the
 * seen set IS the streaming state.
 *
 * Shape:
 *  - discovery is the stateless per-row transform (anchors minus nofollow,
 *    meta-refresh resolved absolute, feed items — one payload scan, the
 *    FrontierOps extraction contract) plus the broadcast blocklist gate;
 *    robots joins as a STREAM-STATIC join on the target host (the static
 *    side reloads per micro-batch — robots freshness for free);
 *  - dedup keys `flatMapGroupsWithState` on the target HOST: per-host
 *    state is a bounded set of 64-bit canonical-url hashes (splitmix over
 *    the canonical form). The host key makes state eviction align with
 *    crawl politeness (a host idle past `idleTimeout` is dropped whole),
 *    and the per-host cap bounds worst-case state at
 *    maxSeenPerHost × active hosts regardless of stream length.
 *  - cap semantics (documented): a FULL host set still FILTERS against
 *    its members but stops admitting new hashes — later novel urls on
 *    that host re-emit rather than silently vanish; the downstream batch
 *    frontier/seen anti-join (FrontierPipeline) is the exactness
 *    backstop, mirroring dedupByDigest's stance. Every emission carries
 *    `seen_state` so a consumer can SEE the boundary: "fresh" = admitted
 *    to the seen set (will not re-emit), "overflow" = novel on a full
 *    host set (MAY re-emit every batch it reappears — route these rows
 *    through the exact anti-join instead of refetching them blindly; a
 *    hot host past its cap otherwise multiplies downstream fetch work
 *    with no in-stream signal).
 */
object StreamingFrontier {

  final case class Target(url: String, host: String, kind: String,
                          discovered_from: String, seen_state: String)

  /** Per-host seen-set state across micro-batches. */
  final case class SeenState(hashes: Set[Long], lastMs: Long)

  /** Stateless discovery + gates; valid on batch and streaming frames.
    * Emits (warc_ts, url, host, kind, discovered_from). */
  def discoverTransform(pages: DataFrame,
                        robots: Option[DataFrame] = None,
                        agent: String = "graftbot",
                        blockedDomains: Seq[String] = Nil,
                        blockedSubstrings: Seq[String] = Nil): DataFrame = {
    val anchors = transform(
      filter(html_anchors(col("html"), col("url")),
        a => !a.getField("nofollow") && a.getField("href").isNotNull),
      a => struct(a.getField("href").as("u"), lit("anchor").as("k")))
    val feeds = transform(
      filter(feed_items(col("html")), it => it.getField("link").isNotNull),
      it => struct(it.getField("link").as("u"), lit("feed").as("k")))
    val refreshTo = resolve_url(col("url"),
      html_meta(col("html")).getField("refresh_url"))
    val refreshes = filter(
      array(struct(refreshTo.as("u"), lit("refresh").as("k"))),
      s => s.getField("u").isNotNull)
    val cand = pages
      .select(col("warc_ts"), col("url").as("_from"),
        explode(concat(anchors, refreshes, feeds)).as("_t"))
      .select(col("warc_ts"),
        col("_t").getField("u").as("url"),
        col("_t").getField("k").as("kind"),
        col("_from").as("discovered_from"))
      .withColumn("host", lower(url_host(col("url"))))
      .filter(col("host").isNotNull)
    val gated = robots match {
      case Some(r) =>
        val rr = r.select(lower(col("host")).as("host"), col("robots_txt").as("_robots"))
          .groupBy(col("host")).agg(min(col("_robots")).as("_robots"))
        val p0 = org.apache.spark.sql.functions.try_parse_url(col("url"), lit("PATH"))
        val q0 = org.apache.spark.sql.functions.try_parse_url(col("url"), lit("QUERY"))
        val path = concat(
          when(p0.isNull || length(p0) === 0, lit("/")).otherwise(p0),
          when(q0.isNotNull, concat(lit("?"), q0)).otherwise(lit("")))
        cand.join(rr, Seq("host"), "left_outer")
          .filter(col("_robots").isNull ||
            robots_allowed(col("_robots"), lit(agent), path))
          .drop("_robots")
      case None => cand
    }
    if (blockedDomains.nonEmpty || blockedSubstrings.nonEmpty)
      graft.ops.CurationOps.urlBlocklistFilter(gated, "url", blockedDomains, blockedSubstrings)
    else gated
  }

  /** First-seen targets per host with bounded streaming state (see object
    * Scaladoc for the cap/eviction contract). `pages` must carry
    * (warc_ts, url, html). */
  def targets(pages: DataFrame,
              robots: Option[DataFrame] = None,
              agent: String = "graftbot",
              blockedDomains: Seq[String] = Nil,
              blockedSubstrings: Seq[String] = Nil,
              watermark: String = "1 hour",
              // GroupState re-serializes the WHOLE set on every updating
              // micro-batch: 64k hashes ≈ 0.5 MB per hot host per batch is
              // the sane ceiling — raise it only with state-store budget in
              // hand (the batch seen anti-join stays the exactness backstop)
              maxSeenPerHost: Int = 1 << 16,
              idleTimeoutMs: Long = 6L * 3600 * 1000): Dataset[Target] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val discovered = discoverTransform(pages, robots, agent,
      blockedDomains, blockedSubstrings)
      .withWatermark("warc_ts", watermark)
      .select(col("host"), col("warc_ts"), col("url"), col("kind"),
        col("discovered_from"),
        coalesce(canonical_url(col("url")), col("url")).as("_curl"))
      .as[(String, Timestamp, String, String, String, String)]
      .groupByKey(_._1)
    discovered.flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
      firstSeen(maxSeenPerHost, idleTimeoutMs))
  }

  private def firstSeen(maxSeen: Int, idleMs: Long)(
      host: String,
      events: Iterator[(String, Timestamp, String, String, String, String)],
      state: GroupState[SeenState]): Iterator[Target] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      var seen = state.getOption.map(_.hashes).getOrElse(Set.empty[Long])
      var lastMs = state.getOption.map(_.lastMs).getOrElse(0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[Target]
      // deterministic within a batch: process in (ts, kind, url) order so
      // replays emit identical first-seen rows at any partitioning
      events.toArray.sortBy(e => (e._2.getTime, e._4, e._3)).foreach {
        case (_, ts, url, kind, from, curl) =>
          val h = graft.text.TextHash.hashToken(curl, 0, curl.length, 0x5eedL)
          if (!seen.contains(h)) {
            // admitted → "fresh" (never re-emits); set full → "overflow"
            // (novel but unadmitted — may re-emit; consumers route these
            // through the exact batch anti-join)
            if (seen.size < maxSeen) {
              out += Target(url, host, kind, from, "fresh")
              seen += h
            } else out += Target(url, host, kind, from, "overflow")
          }
          if (ts.getTime > lastMs) lastMs = ts.getTime
      }
      state.update(SeenState(seen, lastMs))
      state.setTimeoutTimestamp(math.max(lastMs + idleMs, state.getCurrentWatermarkMs() + 1))
      out.iterator
    }
  }
}
