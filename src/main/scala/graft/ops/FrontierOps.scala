package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._

import graft.functions._

/**
 * Crawl-frontier composition: one operator from discovered-link pieces the
 * engine already extracts — anchors (rel=nofollow respected), meta-refresh
 * redirect targets, and RSS/Atom item links — gated by robots.txt (RFC
 * 9309), the URL blocklist, and an anti-join against already-seen urls (the
 * resume/E4 shape), deduplicated on the canonical url. This is the
 * discovery half of a crawler: pages in, politeness-keyed fetch targets
 * out. (The reference ingests directories/uploads — ocr_combined.py walks
 * given paths; a crawl-data engine discovers its own inputs.)
 *
 * Scale shape:
 *  - ONE scan of the page payloads: the three extractors project into one
 *    array column that explodes once (no per-kind rescan);
 *  - the robots gate joins on the target HOST (a hosts-sized frame — AQE
 *    broadcasts it when small, never forced);
 *  - the blocklist gate is the broadcast hash-set / Aho-Corasick probe
 *    (CurationOps.urlBlocklistFilter — no plan-size dependence on list
 *    size);
 *  - canonical dedup is one groupBy on the canonical url with a
 *    deterministic min-struct keeper (kind, then discoverer, then url —
 *    lexicographic, partitioning-invariant);
 *  - the seen anti-join shuffles on the same canonical key the dedup just
 *    grouped on;
 *  - `politeness_key` = hash(host) % shards co-locates same-host fetches so
 *    a downstream fetcher can rate-limit per partition without a second
 *    shuffle.
 *
 * Gate order (the deterministic contract): extract → robots → blocklist →
 * canonical dedup → seen. Robots/blocklist run BEFORE dedup so a url's
 * keeper row is chosen among fetchable discoveries only.
 */
object FrontierOps {

  /** `pages`: (urlCol, payloadCol binary). `robots`: optional (host,
    * robots.txt text) frame; targets on hosts absent from it are allowed
    * (the crawl convention: no robots.txt = fetchable). `seen`: optional
    * frame of already-fetched urls (any column named `seenUrlCol`).
    * `sitemaps=true` adds the fourth discovery channel: XML sitemap /
    * sitemap-index entries in the fetched payloads (kind "sitemap",
    * document-resolved like any other reference) — off by default so the
    * anchors-only contract stays stable. Returns (url, host, kind
    * anchor|feed|refresh|sitemap, discovered_from, politeness_key,
    * crawl_delay_ms — the host's de-facto Crawl-delay, null when no robots
    * row or no directive). */
  def frontier(pages: DataFrame, urlCol: String, payloadCol: String,
               robots: Option[DataFrame] = None,
               robotsHostCol: String = "host", robotsTxtCol: String = "robots_txt",
               agent: String = "graftbot",
               blockedDomains: Seq[String] = Nil,
               blockedSubstrings: Seq[String] = Nil,
               seen: Option[DataFrame] = None, seenUrlCol: String = "url",
               shards: Int = 1024, sitemaps: Boolean = false): DataFrame = {
    val src = pages.select(col(urlCol).as("_from"), col(payloadCol).as("_payload"))
    val anchors = transform(
      filter(html_anchors(col("_payload"), col("_from")),
        a => !a.getField("nofollow") && a.getField("href").isNotNull),
      a => struct(a.getField("href").as("u"), lit("anchor").as("k")))
    val feeds = transform(
      filter(feed_items(col("_payload")), it => it.getField("link").isNotNull),
      it => struct(it.getField("link").as("u"), lit("feed").as("k")))
    // refresh targets are RAW (html_meta's q91 contract) — resolve against
    // the page url like any other reference
    val refreshTo = resolve_url(col("_from"),
      html_meta(col("_payload")).getField("refresh_url"))
    // a 0-or-1 element array without a typed empty literal: build then filter
    val refreshes = filter(
      array(struct(refreshTo.as("u"), lit("refresh").as("k"))),
      s => s.getField("u").isNotNull)
    // sitemap locs are absolute per the protocol, but hostile payloads get
    // the same RFC 3986 resolution as every other reference
    val sitemapTargets = filter(
      transform(sitemap_entries(col("_payload")),
        e => struct(resolve_url(col("_from"), e.getField("loc")).as("u"),
          lit("sitemap").as("k"))),
      s => s.getField("u").isNotNull)
    val channels =
      if (sitemaps) concat(anchors, refreshes, feeds, sitemapTargets)
      else concat(anchors, refreshes, feeds)
    val cand = src
      .select(col("_from"), explode(channels).as("_t"))
      .select(col("_t").getField("u").as("_url"),
        col("_t").getField("k").as("_kind"), col("_from"))
      .withColumn("_host", lower(url_host(col("_url"))))
      .filter(col("_host").isNotNull)

    // one row per host (deterministic min) — a duplicate-host robots frame
    // must not duplicate candidates through the join; reused by the gate
    // AND the final crawl-delay attach
    val rrOpt = robots.map { r =>
      r.select(lower(col(robotsHostCol)).as("_host"), col(robotsTxtCol).as("_robots"))
        .groupBy(col("_host")).agg(min(col("_robots")).as("_robots"))
    }
    // robots gate on the TARGET host; RFC 9309 matches path + optional query
    val gated = rrOpt match {
      case Some(rr) =>
        val p0 = F.try_parse_url(col("_url"), lit("PATH"))
        val q0 = F.try_parse_url(col("_url"), lit("QUERY"))
        val path = concat(
          when(p0.isNull || length(p0) === 0, lit("/")).otherwise(p0),
          when(q0.isNotNull, concat(lit("?"), q0)).otherwise(lit("")))
        cand.join(rr, Seq("_host"), "left")
          .filter(col("_robots").isNull ||
            robots_allowed(col("_robots"), lit(agent), path))
          .drop("_robots")
      case None => cand
    }
    val unblocked =
      if (blockedDomains.nonEmpty || blockedSubstrings.nonEmpty)
        CurationOps.urlBlocklistFilter(gated, "_url", blockedDomains, blockedSubstrings)
      else gated

    // canonical dedup with a deterministic keeper, then the seen anti-join
    // on the same canonical key
    val deduped = unblocked
      .withColumn("_curl", coalesce(canonical_url(col("_url")), col("_url")))
      .groupBy(col("_curl"))
      .agg(min(struct(col("_kind").as("kind"), col("_from").as("discovered_from"),
        col("_url").as("url"))).as("_keep"))
    val unseen = seen match {
      case Some(s) =>
        val sc = s.select(coalesce(canonical_url(col(seenUrlCol)), col(seenUrlCol)).as("_curl"))
          .distinct()
        deduped.join(sc, Seq("_curl"), "left_anti")
      case None => deduped
    }
    val out = unseen.select(
      col("_keep").getField("url").as("url"),
      lower(url_host(col("_keep").getField("url"))).as("host"),
      col("_keep").getField("kind").as("kind"),
      col("_keep").getField("discovered_from").as("discovered_from"))
      .withColumn("politeness_key", pmod(xxhash64(col("host")), lit(shards.toLong)))
    // the de-facto Crawl-delay rides along from the hosts-sized robots frame
    // so a politeness-sharded fetcher needs no second lookup; null = no
    // robots / no directive (crawl at the fetcher's default rate)
    rrOpt match {
      case Some(rr) =>
        out.join(rr.select(col("_host").as("host"),
            robots_crawl_delay(col("_robots"), lit(agent)).as("crawl_delay_ms")),
          Seq("host"), "left")
          .select(out.columns.map(col) :+ col("crawl_delay_ms"): _*)
      case None => out.withColumn("crawl_delay_ms", lit(null).cast("long"))
    }
  }

  /** Politeness schedule over frontier targets: within each host, targets
    * get deterministic fetch slots spaced by the host's crawl delay —
    * `fetch_offset_ms = (rank-1) · delay`, rank = url order within the
    * host, delay = `delayCol` (null → `defaultDelayMs`). A fetcher that
    * sleeps to its row's offset respects every host's rate without any
    * coordination. One window partitioned by host: parallelism is the host
    * axis itself, and a host's window is proportional to its OWN queue —
    * exactly the work a rate-limited fetcher serializes anyway. */
  def schedule(targets: DataFrame, urlCol: String = "url",
               hostCol: String = "host", delayCol: String = "crawl_delay_ms",
               defaultDelayMs: Long = 1000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(hostCol)).orderBy(col(urlCol))
    targets.withColumn("fetch_offset_ms",
      (row_number().over(w) - 1).cast("long")
        * coalesce(col(delayCol), lit(defaultDelayMs)))
  }
}
