package graft.html

import scala.util.control.NonFatal

/**
 * XML sitemap extraction (sitemaps.org protocol, the de-facto public spec):
 * the third crawl-discovery channel next to anchors and feeds — a site's
 * own enumeration of fetchable urls. Same linear, total-on-hostile-bytes
 * scanner stance as FeedExtract; entries return in document order.
 *
 * Dialects:
 *  - url set (`<urlset>` root): `<url>` children `<loc>` (required — an
 *    entry without a loc is meaningless and is skipped), `<lastmod>`,
 *    `<changefreq>`, `<priority>`;
 *  - sitemap index (`<sitemapindex>` root): `<sitemap>` children `<loc>`,
 *    `<lastmod>` (the protocol defines no changefreq/priority here — they
 *    stay null).
 *
 * `loc` values are entity-decoded (the protocol REQUIRES `&` escaped as
 * `&amp;` inside XML) and trimmed; `priority` stays the raw trimmed string
 * (no float parse — "0.8" is data, not arithmetic). Caps: MaxEntries
 * entries (the protocol's own 50,000-per-file limit), MaxField chars per
 * field, MaxScan bytes walked.
 */
object SitemapExtract {

  val MaxEntries = 50000
  // the protocol's own 50 MB uncompressed file cap — a 2 MiB walk limit
  // would silently cut a normal 50k-entry urlset (~10 MB) to ~10k entries;
  // memory is bounded by the payload (decode materializes it regardless),
  // the cap only bounds the linear walk
  private val MaxScan = 50 << 20

  final case class Entry(loc: String, lastmod: String, changefreq: String,
                         priority: String)

  /** "urlset" | "sitemapindex" | null — the dispatch sniff (first 2 KiB;
    * earliest root wins on hostile both-roots input, the FeedExtract rule). */
  def kind(bytes: Array[Byte]): String = {
    try {
      if (bytes == null || bytes.length == 0) return null
      val head = HtmlExtract.decode(
        java.util.Arrays.copyOf(bytes, math.min(bytes.length, 2048)))
      // probe the LONGER name first at equal positions is moot: "<urlset"
      // and "<sitemapindex" cannot prefix each other
      val us = HtmlMeta.indexOfIgnoreCase(head, "<urlset", 0)
      val ix = HtmlMeta.indexOfIgnoreCase(head, "<sitemapindex", 0)
      if (us >= 0 && (ix < 0 || us < ix)) "urlset"
      else if (ix >= 0) "sitemapindex"
      else null
    } catch { case NonFatal(_) => null }
  }

  def entries(bytes: Array[Byte]): Array[Entry] = {
    try {
      val k = kind(bytes)
      if (k == null) return Array.empty[Entry]
      val s0 = HtmlExtract.decode(bytes)
      val s = if (s0.length > MaxScan) s0.substring(0, MaxScan) else s0
      val entryTag = if (k == "urlset") "url" else "sitemap"
      val out = new scala.collection.mutable.ArrayBuffer[Entry](8)
      var i = 0
      val n = s.length
      while (i < n && out.length < MaxEntries) {
        val open = HtmlMeta.indexOfIgnoreCase(s, "<" + entryTag, i)
        if (open < 0) i = n
        else {
          val nameEnd = open + 1 + entryTag.length
          // exactly <url>/<sitemap>, not a prefix of a longer name (<urlset>
          // itself, <urlx>, <sitemapindex>)
          if (nameEnd < n && FeedExtract.isNameChar(s.charAt(nameEnd))) i = nameEnd
          else {
            val bodyStart = HtmlMeta.skipTag(s, nameEnd)
            val close = HtmlMeta.indexOfIgnoreCase(s, "</" + entryTag, bodyStart)
            val bodyEnd = if (close < 0) n else close
            val body = s.substring(bodyStart, bodyEnd)
            val loc = decoded(FeedExtract.elementText(body, "loc"))
            if (loc != null) {
              if (k == "urlset")
                out += Entry(loc,
                  decoded(FeedExtract.elementText(body, "lastmod")),
                  decoded(FeedExtract.elementText(body, "changefreq")),
                  decoded(FeedExtract.elementText(body, "priority")))
              else
                out += Entry(loc,
                  decoded(FeedExtract.elementText(body, "lastmod")), null, null)
            }
            i = if (close < 0) n else HtmlMeta.skipTag(s, close + 2 + entryTag.length)
          }
        }
      }
      out.toArray
    } catch { case NonFatal(_) => Array.empty[Entry] }
  }

  private def decoded(s: String): String =
    if (s == null) null
    else FeedExtract.capField(FeedExtract.trimOrNull(HtmlMeta.decodeEntities(s)))
}
