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

  // dispatch-probe cap: the root element must start within this many bytes.
  // The old fixed 2 KiB window silently rejected a valid urlset behind a
  // longer preamble (comments, DOCTYPE, xml-stylesheet PIs) — a lost
  // discovery channel rather than hostile-input tolerance (r07 advice); a
  // preamble past 256 KiB is hostile, not a sitemap
  private val MaxKindProbe = 256 << 10

  /** "urlset" | "sitemapindex" | null — the dispatch sniff: walk past the
    * XML preamble (BOM/whitespace, `<?...?>` declaration/PIs, `<!--...-->`
    * comments, `<!DOCTYPE ...>`) to the FIRST element and match its name
    * (earliest root wins on hostile both-roots input, the FeedExtract rule —
    * with a real preamble walk the first element IS the earliest root).
    * Stray text before the root, or an unterminated preamble construct,
    * reads as not-a-sitemap. */
  def kind(bytes: Array[Byte]): String = {
    try {
      if (bytes == null || bytes.length == 0) return null
      val head = HtmlExtract.decode(
        java.util.Arrays.copyOf(bytes, math.min(bytes.length, MaxKindProbe)))
      val n = head.length
      var i = 0
      while (i < n) {
        val c = head.charAt(i)
        if (c == '\uFEFF' || Character.isWhitespace(c)) i += 1
        else if (c == '<') {
          if (head.startsWith("<?", i)) {
            val e = head.indexOf("?>", i + 2)
            if (e < 0) return null
            i = e + 2
          } else if (head.startsWith("<!--", i)) {
            val e = head.indexOf("-->", i + 4)
            if (e < 0) return null
            i = e + 3
          } else if (head.startsWith("<!", i)) {
            val e = head.indexOf('>', i + 2)
            if (e < 0) return null
            i = e + 1
          } else {
            // the root element: name-boundary-checked match ("<urlset" and
            // "<sitemapindex" cannot prefix each other, but <urlsetx> must
            // not read as urlset)
            def rootIs(name: String): Boolean =
              HtmlMeta.indexOfIgnoreCase(head, "<" + name, i) == i && {
                val end = i + 1 + name.length
                end >= n || !FeedExtract.isNameChar(head.charAt(end))
              }
            return if (rootIs("urlset")) "urlset"
            else if (rootIs("sitemapindex")) "sitemapindex"
            else null
          }
        } else return null
      }
      null
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
