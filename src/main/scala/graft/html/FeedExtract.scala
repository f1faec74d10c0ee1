package graft.html

import scala.util.control.NonFatal

/**
 * RSS 2.0 / Atom feed extraction — feeds are a standing fraction of crawl
 * payloads ("<?xml" / "<rss" / "<feed" where HTML was expected), and their
 * items are both content (title/summary text) and frontier (link urls).
 * The extractor walks the document with the same linear, total-on-hostile-
 * bytes scanner stance as HtmlMeta and returns the items in document order.
 *
 * Dialect handling:
 *  - RSS 2.0: `<item>` children `<title>`, `<link>` (element text),
 *    `<pubDate>`;
 *  - Atom: `<entry>` children `<title>`, `<link href="…">` (attribute,
 *    alternate rel preferred per RFC 4287 — a bare `<link>` without rel IS
 *    an alternate), `<updated>`/`<published>`.
 * Titles are entity-decoded and whitespace-collapsed; CDATA sections are
 * unwrapped. Caps: MaxItems items, MaxField chars per field.
 *
 * `kind` of the payload: "rss", "atom", or null when neither root appears
 * in the first 2 KiB — the sniff a dispatcher keys on before item parsing.
 */
object FeedExtract {

  val MaxItems = 1024
  val MaxField = 2048
  private val MaxScan = 2 << 20

  final case class Item(title: String, link: String, date: String)

  def kind(bytes: Array[Byte]): String = {
    try {
      if (bytes == null || bytes.length == 0) return null
      val head = HtmlExtract.decode(java.util.Arrays.copyOf(bytes, math.min(bytes.length, 2048)))
      val rss = HtmlMeta.indexOfIgnoreCase(head, "<rss", 0)
      val atom = HtmlMeta.indexOfIgnoreCase(head, "<feed", 0)
      if (rss >= 0 && (atom < 0 || rss < atom)) "rss"
      else if (atom >= 0) "atom"
      else null
    } catch { case NonFatal(_) => null }
  }

  def items(bytes: Array[Byte]): Array[Item] = {
    try {
      val k = kind(bytes)
      if (k == null) return Array.empty[Item]
      val s0 = HtmlExtract.decode(bytes)
      val s = if (s0.length > MaxScan) s0.substring(0, MaxScan) else s0
      val itemTag = if (k == "rss") "item" else "entry"
      val out = new scala.collection.mutable.ArrayBuffer[Item](8)
      var i = 0
      val n = s.length
      while (i < n && out.length < MaxItems) {
        val open = HtmlMeta.indexOfIgnoreCase(s, "<" + itemTag, i)
        if (open < 0) i = n
        else {
          val bodyStart = HtmlMeta.skipTag(s, open + 1 + itemTag.length)
          // the tag must be exactly <item>/<entry>, not a prefix of a longer name
          val nameEnd = open + 1 + itemTag.length
          if (nameEnd < n && isNameChar(s.charAt(nameEnd))) i = nameEnd
          else {
            val close = HtmlMeta.indexOfIgnoreCase(s, "</" + itemTag, bodyStart)
            val bodyEnd = if (close < 0) n else close
            val body = s.substring(bodyStart, bodyEnd)
            out += parseItem(body, k)
            i = if (close < 0) n else HtmlMeta.skipTag(s, close + 2 + itemTag.length)
          }
        }
      }
      out.toArray
    } catch { case NonFatal(_) => Array.empty[Item] }
  }

  private def parseItem(body: String, k: String): Item = {
    val title = clean(elementText(body, "title"))
    if (k == "rss") {
      Item(title, cap(trimOrNull(elementText(body, "link"))),
        cap(trimOrNull(elementText(body, "pubDate"))))
    } else {
      // trim BEFORE the fallback: a whitespace-only <updated></updated> is
      // "absent" and must fall through to <published>
      Item(title, cap(atomLink(body)),
        cap(Option(trimOrNull(elementText(body, "updated")))
          .getOrElse(trimOrNull(elementText(body, "published")))))
    }
  }

  /** Text content of the FIRST `<tag …>…</tag>` in `body`, CDATA unwrapped;
    * null when absent or self-closed. (Shared with SitemapExtract — the
    * same child-element walk serves both XML dialect families.) */
  private[html] def elementText(body: String, tag0: String): String = {
    val tag = tag0.toLowerCase // indexOfIgnoreCase lowercases only the haystack
    var i = 0
    val n = body.length
    while (i < n) {
      val open = HtmlMeta.indexOfIgnoreCase(body, "<" + tag, i)
      if (open < 0) return null
      val nameEnd = open + 1 + tag.length
      if (nameEnd < n && isNameChar(body.charAt(nameEnd))) { i = nameEnd; }
      else {
        val gt = body.indexOf('>', nameEnd)
        if (gt < 0) return null
        if (body.charAt(gt - 1) == '/') return null // self-closed
        val close = HtmlMeta.indexOfIgnoreCase(body, "</" + tag, gt + 1)
        val raw = body.substring(gt + 1, if (close < 0) n else close)
        return unwrapCdata(raw)
      }
    }
    null
  }

  /** Atom link: href of the first alternate (or rel-less) <link>, falling
    * back to the first <link> of any rel. */
  private def atomLink(body: String): String = {
    var best: String = null
    var i = 0
    val n = body.length
    while (i < n) {
      val open = HtmlMeta.indexOfIgnoreCase(body, "<link", i)
      if (open < 0) return best
      val nameEnd = open + 5
      if (nameEnd < n && isNameChar(body.charAt(nameEnd))) i = nameEnd
      else {
        val (attrs, end) = HtmlMeta.parseAttrs(body, nameEnd)
        val href = attrs("href")
        val rel = attrs("rel")
        if (href != null) {
          if (rel == null || rel.trim.equalsIgnoreCase("alternate"))
            return HtmlMeta.decodeEntities(href).trim
          if (best == null) best = HtmlMeta.decodeEntities(href).trim
        }
        i = end
      }
    }
    best
  }

  private def unwrapCdata(s: String): String = {
    val t = s.trim
    if (t.startsWith("<![CDATA[")) {
      val e = t.indexOf("]]>")
      if (e >= 0) t.substring(9, e) else t.substring(9)
    } else t
  }

  private def clean(s: String): String =
    if (s == null) null
    else cap(collapseWs(HtmlMeta.decodeEntities(s)))

  private[html] def capField(s: String): String =
    if (s != null && s.length > MaxField) s.substring(0, MaxField) else s

  @inline private def cap(s: String): String = capField(s)

  private[html] def trimOrNull(s: String): String = {
    if (s == null) return null
    val t = s.trim
    if (t.isEmpty) null else t
  }

  private def collapseWs(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var pending = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c <= ' ') { if (b.length > 0) pending = true }
      else {
        if (pending) { b.append(' '); pending = false }
        b.append(c)
      }
      i += 1
    }
    val r = b.toString
    if (r.isEmpty) null else r
  }

  @inline private[html] def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '!'
}
