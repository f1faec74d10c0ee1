package graft.html

import scala.util.control.NonFatal

/**
 * Outlink extraction for crawl pages — the edge list of the web link graph
 * (crawl frontier expansion, host-level in-degree/PageRank quality priors,
 * spam-neighborhood detection). Every `<a href=…>` across the WHOLE document
 * (not just the head) is collected in document order and resolved ABSOLUTE
 * against the page url per RFC 3986 §5.2: absolute refs keep their own
 * authority, `//host` takes the base scheme, `/path` the base authority,
 * `?query` the base path, and relative paths merge with the base directory
 * before dot-segment removal (§5.2.4). Fragments are dropped everywhere
 * (`#x` alone is a self-link, not an edge); only http/https edges survive
 * (mailto:, javascript:, data:, tel: are not crawl edges).
 *
 * Parsing stance mirrors HtmlMeta: charset-sniffed decode, ONE linear pass,
 * total on hostile bytes, comments and script/style raw text skipped,
 * attribute values entity-decoded (hrefs carry &amp;). Output is capped at
 * MaxLinks — a hostile page with 10^6 anchors must not materialize an
 * unbounded array inside a row (the per-row analog of the LSH bucket cap).
 *
 * Reference behavior: the reference enumerates a directory tree as its input
 * frontier (ocr-processor ocr_combined.py:232-246); for web corpora the
 * frontier IS the link graph, so outlink extraction is the A1-scan analog on
 * the web side.
 */
object HtmlLinks {

  /** Hostile-input cap on links per document. */
  val MaxLinks = 4096

  /** Document scan cap (chars) — anchors past 2 MiB of markup are not worth
    * an unbounded scan; HtmlExtract.decode already bounds the decode. */
  private val MaxScan = 2 << 20

  def extract(bytes: Array[Byte], baseUrl: String): Array[String] =
    extractWithText(bytes, baseUrl).map(_.href)

  /** Public RFC 3986 §5.2 resolution of one reference against a base url —
    * the same machinery the anchor walk uses, for refs that arrive OUTSIDE
    * an href (meta-refresh targets, redirect headers). null = not a
    * fetchable http(s) target. */
  def resolveUrl(baseUrl: String, ref: String): String =
    resolve(parseBase(baseUrl), ref)

  /** Anchor-text cap (chars, post-collapse): link text beyond this is
    * navigation noise, and hostile pages must not grow unbounded strings. */
  val MaxAnchorText = 256

  /** One extracted anchor: resolved href, its text, and whether the source
    * page disclaims endorsement (`rel` contains the nofollow token — the
    * flag link-graph consumers like PageRank exclude edges on). */
  final case class Anchor(href: String, text: String, nofollow: Boolean)

  /** Anchors in document order — anchor text is the text between the anchor
    * and its close (nested inline tags contribute their text; a new `<a`
    * auto-closes the previous one, the browser rule), entity-decoded,
    * whitespace-collapsed, capped. */
  def extractWithText(bytes: Array[Byte], baseUrl: String): Array[Anchor] = {
    try {
      if (bytes == null || bytes.length == 0) return Array.empty[Anchor]
      val s0 = HtmlExtract.decode(bytes)
      val s = if (s0.length > MaxScan) s0.substring(0, MaxScan) else s0
      var base = parseBase(baseUrl)
      var baseSeen = false
      val out = new scala.collection.mutable.ArrayBuffer[Anchor](16)
      var pendingHref: String = null
      var pendingNofollow = false
      val pendingText = new java.lang.StringBuilder
      def finish(): Unit = {
        if (pendingHref != null) {
          val t0 = collapseWs(HtmlMeta.decodeEntities(pendingText.toString))
          val t = if (t0.length > MaxAnchorText) t0.substring(0, MaxAnchorText) else t0
          out += Anchor(pendingHref, t, pendingNofollow)
          pendingHref = null
        }
        pendingText.setLength(0)
      }
      val n = s.length
      var i = 0
      while (i < n && out.length < MaxLinks) {
        val lt = s.indexOf('<', i)
        if (pendingHref != null && pendingText.length <= MaxAnchorText * 4)
          pendingText.append(s, i, if (lt < 0) n else math.min(lt, n))
        if (lt < 0 || lt + 1 >= n) i = n
        else if (s.startsWith("<!--", lt)) {
          val e = s.indexOf("-->", lt + 4)
          i = if (e < 0) n else e + 3
        } else {
          var j = lt + 1
          if (j < n && s.charAt(j) == '/') j += 1
          val nameStart = j
          while (j < n && isNameChar(s.charAt(j))) j += 1
          val name = HtmlMeta.lowerSub(s, nameStart, j)
          if (name.isEmpty) i = lt + 1
          else if (name == "a" && s.charAt(lt + 1) == '/') {
            finish()
            i = HtmlMeta.skipTag(s, j)
          } else if (name == "a") {
            finish() // a new <a> auto-closes any open one
            val (attrs, end) = HtmlMeta.parseAttrs(s, j)
            val href = attrs("href")
            if (href != null) {
              val r = resolve(base, HtmlMeta.decodeEntities(href).trim)
              if (r != null) {
                pendingHref = r
                // rel is a space-separated token list, case-insensitive
                pendingNofollow = Option(attrs("rel")).exists(
                  _.toLowerCase.split("\\s+").contains("nofollow"))
              }
            }
            i = end
          } else if (name == "base" && s.charAt(lt + 1) != '/') {
            // <base href>: the FIRST one re-bases every later relative link
            // (HTML spec); itself resolved against the document url
            val (attrs, end) = HtmlMeta.parseAttrs(s, j)
            val href = attrs("href")
            if (!baseSeen && href != null) {
              baseSeen = true
              val r = resolve(base, HtmlMeta.decodeEntities(href).trim)
              if (r != null) {
                val nb = parseBase(r)
                if (nb != null) base = nb
              }
            }
            i = end
          } else if ((name == "script" || name == "style") && s.charAt(lt + 1) != '/') {
            val end = HtmlMeta.skipTag(s, j)
            val close = HtmlMeta.indexOfIgnoreCase(s, "</" + name, end)
            // past the WHOLE closing tag (its '>') — stopping after the name
            // would leak "> " into a collecting anchor's text
            i = if (close < 0) n else HtmlMeta.skipTag(s, close + 2 + name.length)
          } else i = HtmlMeta.skipTag(s, j)
        }
      }
      finish()
      out.toArray
    } catch { case NonFatal(_) => Array.empty[Anchor] }
  }

  private def collapseWs(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var pending = false
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c <= ' ') { if (b.length > 0) pending = true }
      else {
        if (pending) { b.append(' '); pending = false }
        b.append(c)
      }
      i += 1
    }
    b.toString
  }

  /** (scheme, "scheme://authority", path, query-with-?) of the base url, or
    * null when the base has no "://" (relative refs then drop — a page whose
    * own url is unparseable contributes only its absolute outlinks). */
  private[html] final case class Base(scheme: String, root: String, path: String, query: String)

  private[html] def parseBase(url: String): Base = {
    if (url == null) return null
    val ss = url.indexOf("://")
    if (ss <= 0) return null
    val scheme = url.substring(0, ss).toLowerCase
    val authStart = ss + 3
    var i = authStart
    val n = url.length
    while (i < n && { val c = url.charAt(i); c != '/' && c != '?' && c != '#' }) i += 1
    if (i == authStart) return null
    val root = scheme + "://" + url.substring(authStart, i)
    var pathEnd = i
    while (pathEnd < n && { val c = url.charAt(pathEnd); c != '?' && c != '#' }) pathEnd += 1
    val path = if (pathEnd == i) "/" else url.substring(i, pathEnd)
    var qEnd = pathEnd
    while (qEnd < n && url.charAt(qEnd) != '#') qEnd += 1
    val query = if (qEnd > pathEnd) url.substring(pathEnd, qEnd) else ""
    Base(scheme, root, path, query)
  }

  /** RFC 3986 §5.2 reference resolution; null = not an edge (fragment-only,
    * empty, non-http(s) scheme, or relative under an unparseable base). */
  private[html] def resolve(base: Base, ref0: String): String = {
    if (ref0 == null || ref0.isEmpty) return null
    val ref = stripFragment(ref0)
    if (ref.isEmpty) return null
    val colon = schemeColon(ref)
    if (colon > 0) {
      val sch = ref.substring(0, colon).toLowerCase
      return if (sch == "http" || sch == "https") ref else null
    }
    if (base == null) return null
    if (ref.startsWith("//")) {
      // network-path reference: base scheme + given authority; §5.2.2 still
      // applies removeDotSegments to the reference's own path
      val after = ref.substring(2)
      if (after.isEmpty || after.charAt(0) == '/' || after.charAt(0) == '?') return null
      var j = 0
      while (j < after.length && { val c = after.charAt(j); c != '/' && c != '?' }) j += 1
      val auth = after.substring(0, j)
      val rest = after.substring(j)
      val norm = if (rest.isEmpty || rest.charAt(0) == '?') rest else removeDotSegments(rest)
      return base.scheme + "://" + auth + norm
    }
    if (ref.charAt(0) == '/') return base.root + removeDotSegments(ref)
    if (ref.charAt(0) == '?') return base.root + base.path + ref
    // relative path: merge with the base directory (§5.2.3)
    val dir = base.path.substring(0, base.path.lastIndexOf('/') + 1) match {
      case "" => "/"
      case d => d
    }
    base.root + removeDotSegments(dir + ref)
  }

  /** Position of the scheme-terminating ':' when `s` starts with a scheme
    * (ALPHA *(ALPHA/DIGIT/+/-/.) ":"), else -1. */
  private def schemeColon(s: String): Int = {
    val c0 = s.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return -1
    var i = 1
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == ':') return i
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      if (!ok) return -1
      i += 1
    }
    -1
  }

  private def stripFragment(s: String): String = {
    val h = s.indexOf('#')
    if (h < 0) s else s.substring(0, h)
  }

  /** RFC 3986 §5.2.4 over the path part only (the query rides through). */
  private[html] def removeDotSegments(pathAndQuery: String): String = {
    val q = pathAndQuery.indexOf('?')
    val path = if (q < 0) pathAndQuery else pathAndQuery.substring(0, q)
    val query = if (q < 0) "" else pathAndQuery.substring(q)
    val out = new scala.collection.mutable.ArrayBuffer[String](8)
    val segs = path.split("/", -1)
    var k = 0
    while (k < segs.length) {
      segs(k) match {
        case "" | "." => // skip
        case ".." => if (out.nonEmpty) out.remove(out.length - 1)
        case s => out += s
      }
      k += 1
    }
    // a path ending in "/", "/." or "/.." names a DIRECTORY — keep the slash
    val last = if (segs.isEmpty) "" else segs(segs.length - 1)
    val dir = last == "" || last == "." || last == ".."
    val body =
      if (out.isEmpty) "/"
      else "/" + out.mkString("/") + (if (dir) "/" else "")
    body + query
  }

  @inline private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '!'
}
