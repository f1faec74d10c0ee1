package graft.html

import scala.util.control.NonFatal

/**
 * Head-metadata scanner for crawl pages: the fields a curation pipeline
 * keys on before any content extraction —
 *
 *  - `canonical` (<link rel=canonical href=…>): the publisher's own dedup
 *    key; canonical-URL grouping collapses mirror/tracking-parameter
 *    variants ahead of content dedup (coalesce(canonical, url) feeds the
 *    exact-dedup stage);
 *  - `robots` (<meta name=robots content=…>, lowercased): honoring
 *    noindex is a legal/etiquette gate every serious corpus applies;
 *  - `title`, `og:title`, `description`: ranking/quality signals and the
 *    strongest short dedup keys;
 *  - `lang` (<html lang=…>): a prior for the language-ID gate.
 *
 * Parsing stance mirrors `HtmlExtract`: charset-sniffed decode, one linear
 * pass, total on hostile bytes, first occurrence wins (document.title
 * semantics), and the scan STOPS at </head> or <body> — meta declared in
 * the body is a spam signal, not metadata. Attribute syntax accepted:
 * double-quoted, single-quoted, and unquoted values, any attribute order,
 * any case. Title text gets the named-entity subset + numeric character
 * references decoded and whitespace collapsed.
 *
 * Reference behavior (what to extract, not how): the reference keeps
 * per-file metadata rows around extraction (ocr-processor
 * database_manager.py:79-118); per-page HTML head fields are this engine's
 * web-native analog.
 */
object HtmlMeta {

  /** Absent fields are null. `robots` is lowercased+trimmed; others keep
    * their source spelling (title whitespace-collapsed, entity-decoded). */
  final case class Meta(title: String, canonical: String, robots: String,
                        lang: String, ogTitle: String, description: String,
                        refreshUrl: String)

  private val Empty = Meta(null, null, null, null, null, null, null)

  /** Scan cap: head metadata past 64 KiB of markup is not metadata. */
  private val MaxScan = 65536

  def parse(bytes: Array[Byte]): Meta = {
    try {
      if (bytes == null || bytes.length == 0) return Empty
      val s0 = HtmlExtract.decode(bytes)
      val s = if (s0.length > MaxScan) s0.substring(0, MaxScan) else s0
      var title: String = null
      var canonical: String = null
      var robots: String = null
      var lang: String = null
      var ogTitle: String = null
      var description: String = null
      var refreshUrl: String = null
      val n = s.length
      var i = 0
      var stop = false
      while (!stop && i < n) {
        val lt = s.indexOf('<', i)
        if (lt < 0 || lt + 1 >= n) { stop = true }
        else if (s.startsWith("<!--", lt)) {
          val e = s.indexOf("-->", lt + 4)
          i = if (e < 0) n else e + 3
        } else {
          // tag name
          var j = lt + 1
          var closing = false
          if (j < n && s.charAt(j) == '/') { closing = true; j += 1 }
          val nameStart = j
          while (j < n && (isNameChar(s.charAt(j)))) j += 1
          val name = lowerSub(s, nameStart, j)
          if (name.isEmpty) { i = lt + 1 }
          else if (closing) {
            if (name == "head") stop = true
            i = skipTag(s, j)
          } else name match {
            case "body" => stop = true
            case "html" =>
              val (attrs, end) = parseAttrs(s, j)
              if (lang == null) lang = attrs("lang")
              i = end
            case "title" =>
              val end = skipTag(s, j)
              val close = indexOfIgnoreCase(s, "</title", end)
              if (title == null) {
                val raw = s.substring(end, if (close < 0) n else close)
                val t = collapseWs(decodeEntities(raw))
                if (t.nonEmpty) title = t
              }
              i = if (close < 0) n else close + 7
            case "link" =>
              val (attrs, end) = parseAttrs(s, j)
              val rel = attrs("rel")
              if (canonical == null && rel != null && rel.trim.equalsIgnoreCase("canonical"))
                canonical = attrs("href")
              i = end
            case "meta" =>
              val (attrs, end) = parseAttrs(s, j)
              val nm = Option(attrs("name")).map(_.trim.toLowerCase).orNull
              val prop = Option(attrs("property")).map(_.trim.toLowerCase).orNull
              val equiv = Option(attrs("http-equiv")).map(_.trim.toLowerCase).orNull
              val content = attrs("content")
              if (nm == "robots" && robots == null && content != null)
                robots = content.trim.toLowerCase
              else if (nm == "description" && description == null) description = content
              if (prop == "og:title" && ogTitle == null) ogTitle = content
              if (equiv == "refresh" && refreshUrl == null && content != null)
                refreshUrl = refreshTarget(content)
              i = end
            case "script" | "style" => // raw text: skip to the closing tag
              val end = skipTag(s, j)
              val close = indexOfIgnoreCase(s, "</" + name, end)
              i = if (close < 0) n else close + 2 + name.length
            case _ =>
              i = skipTag(s, j)
          }
        }
      }
      Meta(title, canonical, robots, lang, ogTitle, description, refreshUrl)
    } catch { case NonFatal(_) => Empty }
  }

  /** The url of a meta-refresh content value ("5; url=/next" — delay then an
    * optional case-insensitive url= part, quotes optional); null when the
    * refresh has no url (a pure reload is not a redirect edge). */
  private def refreshTarget(content: String): String = {
    val semi = content.indexOf(';')
    if (semi < 0) return null
    val after = content.substring(semi + 1).trim
    if (after.length < 4 || !after.substring(0, 4).equalsIgnoreCase("url=")) return null
    var v = after.substring(4).trim
    if (v.length >= 2 && ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v = v.substring(1, v.length - 1).trim
    if (v.isEmpty) null else v
  }

  @inline private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '!'

  private[html] def lowerSub(s: String, from: Int, until: Int): String = {
    val b = new java.lang.StringBuilder(until - from)
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      b.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    b.toString
  }

  /** Advance past the current tag's '>' respecting quoted attribute values. */
  private[html] def skipTag(s: String, from: Int): Int = {
    var i = from
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"' || c == '\'') {
        val e = s.indexOf(c, i + 1)
        i = if (e < 0) n else e + 1
      } else if (c == '>') return i + 1
      else i += 1
    }
    n
  }

  /** Tiny first-wins attribute map for the handful of head tags. */
  private[html] final class Attrs {
    private var ks = new Array[String](8)
    private var vs = new Array[String](8)
    private var sz = 0
    def put(k: String, v: String): Unit = {
      if (apply(k) == null && sz < ks.length) { ks(sz) = k; vs(sz) = v; sz += 1 }
    }
    def apply(k: String): String = {
      var i = 0
      while (i < sz) { if (ks(i) == k) return vs(i); i += 1 }
      null
    }
  }

  /** Parse name[=value] pairs until '>'; returns (attrs, index past '>'). */
  private[html] def parseAttrs(s: String, from: Int): (Attrs, Int) = {
    val a = new Attrs
    val n = s.length
    var i = from
    var done = false
    while (!done && i < n) {
      var c = s.charAt(i)
      if (c == '>') { i += 1; done = true }
      else if (c <= ' ' || c == '/') i += 1
      else {
        val ks = i
        while (i < n && { c = s.charAt(i); c > ' ' && c != '=' && c != '>' && c != '/' }) i += 1
        val key = lowerSub(s, ks, i)
        while (i < n && s.charAt(i) <= ' ') i += 1
        if (i < n && s.charAt(i) == '=') {
          i += 1
          while (i < n && s.charAt(i) <= ' ') i += 1
          if (i < n) {
            val q = s.charAt(i)
            if (q == '"' || q == '\'') {
              val e = s.indexOf(q, i + 1)
              val v = s.substring(i + 1, if (e < 0) n else e)
              a.put(key, v)
              i = if (e < 0) n else e + 1
            } else {
              val vs = i
              while (i < n && { c = s.charAt(i); c > ' ' && c != '>' }) i += 1
              a.put(key, s.substring(vs, i))
            }
          }
        } else if (key.nonEmpty) a.put(key, "")
      }
    }
    (a, i)
  }

  private[html] def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = math.max(0, from)
    while (i <= n - m) {
      var k = 0
      while (k < m && {
        val c = s.charAt(i + k)
        (if (c >= 'A' && c <= 'Z') (c + 32).toChar else c) == needle.charAt(k)
      }) k += 1
      if (k == m) return i
      i += 1
    }
    -1
  }

  /** The named-entity subset + numeric character references (title text). */
  private[html] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          val rep =
            if (name.startsWith("#x") || name.startsWith("#X"))
              try { new String(Character.toChars(Integer.parseInt(name.substring(2), 16))) }
              catch { case NonFatal(_) => null }
            else if (name.startsWith("#"))
              try { new String(Character.toChars(Integer.parseInt(name.substring(1)))) }
              catch { case NonFatal(_) => null }
            else name match {
              case "amp" => "&"
              case "lt" => "<"
              case "gt" => ">"
              case "quot" => "\""
              case "apos" => "'"
              case "nbsp" => " "
              case _ => null
            }
          if (rep != null) { b.append(rep); i = semi + 1 }
          else { b.append(c); i += 1 }
        } else { b.append(c); i += 1 }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private def collapseWs(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c <= ' ' || c == ' ') { if (b.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { b.append(' '); pendingSpace = false }
        b.append(c)
      }
      i += 1
    }
    b.toString
  }
}
