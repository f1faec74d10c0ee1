package graft.html

import scala.util.control.NonFatal

/**
 * JSON-LD (schema.org) block extraction — the structured-data side of a
 * crawl page: `<script type="application/ld+json">` bodies carry the
 * publisher's own machine-readable description (Article/Product/FAQ types,
 * headlines, authors, dates), and curation pipelines read them for dedup
 * keys and quality/provenance signals. This extracts the RAW JSON text of
 * every such block in document order; parsing is left to Spark's `from_json`
 * (Catalyst-native, schema-checked) — the idiomatic split between a custom
 * byte-level extractor and the built-in JSON machinery.
 *
 * Stance mirrors HtmlMeta: charset-sniffed decode, one linear pass, total on
 * hostile bytes. Script bodies are RAW TEXT (no entity decoding — the HTML
 * spec's script data state); the type attribute matches case-insensitively
 * with optional parameters (e.g. `application/ld+json; charset=utf-8`).
 * Caps: at most MaxBlocks blocks, each at most MaxBlockLen chars — a hostile
 * page must not grow unbounded strings inside a row.
 */
object JsonLd {

  val MaxBlocks = 64
  val MaxBlockLen = 65536
  private val MaxScan = 2 << 20

  def blocks(bytes: Array[Byte]): Array[String] = {
    try {
      if (bytes == null || bytes.length == 0) return Array.empty[String]
      val s0 = HtmlExtract.decode(bytes)
      val s = if (s0.length > MaxScan) s0.substring(0, MaxScan) else s0
      val out = new scala.collection.mutable.ArrayBuffer[String](2)
      val n = s.length
      var i = 0
      while (i < n && out.length < MaxBlocks) {
        val lt = s.indexOf('<', i)
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
          else if (name == "script" && s.charAt(lt + 1) != '/') {
            val (attrs, end) = HtmlMeta.parseAttrs(s, j)
            val close = HtmlMeta.indexOfIgnoreCase(s, "</script", end)
            val bodyEnd = if (close < 0) n else close
            if (isLdJson(attrs("type"))) {
              val raw = s.substring(end, math.min(bodyEnd, end + MaxBlockLen)).trim
              if (raw.nonEmpty) out += raw
            }
            i = if (close < 0) n else HtmlMeta.skipTag(s, close + 8)
          } else i = HtmlMeta.skipTag(s, j)
        }
      }
      out.toArray
    } catch { case NonFatal(_) => Array.empty[String] }
  }

  /** `application/ld+json` with optional MIME parameters, case-insensitive. */
  private def isLdJson(t: String): Boolean = {
    if (t == null) return false
    val base = { val semi = t.indexOf(';'); if (semi < 0) t else t.substring(0, semi) }
    base.trim.equalsIgnoreCase("application/ld+json")
  }

  @inline private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '!'
}
