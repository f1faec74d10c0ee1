package graft.html

import java.nio.charset.StandardCharsets
import scala.collection.mutable

/**
 * Streaming, linear-time HTML main-content extractor.
 *
 * Semantics (the engine's documented extraction contract — the reference analog is
 * the class-based hOCR span selection at reference ocr_combined.py:73-82, generalized
 * to boilerplate stripping in the style of Boilerpipe/Readability text-density +
 * link-density block scoring):
 *
 *  1. Charset: UTF-8 by default; if a `charset=` declaration naming latin-1 /
 *     iso-8859-1 / windows-1252 appears in the first 1024 bytes, decode as ISO-8859-1.
 *     A UTF-8 BOM is skipped. Malformed sequences decode to U+FFFD (Java default).
 *  2. Tokenize: tags, text, comments (`<!-- -->`), doctype/PI (`<! >`, `<? >`).
 *     Every tag/comment/PI is a word boundary. Tags ending `/>` are treated as
 *     self-closing (XHTML-style).
 *     `<script>`, `<style>`, `<textarea>` contents are raw text and fully dropped.
 *     Attribute values may be single/double-quoted or bare; `>` inside quotes is data.
 *     The tokenizer is total: any byte sequence yields a result, never throws,
 *     single forward pass (no backtracking — per-file timeout analog,
 *     reference config.py:23).
 *  3. Entities in text: named subset (amp lt gt quot apos nbsp mdash ndash hellip
 *     copy reg trade laquo raquo shy) + numeric `&#NNN;` / `&#xHH;`. Unknown entities
 *     are kept literally.
 *  4. Block segmentation: opening/closing any block-level tag flushes the current
 *     block. Words inside `<a>` are counted as link words.
 *  5. Boilerplate containers: words inside head, title, nav, header, footer, aside,
 *     form, noscript, button, select, label are never content.
 *  6. A block is content iff: not inside a boilerplate container, wordCount >= 5,
 *     and linkWords * 3 <= wordCount (link density <= 1/3).
 *  7. Output: content block texts (words joined by single space; all whitespace
 *     incl. U+00A0 collapses) joined by '\n'. Empty result -> "".
 */
object HtmlExtract {

  final case class Block(
      idx: Int,
      tag: String,
      text: String,
      words: Int,
      linkWords: Int,
      isContent: Boolean
  )

  private val BlockTags: Set[String] = Set(
    "html", "head", "body", "p", "div", "section", "article", "main",
    "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol", "dl", "dt", "dd",
    "td", "th", "tr", "table", "thead", "tbody", "tfoot", "caption",
    "blockquote", "pre", "br", "hr", "figure", "figcaption", "address",
    "nav", "header", "footer", "aside", "form", "fieldset", "title",
    "noscript", "button", "select", "option", "label", "iframe"
  )

  private val BoilerTags: Set[String] = Set(
    "head", "title", "nav", "header", "footer", "aside", "form",
    "noscript", "button", "select", "option", "label", "iframe"
  )

  private val RawTextTags: Set[String] = Set("script", "style", "textarea")

  // flag bits for the allocation-free tag classifier
  private final val FBlock = 1
  private final val FBoiler = 2
  private final val FRaw = 4
  private final val FAnchor = 8

  // open-addressed lookup keyed by lowercased tag name — classifying a tag from
  // its char region without allocating a substring (hot path: ~1 tag / 25 chars)
  private val TagTableSize = 256
  private val tagNames = new Array[String](TagTableSize)
  private val tagFlags = new Array[Int](TagTableSize)
  locally {
    def put(name: String, flag: Int): Unit = {
      var idx = hashName(name, 0, name.length) & (TagTableSize - 1)
      while (tagNames(idx) != null && tagNames(idx) != name) idx = (idx + 1) & (TagTableSize - 1)
      tagNames(idx) = name
      tagFlags(idx) |= flag
    }
    BlockTags.foreach(put(_, FBlock))
    BoilerTags.foreach(put(_, FBoiler))
    RawTextTags.foreach(put(_, FRaw))
    put("a", FAnchor)
  }

  @inline private def lowerAscii(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  private def hashName(s: CharSequence, start: Int, end: Int): Int = {
    var h = 5381
    var i = start
    while (i < end) { h = h * 33 + lowerAscii(s.charAt(i)); i += 1 }
    h & Int.MaxValue
  }

  /** Flags for the tag name at s[start,end), 0 if unknown — no allocation. */
  private def classifyTag(s: String, start: Int, end: Int): Int = {
    var idx = hashName(s, start, end) & (TagTableSize - 1)
    val len = end - start
    while (tagNames(idx) != null) {
      val cand = tagNames(idx)
      if (cand.length == len) {
        var k = 0
        while (k < len && cand.charAt(k) == lowerAscii(s.charAt(start + k))) k += 1
        if (k == len) return tagFlags(idx)
      }
      idx = (idx + 1) & (TagTableSize - 1)
    }
    0
  }

  private val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> "\u00A0", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "laquo" -> "«", "raquo" -> "»",
    "shy" -> ""
  )

  /** Case-insensitive ASCII search for `needle` (lowercase) in bytes[from, until). */
  private def byteIndexOfIgnoreCase(b: Array[Byte], needle: String, from: Int, until: Int): Int = {
    val m = needle
    var i = from
    val lim = until - m.length
    while (i <= lim) {
      var k = 0
      while (k < m.length && lowerAscii((b(i + k) & 0xff).toChar) == m.charAt(k)) k += 1
      if (k == m.length) return i
      i += 1
    }
    -1
  }

  /** Sniff charset from the first 1024 bytes (allocation-free scan);
    * ISO-8859-1 family or UTF-8. */
  private[graft] def decode(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length == 0) return ""
    var off = 0
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
        (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf) off = 3
    val sniffLen = math.min(bytes.length, 1024)
    val cs = byteIndexOfIgnoreCase(bytes, "charset=", 0, sniffLen)
    val latin1 = if (cs >= 0) {
      var j = cs + 8
      var end = j
      while (end < sniffLen && {
        val c = (bytes(end) & 0xff).toChar
        c.isLetterOrDigit || c == '-' || c == '_' || c == '"' || c == '\''
      }) end += 1
      byteIndexOfIgnoreCase(bytes, "8859-1", j, end) >= 0 ||
        byteIndexOfIgnoreCase(bytes, "latin", j, end) >= 0 ||
        byteIndexOfIgnoreCase(bytes, "1252", j, end) >= 0
    } else false
    val charset = if (latin1) StandardCharsets.ISO_8859_1 else StandardCharsets.UTF_8
    // (no hand-rolled ASCII fast path: JDK17's UTF-8 String decoder already
    // fast-paths pure-ASCII input via the countPositives intrinsic — measured
    // identical throughput with and without a manual ISO_8859_1 shortcut)
    new String(bytes, off, bytes.length - off, charset)
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u00A0'

  /** One word plus whether it occurred inside an <a>. */
  /** Word chars are written straight into the block buffer (no per-word String);
    * wordStart == -1 ⇔ between words. */
  private final class BlockAcc {
    val sb = new java.lang.StringBuilder(256)
    var words = 0
    var linkWords = 0
    var wordStart = -1
    def nonEmpty: Boolean = words > 0 || wordStart >= 0
    def reset(): Unit = { sb.setLength(0); words = 0; linkWords = 0; wordStart = -1 }
  }

  /** Full block analysis; `extract` is the text-only fast path over the same walk. */
  def blocks(bytes: Array[Byte]): IndexedSeq[Block] = {
    val out = mutable.ArrayBuffer.empty[Block]
    walk(bytes, (tag, text, words, linkWords, boiler) => {
      val content = !boiler && words >= MinWords && linkWords * 3 <= words
      out += Block(out.length, tag, text, words, linkWords, content)
    })
    out.toIndexedSeq
  }

  val MinWords = 5

  def extract(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(256)
    walk(bytes, (_, text, words, linkWords, boiler) => {
      if (!boiler && words >= MinWords && linkWords * 3 <= words) {
        if (sb.length() > 0) sb.append('\n')
        sb.append(text)
      }
    })
    sb.toString
  }

  /** Core single-pass walk: (enclosingTag, blockText, words, linkWords, inBoilerplate). */
  private def walk(bytes: Array[Byte], emit: (String, String, Int, Int, Boolean) => Unit): Unit = {
    val s = decode(bytes)
    val n = s.length
    var i = 0
    var linkDepth = 0
    var boilerDepth = 0
    var curTag = "body"
    var blockBoiler = false
    val acc = new BlockAcc

    def appendChar(c: Char): Unit = {
      if (acc.wordStart < 0) {
        if (acc.sb.length() == 0) blockBoiler = boilerDepth > 0
        else acc.sb.append(' ')
        acc.wordStart = acc.sb.length()
      }
      acc.sb.append(c)
    }
    def flushWord(): Unit = {
      if (acc.wordStart >= 0) {
        acc.words += 1
        if (linkDepth > 0) acc.linkWords += 1
        acc.wordStart = -1
      }
    }
    def flushBlock(): Unit = {
      flushWord()
      if (acc.words > 0) {
        emit(curTag, acc.sb.toString, acc.words, acc.linkWords, blockBoiler)
        acc.reset()
      }
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        // every tag/comment/PI is a word boundary (so a pending word's link flag
        // is decided before <a>/</a> changes depth)
        if (c1 == '!' || c1 == '?' || c1.isLetter || c1 == '/') flushWord()
        if (c1 == '!') {
          if (i + 3 < n && s.charAt(i + 2) == '-' && s.charAt(i + 3) == '-') {
            val e = s.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else {
            val e = s.indexOf('>', i + 2)
            i = if (e < 0) n else e + 1
          }
        } else if (c1 == '?') {
          val e = s.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else if (c1.isLetter || c1 == '/') {
          val closing = c1 == '/'
          var j = i + (if (closing) 2 else 1)
          val nameStart = j
          while (j < n && (s.charAt(j).isLetterOrDigit)) j += 1
          val nameEnd = j
          val flags = classifyTag(s, nameStart, nameEnd)
          // scan to tag end honoring quotes
          var selfClose = false
          var done = false
          while (j < n && !done) {
            val cj = s.charAt(j)
            if (cj == '"' || cj == '\'') {
              val e = s.indexOf(cj, j + 1)
              j = if (e < 0) n else e + 1
            } else if (cj == '>') {
              if (j > i && s.charAt(j - 1) == '/') selfClose = true
              j += 1; done = true
            } else j += 1
          }
          if (nameEnd == nameStart) { i = j }
          else {
            if ((flags & FBlock) != 0) flushBlock()
            if ((flags & FAnchor) != 0) {
              if (closing) { if (linkDepth > 0) linkDepth -= 1 }
              else if (!selfClose) linkDepth += 1
            }
            if ((flags & FBoiler) != 0) {
              if (closing) { if (boilerDepth > 0) boilerDepth -= 1 }
              else if (!selfClose) boilerDepth += 1
            }
            if ((flags & FBlock) != 0 && !closing)
              curTag = s.substring(nameStart, nameEnd).toLowerCase(java.util.Locale.ROOT)
            i = j
            if (!closing && !selfClose && (flags & FRaw) != 0) {
              // raw text until matching close tag (case-insensitive), dropped
              val close = "</" + s.substring(nameStart, nameEnd).toLowerCase(java.util.Locale.ROOT)
              var k = i
              var found = -1
              while (found < 0 && k + close.length <= n) {
                if (s.regionMatches(true, k, close, 0, close.length)) found = k
                else k += 1
              }
              if (found < 0) i = n
              else {
                val e = s.indexOf('>', found)
                i = if (e < 0) n else e + 1
              }
            }
          }
        } else {
          // literal '<'
          appendChar(c); i += 1
        }
      } else if (c == '&') {
        // entity
        var j = i + 1
        val lim = math.min(n, i + 32)
        while (j < lim && s.charAt(j) != ';' && s.charAt(j) != '&' && s.charAt(j) != '<' && !isWs(s.charAt(j))) j += 1
        if (j < lim && j < n && s.charAt(j) == ';') {
          val ent = s.substring(i + 1, j)
          val decoded: String =
            if (ent.startsWith("#x") || ent.startsWith("#X")) {
              try { val cp = Integer.parseInt(ent.substring(2), 16); if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp)) else "�" }
              catch { case _: Exception => "&" + ent + ";" }
            } else if (ent.startsWith("#")) {
              try { val cp = Integer.parseInt(ent.substring(1)); if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp)) else "�" }
              catch { case _: Exception => "&" + ent + ";" }
            } else Entities.getOrElse(ent, "&" + ent + ";")
          var k = 0
          while (k < decoded.length) {
            val dc = decoded.charAt(k)
            if (isWs(dc)) flushWord() else appendChar(dc)
            k += 1
          }
          i = j + 1
        } else {
          appendChar('&'); i += 1
        }
      } else {
        if (isWs(c)) { flushWord(); i += 1 }
        else {
          // bulk word-run: scan to the next markup/entity/whitespace boundary
          // and append the whole run in one copy — the per-char append was the
          // single hottest path in the walk (~1 call per payload byte)
          var j = i + 1
          while (j < n && {
            val cj = s.charAt(j)
            cj != '<' && cj != '&' && !isWs(cj)
          }) j += 1
          if (acc.wordStart < 0) {
            if (acc.sb.length() == 0) blockBoiler = boilerDepth > 0
            else acc.sb.append(' ')
            acc.wordStart = acc.sb.length()
          }
          acc.sb.append(s, i, j)
          i = j
        }
      }
    }
    flushBlock()
  }
}
