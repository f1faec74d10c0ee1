package graft.html

import scala.collection.mutable

import graft.pdf.PdfExtract.Span

/**
 * hOCR word-span parser — the reference's literal core consumption operator
 * (ocr_combined.py:73-82): select `<span class="ocrx_word">` elements, bbox
 * from the `title` attribute ("bbox x1 y1 x2 y2[; x_wconf NN]"), page from the
 * enclosing element id.
 *
 * Page resolution: nearest ancestor whose id is `page_N` (the hOCR ocr_page
 * contract) wins; otherwise the direct parent's id's last `_`-separated token
 * (the reference's literal `word.parent["id"].split("_")[-1]`,
 * ocr_combined.py:80). Spans with no resolvable page or malformed bbox are
 * skipped (B9 bounds guards — the reference would raise; a task must not die
 * on one bad document).
 *
 * Single forward pass over the decoded document (same charset sniffing as
 * HtmlExtract); total — never throws on any byte sequence.
 */
object HocrParse {

  def spans(bytes: Array[Byte]): IndexedSeq[Span] = {
    try spansImpl(bytes)
    catch { case _: Exception => IndexedSeq.empty }
  }

  private def spansImpl(bytes: Array[Byte]): IndexedSeq[Span] = {
    val s = HtmlExtract.decode(bytes)
    val n = s.length
    val out = mutable.ArrayBuffer.empty[Span]
    // stack of (lowercased tag name, id attribute or null) for open elements
    val stack = mutable.ArrayBuffer.empty[(String, String)]
    var i = 0

    def attrValue(tagStart: Int, tagEnd: Int, name: String): String = {
      // find ` name=` (case-insensitive) inside [tagStart, tagEnd), SKIPPING
      // quoted attribute values — `title="image id=9; ..." id="page_1"` must
      // resolve id to page_1, not the id=9 inside another attribute's value
      var j = tagStart
      while (j + name.length + 1 < tagEnd) {
        val cj = s.charAt(j)
        if (cj == '"' || cj == '\'') {
          val e = s.indexOf(cj, j + 1)
          j = if (e < 0 || e >= tagEnd) tagEnd else e + 1
        } else if (s.regionMatches(true, j, name, 0, name.length) &&
            !Character.isLetterOrDigit(s.charAt(j - 1)) && s.charAt(j - 1) != '-') {
          var k = j + name.length
          while (k < tagEnd && s.charAt(k).isWhitespace) k += 1
          if (k < tagEnd && s.charAt(k) == '=') {
            k += 1
            while (k < tagEnd && s.charAt(k).isWhitespace) k += 1
            if (k < tagEnd) {
              val q = s.charAt(k)
              if (q == '"' || q == '\'') {
                val e = s.indexOf(q, k + 1)
                return if (e < 0 || e > tagEnd) null else s.substring(k + 1, e)
              } else {
                var e = k
                while (e < tagEnd && !s.charAt(e).isWhitespace && s.charAt(e) != '>' && s.charAt(e) != '/') e += 1
                return s.substring(k, e)
              }
            }
          }
          j += 1
        } else j += 1
      }
      null
    }

    def hasClassWord(classAttr: String, word: String): Boolean = {
      if (classAttr == null) return false
      var from = 0
      while (from <= classAttr.length - word.length) {
        val at = classAttr.indexOf(word, from)
        if (at < 0) return false
        val beforeOk = at == 0 || classAttr.charAt(at - 1).isWhitespace
        val after = at + word.length
        val afterOk = after == classAttr.length || classAttr.charAt(after).isWhitespace
        if (beforeOk && afterOk) return true
        from = at + 1
      }
      false
    }

    /** bbox ints from a title attribute: first ';'-part must start with "bbox". */
    def parseBbox(title: String): Array[Int] = {
      if (title == null) return null
      val semi = title.indexOf(';')
      val part = (if (semi < 0) title else title.substring(0, semi)).trim
      if (!part.startsWith("bbox")) return null
      val nums = part.substring(4).trim.split("\\s+")
      if (nums.length != 4) return null
      val coords = new Array[Int](4)
      var k = 0
      while (k < 4) {
        try coords(k) = nums(k).toInt
        catch { case _: NumberFormatException => return null }
        k += 1
      }
      coords
    }

    /** Reference page semantics: ancestor `page_N` id preferred, else the
      * direct parent id's last `_` token. -1 when unresolvable. */
    def currentPage(): Int = {
      var k = stack.length - 1
      while (k >= 0) {
        val id = stack(k)._2
        if (id != null && id.startsWith("page_")) {
          try return id.substring(5).toInt catch { case _: NumberFormatException => }
        }
        k -= 1
      }
      if (stack.nonEmpty) {
        val id = stack.last._2
        if (id != null) {
          val us = id.lastIndexOf('_')
          if (us >= 0 && us + 1 < id.length) {
            try return id.substring(us + 1).toInt catch { case _: NumberFormatException => }
          }
        }
      }
      -1
    }

    /** Inner text of the current word span up to its matching </span>;
      * advances i past the close tag. Whitespace collapsed, basic entities. */
    def innerText(): String = {
      val sb = new java.lang.StringBuilder(16)
      var depth = 1
      var pendingSpace = false
      def put(c: Char): Unit = {
        if (c.isWhitespace || c == ' ') { if (sb.length > 0) pendingSpace = true }
        else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(c)
        }
      }
      // name-boundary check: "</span" must not match "</spanner"
      def atTag(pos: Int, tag: String): Boolean =
        s.regionMatches(true, pos, tag, 0, tag.length) && {
          val after = pos + tag.length
          after >= n || !Character.isLetterOrDigit(s.charAt(after))
        }
      while (i < n && depth > 0) {
        val c = s.charAt(i)
        if (c == '<') {
          val e = s.indexOf('>', i)
          val selfClosed = e > i && s.charAt(e - 1) == '/'
          if (atTag(i, "</span")) depth -= 1
          else if (atTag(i, "<span") && !selfClosed) depth += 1
          i = if (e < 0) n else e + 1
        } else if (c == '&') {
          var j = i + 1
          val lim = math.min(n, i + 12)
          while (j < lim && s.charAt(j) != ';' && !s.charAt(j).isWhitespace) j += 1
          if (j < lim && j < n && s.charAt(j) == ';') {
            val ent = s.substring(i + 1, j)
            val dec = ent match {
              case "amp" => "&"
              case "lt" => "<"
              case "gt" => ">"
              case "quot" => "\""
              case "apos" => "'"
              case e0 if e0.startsWith("#") =>
                try {
                  val cp = if (e0.startsWith("#x") || e0.startsWith("#X"))
                    Integer.parseInt(e0.substring(2), 16) else Integer.parseInt(e0.substring(1))
                  if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp)) else ""
                } catch { case _: Exception => "&" + e0 + ";" }
              case e0 => "&" + e0 + ";"
            }
            dec.foreach(put)
            i = j + 1
          } else { put('&'); i += 1 }
        } else { put(c); i += 1 }
      }
      sb.toString
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (c1 == '!' || c1 == '?') {
          val e = s.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else if (c1 == '/') {
          var j = i + 2
          val ns = j
          while (j < n && s.charAt(j).isLetterOrDigit) j += 1
          val name = s.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
          // pop to the matching open tag (mis-nesting recovery)
          var k = stack.length - 1
          while (k >= 0 && stack(k)._1 != name) k -= 1
          if (k >= 0) stack.dropRightInPlace(stack.length - k)
          val e = s.indexOf('>', j)
          i = if (e < 0) n else e + 1
        } else if (c1.isLetter) {
          var j = i + 1
          val ns = j
          while (j < n && s.charAt(j).isLetterOrDigit) j += 1
          val name = s.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
          // scan to tag end honoring quotes
          var tagEnd = j
          var done = false
          var selfClose = false
          while (tagEnd < n && !done) {
            val cj = s.charAt(tagEnd)
            if (cj == '"' || cj == '\'') {
              val e = s.indexOf(cj, tagEnd + 1)
              tagEnd = if (e < 0) n else e + 1
            } else if (cj == '>') {
              if (tagEnd > i && s.charAt(tagEnd - 1) == '/') selfClose = true
              done = true
            } else tagEnd += 1
          }
          val cls = attrValue(j, tagEnd, "class")
          val isWordSpan = name == "span" && hasClassWord(cls, "ocrx_word")
          if (isWordSpan) {
            val bbox = parseBbox(attrValue(j, tagEnd, "title"))
            val page = currentPage()
            i = math.min(n, tagEnd + 1)
            if (selfClose) {
              // degenerate self-closed word span: no text, skip
            } else {
              val word = innerText()
              if (bbox != null && page >= 0 && word.nonEmpty)
                out += Span(page, bbox(0), bbox(1), bbox(2), bbox(3), word)
            }
          } else {
            if (!selfClose && name != "br" && name != "img" && name != "meta" &&
                name != "link" && name != "hr" && name != "input")
              stack += ((name, attrValue(j, tagEnd, "id")))
            i = math.min(n, tagEnd + 1)
          }
        } else i += 1
      } else i += 1
    }
    out.toIndexedSeq
  }
}
