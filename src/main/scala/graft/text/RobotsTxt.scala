package graft.text

/**
 * robots.txt evaluation per RFC 9309 (the Robots Exclusion Protocol) — the
 * crawl-policy gate every serious corpus applies at collection time and
 * re-checks at curation time (takedown/etiquette audits re-evaluate stored
 * policies against stored urls).
 *
 * Semantics implemented (RFC 9309 §2):
 *  - groups: consecutive `User-agent` lines share one group; `Allow`/
 *    `Disallow` lines attach to the current group; a `User-agent` line after
 *    rules starts a new group; rules before any group are ignored; other
 *    directives (Sitemap, Crawl-delay) are ignored; `#` starts a comment.
 *  - group selection: all groups naming the crawler's product token
 *    (case-insensitive) combine; when none match, the `*` groups apply.
 *  - path matching: byte-literal prefix match with `*` (any sequence) and a
 *    trailing `$` (end anchor). The MOST SPECIFIC matching rule wins —
 *    longest pattern in octets — and ties break to Allow (least
 *    restrictive). An empty pattern matches nothing (the classic
 *    "Disallow:" = allow-all). No matching rule = allowed.
 *
 * Pure JVM, total on arbitrary text, linear in input size (wildcard
 * placement is a forward scan, never backtracking exponentially).
 */
object RobotsTxt {

  final case class Rule(allow: Boolean, pattern: String)

  /** Parsed groups in file order: (lowercased agent tokens, rules). */
  def parse(txt: String): Seq[(Seq[String], Seq[Rule])] =
    parseFull(txt).map { case (a, r, _) => (a, r) }

  /** Like [[parse]], plus each group's first valid `Crawl-delay` in millis
    * (the de-facto politeness directive major crawlers honor — not in RFC
    * 9309, which files it under "other records"). Accepted values: decimal
    * seconds `[0-9]+(.[0-9]*)?`, truncated to millis, capped at 24 h
    * (hostile `Crawl-delay: 99999999999` must not overflow a scheduler).
    *
    * Grouping stance (a documented choice — parsers genuinely diverge
    * here): a crawl-delay line is a RULE line, so a later `User-agent`
    * starts a NEW group, matching the crawlers that honor the directive
    * per group. A parser that ignores the directive entirely (it is not in
    * the RFC) would instead merge `UA: a / Crawl-delay / UA: b` into one
    * shared group; this engine prefers the honoring parsers' reading. */
  private[text] def parseFull(txt: String): Seq[(Seq[String], Seq[Rule], Option[Long])] = {
    if (txt == null) return Nil
    val groups = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], Seq[Rule], Option[Long])]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var delay: Option[Long] = None
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += ((agents.toSeq, rules.toSeq, delay))
      agents = scala.collection.mutable.ArrayBuffer.empty[String]
      rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
      delay = None
      inRules = false
    }
    txt.split("\n", -1).foreach { line0 =>
      val line = { val h = line0.indexOf('#'); if (h < 0) line0 else line0.substring(0, h) }.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) flush()
            agents += value.toLowerCase
          case "allow" if agents.nonEmpty => rules += Rule(allow = true, value); inRules = true
          case "disallow" if agents.nonEmpty => rules += Rule(allow = false, value); inRules = true
          case "crawl-delay" if agents.nonEmpty =>
            if (delay.isEmpty) delay = parseDelayMillis(value)
            inRules = true
          case _ => // sitemap, unknown: ignored
        }
      }
    }
    flush()
    groups.toSeq
  }

  val MaxDelayMillis: Long = 24L * 3600 * 1000

  private def parseDelayMillis(v: String): Option[Long] = {
    if (v.isEmpty || !v.forall(c => (c >= '0' && c <= '9') || c == '.')) return None
    val dot = v.indexOf('.')
    if (dot != v.lastIndexOf('.')) return None
    val intPart = if (dot < 0) v else v.substring(0, dot)
    val fracPart = if (dot < 0) "" else v.substring(dot + 1)
    if (intPart.isEmpty && fracPart.isEmpty) return None
    if (intPart.length > 8) return Some(MaxDelayMillis)
    val whole = if (intPart.isEmpty) 0L else intPart.toLong
    val frac = (fracPart + "000").substring(0, 3).toLong
    Some(math.min(whole * 1000L + frac, MaxDelayMillis))
  }

  /** Effective `Crawl-delay` for `agent` in millis, or None: the FIRST
    * delay among the agent's selected groups (named groups if any name it,
    * else the `*` groups — the [[isAllowed]] selection rule) in file
    * order. */
  def crawlDelayMillis(txt: String, agent: String): Option[Long] = {
    val groups = parseFull(txt)
    val a = if (agent == null) "*" else agent.toLowerCase
    val mine = groups.filter(_._1.contains(a))
    val eff = if (mine.nonEmpty) mine else groups.filter(_._1.contains("*"))
    eff.flatMap(_._3).headOption
  }

  /** RFC 9309 §2.2.3 pattern match: anchored-prefix with `*` and trailing `$`. */
  private[text] def matches(pattern0: String, path: String): Boolean = {
    var pattern = pattern0
    var anchored = false
    if (pattern.endsWith("$")) { anchored = true; pattern = pattern.substring(0, pattern.length - 1) }
    val parts = pattern.split("\\*", -1)
    if (!path.startsWith(parts(0))) return false
    var pos = parts(0).length
    var k = 1
    while (k < parts.length) {
      val p = parts(k)
      if (p.isEmpty) {
        // consecutive '*' collapse; a TRAILING '*' eats the rest (incl. for $)
        if (k == parts.length - 1) pos = path.length
      } else if (anchored && k == parts.length - 1) {
        // the last literal must END the path, at or after the cursor
        if (!(path.endsWith(p) && path.length - p.length >= pos)) return false
        pos = path.length
      } else {
        val idx = path.indexOf(p, pos)
        if (idx < 0) return false
        pos = idx + p.length
      }
      k += 1
    }
    if (anchored) pos == path.length else true
  }

  /** `Sitemap:` directive urls in file order (sitemaps.org robots-txt
    * discovery; RFC 9309 treats the line as an "other record" that parsers
    * pass through). The directive is GROUP-INDEPENDENT — it counts wherever
    * it appears, even before any User-agent line — and the value is taken
    * verbatim after trimming (the protocol requires an absolute url; hostile
    * values are the caller's resolve/validate problem). Exact duplicates
    * collapse to the first occurrence; capped at [[MaxSitemaps]]. */
  def sitemaps(txt: String): Seq[String] = {
    if (txt == null) return Nil
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    txt.split("\n", -1).foreach { line0 =>
      if (out.size < MaxSitemaps) {
        val line = { val h = line0.indexOf('#'); if (h < 0) line0 else line0.substring(0, h) }.trim
        val colon = line.indexOf(':')
        if (colon > 0 && line.substring(0, colon).trim.equalsIgnoreCase("sitemap")) {
          val value = line.substring(colon + 1).trim
          if (value.nonEmpty) out += value
        }
      }
    }
    out.toSeq
  }

  val MaxSitemaps = 1024

  /** Is `path` fetchable for `agent` under this robots.txt? */
  def isAllowed(txt: String, agent: String, path: String): Boolean = {
    val groups = parse(txt)
    val a = if (agent == null) "*" else agent.toLowerCase
    val mine = groups.filter(_._1.contains(a))
    val eff = if (mine.nonEmpty) mine else groups.filter(_._1.contains("*"))
    val matching = eff.flatMap(_._2)
      .filter(r => r.pattern.nonEmpty && matches(r.pattern, if (path == null) "/" else path))
    if (matching.isEmpty) true
    else matching.maxBy(r => (r.pattern.length, r.allow)).allow
  }
}
