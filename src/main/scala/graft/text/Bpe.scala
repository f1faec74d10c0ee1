package graft.text

import scala.collection.mutable

/**
 * Byte-pair encoding against an explicit merge table (Sennrich et al. 2016 —
 * the GPT-2/tiktoken tokenizer family's core loop): each whitespace word
 * starts as its character sequence, and the adjacent pair with the LOWEST
 * merge rank merges first (leftmost wins ties), repeatedly, until no adjacent
 * pair is in the table. This is the real token count a training pipeline
 * budgets by — q38's regex pre-tokenization is the stage BEFORE this one.
 *
 * Deterministic, per-row, no RNG; words are memoized within a row (crawl text
 * repeats words heavily, and BPE is per-word by construction).
 */
object Bpe {

  /** BPE split of one word. Initial symbols are CODE POINTS, not UTF-16
    * chars: a char split would seed non-BMP text (emoji, rare CJK — routine
    * in crawl data) as unpaired surrogate halves, and any unmerged half is an
    * invalid string that mangles to U+FFFD through UTF8String — breaking the
    * concatenation-conserves-content property. */
  def tokenizeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var parts = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        val n = Character.charCount(cp)
        b += word.substring(i, i + n)
        i += n
      }
      b.result()
    }
    var done = parts.length <= 1
    while (!done) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < parts.length - 1) {
        val r = ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i } // strict < keeps the leftmost on ties
        i += 1
      }
      if (best < 0 || bestRank == Int.MaxValue) done = true
      else parts = (parts.take(best) :+ (parts(best) + parts(best + 1))) ++ parts.drop(best + 2)
    }
    parts
  }

  /** All tokens of whitespace-split text, in order. */
  def tokenize(text: String, ranks: Map[(String, String), Int]): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val cache = mutable.HashMap.empty[String, Vector[String]]
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && text.charAt(i).isWhitespace) i += 1
      if (i < n) {
        val s = i
        while (i < n && !text.charAt(i).isWhitespace) i += 1
        val w = text.substring(s, i)
        out ++= cache.getOrElseUpdate(w, tokenizeWord(w, ranks))
      }
    }
    out.toArray
  }

  /** Merge list (in priority order) → rank lookup. */
  def ranksOf(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap
}
