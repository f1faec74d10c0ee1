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

  private def codePoints(word: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      b += word.substring(i, i + n)
      i += n
    }
    b.result()
  }

  /**
   * Learn a merge table from word frequencies (Sennrich et al. 2016 §3 —
   * the tokenizer-TRAINING step a pipeline runs once per corpus before
   * budgeting by [[tokenize]]): repeatedly merge the adjacent symbol pair
   * with the highest frequency-weighted count. Fully deterministic: ties
   * break to the lexicographically smallest (left, right) pair, so the
   * table is independent of input order and partitioning. Stops early when
   * no adjacent pair remains (every word fully merged or single-symbol).
   */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges out of range: $numMerges")
    var vocab: Vector[(Vector[String], Long)] =
      wordCounts.filter(_._1.nonEmpty).map { case (w, c) => (codePoints(w), c) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max count; ties to the lexicographically smallest pair — the
        // determinism contract (a HashMap-order pick would vary per run)
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        vocab = vocab.map { case (syms, c) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              b += (syms(i) + syms(i + 1)); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), c)
        }
        k += 1
      }
    }
    merges.result()
  }

  /** Distributed front for [[train]]: word counts aggregate across the
    * corpus (one shuffle, map-side combined), the TOP `maxWords` words by
    * (count desc, word asc — deterministic) come to the driver as a BOUNDED
    * sample (the ANN-model training-sample class, never the corpus), and
    * the merge loop runs in-JVM. BPE training quality saturates fast in
    * vocabulary coverage — the published tokenizers train on samples, not
    * petabytes. */
  def trainFromCorpus(docs: org.apache.spark.sql.DataFrame, textCol: String,
                      numMerges: Int, maxWords: Int = 65536): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    require(maxWords >= 1 && maxWords <= (1 << 20), s"maxWords out of range: $maxWords")
    val rows = docs
      .select(explode(filter(split(col(textCol), "\\s+"), t => length(t) > 0)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect()
    train(rows.map(r => (r.getString(0), r.getLong(1))).toSeq, numMerges)
  }
}
