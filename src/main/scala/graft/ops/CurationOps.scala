package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/**
 * Corpus-curation operators a training-data pipeline runs between extraction
 * and tokenization — the named stages from the public data-curation
 * literature (GPT-3 appendix A / The Pile / Gopher MassiveText rules), each
 * in a shuffle-frugal Spark shape.
 */
object CurationOps {

  /** Token n-grams of a text column as 64-bit hashes (one fused expression:
    * split → rolling splitmix fold), via the same rolling_fingerprint family
    * the dedup ops use. Exposed for decontaminate's two sides. */
  private def ngramHashes(text: Column, n: Int): Column =
    ngram_hashes(text, n)

  /**
   * Benchmark decontamination (GPT-3 appendix A shape): flag every document
   * sharing ANY token n-gram (default 13 — the published choice) with the
   * benchmark corpus. Scale shape: the benchmark is orders of magnitude
   * smaller than the corpus, so its DISTINCT n-gram hashes broadcast; the
   * corpus side explodes to (doc, hash) pairs and semi-joins — ONE corpus
   * scan, no shuffle of corpus text, never a cross join. Returns (id,
   * contaminated:boolean).
   */
  def decontaminate(docs: DataFrame, textCol: String, idCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    n: Int = 13): DataFrame = {
    val benchGrams = benchmark
      .select(explode(ngramHashes(col(benchTextCol), n)).as("_g"))
      .distinct()
    val hits = docs
      .select(col(idCol).as("_id"), explode(ngramHashes(col(textCol), n)).as("_g"))
      .join(broadcast(benchGrams), Seq("_g"), "left_semi")
      .select(col("_id")).distinct()
    docs.select(col(idCol))
      .join(hits.withColumn("_c", lit(true)).withColumnRenamed("_id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("_c"), lit(false)).as("contaminated"))
  }

  /** Gopher/MassiveText-style repetition signals (Rae et al. 2021 §A1.1):
    * fraction of duplicate token n-grams, and the fraction of all 2-gram
    * occurrences taken by the single most frequent 2-gram. Pure per-row
    * column math — no shuffle, codegen-friendly. */
  def repetitionStats(docs: DataFrame, textCol: String, idCol: String,
                      n: Int = 3): DataFrame = {
    val grams = ngramHashes(col(textCol), n)
    val bigrams = ngramHashes(col(textCol), 2)
    // top-bigram count via a groupBy-free expression: sort the hashes, then
    // the longest equal-run length = max occurrence count
    val sorted = array_sort(bigrams)
    val runLens = expr(
      """aggregate(
        |  slice(sortedBigrams, 2, greatest(0, size(sortedBigrams) - 1)),
        |  struct(1 as run, 1 as best, sortedBigrams[0] as prev),
        |  (acc, x) -> IF(x = acc.prev,
        |      struct(acc.run + 1 as run, greatest(acc.best, acc.run + 1) as best, x as prev),
        |      struct(1 as run, acc.best as best, x as prev)),
        |  acc -> acc.best)""".stripMargin)
    docs
      .withColumn("sortedBigrams", sorted)
      .select(
        col(idCol),
        size(grams).as("n_grams"),
        size(array_distinct(grams)).as("n_distinct_grams"),
        when(size(grams) === 0, 0.0).otherwise(
          round(lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams), 4))
          .as("dup_gram_frac"),
        when(size(col("sortedBigrams")) === 0, 0.0)
          .otherwise(round(runLens.cast("double") / size(col("sortedBigrams")), 4))
          .as("top_bigram_frac"))
  }

  /**
   * URL blocklist filtering (the RefinedWeb §3.1 pre-content gate — cheaper
   * than any text inspection, so it runs first): drop documents whose host
   * matches a blocked domain (exact or any-subdomain suffix) or whose url
   * matches a blocked substring (the published lists are adult/fraud domains
   * plus path fragments like "/tag/", "?replytocom="). Lists are 10^4-10^6
   * entries, so per-entry Column terms are out (an O(n)-node expression tree
   * blows codegen's 64KB method limit at 10^4 and the driver's analysis at
   * 10^6): both sides ship ONCE per executor as a TorrentBroadcast and probe
   * per row — a hash-set over host dot-suffixes (O(labels) per row) and an
   * Aho-Corasick automaton over the url (O(length) per row, any pattern
   * count). Still a narrow per-row filter: no corpus explode, no join, no
   * UDF, pushdown-safe. Returns the surviving rows unchanged.
   */
  def urlBlocklistFilter(docs: DataFrame, urlCol: String,
                         blockedDomains: Seq[String],
                         blockedSubstrings: Seq[String] = Nil): DataFrame = {
    // NULL url must SURVIVE (the quarantine-downstream stance every other
    // gate takes): probes are null-intolerant, so match sides run over a
    // ""-coalesced url
    val sc = docs.sparkSession.sparkContext
    val u = lower(coalesce(col(urlCol), lit("")))
    val host = lower(coalesce(url_host(col(urlCol)), lit("")))
    val domainHit =
      if (blockedDomains.isEmpty) lit(false)
      else host_in_domain_set(host,
        sc.broadcast(blockedDomains.map(_.toLowerCase).toArray))
    val substrHit =
      if (blockedSubstrings.isEmpty) lit(false)
      else contains_any_pattern(u,
        sc.broadcast(blockedSubstrings.map(_.toLowerCase).toArray))
    docs.filter(!domainHit && !substrHit)
  }

  /**
   * Per-host document cap (crawl balancing: no single host may dominate the
   * corpus): keep the first `k` documents per host in `orderCol` order
   * (`orderCol` is assumed unique within a host — ids, timestamps).
   *
   * Skew-safe two-phase shape (the host key is EXACTLY the one the extraction
   * pipeline salts — head hosts are 10^7-10^8 docs at design scale, and a
   * single `row_number` window would sort every one of them in ONE task):
   *   1. per-host counts (map-side combine) → the HEAVY host list (count > k,
   *      at most n/k hosts) tags rows via a join; the join STRATEGY is left
   *      to size-based planning + AQE on purpose — with the design-scale cap
   *      (k=10^5) the heavy list is tiny and broadcasts at runtime, while a
   *      pathological small-k call at corpus scale (n/k rows no driver can
   *      hold) degrades to a shuffle join instead of a forced-broadcast OOM.
   *      LIGHT hosts cannot exceed the cap, so their rows pass through
   *      with no window at all.
   *   2. the heavy slice alone runs a two-level top-k: a salted window over
   *      (host, hash(orderCol) % saltBuckets) keeps each salted group's first
   *      k (a superset of the global first-k, ≤ saltBuckets·k rows per host),
   *      then the final ordered window ranks only that bounded remnant — no
   *      task ever sorts more than max(c/saltBuckets, saltBuckets·k) rows.
   * Result set is IDENTICAL to the naive single-window form (asserted by
   * PlanAuditSpec against a zipf-head fixture).
   *
   * `docs` is consumed by THREE plan branches (the counts aggregation and
   * both union arms); callers passing an expensive derived frame should
   * cache/localCheckpoint it first — `CurationPipeline` caps over its narrow
   * checkpointed flag frame for exactly this reason.
   */
  def hostCap(docs: DataFrame, hostCol: String, orderCol: String, k: Int,
              saltBuckets: Int = 64): DataFrame = {
    require(k >= 0 && saltBuckets >= 1)
    val counts = docs.groupBy(col(hostCol)).agg(count(lit(1)).as("_hc"))
    val heavy = counts.filter(col("_hc") > k)
      .select(col(hostCol).as("_hchost")).withColumn("_heavy", lit(true))
    // null-safe equality: a null host is a host like any other here (the
    // naive window groups nulls together and caps them; a plain join key
    // would silently exempt them from the cap)
    val tagged = docs.join(heavy, col(hostCol) <=> col("_hchost"), "left")
      .drop("_hchost")
    val original = docs.columns.map(col)
    val light = tagged.filter(col("_heavy").isNull).select(original: _*)
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(hostCol), col("_hcsalt")).orderBy(col(orderCol).asc)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(hostCol)).orderBy(col(orderCol).asc)
    val heavyKept = tagged.filter(col("_heavy") === true)
      .withColumn("_hcsalt", pmod(xxhash64(col(orderCol)), lit(saltBuckets.toLong)))
      .withColumn("_rn1", row_number().over(w1)).filter(col("_rn1") <= k)
      .withColumn("_rn2", row_number().over(w2)).filter(col("_rn2") <= k)
      .select(original: _*)
    light.unionByName(heavyKept)
  }

  /**
   * CCNet-style line-level dedup (Wenzek et al. 2019): a line duplicated
   * ACROSS the corpus (boilerplate, nav, cookie banners) survives only in its
   * first occurrence — the (min doc id, min line index) one, a deterministic
   * stand-in for CCNet's shard-order first-seen — and every other copy is
   * dropped; documents are reassembled in original line order (empty string
   * when nothing survives).
   *
   * Scale shape: the keeper-per-line aggregation is a groupBy on the line
   * with map-side combine — a line duplicated 10^8 times collapses to one
   * record per map partition BEFORE the shuffle, so hot boilerplate lines
   * cannot skew the aggregation. The join attaching keepers back to line
   * occurrences IS keyed on the line (inherently — every copy must learn its
   * keeper); oversized hot-line partitions there are AQE skew-join territory.
   */
  def dropDuplicatedLines(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val lines = docs.select(col(idCol).as("_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("_ln", "_line")))
    val keepers = lines.groupBy(col("_line"))
      .agg(min(struct(col("_id"), col("_ln"))).as("_keep"))
    val kept = lines.join(keepers, Seq("_line"))
      .filter(struct(col("_id"), col("_ln")) === col("_keep"))
    val rebuilt = kept.groupBy(col("_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("_ln"), col("_line")))),
          x => x.getField("_line")), "\n").as("text_deduped"))
    docs.select(col(idCol).as("_id")).join(rebuilt, Seq("_id"), "left")
      .select(col("_id").as(idCol), coalesce(col("text_deduped"), lit("")).as("text_deduped"))
  }

  /**
   * Duplicated-passage signal (Lee et al. 2022, "Deduplicating Training Data
   * Makes Language Models Better" — the EXACTSUBSTR criterion): for every
   * document, how many of its token n-gram windows occur more than once in
   * the whole corpus (any document, including itself). The published pipeline
   * removes those spans; at corpus-stats time the per-document duplicated
   * fraction is the filter/repair signal.
   *
   * Scale shape: windows travel as 64-bit hashes, never text, and the corpus
   * is SCANNED ONCE — a join of grams against per-gram counts would rebuild
   * the scan+explode subtree on both join inputs (the partial aggregate under
   * one exchange defeats ReusedExchange). Instead: (1) groupBy (gram, doc)
   * with map-side combine (in-doc boilerplate repetition collapses per map
   * partition), (2) the corpus-wide count attaches as an unordered window
   * sum over the gram key, (3) one narrow re-aggregation on the doc id. A
   * gram shared by D documents puts D narrow rows in one window partition —
   * the same per-key concentration any attach shape pays.
   * Returns (id, n_windows, dup_windows, dup_frac).
   */
  def duplicatedSpanStats(docs: DataFrame, textCol: String, idCol: String,
                          n: Int = 13): DataFrame = {
    val pairCounts = docs
      .select(col(idCol).as("_id"), explode(ngramHashes(col(textCol), n)).as("_g"))
      .groupBy(col("_g"), col("_id")).agg(count(lit(1)).as("_k"))
    val withTotals = pairCounts.withColumn("_c",
      sum(col("_k")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("_g"))))
    val per = withTotals.groupBy(col("_id"))
      .agg(sum(col("_k")).as("_nw"),
        coalesce(sum(when(col("_c") > 1, col("_k"))), lit(0L)).as("_dw"))
    docs.select(col(idCol).as("_id")).join(per, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("_nw"), lit(0L)).cast("int").as("n_windows"),
        coalesce(col("_dw"), lit(0L)).cast("int").as("dup_windows"),
        when(coalesce(col("_nw"), lit(0L)) === 0, 0.0)
          .otherwise(round(col("_dw").cast("double") / col("_nw"), 4)).as("dup_frac"))
  }

  /**
   * EXACTSUBSTR dedup as a TRANSFORM (Lee et al. 2022 §4.1 — the
   * deduplicate-text-datasets tool's removal half): duplicatedSpanStats
   * MEASURES corpus-wide duplicated token windows; this REMOVES them. Every
   * token covered by some n-token window whose hash occurs more than once
   * corpus-wide is dropped, and the document is rebuilt from the surviving
   * tokens (single-space joined — the shared curation-op convention; the
   * op's token model is whitespace runs, matching ngram_hashes). Exact-dup
   * documents collapse to empty strings and shared boilerplate runs vanish
   * from EVERY copy — the paper keeps one occurrence; removing all copies is
   * the conservative variant whose count duplicatedSpanStats already reports
   * (documented deviation, composable with exact dedup for keep-one).
   * Returns (id, clean_text, removed_tokens).
   *
   * Scale shape: windows and coverage travel as (id, pos) ints plus a 64-bit
   * gram hash, never text. One corpus scan explodes windows; the corpus-wide
   * occurrence count attaches as an unordered window count over the gram key
   * (the duplicatedSpanStats shape); duplicated window starts explode to
   * covered positions (dup_windows × n narrow rows); tokens anti-join the
   * coverage on (id, pos) and reassemble order-preserving via sort_array
   * (the dropDuplicatedLines shape) — no per-token quadratic corner at any
   * document size.
   */
  def removeDuplicatedSpans(docs: DataFrame, textCol: String, idCol: String,
                            n: Int = 13): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("_g"))
    // ws_tokens, NOT split("\\s+"): gram positions come from ngram_hashes'
    // tokenBounds (Character.isWhitespace) — a regex split disagrees on
    // Unicode whitespace (U+2028, U+3000) and would misalign coverage,
    // removing the WRONG tokens
    val toksOf = ws_tokens(col(textCol))
    val starts = docs
      .select(col(idCol).as("_id"),
        posexplode(ngramHashes(col(textCol), n)).as(Seq("_pos", "_g")))
      .withColumn("_c", count(lit(1)).over(w))
      .filter(col("_c") > 1)
    val covered = starts.select(col("_id"),
      explode(sequence(col("_pos"), col("_pos") + lit(n - 1))).as("_pos"))
    val toks = docs.select(col(idCol).as("_id"),
      posexplode(toksOf).as(Seq("_pos", "_tok")))
    val kept = toks.join(covered, Seq("_id", "_pos"), "left_anti")
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("_pos"), col("_tok")))),
          s => s.getField("_tok"))).as("_clean"))
    docs.select(col(idCol).as("_id"), col(textCol))
      .join(kept, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("_clean"), lit("")).as("clean_text"),
        (coalesce(size(toksOf), lit(0)) - coalesce(col("_kept"), lit(0L)).cast("int"))
          .cast("int").as("removed_tokens"))
  }

  /**
   * The Gopher/MassiveText document-level quality rules (Rae et al. 2021
   * §A1.1) that complement `repetitionStats`' repetition family: word-count
   * bounds, mean word length, symbol-to-word ratio (# and ellipsis), bullet /
   * ellipsis line fractions, alphabetic-word fraction, and the
   * ≥2-required-stop-words test. Returns every signal plus the conjunctive
   * `keep` verdict so callers can re-threshold without recomputing.
   *
   * Pure per-row column math over one text scan — no shuffle, and ratios are
   * exact integer-over-integer divisions (deterministic across engines).
   * Tokens here are the corpus convention (single-space split), matching the
   * other curation ops.
   */
  def gopherQualitySignals(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol) +: gopherCols(col(textCol)).map { case (n, c) => c.as(n) }: _*)

  /** The Gopher signal columns as named expressions — shared by the
    * per-document view, the one-pass funnel, and CurationPipeline's gates. */
  private[graft] def gopherCols(txt: Column): Seq[(String, Column)] = {
    val words = filter(split(txt, " "), w => length(w) > 0)
    val lines = split(txt, "\n")
    val wc = size(words)
    val sumLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
    val meanLen = when(wc === 0, 0.0).otherwise(sumLen.cast("double") / wc)
    val hashCount = length(txt) - length(regexp_replace(txt, "#", ""))
    val ellipsisCount = ((length(txt) - length(regexp_replace(txt, "\\.\\.\\.", ""))) / 3).cast("int")
    val symbolRatio = when(wc === 0, 0.0)
      .otherwise((hashCount + ellipsisCount).cast("double") / wc)
    val nLines = size(lines)
    val bulletLines = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•")))
    val ellipsisLines = size(filter(lines, l => l.endsWith("...")))
    val bulletFrac = bulletLines.cast("double") / nLines // split() ⇒ ≥1 line always
    val ellipsisFrac = ellipsisLines.cast("double") / nLines
    val alphaWords = size(filter(words, w => w.rlike("[a-zA-Z]")))
    val alphaFrac = when(wc === 0, 0.0).otherwise(alphaWords.cast("double") / wc)
    val requiredStops = array(Seq("the", "be", "to", "of", "and", "that", "have", "with").map(lit): _*)
    val nStops = size(array_intersect(array_distinct(words), requiredStops))
    Seq(
      "word_count" -> wc,
      "mean_word_len" -> round(meanLen, 4),
      "symbol_word_ratio" -> round(symbolRatio, 4),
      "bullet_line_frac" -> round(bulletFrac, 4),
      "ellipsis_line_frac" -> round(ellipsisFrac, 4),
      "alpha_word_frac" -> round(alphaFrac, 4),
      "n_required_stops" -> nStops,
      "keep" -> (wc >= 50 && wc <= 100000 &&
        meanLen >= 3.0 && meanLen <= 10.0 &&
        symbolRatio <= 0.1 &&
        bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
        alphaFrac >= 0.8 && nStops >= 2))
  }

  /**
   * C4-style cleanup (Raffel et al. 2020 §2.2, the published T5 corpus
   * rules): keep only lines that end in terminal punctuation AND have at
   * least 3 words; then at page level, flag documents containing any
   * badword, "lorem ipsum", or a curly brace (code), and require ≥5
   * sentences in the retained text. Returns the cleaned text, the per-rule
   * signals, and the conjunctive `keep` — pure per-row column math over one
   * scan, no shuffle.
   */
  def c4Filter(docs: DataFrame, textCol: String, idCol: String,
               badwords: Seq[String] = Seq("lorem ipsum")): DataFrame =
    docs.select(col(idCol) +: c4Cols(col(textCol), badwords).map { case (n, c) => c.as(n) }: _*)

  /** The C4 rule columns as named expressions — shared by the per-document
    * view, the one-pass funnel, and CurationPipeline's gates. */
  private[graft] def c4Cols(txt: Column, badwords: Seq[String]): Seq[(String, Column)] = {
    val keptLines = filter(split(txt, "\n"), l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")) &&
        size(split(l, " ")) >= 3)
    val cleaned = array_join(keptLines, "\n")
    val nSentences = length(cleaned) - length(regexp_replace(cleaned, "[.!?]", ""))
    val flagged = (badwords.map(b => contains(lower(txt), lit(b))) :+ contains(txt, lit("{")))
      .reduce(_ || _)
    Seq(
      "text_clean" -> cleaned,
      "n_kept_lines" -> size(keptLines),
      "n_sentences" -> nSentences,
      "flagged" -> flagged,
      "keep" -> (nSentences >= 5 && !flagged))
  }

  /**
   * One-pass corpus triage funnel: every PER-ROW gate (the Gopher rule set,
   * the C4 rule set) plus the exact-duplicate collapse, counted in a SINGLE
   * scan + aggregation. This is the shape a 100 TB triage run takes — a
   * count() action per stage would re-scan the corpus once per number;
   * here the stage counts are sums of per-row flags and the unique count is
   * a count-distinct over the 64-byte digest, all in one job. Returns one
   * row: (n_docs, n_gopher_keep, n_c4_keep, n_both_keep, n_unique_docs).
   */
  def curationFunnel(docs: DataFrame, textCol: String,
                     badwords: Seq[String] = Seq("lorem ipsum")): DataFrame = {
    val txt = col(textCol)
    val g = gopherCols(txt).toMap.apply("keep")
    val c = c4Cols(txt, badwords).toMap.apply("keep")
    docs
      .select(g.as("_g"), c.as("_c"), sha2(encode(txt, "UTF-8"), 256).as("_d"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("_g"), 1L).otherwise(0L)).as("n_gopher_keep"),
        sum(when(col("_c"), 1L).otherwise(0L)).as("n_c4_keep"),
        sum(when(col("_g") && col("_c"), 1L).otherwise(0L)).as("n_both_keep"),
        countDistinct(col("_d")).as("n_unique_docs"))
  }

  /**
   * DSIR importance weights (Xie et al. 2023, "Data Selection for Language
   * Models via Importance Resampling"): score every document by how much its
   * hashed n-gram profile (unigrams + bigrams, `buckets` hash buckets — the
   * paper's 10k default) looks like a small target corpus rather than the raw
   * corpus: weight = Σ_f c_f · [ln p̂_target(f) − ln p̂_raw(f)] with add-one
   * smoothing. Selection then keeps the top-weight documents (resampling is
   * the caller's `stratifiedSample`-style step).
   *
   * Scale shape: ONE corpus scan → (bucket, doc) counts with map-side
   * combine; per-bucket corpus totals derive from those counts (narrow
   * re-agg, exchange reused); the target side is tiny by construction and the
   * log-ratio table is ≤ `buckets` rows — broadcast to the final attach. The
   * per-bucket log-ratio is quantized to integer micro-nats BEFORE the
   * per-doc sum, so the result is independent of float summation order (a
   * Long sum is exact).
   */
  def dsirWeights(docs: DataFrame, textCol: String, idCol: String,
                  target: DataFrame, targetTextCol: String,
                  buckets: Int = 10000): DataFrame = {
    def bucketsOf(t: Column) =
      transform(concat(ngram_hashes(t, 1), ngram_hashes(t, 2)),
        h => pmod(h, lit(buckets.toLong)))
    val w1 = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val tCounts = target.select(explode(bucketsOf(col(targetTextCol))).as("_b"))
      .groupBy(col("_b")).agg(count(lit(1)).as("_t"))
    // the explicit (vacuously true) not-null filters matter: the downstream
    // joins INFER isnotnull(_b) / isnotnull(id) on ONE consumer branch of
    // this subtree each, and any inferred-filter asymmetry between the two
    // consumers defeats exchange reuse — with both present here, the corpus
    // is scanned and gram-hashed ONCE (plan-audited)
    val pair = docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("_id"), explode(bucketsOf(col(textCol))).as("_b"))
      .filter(col("_b").isNotNull)
      .groupBy(col("_b"), col("_id")).agg(count(lit(1)).as("_c"))
    val rCounts = pair.groupBy(col("_b")).agg(sum(col("_c")).as("_r"))
    val ratios = rCounts.join(tCounts, Seq("_b"), "full_outer")
      .withColumn("_nt", sum(coalesce(col("_t"), lit(0L))).over(w1))
      .withColumn("_nr", sum(coalesce(col("_r"), lit(0L))).over(w1))
      .select(col("_b"), round((
        log((coalesce(col("_t"), lit(0L)) + 1).cast("double"))
          - log((coalesce(col("_r"), lit(0L)) + 1).cast("double"))
          + log((col("_nr") + buckets).cast("double"))
          - log((col("_nt") + buckets).cast("double"))) * 1e6).cast("long").as("_lri"))
    val per = pair.join(broadcast(ratios), Seq("_b"))
      .groupBy(col("_id"))
      .agg(sum(col("_c")).as("_nf"), sum(col("_c") * col("_lri")).as("_s"))
    docs.select(col(idCol).as("_id")).join(per, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("_nf"), lit(0L)).cast("int").as("n_features"),
        round(coalesce(col("_s"), lit(0L)) / 1e6, 4).as("dsir_logweight"))
  }

  /**
   * CCNet-style LM filtering (Wenzek et al. 2019 §4.3): score every document
   * by its cross-entropy under a language model trained on a small target
   * corpus (CCNet uses a Wikipedia KenLM; this is the same pipeline stage
   * over an honest hashed-token BIGRAM model with add-one smoothing —
   * p(b₂|b₁) = (c₂(b₁,b₂)+1)/(c₁(b₁)+B) over B hash buckets). Low
   * cross-entropy ≈ target-like text; the caller thresholds or buckets into
   * CCNet's head/middle/tail tertiles. Returns (id, n_bigrams,
   * ce_nats = mean −ln p per bigram, rounded 4).
   *
   * Scale shape (the dsirWeights pattern): the target is small by
   * construction, so both model tables broadcast — ln-quantized to integer
   * MICRO-NATS so the per-doc sum is a Long (order-independent, DuckDB
   * replays it bit-for-bit). The corpus is scanned ONCE: per-(doc, bigram
   * key) counts with map-side combine, two broadcast attaches (the context
   * table on b₁ with an unseen-context fallback of ln B; the bigram table on
   * the packed key, unseen → ln 1 = 0), one narrow re-agg on the doc id.
   */
  def lmCrossEntropy(docs: DataFrame, textCol: String, idCol: String,
                     target: DataFrame, targetTextCol: String,
                     buckets: Int = 10000): DataFrame = {
    val B = buckets.toLong
    def bucketsOf(t: Column): Column =
      transform(ngram_hashes(t, 1), h => pmod(h, lit(B)))
    // consecutive-bucket pairs as packed keys b1·B + b2 (and b1 alone for the
    // context counts). Both slice arguments reference the bucket array, so
    // projection collapse may evaluate the unigram hashing twice per ROW —
    // accepted: it is per-row (never per-element), and the text scan
    // dominates either way
    def pairKeys(a: Column): Column =
      zip_with(slice(a, lit(1), greatest(size(a) - 1, lit(0))),
        slice(a, lit(2), greatest(size(a) - 1, lit(0))),
        (x, y) => x * B + y)
    def contexts(a: Column): Column = slice(a, lit(1), greatest(size(a) - 1, lit(0)))
    val lnq: Double => Long = x => math.round(math.log(x) * 1e6)

    val tA = target.select(bucketsOf(col(targetTextCol)).as("_a"))
    val c2 = tA.select(explode(pairKeys(col("_a"))).as("_k"))
      .groupBy(col("_k")).agg(count(lit(1)).as("_c2"))
      .select(col("_k"), round(log(col("_c2") + 1) * 1e6).cast("long").as("_ln2"))
    val c1 = tA.select(explode(contexts(col("_a"))).as("_b1"))
      .groupBy(col("_b1")).agg(count(lit(1)).as("_c1"))
      .select(col("_b1"), round(log(col("_c1") + B) * 1e6).cast("long").as("_ln1"))

    val pair = docs
      .select(col(idCol).as("_id"), explode(pairKeys(bucketsOf(col(textCol)))).as("_k"))
      .groupBy(col("_id"), col("_k")).agg(count(lit(1)).as("_c"))
      // integer context recovery: keys are < B² = 10^8, exact in the double
      // division, and non-negative so the truncating cast is floor
      .withColumn("_b1", floor(col("_k") / B).cast("long"))
    val per = pair
      .join(broadcast(c2), Seq("_k"), "left")
      .join(broadcast(c1), Seq("_b1"), "left")
      // cost in micro-nats: −ln p = ln(c1+B) − ln(c2+1); unseen context →
      // ln(0+B), unseen bigram → ln(0+1) = 0
      .withColumn("_cost",
        coalesce(col("_ln1"), lit(lnq(B.toDouble))) - coalesce(col("_ln2"), lit(0L)))
      .groupBy(col("_id"))
      .agg(sum(col("_c")).as("_n"), sum(col("_c") * col("_cost")).as("_s"))
    docs.select(col(idCol).as("_id")).join(per, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("_n"), lit(0L)).cast("int").as("n_bigrams"),
        when(coalesce(col("_n"), lit(0L)) === 0, 0.0)
          .otherwise(round(col("_s") / 1e6 / col("_n"), 4)).as("ce_nats"))
  }

  /**
   * CCNet perplexity bucketing (Wenzek et al. 2020 §4.4): split each
   * language's documents into head/middle/tail TERCILES by LM score (lower
   * cross-entropy = cleaner text = head) — the quality tiers CCNet publishes
   * and downstream corpora sample from. `scored` is lmCrossEntropy's output
   * joined with a language column; returns it plus `ppl_bucket`.
   *
   * Exact integer contract (replayable cross-engine): with cum(v) = #docs of
   * the language with score ≤ v and n the language total, the cutoffs are
   * t1 = min{v : 3·cum(v) ≥ n} and t2 = min{v : 3·cum(v) ≥ 2n}; bucket =
   * head iff score ≤ t1, middle iff score ≤ t2, else tail. All comparisons
   * are integer (counts) or on the already-quantized score values.
   *
   * Scale shape: the q42 histogram trick per language — the window runs over
   * groupBy(lang, score) COUNTS (bounded by the quantized value space, never
   * corpus rows), so no per-language full sort of documents exists anywhere;
   * the threshold frame is #languages rows and joins by size-based planning.
   */
  def perplexityBuckets(scored: DataFrame, ceCol: String, langCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val hist = scored.groupBy(col(langCol).as("_graft_ppl_lang"), col(ceCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val wOrd = w.partitionBy(col("_graft_ppl_lang")).orderBy(col("_v"))
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    val wAll = w.partitionBy(col("_graft_ppl_lang"))
    val thr = hist
      .withColumn("_cum", sum(col("_c")).over(wOrd))
      .withColumn("_n", sum(col("_c")).over(wAll))
      .groupBy(col("_graft_ppl_lang"))
      .agg(min(when(col("_cum") * 3 >= col("_n"), col("_v"))).as("_t1"),
        min(when(col("_cum") * 3 >= col("_n") * 2, col("_v"))).as("_t2"))
    scored.join(thr, col(langCol) <=> col("_graft_ppl_lang"))
      .withColumn("ppl_bucket",
        when(col(ceCol) <= col("_t1"), "head")
          .when(col(ceCol) <= col("_t2"), "middle")
          .otherwise("tail"))
      .drop("_graft_ppl_lang", "_t1", "_t2")
  }

  /**
   * SEQUENCE PACKING — the training-shard layout stage (the GPT-2/3 input
   * convention: document token streams concatenated with one EOS between
   * docs, split into fixed seqLen chunks; Brown et al. 2020 §2.3 describe
   * exactly this packing): maps every document to the chunk ids it occupies
   * and rolls the corpus up per chunk. Tokens are whitespace runs (+1 EOS
   * per doc); documents are ordered by `idCol` (must be distinct numeric
   * ids). Returns (chunk_id, n_tokens, n_docs, first_doc, last_doc) — every
   * chunk is exactly seqLen tokens except the last.
   *
   * Scale shape: a GLOBAL prefix sum without a global sort — the hostCap
   * two-phase trick applied to offsets. Documents bucket by id range
   * (id div bucketWidth); per-bucket token sums aggregate map-side; the
   * bucket-level running offset is a window over the #buckets-row frame
   * (metadata-sized); each doc's offset = bucket offset + a within-bucket
   * running sum (window bounded by bucketWidth ids). The result is provably
   * bucketWidth-invariant (spec-pinned), so the knob is purely a
   * parallelism/skew choice. Chunk spans then explode to ≤ (nt/seqLen + 1)
   * narrow rows per doc and aggregate on chunk_id — one shuffle.
   */
  def packSequences(docs: DataFrame, textCol: String, idCol: String,
                    seqLen: Int, bucketWidth: Long = 1L << 20): DataFrame = {
    require(seqLen >= 1, s"seqLen must be positive: $seqLen")
    require(bucketWidth >= 1, s"bucketWidth must be positive: $bucketWidth")
    val w = org.apache.spark.sql.expressions.Window
    val L = seqLen.toLong
    val counts = docs.select(col(idCol).cast("long").as("_id"),
      (size(filter(split(col(textCol), "\\s+"), t => length(t) > 0)) + 1).cast("long").as("_nt"))
    val bucketed = counts.withColumn("_bkt", expr(s"_id div $bucketWidth"))
    val bPrefix = bucketed.groupBy(col("_bkt")).agg(sum(col("_nt")).as("_bsum"))
      .withColumn("_boff", coalesce(sum(col("_bsum")).over(
        w.orderBy(col("_bkt")).rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("_bkt"), col("_boff"))
    val wIn = w.partitionBy(col("_bkt")).orderBy(col("_id"))
      .rowsBetween(Long.MinValue, 0)
    val offs = bucketed.join(bPrefix, Seq("_bkt"))
      .withColumn("_off", col("_boff") + sum(col("_nt")).over(wIn) - col("_nt"))
    val spans = offs.select(col("_id"), col("_nt"), col("_off"),
      explode(sequence(expr(s"_off div $L"), expr(s"(_off + _nt - 1) div $L"))).as("chunk_id"))
    spans.groupBy(col("chunk_id"))
      .agg(
        sum(least(lit(L) * (col("chunk_id") + 1), col("_off") + col("_nt"))
          - greatest(lit(L) * col("chunk_id"), col("_off"))).as("n_tokens"),
        count(lit(1)).as("n_docs"),
        min(col("_id")).as("first_doc"),
        max(col("_id")).as("last_doc"))
  }

  /** Unicode text normalization (the ftfy/CCNet-style cleanup every published
    * pipeline runs before tokenization — typographic noise otherwise
    * fragments the token space): curly quotes → straight, en/em dashes → '-',
    * ellipsis char → '...', NBSP → space, zero-width characters removed,
    * space runs collapsed, ends trimmed. Pure codegen'd built-ins
    * (translate + regexp_replace), no UDF. */
  def normalizeText(text: Column): Column = {
    val mapped = translate(text, "‘’“”–— ", "''\"\"-- ")
    val expanded = regexp_replace(mapped, "…", "...")
    val zapped = regexp_replace(expanded, "[​‌‍﻿]", "")
    trim(regexp_replace(zapped, " {2,}", " "))
  }

  /** PII scrubbing to typed placeholders (emails → [EMAIL], IPv4 → [IP],
    * phone-like digit runs → [PHONE]) — patterns restricted to the
    * lookahead-free common subset of Java regex and RE2. Order matters: IP
    * before phone, or the phone run eats the address's digits. */
  def redactPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val phone = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "[EMAIL]"),
        ipv4, "[IP]"),
      phone, "[PHONE]")
  }

  /** Deterministic stratified sampling: keep ~pct% of rows per stratum, the
    * keep decision a pure splitmix64 hash of the id (reproducible across
    * runs/partitionings — never rand()). No shuffle; the stratum column is
    * only for the caller's accounting. */
  def stratifiedSample(docs: DataFrame, idCol: String, pct: Int, seed: Long = 0x5eedL): DataFrame = {
    require(pct >= 0 && pct <= 100)
    docs.filter(pmod(splitmix64(col(idCol).cast("long").bitwiseXOR(lit(seed))), lit(100)) < pct)
  }

  /** Host-level prior table — the per-site reputation rollup a crawler
    * feeds back into prioritization and a curator uses to spot template
    * farms: docs, exact-dup share (rows beyond one per content digest —
    * boilerplate mills duplicate wholesale), token mass, and the share of
    * near-empty documents. The mixed distinct/non-distinct aggregate plans
    * as Spark's two-phase distinct rewrite — TWO exchanges (per
    * (host, digest), then per host), both map-side partial, carrying
    * digests and counters rather than text (PlanAuditSpec pins the shape).
    * All-integer outputs replay directly in SQL. */
  def hostProfile(docs: DataFrame, urlCol: String, textCol: String,
                  shortTokens: Int = 5): DataFrame = {
    val toks = size(filter(split(col(textCol), "\\s+"), t => length(t) > 0))
    docs
      .select(lower(graft.functions.url_host(col(urlCol))).as("host"),
        sha2(encode(col(textCol), "UTF-8"), 256).as("_dig"), toks.as("_tok"))
      .filter(col("host").isNotNull)
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("_dig")).as("n_unique"),
        sum(col("_tok").cast("long")).as("tokens_total"),
        sum(when(col("_tok") < shortTokens, 1L).otherwise(0L)).as("short_docs"))
      .withColumn("dup_rows", col("n_docs") - col("n_unique"))
      .withColumn("dup_permille", expr("dup_rows * 1000 div n_docs"))
  }

  /** Training-mixture construction under a token budget — the data-MIXING
    * step after curation (per-domain weights, hand-set or DoReMi-style
    * tuned, times a global budget give per-domain token targets; docs are
    * admitted in a fixed pseudo-random order until the domain's target is
    * full). Unlike [[stratifiedSample]]'s per-row rate, this meets an
    * ABSOLUTE budget: target_d = budget·w_d div 1000, and domain d keeps
    * the longest prefix of its permutation whose inclusive cost sum stays
    * ≤ target_d — the budget is never exceeded (the boundary doc and
    * everything after it are dropped; at real scale a doc is ≪ the budget,
    * so the slack is at most one document). Domains absent from
    * `weightsPermille` contribute nothing. `idCol` must be INTEGRAL (hash
    * string ids first — xxhash64(url)); the permutation is (h, id) with
    * h = splitmix64(id xor seed) — partitioning-invariant; the bucket key
    * is an ORDER-PRESERVING range of h (truncating div by a positive
    * constant is monotone), so bucket-major order is identical to (h, id)
    * order for ANY bucket count, and splitmix uniformity keeps the ranges
    * balanced.
    *
    * Scale shape (the packSequences two-level prefix sum — never one
    * serial window per domain): per-(domain, bucket) cost sums aggregate
    * map-side to a |domains|·buckets frame; the exclusive bucket offsets
    * window over THAT small frame; the big frame shuffles ONCE on
    * (domain, bucket) for the intra-bucket running sums, `buckets`-way
    * parallel per domain. Null costs count 0. */
  def tokenBudgetMix(docs: DataFrame, idCol: String, domainCol: String,
                     costCol: String, weightsPermille: Seq[(String, Long)],
                     budget: Long, buckets: Int = 256,
                     seed: Long = 0x5eedL): DataFrame = {
    require(budget >= 0, s"budget must be nonnegative: $budget")
    require(buckets >= 1, s"buckets must be positive: $buckets")
    weightsPermille.foreach { case (d, wt) =>
      require(wt >= 0, s"negative weight for domain $d: $wt") }
    val spark = docs.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
    val targets = weightsPermille
      .map { case (d, wt) => (d, budget * wt / 1000L) }
      .toDF(domainCol, "_target")
    // clamp at 0: a negative cost would make the running sum non-monotone,
    // silently breaking the longest-prefix/budget-never-exceeded guarantee
    // (rows AFTER the boundary could re-enter under the target); null counts 0
    val cost = greatest(coalesce(col(costCol).cast("long"), lit(0L)), lit(0L))
    // h div W ranges over ~[-buckets, buckets) — granularity only; the
    // admission result is W-invariant because truncating div by a POSITIVE
    // constant keeps h's order. buckets=1 must not take MaxValue+1 (it
    // overflows to MinValue — a negative divisor that inverts the order
    // for h = MinValue); MaxValue itself yields the 2-3 ranges wanted there
    val rangeWidth = if (buckets == 1) Long.MaxValue else Long.MaxValue / buckets + 1L
    val based = docs
      .withColumn("_h", splitmix64(col(idCol).cast("long").bitwiseXOR(lit(seed))))
      .withColumn("_bkt", expr(s"_h div ${rangeWidth}L"))
    val bOff = based.groupBy(col(domainCol), col("_bkt"))
      .agg(sum(cost).as("_bsum"))
      .withColumn("_boff", coalesce(sum(col("_bsum")).over(
        w.partitionBy(col(domainCol)).orderBy(col("_bkt"))
          .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col(domainCol), col("_bkt"), col("_boff"))
    val wIn = w.partitionBy(col(domainCol), col("_bkt"))
      .orderBy(col("_h"), col(idCol)).rowsBetween(Long.MinValue, 0)
    based
      .join(bOff, Seq(domainCol, "_bkt"))
      .join(targets, Seq(domainCol)) // inner: unweighted domains drop here
      .withColumn("_cum", col("_boff") + sum(cost).over(wIn))
      .filter(col("_cum") <= col("_target"))
      .drop("_h", "_bkt", "_boff", "_cum", "_target")
  }
}
