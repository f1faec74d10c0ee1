package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CurationOpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("decontaminate flags exactly the documents sharing a benchmark 13-gram") {
    val phrase = (1 to 13).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"leading words $phrase trailing words here"),
      (2L, "completely unrelated text " + (1 to 20).map(i => s"w$i").mkString(" ")),
      (3L, phrase), // exactly the benchmark gram
      (4L, phrase.split(" ").dropRight(1).mkString(" ")), // only 12 tokens of it
      (5L, "short doc")
    ).toDF("doc_id", "text")
    val bench = Seq(phrase).toDF("bench_text")
    val got = CurationOps.decontaminate(docs, "text", "doc_id", bench, "bench_text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false, 5L -> false))
  }

  test("decontaminate plan: benchmark side broadcast, no cartesian") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val bench = Seq("a b c").toDF("bench_text")
    val plan = CurationOps.decontaminate(docs, "text", "doc_id", bench, "bench_text", n = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("repetitionStats: hand-computed fractions") {
    val docs = Seq(
      (1L, "a a a a"),       // trigrams [aaa, aaa]: dup 0.5; bigrams [aa,aa,aa]: top 1.0
      (2L, "a b c d"),       // trigrams [abc, bcd]: dup 0; bigrams all distinct: top 1/3
      (3L, "x y"),           // no trigrams → zeros; one bigram → top 1.0
      (4L, "solo")           // nothing
    ).toDF("doc_id", "text")
    val got = CurationOps.repetitionStats(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(got(0) == ((1L, 2, 1, 0.5, 1.0)))
    assert(got(1) == ((2L, 2, 2, 0.0, 0.3333)))
    assert(got(2) == ((3L, 0, 0, 0.0, 1.0)))
    assert(got(3) == ((4L, 0, 0, 0.0, 0.0)))
  }

  test("hostCap keeps the first k per host in order") {
    val docs = (1L to 20L).map(i => (i, s"h${i % 2}")).toDF("id", "host")
    val kept = CurationOps.hostCap(docs, "host", "id", 3)
      .collect().map(r => r.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 4L, 5L, 6L)) // first 3 odd + first 3 even ids
  }

  test("dropDuplicatedLines: corpus-duplicated lines survive only in the first occurrence") {
    val docs = Seq(
      (3L, "boiler\nunique three\nboiler"), // in-doc dup: second copy dropped too
      (1L, "boiler\nunique one"),
      (2L, "unique two\nboiler"),
      (4L, "boiler")                         // loses everything → empty
    ).toDF("doc_id", "text")
    val got = CurationOps.dropDuplicatedLines(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "boiler\nunique one", // min doc_id keeps the shared line
      2L -> "unique two",
      3L -> "unique three",
      4L -> ""))
  }

  test("dropDuplicatedLines preserves original line order after reassembly") {
    val docs = Seq((1L, (0 until 50).map(i => s"line $i").mkString("\n"))).toDF("doc_id", "text")
    val got = CurationOps.dropDuplicatedLines(docs.repartition(7), "text", "doc_id")
      .collect().head.getString(1)
    assert(got == (0 until 50).map(i => s"line $i").mkString("\n"))
  }

  test("duplicatedSpanStats: corpus-wide repeated windows counted per doc") {
    val shared = "one two three four five six" // 6 tokens → two 5-gram windows
    val docs = Seq(
      (1L, s"$shared tail a b c"),   // shares both windows with doc 2
      (2L, shared),
      (3L, "q w e r t y u"),         // 3 unique windows
      (4L, "rep rep rep rep rep rep rep rep rep rep"), // in-doc repetition: all 6 windows identical
      (5L, "too short")              // < 5 tokens → no windows
    ).toDF("doc_id", "text")
    val got = CurationOps.duplicatedSpanStats(docs, "text", "doc_id", n = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .sortBy(_._1)
    // doc 1 has 10 tokens → 6 windows; the first two ("one..five","two..six")
    // also occur in doc 2
    assert(got(0) == ((1L, 6, 2, 0.3333)))
    assert(got(1) == ((2L, 2, 2, 1.0)))
    assert(got(2) == ((3L, 3, 0, 0.0)))
    assert(got(3) == ((4L, 6, 6, 1.0)))
    assert(got(4) == ((5L, 0, 0, 0.0)))
  }

  test("removeDuplicatedSpans: covered tokens dropped, order-preserving rebuild") {
    // docs 1/2 share the 4-token run "p q r s": with n=3 the two fully-shared
    // windows (p q r) / (q r s) are corpus-duplicated, so positions 1..4 are
    // covered in both docs; doc 3 IS one shared window and collapses; doc 4 is
    // unique and survives whole; doc 5 is shorter than n (no windows)
    val docs = Seq(
      (1L, "a p q r s b"),
      (2L, "c p q r s d"),
      (3L, "p q r"),
      (4L, "u v w x y z"),
      (5L, "t u")
    ).toDF("doc_id", "text")
    val got = CurationOps.removeDuplicatedSpans(docs, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(got(0) == ((1L, "a b", 4)))
    assert(got(1) == ((2L, "c d", 4)))
    assert(got(2) == ((3L, "", 3)))
    assert(got(3) == ((4L, "u v w x y z", 0)))
    assert(got(4) == ((5L, "t u", 0)))
  }

  test("removeDuplicatedSpans: exact-dup docs collapse; whitespace-run tokens align") {
    val docs = Seq(
      (1L, "same exact duplicated document text here"),
      (2L, "same exact duplicated document text here"),
      // double spaces + leading whitespace must not desync window positions
      (3L, "  same exact  duplicated document text here"),
      (4L, "an unrelated document that stays intact")
    ).toDF("doc_id", "text")
    val got = CurationOps.removeDuplicatedSpans(docs, "text", "doc_id", n = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    // docs 1-3 tokenize identically (whitespace runs), so all windows occur
    // 3x corpus-wide and every token is covered
    assert(got(0) == ((1L, "", 6)))
    assert(got(1) == ((2L, "", 6)))
    assert(got(2) == ((3L, "", 6)))
    assert(got(3) == ((4L, "an unrelated document that stays intact", 0)))
  }

  test("removeDuplicatedSpans: Unicode whitespace cannot desync token positions") {
    // U+3000 (ideographic space) and U+2028 (line separator) are
    // Character.isWhitespace (so ngram_hashes token positions count them as
    // separators) but NOT Java-regex \s — the round-5 split("\\s+") token
    // side counted them as token characters, shifting indices and removing
    // the WRONG tokens. Both sides now share ws_tokens.
    val docs = Seq(
      (1L, "a　p q r s b"), // same token stream as doc 2 inside p q r s
      (2L, "c p　q r s d"),
      (3L, "solo unique tokens only here")
    ).toDF("doc_id", "text")
    val got = CurationOps.removeDuplicatedSpans(docs, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    // p q r / q r s duplicated across docs 1-2 → positions 1..4 covered
    assert(got(0) == ((1L, "a b", 4)))
    assert(got(1) == ((2L, "c d", 4)))
    assert(got(2) == ((3L, "solo unique tokens only here", 0)))
  }

  test("packSequences: hand-computed chunk layout, doc-spanning boundaries") {
    // token counts incl. EOS: doc1 -> 4, doc2 -> 3, doc3 -> 6; offsets 0, 4, 7
    // seqLen 5: chunk0 = doc1(4) + doc2(1); chunk1 = doc2(2) + doc3(3);
    // chunk2 = doc3(3, short last chunk)
    val docs = Seq(
      (1L, "a b c"), (2L, "d e"), (3L, "f g h i j")
    ).toDF("doc_id", "text")
    val got = CurationOps.packSequences(docs, "text", "doc_id", seqLen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 5L, 2L, 1L, 2L),
      (1L, 5L, 2L, 2L, 3L),
      (2L, 3L, 1L, 3L, 3L)))
  }

  test("packSequences: bucketWidth-invariant, token-conserving, all-full-but-last") {
    val docs = (1L to 97L).map(i => (i * 3, ("w " * ((i % 13).toInt + 1)).trim)).toDF("doc_id", "text")
    def run(bw: Long) = CurationOps.packSequences(docs, "text", "doc_id", 32, bw)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val a = run(1L << 20)
    assert(a == run(7) && a == run(1))
    val totalTokens = (1L to 97L).map(i => i % 13 + 2).sum
    assert(a.map(_._2).sum == totalTokens)
    assert(a.dropRight(1).forall(_._2 == 32L), "every chunk but the last is full")
    assert(a.map(_._1) == a.indices.map(_.toLong), "chunk ids are dense from 0")
  }

  test("perplexityBuckets: a null-language slice keeps its rows and tiers among itself") {
    val scored = Seq[(Long, Option[String], Double)](
      (1L, None, 1.0), (2L, None, 2.0), (3L, None, 3.0),
      (4L, Some("en"), 5.0)
    ).toDF("doc_id", "lang", "ce_nats")
    val got = CurationOps.perplexityBuckets(scored, "ce_nats", "lang")
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(got == Map(1L -> "head", 2L -> "middle", 3L -> "tail", 4L -> "head"))
  }

  test("perplexityBuckets: per-language integer terciles, ties, uneven counts") {
    // en: scores 1..6 -> cum*3>=6 at v=2 (t1), cum*3>=12 at v=4 (t2)
    // de: five docs, three sharing the best score -> the tie crosses BOTH
    //     cutoffs (cum(1.0)=3: 9>=5 and 9>=10 is false -> t2 comes later)
    // fr: a single doc is its own head
    val scored = Seq(
      (1L, "en", 1.0), (2L, "en", 2.0), (3L, "en", 3.0),
      (4L, "en", 4.0), (5L, "en", 5.0), (6L, "en", 6.0),
      (10L, "de", 1.0), (11L, "de", 1.0), (12L, "de", 1.0),
      (13L, "de", 2.0), (14L, "de", 3.0),
      (20L, "fr", 9.0)
    ).toDF("doc_id", "lang", "ce_nats")
    val got = CurationOps.perplexityBuckets(scored, "ce_nats", "lang")
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(got == Map(
      1L -> "head", 2L -> "head", 3L -> "middle", 4L -> "middle", 5L -> "tail", 6L -> "tail",
      // de: t1 = 1.0 (cum 3*3=9 >= 5), t2 = 2.0 (cum 4*3=12 >= 10)
      10L -> "head", 11L -> "head", 12L -> "head", 13L -> "middle", 14L -> "tail",
      20L -> "head"))
  }

  test("gopherQualitySignals: hand-computed rules and keep verdicts") {
    val goodText = (1 to 60).map(i => s"word$i").mkString(" ") + " the of" // 62 words, all alpha
    val docs = Seq(
      (1L, goodText),                                   // passes every rule
      (2L, "the of and that"),                          // only 4 words → word-count fail
      (3L, goodText + " " + Seq.fill(10)("###").mkString(" ")), // symbol ratio 30/72 > 0.1
      (4L, "the of start\n- bullet a\n- bullet b\n" + // 2/4 bullet lines: ok (≤0.9)
        (1 to 50).map(i => s"item$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = CurationOps.gopherQualitySignals(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getInt(7), r.getBoolean(8)))
      .toMap
    assert(got(1L)._1 == 62 && got(1L)._6, s"doc1: ${got(1L)}")
    assert(got(2L)._1 == 4 && !got(2L)._6)
    assert(got(3L)._3 > 0.1 && !got(3L)._6, s"doc3: ${got(3L)}")
    assert(got(4L)._4 == 0.5 && got(4L)._6, s"doc4: ${got(4L)}")
    // zero-word edge: empty text must yield zeros, not nulls
    val empty = CurationOps.gopherQualitySignals(Seq((9L, "")).toDF("doc_id", "text"), "text", "doc_id")
      .collect().head
    assert(empty.getInt(1) == 0 && empty.getDouble(2) == 0.0 && !empty.getBoolean(8))
  }

  test("c4Filter: line punctuation/word rules, page flags, sentence threshold") {
    val docs = Seq(
      (1L, "Good opening line.\nshort.\nno punct at all\nThree more words here! And then? Plus a closer. Extra one."),
      (2L, "Only one sentence here.\nrest has no punctuation"),
      (3L, "A fine page overall. With sentences! Right? Even more. And more.\nbut lorem ipsum appears"),
      (4L, "Code page with braces. One { two. Three! Four? Five. Six.")
    ).toDF("doc_id", "text")
    val got = CurationOps.c4Filter(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    // doc 1: "short." has <3 words, "no punct" line dropped → 2 kept lines, 5 sentences → keep
    assert(got(1L) == (("Good opening line.\nThree more words here! And then? Plus a closer. Extra one.", 2, 5, false, true)))
    // doc 2: 1 kept line, 1 sentence < 5 → dropped
    assert(got(2L)._3 == 1 && !got(2L)._5)
    // doc 3: enough sentences but lorem ipsum → flagged
    assert(got(3L)._3 == 5 && got(3L)._4 && !got(3L)._5)
    // doc 4: brace → flagged even with 6 sentences
    assert(got(4L)._4 && !got(4L)._5)
  }

  test("dsirWeights: target-like docs outrank off-distribution docs; partition-invariant") {
    val docs = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "alpha beta gamma delta" else "omega psi chi phi"))
      .toDF("doc_id", "text")
    val target = Seq("alpha beta gamma delta", "alpha beta gamma").toDF("t")
    val got = CurationOps.dsirWeights(docs, "text", "doc_id", target, "t")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // 4 tokens → 4 unigrams + 3 bigrams
    assert(got(2L)._1 == 7 && got(1L)._1 == 7)
    assert(got(2L)._2 > got(1L)._2, s"target-like ${got(2L)} must outrank ${got(1L)}")
    // every even doc identical, every odd doc identical
    assert((2L to 40L by 2).map(got(_)._2).distinct.size == 1)
    // partition invariance (the micro-nat quantization makes sums exact)
    val again = CurationOps.dsirWeights(docs.repartition(7), "text", "doc_id", target, "t")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(again == got)
  }

  test("lmCrossEntropy: target-like text scores LOW; counts and edges exact") {
    val docs = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "alpha beta gamma delta" else "omega psi chi phi")) ++
      Seq((41L, "solo"), (42L, ""))
    val df = docs.toDF("doc_id", "text")
    val target = Seq("alpha beta gamma delta", "alpha beta gamma").toDF("t")
    val got = CurationOps.lmCrossEntropy(df, "text", "doc_id", target, "t")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // 4 tokens → 3 bigrams; target-like docs have LOWER cross-entropy
    assert(got(2L)._1 == 3 && got(1L)._1 == 3)
    assert(got(2L)._2 < got(1L)._2, s"target-like ${got(2L)} must beat ${got(1L)}")
    // hand-check the smoothed model: "alpha beta"/"beta gamma" seen 2x in
    // target with context count 2, "gamma delta" 1x with context count 1;
    // an unseen bigram from an unseen context costs exactly ln(B)
    val B = 10000.0
    def q(x: Double): Long = math.round(math.log(x) * 1e6)
    val expSeen = (2 * (q(2 + B) - q(3)) + (q(1 + B) - q(2))) / 3.0 / 1e6
    assert(math.abs(got(2L)._2 - expSeen) < 1e-4, s"got ${got(2L)._2} want ~$expSeen")
    assert(math.abs(got(1L)._2 - math.log(B)) < 1e-4)
    // <2 tokens → no bigrams → (0, 0.0)
    assert(got(41L) == ((0, 0.0)) && got(42L) == ((0, 0.0)))
    // partition invariance (Long micro-nat sums are exact)
    val again = CurationOps.lmCrossEntropy(df.repartition(7), "text", "doc_id", target, "t")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(again == got)
    // scale shape: both model tables attach as BROADCAST joins — the corpus
    // stream must never shuffle on the bigram key
    val plan = CurationOps.lmCrossEntropy(df, "text", "doc_id", target, "t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("curationFunnel: one-pass stage counts agree with the per-doc views") {
    val docs = Seq(
      (1L, "Good opening line.\n" + (1 to 60).map(i => s"word$i").mkString(" ") +
        " the of ends here! And then? Plus a closer. Extra one."),
      (2L, "short doc."),
      (3L, "contains lorem ipsum. " + (1 to 60).map(i => s"tok$i").mkString(" ") +
        " the of. More here! Done now? Yes. Final."),
      (4L, "short doc.") // exact duplicate of doc 2
    ).toDF("doc_id", "text")
    val got = CurationOps.curationFunnel(docs, "text").collect().head
    val gopher = CurationOps.gopherQualitySignals(docs, "text", "doc_id")
      .filter(col("keep")).count()
    val c4 = CurationOps.c4Filter(docs, "text", "doc_id").filter(col("keep")).count()
    assert(got.getLong(0) == 4)
    assert(got.getLong(1) == gopher, "funnel gopher count = per-doc view count")
    assert(got.getLong(2) == c4, "funnel c4 count = per-doc view count")
    assert(got.getLong(4) == 3, "docs 2 and 4 collapse")
    // the funnel is ONE scan: exactly one FileScan/LocalTableScan, no join
    val plan = CurationOps.curationFunnel(docs, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(1500))
  }

  test("normalizeText: typographic noise collapses, plain text untouched") {
    val cases = Seq(
      "“curly” and ‘single’" -> "\"curly\" and 'single'",
      "en – dash, em — dash" -> "en - dash, em - dash",
      "wait… what" -> "wait... what",
      "a b and c​d﻿" -> "a b and cd",
      "  padded   and  gappy  " -> "padded and gappy",
      "already clean text" -> "already clean text")
    val df = cases.map(_._1).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = df.select(col("id"), CurationOps.normalizeText(col("t")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i.toLong) == want, s"input: $in")
    }
  }

  test("normalizeText and canonical_url are idempotent (generated samples, one pass)") {
    val gen = new scala.util.Random(11)
    val specials = "‘’“”–—…  ​﻿#.!?-\"'"
    val texts = (0 until 300).map { _ =>
      (0 until gen.nextInt(40)).map { _ =>
        if (gen.nextBoolean()) ('a' + gen.nextInt(26)).toChar
        else specials(gen.nextInt(specials.length))
      }.mkString
    }
    val urls = (0 until 300).map { i =>
      val scheme = if (i % 2 == 0) "http" else "HTTPS"
      val port = Seq("", ":80", ":443", ":8080")(i % 4)
      val q = Seq("", "?b=2&a=1", "?utm_source=x&a=1", "?utm_campaign=y")(i % 4)
      val frag = if (i % 3 == 0) "#frag" else ""
      s"$scheme://Host${i % 7}.Example.com$port/p$i$q$frag"
    }
    val df = texts.zip(urls).zipWithIndex
      .map { case ((t, u), i) => (i.toLong, t, u) }.toDF("id", "t", "u")
    val once = df.select(col("id"),
      CurationOps.normalizeText(col("t")).as("t1"),
      graft.functions.canonical_url(col("u")).as("u1"))
    val twice = once.select(col("id"),
      CurationOps.normalizeText(col("t1")).as("t2"),
      graft.functions.canonical_url(col("u1")).as("u2"))
    val joined = once.join(twice, "id").collect()
    joined.foreach { r =>
      assert(r.getString(1) == r.getString(3), s"normalize not idempotent: '${r.getString(1)}'")
      assert(r.getString(2) == null && r.getString(4) == null ||
        r.getString(2) == r.getString(4), s"canonical_url not idempotent: '${r.getString(2)}'")
    }
  }

  test("urlBlocklistFilter: domain boundary, subdomains, substrings, null urls") {
    val docs = Seq(
      (1L, "http://spam.example/x"),          // exact blocked domain
      (2L, "http://a.b.spam.example/x"),      // nested subdomain
      (3L, "http://notspam.example/x"),       // suffix WITHOUT dot boundary: survives
      (4L, "http://ok.example/tag/9"),        // blocked path fragment
      (5L, "http://ok.example/TAG/9"),        // case-insensitive substring
      (6L, "http://ok.example/article/9"),    // clean
      (7L, "not a url at all"),               // null host: survives (quarantine is B8's job)
      (8L, null.asInstanceOf[String])         // NULL url: contains(NULL,…) is NULL — a
                                              // non-null-safe predicate would silently drop it
    ).toDF("id", "url")
    val kept = CurationOps.urlBlocklistFilter(docs, "url",
      blockedDomains = Seq("SPAM.example"), blockedSubstrings = Seq("/tag/"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 6L, 7L, 8L))
  }

  test("redactPii: emails, IPv4, phone runs → placeholders; clean text untouched") {
    val cases = Seq(
      "write to john.doe+x@sub.example.org today" -> "write to [EMAIL] today",
      "server at 192.168.0.1 rebooted" -> "server at [IP] rebooted",
      "call +44 (0) 20-7946 0958 now" -> "call [PHONE] now",
      "mixed a@b.co and 10.0.0.7 and +1 555 010 99" -> "mixed [EMAIL] and [IP] and [PHONE]",
      "no pii in plain words" -> "no pii in plain words",
      "version 1.2 costs 42 dollars" -> "version 1.2 costs 42 dollars")
    val df = cases.map(_._1).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = df.select(col("id"), CurationOps.redactPii(col("t")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i.toLong) == want, s"input: $in")
    }
  }

  test("hostProfile: dup share, token mass, short-doc count per host; null hosts dropped") {
    val docs = Seq(
      ("https://h0.example/1", "dup text"),
      ("https://h0.example/2", "dup text"),
      ("https://h0.example/3", "a b c d e f"),
      ("https://h1.example/1", "x"),
      ("not a url", "dropped row")
    ).toDF("url", "text")
    val got = CurationOps.hostProfile(docs, "url", "text")
      .collect().map(r => r.getAs[String]("host") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_unique"), r.getAs[Long]("dup_rows"),
          r.getAs[Long]("dup_permille"), r.getAs[Long]("tokens_total"),
          r.getAs[Long]("short_docs"))).toMap
    assert(got == Map(
      "h0.example" -> ((3L, 2L, 1L, 333L, 10L, 2L)),
      "h1.example" -> ((1L, 1L, 0L, 0L, 1L, 1L))), got.toString)
  }

  test("tokenBudgetMix: budgets never exceeded, prefix rule, unweighted domains dropped") {
    val docs = spark.range(600).select(col("id").as("doc_id"),
      concat(lit("d"), (col("id") % 3).cast("string")).as("dom"),
      (col("id") % 7 * 10 + 10).as("cost"))
    val w = Seq("d0" -> 500L, "d1" -> 250L, "d2" -> 0L)
    val got = CurationOps.tokenBudgetMix(docs, "doc_id", "dom", "cost", w, budget = 4000L)
    val perDom = got.groupBy("dom").agg(sum("cost").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // targets: d0 → 2000, d1 → 1000, d2 → 0 (zero weight drops everything)
    assert(perDom.keySet == Set("d0", "d1"), perDom.toString)
    assert(perDom("d0")._1 <= 2000 && perDom("d1")._1 <= 1000, perDom.toString)
    // prefix rule: sum + the NEXT doc in permutation order would overflow —
    // each domain's kept mass sits within one max-cost doc of its target
    assert(perDom("d0")._1 > 2000 - 70 && perDom("d1")._1 > 1000 - 70, perDom.toString)
    // a domain in the weight list but absent from the data contributes nothing
    val gotExtra = CurationOps.tokenBudgetMix(docs, "doc_id", "dom", "cost",
      w :+ ("ghost" -> 250L), budget = 4000L)
    assert(gotExtra.filter(col("dom") === "ghost").count() == 0)
  }

  test("tokenBudgetMix: negative costs clamp to 0 — the running sum stays monotone") {
    // an un-clamped negative cost made the running sum non-monotone, so rows
    // AFTER the budget boundary could re-enter under the target, silently
    // breaking the longest-prefix guarantee (r07 advice)
    val docs = spark.range(100).select(col("id").as("doc_id"), lit("d0").as("dom"),
      when(col("id") % 4 === 0, lit(-1000L)).otherwise(lit(10L)).as("cost"))
    val got = CurationOps.tokenBudgetMix(docs, "doc_id", "dom", "cost",
      Seq("d0" -> 1000L), budget = 300L) // target 300
    val rows = got.collect().map(r => r.getAs[Long]("doc_id")).toSet
    // clamped reference: the PREFIX rule — a running sum over every row in
    // splitmix64(doc_id ^ seed) order, row admitted while the clamped
    // cumulative (including its own cost) stays <= 300
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val ordered = (0L until 100L).map(id => (mix(id ^ 0x5eedL), id)).sortBy(identity)
    var cum = 0L
    val expect = scala.collection.mutable.Set.empty[Long]
    ordered.foreach { case (_, id) =>
      val c = math.max(0L, if (id % 4 == 0) -1000L else 10L)
      cum += c
      if (cum <= 300L) expect += id
    }
    assert(rows == expect.toSet, s"got ${rows.size}, expect ${expect.size}")
    // positive-cost mass admitted never exceeds the target
    val kept = got.filter(col("cost") > 0).agg(sum("cost")).collect()(0).getLong(0)
    assert(kept <= 300L)
  }

  test("tokenBudgetMix is bucket-count-invariant and partition-invariant") {
    val docs = spark.range(500).select(col("id").as("doc_id"),
      concat(lit("d"), (col("id") % 2).cast("string")).as("dom"),
      (col("id") % 5 * 3 + 1).as("cost"))
    val w = Seq("d0" -> 600L, "d1" -> 400L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(CurationOps.tokenBudgetMix(docs, "doc_id", "dom", "cost", w, 1000L))
    val b = ids(CurationOps.tokenBudgetMix(docs, "doc_id", "dom", "cost", w, 1000L, buckets = 1))
    val c = ids(CurationOps.tokenBudgetMix(docs, "doc_id", "dom", "cost", w, 1000L, buckets = 4096))
    val d = ids(CurationOps.tokenBudgetMix(docs.repartition(13), "doc_id", "dom", "cost", w, 1000L))
    assert(a == b && a == c && a == d,
      s"two-level prefix sum must be bucket/partition-invariant: ${a.size}/${b.size}/${c.size}/${d.size}")
    assert(a.nonEmpty)
  }

  test("stratifiedSample is deterministic, partition-invariant, and ~pct sized") {
    val docs = spark.range(10000).select(col("id").as("doc_id"), (col("id") % 3).as("lang"))
    val a = CurationOps.stratifiedSample(docs, "doc_id", 30).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = CurationOps.stratifiedSample(docs.repartition(13), "doc_id", 30).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "same keep-set under any partitioning")
    assert(math.abs(a.size - 3000) < 300, s"~30% expected, got ${a.size}")
    assert(CurationOps.stratifiedSample(docs, "doc_id", 0).count() == 0)
    assert(CurationOps.stratifiedSample(docs, "doc_id", 100).count() == 10000)
  }
}
