package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.text.TextHash

/** Codegen entry points (string in, primitive/array out — no boxing in eval). */
object TextExprRuntime {
  def simhash64(s: UTF8String): Long = TextHash.simhash64(s.toString)
  def rollingFingerprint(s: UTF8String, n: Int): Long =
    TextHash.rollingFingerprint(s.toString, n)

  /** Deflater is allocated per call and `end()`ed — native zlib memory must
    * not wait for GC on a corpus-sized scan. */
  def deflateLen(bytes: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** 64-bit SimHash of whitespace-tokenized text (near-dup fingerprint). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextExprRuntime.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextExprRuntime.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature (numHashes values over token shingleSize-shingles). */
case class MinHashSig(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.minhash(input.asInstanceOf[UTF8String].toString, numHashes, shingleSize))
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** LSH band keys from text directly (minhash + banding fused). */
case class MinHashBands(child: Expression, numHashes: Int, shingleSize: Int, rowsPerBand: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val sig = TextHash.minhash(input.asInstanceOf[UTF8String].toString, numHashes, shingleSize)
    new GenericArrayData(TextHash.bandKeys(sig, rowsPerBand))
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** MinHash signature AND its LSH band keys from ONE hashing pass:
  * struct(sig: array<long>, bands: array<long>). nearDupPairs needs both —
  * bands for the candidate join, sig for the estimate on survivors — and
  * computing them as two expressions hashes the full corpus twice (the
  * dominant cost of every minhash query at scale). */
case class MinHashSigBands(child: Expression, numHashes: Int, shingleSize: Int, rowsPerBand: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("bands", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val sig = TextHash.minhash(input.asInstanceOf[UTF8String].toString, numHashes, shingleSize)
    org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(sig), new GenericArrayData(TextHash.bandKeys(sig, rowsPerBand)))
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSigBands =
    copy(child = newChild)
}

/** Exact token-shingle Jaccard between two texts (the verifier behind MinHash
  * candidates — run only on LSH-bucketed pairs, never O(n²)). */
case class ShingleJaccard(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any =
    TextHash.shingleJaccard(l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.text.TextHash.shingleJaccard($a.toString(), $b.toString(), $k)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ShingleJaccard =
    copy(left = newLeft, right = newRight)
}

/** Winnowing-style rolling fingerprint (min rolling hash over token n-grams). */
/** All token n-gram hashes in order (strict windows: < n tokens → empty) —
  * the corpus side of decontamination joins and per-doc repetition stats. */
case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.ngramHashes(input.asInstanceOf[UTF8String].toString, n))
  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/** Real BPE tokenization against an explicit merge table (graft.text.Bpe):
  * the merge list rides the plan as a constant; ranks build once per
  * executor. Returns every token of the whitespace-split text, in order. */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val ranks = graft.text.Bpe.ranksOf(merges)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(graft.text.Bpe.tokenize(input.asInstanceOf[UTF8String].toString, ranks)
      .map(t => UTF8String.fromString(t): Any))
  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

/** Whitespace tokens under the TextHash.tokenBounds contract — the position
  * source for every op that must align token indices with ngram_hashes
  * window positions (EXACTSUBSTR removal). */
case class WsTokens(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.wsTokens(input.asInstanceOf[UTF8String].toString)
      .map(t => UTF8String.fromString(t): Any))
  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

/** Language identification: struct(lang, score_micro) from the embedded
  * char-bigram Naive Bayes (graft.text.LangId). Integer micro-nat scores —
  * the DuckDB oracle replays a prediction from the interpolated model table
  * without ever computing a logarithm. The model is a JVM-wide singleton
  * (trains once per executor from the embedded seed corpus). */
case class LangIdExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("score_micro", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val (lang, score) = graft.text.LangId.classify(input.asInstanceOf[UTF8String].toString)
    org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(lang), score)
  }
  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** splitmix64 finalizer over a long column — the deterministic sampling key
  * (reproducible across runs and partitionings, unlike rand()). */
case class SplitMix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextHash.mix64(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextHash.mix64($c)")
  override protected def withNewChildInternal(newChild: Expression): SplitMix64 =
    copy(child = newChild)
}

case class RollingFingerprint(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextExprRuntime.rollingFingerprint(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextExprRuntime.rollingFingerprint($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** RFC 9309 robots.txt evaluation: is `path` fetchable for `agent` under
  * `robots`? (graft.text.RobotsTxt — group selection, wildcard/$ patterns,
  * longest-match-wins, Allow on ties.) */
case class RobotsAllowed(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(robots: Any, agent: Any, path: Any): Any =
    graft.text.RobotsTxt.isAllowed(
      robots.asInstanceOf[UTF8String].toString,
      agent.asInstanceOf[UTF8String].toString,
      path.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): RobotsAllowed =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** DEFLATE-compressed length of a byte payload (java.util.zip.Deflater,
  * level 6, raw/nowrap) — the compression-ratio quality signal several
  * published pipelines gate on: machine-generated repetition compresses
  * far below natural text, random gibberish barely compresses at all.
  * Deterministic for a given JDK's bundled zlib; oracles pin ratios as
  * plan-build constants from the SAME JVM (the q30 sketch-arm pattern),
  * never cross-engine recomputation. */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextExprRuntime.deflateLen(input.asInstanceOf[Array[Byte]])
  // scalar long out of byte[]: the static-call pattern keeps a corpus scan
  // with this signal inside whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextExprRuntime.deflateLen($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

/** Effective `Crawl-delay` for `agent` in MILLIS (RobotsTxt
  * .crawlDelayMillis — decimal seconds truncated to millis, 24 h cap, the
  * isAllowed group-selection rule); null when absent/invalid. */
case class RobotsCrawlDelay(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(robots: Any, agent: Any): Any =
    graft.text.RobotsTxt.crawlDelayMillis(
      robots.asInstanceOf[UTF8String].toString,
      agent.asInstanceOf[UTF8String].toString) match {
      case Some(ms) => ms
      case None => null
    }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsCrawlDelay =
    copy(left = newLeft, right = newRight)
}

/** `Sitemap:` directive urls of a robots.txt, file order (RobotsTxt
  * .sitemaps) — the robots-side half of sitemap discovery: a crawler that
  * fetched /robots.txt for the policy gate gets the site's sitemap urls
  * from the same payload for free. */
case class RobotsSitemaps(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(robots: Any): Any =
    new GenericArrayData(
      graft.text.RobotsTxt.sitemaps(robots.asInstanceOf[UTF8String].toString)
        .map(UTF8String.fromString(_): Any).toArray)
  override protected def withNewChildInternal(newChild: Expression): RobotsSitemaps =
    copy(child = newChild)
}
