package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.html.HtmlExtract
import graft.pdf.PdfExtract

/**
 * Static runtime entry points for codegen: the generated Java calls these
 * directly so string-output extraction stays inside whole-stage codegen
 * (SURVEY.md §4 — never `udf()` lambdas; nullSafeEval over Array[Byte] →
 * UTF8String, no boxing in the hot path).
 */
object ExprRuntime {
  def extractMainContent(html: Array[Byte]): UTF8String =
    UTF8String.fromString(HtmlExtract.extract(html))

  def parsePdfText(bytes: Array[Byte]): UTF8String =
    UTF8String.fromString(PdfExtract.text(bytes))

  /** Payload dispatch: "%PDF-" magic → PDF reconstructor, else HTML extractor
    * (reference magic check, security_validator.py:377). */
  def extractAny(bytes: Array[Byte]): UTF8String =
    if (PdfExtract.isPdfMagic(bytes)) parsePdfText(bytes)
    else extractMainContent(bytes)
}

/** Strip HTML boilerplate, return main-content text (HtmlExtract contract). */
case class ExtractMainContent(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    ExprRuntime.extractMainContent(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ExprRuntime.extractMainContent($c)")
  override protected def withNewChildInternal(newChild: Expression): ExtractMainContent =
    copy(child = newChild)
}

/** Layout-aware PDF text reconstruction (PdfExtract contract). */
case class ParsePdfText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    ExprRuntime.parsePdfText(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ExprRuntime.parsePdfText($c)")
  override protected def withNewChildInternal(newChild: Expression): ParsePdfText =
    copy(child = newChild)
}

/** Empty-user-password PDF decryption (PdfCrypto: standard security
  * handler, RC4 V1/V2): the clear bytes when the empty password opens the
  * file, NULL otherwise (not encrypted / unsupported scheme / a real
  * password) — `coalesce(pdf_decrypt(b), b)` is the recovery composition. */
case class PdfDecrypt(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    graft.pdf.PdfCrypto.tryDecrypt(input.asInstanceOf[Array[Byte]]).orNull
  override protected def withNewChildInternal(newChild: Expression): PdfDecrypt =
    copy(child = newChild)
}

/** Magic-byte dispatch: PDF payloads → ParsePdfText, anything else → ExtractMainContent. */
case class ExtractAnyText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    ExprRuntime.extractAny(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ExprRuntime.extractAny($c)")
  override protected def withNewChildInternal(newChild: Expression): ExtractAnyText =
    copy(child = newChild)
}

object ExtractBlocks {
  val elementType: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("words", IntegerType, nullable = false),
    StructField("link_words", IntegerType, nullable = false),
    StructField("is_content", BooleanType, nullable = false)
  ))
}

/** Per-block analysis of an HTML payload (debug/span analog of hOCR spans). */
case class ExtractBlocks(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(ExtractBlocks.elementType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val bs = HtmlExtract.blocks(input.asInstanceOf[Array[Byte]])
    new GenericArrayData(bs.map { b =>
      InternalRow(b.idx, UTF8String.fromString(b.tag), UTF8String.fromString(b.text),
        b.words, b.linkWords, b.isContent)
    }.toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): ExtractBlocks =
    copy(child = newChild)
}

object HtmlMetaExpr {
  val structType: StructType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("canonical", StringType, nullable = true),
    StructField("robots", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("og_title", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("refresh_url", StringType, nullable = true)
  ))
}

/** Head metadata from HTML bytes (HtmlMeta: canonical link, robots meta,
  * title/og:title/description, html lang) — the curation keys read BEFORE
  * content extraction; absent fields are null. */
case class HtmlMetaExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = HtmlMetaExpr.structType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val m = graft.html.HtmlMeta.parse(input.asInstanceOf[Array[Byte]])
    def u(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)
    InternalRow(u(m.title), u(m.canonical), u(m.robots), u(m.lang), u(m.ogTitle),
      u(m.description), u(m.refreshUrl))
  }
  override protected def withNewChildInternal(newChild: Expression): HtmlMetaExpr =
    copy(child = newChild)
}

/** Outlinks from HTML bytes resolved absolute against the page url
  * (HtmlLinks: RFC 3986 §5.2, http/https only, document order, hostile-input
  * capped) — the web link-graph edge extractor. */
case class ExtractLinks(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(html: Any, url: Any): Any =
    new GenericArrayData(
      graft.html.HtmlLinks.extract(html.asInstanceOf[Array[Byte]],
          url.asInstanceOf[UTF8String].toString)
        .map(l => UTF8String.fromString(l): Any))
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ExtractLinks =
    copy(left = newLeft, right = newRight)
}

/** RFC 3986 §5.2 resolution of a reference against a base url (HtmlLinks
  * .resolveUrl) — for refs that arrive outside an href: meta-refresh
  * targets, redirect locations. NULL when the result is not http(s). */
case class ResolveUrl(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(base: Any, ref: Any): Any = {
    val r = graft.html.HtmlLinks.resolveUrl(
      base.asInstanceOf[UTF8String].toString, ref.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ResolveUrl =
    copy(left = newLeft, right = newRight)
}

object FeedItems {
  val elementType: StructType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("link", StringType, nullable = true),
    StructField("date", StringType, nullable = true)))
}

/** RSS/Atom feed items (FeedExtract.items): title, link, date per item in
  * document order — feeds are content AND frontier in a web corpus. */
case class FeedItems(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FeedItems.elementType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    def u(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)
    new GenericArrayData(
      graft.html.FeedExtract.items(input.asInstanceOf[Array[Byte]])
        .map(it => InternalRow(u(it.title), u(it.link), u(it.date)): Any))
  }
  override protected def withNewChildInternal(newChild: Expression): FeedItems =
    copy(child = newChild)
}

object SitemapEntries {
  val elementType: StructType = StructType(Seq(
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true),
    StructField("changefreq", StringType, nullable = true),
    StructField("priority", StringType, nullable = true)))
}

/** XML sitemap entries (SitemapExtract.entries): loc, lastmod, changefreq,
  * priority per entry in document order — a site's own enumeration of its
  * fetchable urls, the third crawl-discovery channel. Index files
  * (`<sitemapindex>`) yield their child sitemap urls (changefreq/priority
  * null — the protocol defines none there). */
case class SitemapEntries(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(SitemapEntries.elementType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    def u(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)
    new GenericArrayData(
      graft.html.SitemapExtract.entries(input.asInstanceOf[Array[Byte]])
        .map(e => InternalRow(u(e.loc), u(e.lastmod), u(e.changefreq), u(e.priority)): Any))
  }
  override protected def withNewChildInternal(newChild: Expression): SitemapEntries =
    copy(child = newChild)
}

/** "urlset" | "sitemapindex" | null — the sitemap dispatch sniff
  * (SitemapExtract.kind). */
case class SitemapKind(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val k = graft.html.SitemapExtract.kind(input.asInstanceOf[Array[Byte]])
    if (k == null) null else UTF8String.fromString(k)
  }
  override protected def withNewChildInternal(newChild: Expression): SitemapKind =
    copy(child = newChild)
}

/** "rss" | "atom" | null — the feed dispatch sniff (FeedExtract.kind). */
case class FeedKind(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val k = graft.html.FeedExtract.kind(input.asInstanceOf[Array[Byte]])
    if (k == null) null else UTF8String.fromString(k)
  }
  override protected def withNewChildInternal(newChild: Expression): FeedKind =
    copy(child = newChild)
}

/** Raw JSON-LD block texts from HTML bytes (JsonLd.blocks — document order,
  * hostile-input capped); parse with Spark's from_json downstream. */
case class LdJsonBlocks(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      graft.html.JsonLd.blocks(input.asInstanceOf[Array[Byte]])
        .map(b => UTF8String.fromString(b): Any))
  override protected def withNewChildInternal(newChild: Expression): LdJsonBlocks =
    copy(child = newChild)
}

object HtmlAnchors {
  val elementType: StructType = StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("nofollow", BooleanType, nullable = false)))
}

/** (resolved href, anchor text, nofollow) structs — anchor text is the
  * retrieval-signal side of the link graph, nofollow the endorsement flag
  * PageRank-style consumers exclude edges on (HtmlLinks.extractWithText). */
case class HtmlAnchors(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(HtmlAnchors.elementType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(html: Any, url: Any): Any =
    new GenericArrayData(
      graft.html.HtmlLinks.extractWithText(html.asInstanceOf[Array[Byte]],
          url.asInstanceOf[UTF8String].toString)
        .map { a =>
          InternalRow(UTF8String.fromString(a.href), UTF8String.fromString(a.text),
            a.nofollow): Any
        })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HtmlAnchors =
    copy(left = newLeft, right = newRight)
}

object ParsePdfSpans {
  /** hOCR word-span analog: (page, bbox, word) — reference ocr_combined.py:73-82. */
  val elementType: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("x1", IntegerType, nullable = false),
    StructField("y1", IntegerType, nullable = false),
    StructField("x2", IntegerType, nullable = false),
    StructField("y2", IntegerType, nullable = false),
    StructField("word", StringType, nullable = false)
  ))
}

case class ParsePdfSpans(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(ParsePdfSpans.elementType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val ss = PdfExtract.spans(input.asInstanceOf[Array[Byte]])
    new GenericArrayData(ss.map { s =>
      InternalRow(s.page, s.x1, s.y1, s.x2, s.y2, UTF8String.fromString(s.word))
    }.toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): ParsePdfSpans =
    copy(child = newChild)
}

/** hOCR word spans (the reference's literal core operator,
  * ocr_combined.py:73-82): `ocrx_word` spans with bbox from the title
  * attribute and page from the enclosing ocr_page/parent id. Same element
  * type as ParsePdfSpans — hOCR input and PDF reconstruction meet in one
  * span schema. */
case class ParseHocrSpans(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(ParsePdfSpans.elementType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val ss = graft.html.HocrParse.spans(input.asInstanceOf[Array[Byte]])
    new GenericArrayData(ss.map { s =>
      InternalRow(s.page, s.x1, s.y1, s.x2, s.y2, UTF8String.fromString(s.word))
    }.toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): ParseHocrSpans =
    copy(child = newChild)
}

object ExtractDoc {
  /** struct(text, spans, error): single-parse fused extraction (PDF text +
    * hOCR-analog spans from one content-stream interpretation; HTML → text +
    * empty spans). `error` is null on success, else a stable failure category
    * (error_handler.py:305-325 analog) — a malformed-but-valid-magic payload
    * must be distinguishable from a genuinely empty document. */
  val structType: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("spans", ArrayType(ParsePdfSpans.elementType, containsNull = false), nullable = false),
    StructField("error", StringType, nullable = true)
  ))
}

case class ExtractDoc(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ExtractDoc.structType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (PdfExtract.isPdfMagic(bytes)) {
      val o = PdfExtract.outcome(bytes)
      InternalRow(UTF8String.fromString(o.text), new GenericArrayData(o.spans.map { s =>
        InternalRow(s.page, s.x1, s.y1, s.x2, s.y2, UTF8String.fromString(s.word))
      }.toArray[Any]),
        if (o.error == null) null else UTF8String.fromString(o.error))
    } else {
      try InternalRow(ExprRuntime.extractMainContent(bytes),
        new GenericArrayData(Array.empty[Any]), null)
      catch { case e: Exception =>
        InternalRow(UTF8String.EMPTY_UTF8, new GenericArrayData(Array.empty[Any]),
          UTF8String.fromString("html_" + graft.ErrorClass.classify(e)))
      }
    }
  }
  override protected def withNewChildInternal(newChild: Expression): ExtractDoc =
    copy(child = newChild)
}

object PdfPreflightExpr {
  /** ValidationResult analog (security_validator.py:21-44, 370-461). */
  val structType: StructType = StructType(Seq(
    StructField("is_pdf", BooleanType, nullable = false),
    StructField("version", StringType, nullable = false),
    StructField("encrypted", BooleanType, nullable = false),
    StructField("embedded", BooleanType, nullable = false),
    StructField("suspicious", BooleanType, nullable = false),
    StructField("issues", ArrayType(StringType, containsNull = false), nullable = false)
  ))
}

case class PdfPreflightExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = PdfPreflightExpr.structType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val p = PdfExtract.preflight(input.asInstanceOf[Array[Byte]])
    InternalRow(p.isPdf, UTF8String.fromString(p.version), p.encrypted, p.embedded,
      p.suspicious,
      new GenericArrayData(p.issues.map(UTF8String.fromString).toArray[Any]))
  }
  override protected def withNewChildInternal(newChild: Expression): PdfPreflightExpr =
    copy(child = newChild)
}
