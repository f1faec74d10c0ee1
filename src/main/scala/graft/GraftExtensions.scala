package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr._

/**
 * SparkSessionExtensions hook: registers the engine's Catalyst expressions as
 * SQL functions, so `spark.sql("SELECT graft_extract_any_text(html) ...")` works
 * from any client (incl. pyspark) with
 * `--conf spark.sql.extensions=graft.GraftExtensions`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name),
        builder))
    }
}

object GraftExtensions {

  private def one(build: Expression => Expression): Seq[Expression] => Expression =
    args => {
      require(args.length == 1, "expects exactly 1 argument")
      build(args.head)
    }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_extract_main_content" -> one(ExtractMainContent.apply),
    "graft_parse_pdf_text" -> one(ParsePdfText.apply),
    "graft_extract_any_text" -> one(ExtractAnyText.apply),
    "graft_extract_blocks" -> one(ExtractBlocks.apply),
    "graft_parse_pdf_spans" -> one(ParsePdfSpans.apply),
    "graft_parse_hocr_spans" -> one(ParseHocrSpans.apply),
    "graft_extract_doc" -> one(ExtractDoc.apply),
    "graft_pdf_preflight" -> one(PdfPreflightExpr.apply),
    "graft_simhash64" -> one(SimHash64.apply),
    "graft_rolling_fingerprint" -> one(RollingFingerprint(_, 8)),
    "graft_minhash_sig" -> one(MinHashSig(_, 64, 3)),
    "graft_minhash_bands" -> one(MinHashBands(_, 64, 3, 8)),
    "graft_minhash_sig_bands" -> one(MinHashSigBands(_, 64, 3, 8)),
    "graft_media_sniff" -> one(MediaSniffExpr.apply),
    "graft_media_features" -> one(MediaFeatures.apply),
    "graft_av_meta" -> one(AvMetaExpr.apply),
    "graft_feed_items" -> one(FeedItems.apply),
    "graft_sitemap_entries" -> one(SitemapEntries.apply),
    "graft_sitemap_kind" -> one(SitemapKind.apply),
    "graft_robots_sitemaps" -> one(RobotsSitemaps.apply),
    "graft_deflate_len" -> one(DeflateLen.apply),
    "graft_html_meta" -> one(HtmlMetaExpr.apply),
    "graft_exif_meta" -> one(ExifMetaExpr.apply),
    "graft_image_dhash" -> one(ImageDhash.apply),
    "graft_lang_id" -> one(LangIdExpr.apply),
    "graft_pdf_decrypt" -> one(PdfDecrypt.apply)
  )

  /** Direct registration into an existing session (spark.sql.extensions is a
    * *static* conf bound at SparkContext creation — this path works anywhere). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
