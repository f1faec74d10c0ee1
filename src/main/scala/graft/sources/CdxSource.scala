package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types._

/**
 * CDXJ capture-index source (the public Common Crawl / Internet Archive
 * index line format: `<SURT key> <14-digit timestamp> <JSON>`). A crawl
 * corpus at scale is addressed THROUGH its index — which urls are captured,
 * where each record sits inside which WARC — so the index is both a fetch
 * planner's input (offset/length/filename point `WarcSource` at records)
 * and a ready-made seen-set for `FrontierOps` (the `url` column anti-joins
 * as-is).
 *
 * Spark-first shape: `spark.read.text` (splittable for plain text,
 * file-per-task for `.gz` — exactly the WARC parallelism story), then pure
 * built-ins — `split(limit=3)` + `from_json` — so parsing stays inside
 * whole-stage codegen with no custom expression at all. Hostile lines
 * (blank, the classic-CDX ` CDX` header, truncated, malformed JSON) yield
 * null fields, never a throw: `get()` is out-of-bounds-null and the numeric
 * casts are digit-guarded (ANSI-safe).
 */
object CdxSource {

  /** The CC-index JSON payload: every value arrives as a JSON string (the
    * public index convention), so the schema is all-strings and typed
    * columns are derived with guarded casts in [[entries]]. */
  val metaSchema: StructType = StructType(Seq(
    StructField("url", StringType), StructField("mime", StringType),
    StructField("status", StringType), StructField("digest", StringType),
    StructField("length", StringType), StructField("offset", StringType),
    StructField("filename", StringType), StructField("languages", StringType),
    StructField("encoding", StringType)))

  /** Parse one CDXJ line into struct(surt_key, ts, meta) — exposed as a
    * Column function so in-query fixtures and file reads share one parse. */
  def parseLine(line: Column): Column = {
    val p = F.split(line, " ", 3)
    F.struct(
      F.get(p, F.lit(0)).as("surt_key"),
      F.get(p, F.lit(1)).as("ts"),
      F.from_json(F.get(p, F.lit(2)), metaSchema).as("meta"))
  }

  private def longOrNull(c: Column): Column =
    F.when(c.rlike("^-?[0-9]{1,18}$"), c.cast("long"))

  // int-bound digit guard: 9 digits max 999,999,999 < Int.MaxValue, so the
  // cast can never overflow. The previous longOrNull(...).cast("int") passed
  // 10-18 digit values through the rlike and THREW CAST_OVERFLOW under ANSI
  // on e.g. status "9999999999" — contradicting the null-never-throw totality
  private def intOrNull(c: Column): Column =
    F.when(c.rlike("^-?[0-9]{1,9}$"), c.cast("int"))

  /** Typed projection of parsed lines (shared by [[entries]] and in-query
    * fixture parses): line → one row per capture. `keep` columns pass
    * through ahead of the parsed ones. */
  def project(lines: DataFrame, lineCol: String, keep: Seq[String] = Nil): DataFrame = {
    val e = parseLine(F.col(lineCol))
    lines.select(keep.map(F.col) ++ Seq(
      e.getField("surt_key").as("surt_key"),
      e.getField("ts").as("ts"),
      e.getField("meta").getField("url").as("url"),
      e.getField("meta").getField("mime").as("mime"),
      intOrNull(e.getField("meta").getField("status")).as("status"),
      e.getField("meta").getField("digest").as("digest"),
      longOrNull(e.getField("meta").getField("length")).as("length"),
      longOrNull(e.getField("meta").getField("offset")).as("offset"),
      e.getField("meta").getField("filename").as("filename")): _*)
  }

  /** Read `*.cdx(j)[.gz]` files into one row per capture. Blank lines and
    * the classic-CDX ` CDX …` header line are dropped; everything else
    * parses best-effort (null fields on malformation). */
  def entries(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
    project(
      raw.filter(F.length(F.trim(F.col("value"))) > 0 &&
        !F.col("value").startsWith(" ")),
      "value")
  }
}
