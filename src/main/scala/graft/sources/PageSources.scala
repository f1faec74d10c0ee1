package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Input sources for the pipeline (SURVEY.md §2-A):
 *  - pagesTable: the canonical Iceberg-style parquet table of PageRow
 *  - binaryDir: the reference's recursive directory scan
 *    (`glob("**&#47;*.pdf")`, ocr_combined.py:238-240) via Spark's binaryFile
 *    source — lazily streamed file splits, pushdown on path glob, no driver
 *    directory walk
 */
object PageSources {

  def pagesTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Recursive (or flat) scan of *.pdf / *.html files as PageRow-shaped rows:
    * url = file path, warc_ts = modificationTime, html = content bytes,
    * text = null, lang = default. */
  def binaryDir(spark: SparkSession, dir: String, glob: String = "*.{pdf,html}",
                recursive: Boolean = true, defaultLang: String = "heb+eng"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", recursive.toString)
      .load(dir)
      .select(
        col("path").as("url"),
        col("modificationTime").as("warc_ts"),
        col("content").as("html"),
        lit(null).cast("string").as("text"),
        lit(defaultLang).as("lang"))
}
