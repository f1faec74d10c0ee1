package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.ops.CurationOps

/**
 * The post-extraction curation stage as ONE runnable job — the published
 * pipeline composition (CCNet / C4 / Gopher / RefinedWeb order), each stage
 * applied to the survivors of the previous one:
 *
 *   1. unicode normalization (per-row)
 *   2. canonical-url dedup (first doc per canonical url)
 *   3. exact content dedup on the text digest (among url survivors)
 *   4. per-row quality gates (Gopher ∧ C4, on normalized text)
 *   5. per-host cap (among quality survivors)
 *   6. deterministic splitmix sampling
 *   7. CCNet line-level dedup applied to the final survivors' text
 *
 * Scale shape: stages 1-6 are FLAG COLUMNS over one frame — conditional
 * membership composes through windows (`min(when(prev_keep, id))` over the
 * stage key gives the stage's keeper among prior survivors; a conditional
 * running count gives the host cap) — so the whole funnel is computed in one
 * plan: per-stage counts are ONE aggregation job (never a count() action per
 * stage), and the curated output is a filter on the same frame. Only the
 * line-dedup rewrite (stage 7, a text transform, not a row filter) runs as
 * its own shuffling pass over the already-curated subset.
 */
object CurationPipeline {

  final case class Result(curated: DataFrame, funnel: DataFrame)

  /** `docs` must carry (idCol: long-castable, urlCol, textCol). `gates`
    * picks the quality rule sets ("gopher", "c4", both, or empty) — the
    * published pipelines differ exactly here (C4's terminal-punctuation line
    * rule deletes punctuation-free corpora outright; Gopher's doesn't). */
  def run(docs: DataFrame, textCol: String, idCol: String, urlCol: String,
          hostCapK: Int = 100000, samplePct: Int = 100,
          gates: Set[String] = Set("gopher", "c4")): Result = {
    val norm = CurationOps.normalizeText(col(textCol))
    val base = docs.select(
      col(idCol).as("_id"),
      col(urlCol).as("_url"),
      norm.as("_text"),
      coalesce(canonical_url(col(urlCol)), col(urlCol)).as("_curl"),
      url_host(col(urlCol)).as("_host"))
      .withColumn("_digest", text_digest(col("_text")))

    val urlW = Window.partitionBy(col("_curl"))
    val digW = Window.partitionBy(col("_digest"))
    val quality = Seq(
      if (gates.contains("gopher")) Some(gopherKeep(col("_text"))) else None,
      if (gates.contains("c4")) Some(c4Keep(col("_text"))) else None)
      .flatten.reduceOption(_ && _).getOrElse(lit(true))
    val hostW = Window.partitionBy(col("_host")).orderBy(col("_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val flagged = base
      .withColumn("_url_keep", col("_id") === min(col("_id")).over(urlW))
      // exact-dup keeper AMONG url survivors: min id with _url_keep per digest
      .withColumn("_dig_keep", col("_url_keep") &&
        col("_id") === min(when(col("_url_keep"), col("_id"))).over(digW))
      .withColumn("_q_keep", col("_dig_keep") && quality)
      // conditional running count of quality survivors per host ⇒ cap without
      // a row_number that would miscount dropped rows
      .withColumn("_host_keep", col("_q_keep") &&
        sum(when(col("_q_keep"), 1L).otherwise(0L)).over(hostW) <= hostCapK)
      .withColumn("_keep", col("_host_keep") &&
        pmod(splitmix64(col("_id").cast("long").bitwiseXOR(lit(0x5eedL))), lit(100)) < samplePct)

    val funnel = flagged.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("_url_keep"), 1L).otherwise(0L)).as("n_after_url_dedup"),
      sum(when(col("_dig_keep"), 1L).otherwise(0L)).as("n_after_exact_dedup"),
      sum(when(col("_q_keep"), 1L).otherwise(0L)).as("n_after_quality"),
      sum(when(col("_host_keep"), 1L).otherwise(0L)).as("n_after_host_cap"),
      sum(when(col("_keep"), 1L).otherwise(0L)).as("n_curated"))

    val survivors = flagged.filter(col("_keep"))
      .select(col("_id"), col("_url"), col("_text"))
    val curated = CurationOps.dropDuplicatedLines(survivors, "_text", "_id")
      .join(survivors.select(col("_id"), col("_url")), Seq("_id"))
      .select(col("_id").as(idCol), col("_url").as(urlCol),
        col("text_deduped").as(textCol))
    Result(curated, funnel)
  }

  // the exact rule expressions the q55/q56 oracles pin — shared builders in
  // CurationOps, so the job's gates can never drift from the audited views
  private def gopherKeep(txt: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    CurationOps.gopherCols(txt).toMap.apply("keep")

  private def c4Keep(txt: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    CurationOps.c4Cols(txt, Seq("lorem ipsum")).toMap.apply("keep")
}
