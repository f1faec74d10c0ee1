package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Frequency-aware skew salting (SURVEY.md §4): a fixed salt fans EVERY host out,
 * fragmenting co-location for the long tail that never needed it. This variant
 * samples host frequencies, and salts only hosts whose share exceeds one
 * partition's worth of rows — each with a salt count proportional to its share.
 *
 * At the 100 TB tier the sample pass is a cheap column-pruned scan (host only);
 * the head-host map is tiny (zipf ⇒ O(10²) entries) and broadcast as a literal
 * map expression.
 */
object SkewSalting {

  /** Sampled per-host counts — the frame BOTH the total and the head filter
    * run over (persisted by headHostSalts so the two actions share one
    * sample+aggregate). Exposed for the spec that pins the driver-side
    * collect to the HEAD, not the distinct-host count. */
  private[graft] def sampledHostCounts(df: DataFrame, hostCol: Column,
                                       sampleFraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, sampleFraction, seed)
      .select(hostCol.as("_h")).groupBy(col("_h")).agg(count(lit(1)).as("_c"))

  /** The head slice: hosts whose sampled share exceeds 0.5/targetPartitions —
    * at most 2·targetPartitions rows BY CONSTRUCTION (shares sum to 1), which
    * is what makes the downstream collect safe at any corpus host count.
    * null hosts (malformed urls — url_host is total, not throwing) are
    * excluded here too: null is not a legal map key, and saltColumn spreads
    * them unconditionally instead. */
  private[graft] def headFrame(counts: DataFrame, total: Long, targetPartitions: Int): DataFrame =
    counts.filter(col("_h").isNotNull &&
      col("_c").cast("double") > lit(0.5 * total / targetPartitions))

  /** (host → saltCount) for hosts whose sampled share exceeds 1/targetPartitions.
    * Salt counts target chunks of ~1/(overPartition × targetPartitions) of the
    * data: chunks much smaller than a partition smooth out hash collisions when
    * (host, salt) keys land on partitions.
    *
    * The share threshold is applied IN-FRAME, below the aggregation and above
    * the collect: a Common-Crawl-shaped corpus has 10^7-10^8 distinct hosts,
    * and collecting the unfiltered count frame would materialize gigabytes on
    * the driver — the zipf-head argument only ever bounded the FILTERED set
    * (≤ 2·targetPartitions rows, shares sum to 1). */
  def headHostSalts(df: DataFrame, hostCol: Column, targetPartitions: Int,
                    sampleFraction: Double = 0.05, seed: Long = 7L,
                    overPartition: Int = 4): Map[String, Int] = {
    val counts = sampledHostCounts(df, hostCol, sampleFraction, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totRow = counts.agg(sum(col("_c"))).first()
      val total = math.max(1L, if (totRow.isNullAt(0)) 0L else totRow.getLong(0))
      headFrame(counts, total, targetPartitions).collect().flatMap { r =>
        val share = r.getLong(1).toDouble / total
        val salts = math.ceil(share * targetPartitions * overPartition).toInt
        if (salts > 1) Some(r.getString(0) -> salts) else None
      }.toMap
    } finally { counts.unpersist(blocking = false); () }
  }

  /** Salt column: pmod(xxhash64(url), salts(host)) for head hosts, 0 for the
    * tail (tail hosts stay fully co-located). NULL hosts — malformed urls —
    * always spread across nullHostSalts keys: an adversarial shard can be
    * mostly junk urls, and co-locating all of them would re-create the exact
    * skew the salting exists to prevent. */
  def saltColumn(url: Column, host: Column, headSalts: Map[String, Int],
                 nullHostSalts: Int = 8): Column = {
    val nullSpread = pmod(xxhash64(url), lit(nullHostSalts))
    if (headSalts.isEmpty) when(host.isNull, nullSpread).otherwise(lit(0))
    else {
      val m = map(headSalts.toSeq.flatMap { case (h, s) => Seq(lit(h), lit(s)) }: _*)
      val salts = coalesce(element_at(m, host), lit(1))
      when(host.isNull, nullSpread).otherwise(pmod(xxhash64(url), salts))
    }
  }
}
