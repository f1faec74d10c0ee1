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

  /** (host → saltCount) for hosts whose sampled share exceeds 1/targetPartitions.
    * Salt counts target chunks of ~1/(overPartition × targetPartitions) of the
    * data: chunks much smaller than a partition smooth out hash collisions when
    * (host, salt) keys land on partitions. */
  def headHostSalts(df: DataFrame, hostCol: Column, targetPartitions: Int,
                    sampleFraction: Double = 0.05, seed: Long = 7L,
                    overPartition: Int = 4): Map[String, Int] = {
    val sampled = df.sample(withReplacement = false, sampleFraction, seed)
      .select(hostCol.as("_h")).groupBy(col("_h")).count().collect()
    val total = math.max(1L, sampled.map(_.getLong(1)).sum)
    sampled.flatMap { r =>
      val share = r.getLong(1).toDouble / total
      val salts = math.ceil(share * targetPartitions * overPartition).toInt
      // salt every host above half a partition's share — unsalted hosts can then
      // stack at most ~0.5/targetPartitions each when they collide.
      // null hosts (malformed urls — url_host is total, not throwing) are
      // EXCLUDED: null is not a legal map key, and saltColumn spreads them
      // unconditionally instead
      if (r.isNullAt(0)) None
      else if (share > 0.5 / targetPartitions && salts > 1) Some(r.getString(0) -> salts) else None
    }.toMap
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
