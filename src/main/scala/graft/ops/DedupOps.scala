package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/**
 * Corpus-scale deduplication operators (training-data pipeline surface).
 * All are shuffle-frugal: exact dedup is one hash-groupBy; near-dup candidate
 * generation is an LSH band-key shuffle join (never O(n²)); keeper selection is
 * a single left_anti join.
 */
object DedupOps {

  /** Exact dedup: keep the row with the smallest `idCol` per identical `textCol`.
    * One shuffle on the text digest (never on raw text — 64-byte keys, not docs). */
  def dropExactDups(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2(encode(col(textCol), "UTF-8"), 256))
      .orderBy(col(idCol).asc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** MinHash-LSH near-dup candidate pairs (a < b) with estimated Jaccard ≥ threshold.
    * Band-key explode + self-join on the band bucket; signatures compared only for
    * same-bucket candidates. */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
                   threshold: Double = 0.5,
                   numHashes: Int = 64, shingleSize: Int = 3, rowsPerBand: Int = 8): DataFrame = {
    // the band self-join shuffles only (id, band) — signatures (8× wider) are
    // attached AFTER candidate pairs are deduped, keeping the explosive stage narrow
    val bands = df.select(
      col(idCol).as("_id"),
      explode(minhash_bands(col(textCol), numHashes, shingleSize, rowsPerBand)).as("_band"))
    val candidates = bands.as("x").join(bands.as("y"),
        col("x._band") === col("y._band") && col("x._id") < col("y._id"))
      .select(col("x._id").as("a"), col("y._id").as("b"))
      .distinct()
    val sigs = df.select(col(idCol).as("_sid"),
      minhash_sig(col(textCol), numHashes, shingleSize).as("_sig"))
    val est = expr(s"aggregate(zip_with(_siga, _sigb, (p,q) -> IF(p = q, 1, 0)), 0, (acc,v) -> acc + v)")
      .cast("double") / numHashes
    candidates
      .join(sigs.select(col("_sid"), col("_sig").as("_siga")), col("a") === col("_sid")).drop("_sid")
      .join(sigs.select(col("_sid"), col("_sig").as("_sigb")), col("b") === col("_sid")).drop("_sid")
      .withColumn("est_jaccard", est)
      .filter(col("est_jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** Two-phase near-dup detection: MinHash-LSH candidates verified by EXACT
    * token-shingle Jaccard (computed only on candidate pairs — the standard
    * generate-then-verify shape; estimates never reach the output). */
  def verifiedNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                           threshold: Double = 0.8,
                           candidateThreshold: Double = 0.5, shingleSize: Int = 3): DataFrame = {
    val texts = df.select(col(idCol).as("_tid"), col(textCol).as("_t"))
    nearDupPairs(df, textCol, idCol, candidateThreshold, shingleSize = shingleSize)
      .join(texts.select(col("_tid"), col("_t").as("_ta")), col("a") === col("_tid")).drop("_tid")
      .join(texts.select(col("_tid"), col("_t").as("_tb")), col("b") === col("_tid")).drop("_tid")
      .withColumn("jaccard", round(shingle_jaccard(col("_ta"), col("_tb"), shingleSize), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Greedy near-dup removal: drop every row whose id appears as the larger member
    * of a qualifying pair (single left_anti join; approximate — a chain a~b~c with
    * a≁c still drops b and c, the standard one-pass LSH-dedup compromise vs full
    * connected components). */
  def dropNearDups(df: DataFrame, textCol: String, idCol: String,
                   threshold: Double = 0.8): DataFrame = {
    val losers = nearDupPairs(df, textCol, idCol, threshold)
      .select(col("b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** SimHash near-dup pairs within Hamming distance ≤ maxHamming, bucketed by the
    * top `prefixBits` bits (near-dups share the prefix with high probability for
    * small hamming distances; multi-table variants can lower the miss rate). */
  def simhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                          maxHamming: Int = 3, prefixBits: Int = 16): DataFrame = {
    val withSim = df.select(col(idCol).as("_id"), simhash64(col(textCol)).as("_sim"))
      .withColumn("_bucket", shiftright(col("_sim"), 64 - prefixBits))
    withSim.as("x").join(withSim.as("y"),
        col("x._bucket") === col("y._bucket") && col("x._id") < col("y._id"))
      .withColumn("hamming", bit_count(col("x._sim").bitwiseXOR(col("y._sim"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("x._id").as("a"), col("y._id").as("b"), col("hamming"))
  }
}
