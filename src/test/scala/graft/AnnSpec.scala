package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN quality. q28 runs the LSH bucket-join machinery at probe radius = k
  * (every bucket probed — the oracle-exact configuration), so its results must
  * EQUAL brute force. The production single-probe (radius=1) configuration is
  * approximate by design; its recall is pinned separately — the wiring, not
  * state-of-the-art recall on random-ish embeddings. */
class AnnSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def topkSets(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
    rows.map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap

  test("q28 exhaustive-probe LSH equals brute force exactly") {
    val brute = topkSets(SparkEntry.queries("q16_ann_cosine_topk")(spark, sf).collect())
    val lsh = topkSets(SparkEntry.queries("q28_ann_lsh_bucketed")(spark, sf).collect())
    assert(lsh.nonEmpty)
    assert(lsh == brute, "radius = nPlanes probes every bucket — results must be exact")
  }

  test("production single-probe LSH (radius=1) recall@5 vs brute force") {
    import org.apache.spark.sql.functions._
    import ops.SimilarityOps
    val embT = spark.read.parquet(s"$sf/embeddings.parquet")
    // small minPlanes so tiny-corpus buckets are actually shared (at the
    // default minPlanes=8 a 100-vector corpus is all singleton buckets and
    // the test would measure sparsity, not the probe path)
    val k = SimilarityOps.planesFor(embT.count(), targetBucket = 16, minPlanes = 2)
    val planes = SimilarityOps.lshPlanes(k, SimilarityOps.embeddingDim(embT, "embedding"))
    val emb = embT.withColumn("v", transform(col("embedding"), x => x.cast("double")))
      .withColumn("bucket", SimilarityOps.lshBucket(col("v"), planes))
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(SimilarityOps.probeBuckets(col("bucket"), k)).as("bucket"))
    val cands = emb.select(col("vec_id").as("neighbor_id"), col("v").as("nv"), col("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    val lsh = topkSets(q.join(cands, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", graft.functions.cosine_sim(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id")).collect())
    val brute = topkSets(SparkEntry.queries("q16_ann_cosine_topk")(spark, sf).collect())
    assert(lsh.nonEmpty)
    val recalls = brute.keys.toSeq.map { qid =>
      (lsh.getOrElse(qid, Set.empty) & brute(qid)).size.toDouble / brute(qid).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, f"mean recall@5 = $mean%.2f")
    lsh.values.foreach(s => assert(s.size <= 5))
  }
}
