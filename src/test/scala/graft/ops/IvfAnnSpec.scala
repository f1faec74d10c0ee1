package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

class IvfAnnSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("training is deterministic and lists partition the corpus") {
    val c1 = IvfAnn.trainCentroids(emb, "embedding", "vec_id", k = 16, iters = 3)
    val c2 = IvfAnn.trainCentroids(emb.repartition(7), "embedding", "vec_id", k = 16, iters = 3)
    assert(c1 == c2) // partitioning-invariant
    assert(c1.size == 16 && c1.forall(_.size == 64))
    c1.foreach(c => assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-9)) // unit norm
    val assigned = IvfAnn.assign(emb, "embedding", c1)
    assert(assigned.count() == emb.count())
    val lists = assigned.groupBy("ivf_list").count().collect()
    assert(lists.map(_.getLong(1)).sum == emb.count())
    assert(lists.length > 4, s"degenerate clustering: ${lists.length} lists")
  }

  test("recall@5 vs brute force rises with nProbe; high probe budget is exact") {
    val brute = SparkEntry.queries("q16_ann_cosine_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val centroids = IvfAnn.trainCentroids(emb, "embedding", "vec_id", k = 16, iters = 3)
    def recallAt(nProbe: Int): Double = {
      val got = IvfAnn.topK(emb, "embedding", "vec_id", col("vec_id") < 20,
        centroids, k = 5, nProbe = nProbe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      brute.keys.toSeq.map { q =>
        (got.getOrElse(q, Set.empty) & brute(q)).size.toDouble / brute(q).size
      }.sum / brute.size
    }
    val r2 = recallAt(2)
    val r8 = recallAt(8)
    assert(r8 >= r2, f"recall must not drop with probes: $r2%.2f -> $r8%.2f")
    assert(r8 >= 0.6, f"recall@5 nProbe=8/16 = $r8%.2f")
    assert(recallAt(16) == 1.0, "probing every list must equal brute force")
  }
}
