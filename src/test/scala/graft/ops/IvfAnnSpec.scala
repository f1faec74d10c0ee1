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

  test("sample-based training: deterministic, partition-invariant, thin-sample fallback") {
    val cs1 = IvfAnn.trainCentroids(emb, "embedding", "vec_id", k = 8, iters = 2, sampleDenominator = 3)
    val cs2 = IvfAnn.trainCentroids(emb.repartition(5), "embedding", "vec_id", k = 8, iters = 2, sampleDenominator = 3)
    assert(cs1 == cs2, "hash sampling must be partition-invariant")
    assert(cs1.size == 8 && cs1.forall(_.size == 64))
    // full-probe search over sample-trained lists is still EXACT (probing all
    // lists ranks every vector regardless of quantizer quality)
    val full = IvfAnn.topK(emb, "embedding", "vec_id", col("vec_id") < 5, cs1, k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = graft.SparkEntry.queries("q16_ann_cosine_topk")(spark, sf)
      .filter(col("query_id") < 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute)
    // a denominator far beyond the corpus size leaves < k seed rows: training
    // must fall back to the full corpus, not return a truncated codebook
    val thin = IvfAnn.trainCentroids(emb, "embedding", "vec_id", k = 8, iters = 1, sampleDenominator = 1 << 20)
    assert(thin.size == 8)
  }

  test("per-list cap bounds candidate volume on a skewed corpus") {
    import spark.implicits._
    // dominant cluster: 400 identical vectors (argmax-dot sends all of them
    // to one list — ties break to the first index) + 100 spread
    val dim = 8
    val rows = (0 until 500).map { i =>
      val v: Seq[Float] =
        if (i < 400) (0 until dim).map(d => if (d == 0) 1.0f else 0.0f)
        else (0 until dim).map(d => if (d == i % dim) 1.0f else 0.05f * ((i + d) % 5))
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val cs = IvfAnn.trainCentroids(df, "embedding", "vec_id", k = 8, iters = 2)
    val uncapped = IvfAnn.assign(df, "embedding", cs)
      .groupBy("ivf_list").count().collect().map(_.getLong(1))
    assert(uncapped.max >= 400, s"corpus should be skewed: ${uncapped.mkString(",")}")
    val capped = IvfAnn.cappedLists(df, "embedding", "vec_id", cs, maxListSize = 50)
    val cappedSizes = capped.groupBy("ivf_list").count().collect().map(_.getLong(1))
    assert(cappedSizes.max <= 50, s"cap leaked: ${cappedSizes.mkString(",")}")
    // capped search still returns k results per query (candidates bounded,
    // not emptied) — nProbe×maxListSize is the per-query candidate ceiling
    val got = IvfAnn.topK(df, "embedding", "vec_id", col("vec_id") < 3, cs,
      k = 5, nProbe = 2, maxListSize = 50)
    val perQuery = got.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQuery.length == 3 && perQuery.forall(_ == 5), perQuery.mkString(","))
  }
}
