package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

class IvfPqSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("subspace training: deterministic, partition-invariant, right shapes") {
    val m1 = IvfPq.trainPq(emb, "embedding", "vec_id", dim = 64, m = 8, ksub = 8, iters = 2)
    val m2 = IvfPq.trainPq(emb.repartition(7), "embedding", "vec_id", dim = 64, m = 8, ksub = 8, iters = 2)
    assert(m1 == m2, "PQ training must be partitioning-invariant")
    assert(m1.m == 8 && m1.dsub == 8)
    assert(m1.codebooks.size == 8 && m1.codebooks.forall(_.size == 8))
    assert(m1.codebooks.forall(_.forall(_.size == 8)))
  }

  test("lossless corpus (subvectors ARE centroids): ADC ordering = exact ordering") {
    import spark.implicits._
    // dim 8, m 2, dsub 4: four sub-patterns per subspace; every vector is a
    // concatenation of two of them, so after training ksub=4 per subspace the
    // codes reconstruct each vector EXACTLY and ADC cosine must order
    // candidates identically to the exact cosine
    val pats = Seq(
      Seq(1.0f, 0f, 0f, 0f), Seq(0f, 1.0f, 0f, 0f),
      Seq(0f, 0f, 1.0f, 0f), Seq(0f, 0f, 0f, 1.0f))
    val rows = (0 until 64).map { i =>
      (i.toLong, pats(i % 4) ++ pats((i / 4) % 4))
    }
    val df = rows.toDF("vec_id", "embedding")
    // hand-built model: the codebooks ARE the four patterns (training seeds
    // can collide on duplicate subvectors — this test pins the encode/ADC
    // math, not Lloyd)
    val pq = IvfPq.PqModel(2, 4,
      Seq.fill(2)(pats.map(_.map(_.toDouble).toSeq).toSeq))
    val withCode = df
      .withColumn("_dv", transform(col("embedding"), x => x.cast("double")))
      .withColumn("code", IvfPq.pqCode(col("_dv"), pq))
    // reconstruction is exact: ADC cosine vs each candidate's code must rank
    // candidates the same as exact cosine for every query
    val q = withCode.filter(col("vec_id") === 0)
      .select(col("_dv").as("qv")).collect().head.getSeq[Double](0)
    val qLit = typedlit(q)
    val scored = withCode.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        IvfPq.adcCosine(qLit, col("code"), pq).as("adc"),
        graft.functions.cosine_sim(qLit, col("_dv")).as("exact"))
      .collect()
    val byAdc = scored.sortBy(r => (-r.getDouble(1), r.getLong(0))).map(_.getLong(0)).toSeq
    val byExact = scored.sortBy(r => (-r.getDouble(2), r.getLong(0))).map(_.getLong(0)).toSeq
    assert(byAdc == byExact, "lossless PQ must preserve the exact ordering")
    // the ADC value is the exact cosine scaled by the (per-query constant)
    // query norm it deliberately drops: adc / |q| = exact when codes
    // reconstruct v perfectly
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    scored.foreach { r =>
      assert(math.abs(r.getDouble(1) / qNorm - r.getDouble(2)) < 1e-9,
        s"vec ${r.getLong(0)}: adc/|q| ${r.getDouble(1) / qNorm} vs exact ${r.getDouble(2)}")
    }
  }

  test("exhaustive probe + full refine is bit-identical to brute force") {
    val centroids = IvfAnn.trainCentroids(emb, "embedding", "vec_id", k = 16, iters = 3)
    val pq = IvfPq.trainPq(emb, "embedding", "vec_id", dim = 64, m = 8, ksub = 8, iters = 2)
    val n = emb.count().toInt
    val got = IvfPq.topK(emb, "embedding", "vec_id", col("vec_id") < 20,
      centroids, pq, k = 5, nProbe = 16, refine = n)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2))).toSet
    val brute = SparkEntry.queries("q16_ann_cosine_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute)
  }

  test("lossy path: recall@5 is useful and grows exact with budget") {
    val centroids = IvfAnn.trainCentroids(emb, "embedding", "vec_id", k = 16, iters = 3)
    val pq = IvfPq.trainPq(emb, "embedding", "vec_id", dim = 64, m = 8, ksub = 8, iters = 2)
    val brute = SparkEntry.queries("q16_ann_cosine_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def recallAt(nProbe: Int, refine: Int): Double = {
      val got = IvfPq.topK(emb, "embedding", "vec_id", col("vec_id") < 20,
        centroids, pq, k = 5, nProbe = nProbe, refine = refine)
        .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      brute.keys.toSeq.map { q =>
        (got.getOrElse(q, Set.empty) & brute(q)).size.toDouble / brute(q).size
      }.sum / brute.size
    }
    val r8 = recallAt(8, 8)
    val r16 = recallAt(8, 16)
    assert(r16 >= r8, f"recall must not drop with refine budget: $r8%.2f -> $r16%.2f")
    assert(r16 >= 0.6, f"PQ recall@5 (nProbe=8, refine=16) = $r16%.2f")
  }

  test("candidate shuffle bytes shrink >= 4x vs the raw-vector inverted file") {
    def shuffledBytes(df: DataFrame): Long = {
      df.collect()
      def walk(p: SparkPlan): Long = {
        val self = p match {
          case s: ShuffleExchangeExec =>
            s.metrics.get("dataSize").map(_.value).getOrElse(0L)
          case _ => 0L
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          // AQE hides materialized exchanges inside leaf query stages
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case other => other.children ++ other.subqueries
        }
        self + kids.map(walk).sum
      }
      walk(df.queryExecution.executedPlan)
    }
    val centroids = IvfAnn.trainCentroids(emb, "embedding", "vec_id", k = 16, iters = 3)
    val pq = IvfPq.trainPq(emb, "embedding", "vec_id", dim = 64, m = 8, ksub = 8, iters = 2)
    // broadcast joins would hide the candidate exchange at fixture scale —
    // disable them (static + AQE) so both paths shuffle the corpus side the
    // way a 10^10-row inverted file must
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "-1"))
    try {
      // candidate stage vs candidate stage at an identical probe budget:
      // IvfAnn.topK IS its candidate stage (probe join + rank window over
      // raw vectors); IvfPq.shortlist is the PQ one (M-byte codes into the
      // join, (query_id, neighbor_id, adc) through the window) — topK's
      // refine join is excluded because with broadcast force-disabled it
      // would shuffle the whole corpus, which real (broadcast-on) plans
      // never do for a k·refine·|queries|-row shortlist
      // 5 queries: the query side replicates qv × nProbe into the join in
      // BOTH paths; at corpus scale |queries| ≪ |corpus| so the corpus side
      // dominates — mirror that ratio here instead of letting 20 queries
      // rival the fixture corpus
      val rawBytes = shuffledBytes(
        IvfAnn.topK(emb, "embedding", "vec_id", col("vec_id") < 5,
          centroids, k = 5, nProbe = 16))
      val pqBytes = shuffledBytes(
        IvfPq.shortlist(emb, "embedding", "vec_id", col("vec_id") < 5,
          centroids, pq, k = 5, nProbe = 16, refine = 4))
      assert(rawBytes > 0 && pqBytes > 0, s"metrics missing: raw=$rawBytes pq=$pqBytes")
      assert(pqBytes.toDouble <= rawBytes.toDouble / 4.0,
        f"PQ path shuffles $pqBytes%d bytes vs raw $rawBytes%d — want >= 4x reduction")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
