package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** SemDeDup (SimilarityOps.semDedup) on a controlled 2-D fixture where every
  * cluster assignment, rank, and pairwise-cosine decision is hand-computable:
  * unit centroids (1,0) / (0,1); ids 1-3 sit within 16 degrees of the x-axis
  * (all pairwise cosines >= cos16 ~ 0.961), id 4 is the y-axis, ids 5/6
  * straddle the diagonal — a CROSS-cluster near-dup pair (cosine 0.988) that
  * within-cluster semantics must never drop. */
class SemDedupSpec extends AnyFunSuite with SparkTestBase {

  private val centroids = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))

  private def deg(d: Double) = math.toRadians(d)
  private def vec(angleDeg: Double) = Seq(math.cos(deg(angleDeg)), math.sin(deg(angleDeg)))

  // cluster 0: ids 1 (0 deg), 2 (8 deg), 3 (16 deg), 5 (0.76, 0.65);
  // cluster 1: ids 4 (90 deg), 6 (0.65, 0.76)
  private def fixture = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, vec(0)), (2L, vec(8)), (3L, vec(16)),
      (4L, vec(90)), (5L, Seq(0.76, 0.65)), (6L, Seq(0.65, 0.76))
    ).toDF("id", "v")
  }

  private def keptIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("paper keeper (low_centroid_sim): the farthest-from-centroid member survives") {
    // cluster-0 rank by ascending centroid sim: id5 (0.760), id3 (0.961),
    // id2 (0.990), id1 (1.0). id2/id1 have an earlier member within eps
    // (cos8 = 0.990, cos16 = 0.961 >= 0.95); id3 vs id5 is 0.909 < eps.
    val kept = keptIds(SimilarityOps.semDedup(fixture, "v", "id", centroids, eps = 0.95))
    assert(kept == Set(3L, 4L, 5L, 6L))
  }

  test("min_id keeper: the smallest id of a duplicate group survives") {
    val kept = keptIds(SimilarityOps.semDedup(fixture, "v", "id", centroids,
      eps = 0.95, keeper = "min_id"))
    assert(kept == Set(1L, 4L, 5L, 6L))
  }

  test("cross-cluster near-dups are never dropped (within-cluster contract)") {
    // ids 5 and 6 have cosine 0.988 >= eps but live in different clusters —
    // both survive under either keeper (asserted above); dropping eps to
    // cover even the 0.76 diagonal-to-axis pairs still cannot cross clusters
    val kept = keptIds(SimilarityOps.semDedup(fixture, "v", "id", centroids,
      eps = 0.7, keeper = "min_id"))
    assert(kept == Set(1L, 4L)) // everything else is within 0.7 of an earlier co-member;
    // id6 (cosine 0.988 with id5) fell to its own cluster's id4, never to id5
  }

  test("oversized clusters are skipped conservatively: all members kept") {
    // cluster 0 has 4 members > maxClusterSize=3 -> exempt from dedup;
    // cluster 1 (2 members, cosine 0.76 < eps) still processed, both kept
    val kept = keptIds(SimilarityOps.semDedup(fixture, "v", "id", centroids,
      eps = 0.95, maxClusterSize = 3))
    assert(kept == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("empty input and unknown keeper rule") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    assert(SimilarityOps.semDedup(empty, "v", "id", centroids).count() == 0)
    intercept[IllegalArgumentException] {
      SimilarityOps.semDedup(fixture, "v", "id", centroids, keeper = "nope")
    }
  }

  test("q80 contract on testdata: originals always survive; drops are exactly co-clustered twins") {
    val kept = SparkEntry_q80(spark).collect().map(_.getLong(0)).toSet
    val originals = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(originals.subsetOf(kept), "an original (min id of its twin pair) must never drop")
    val dropped = (originals.map(_ + 1000000L) -- kept)
    assert(dropped.nonEmpty, "co-clustered perturbed twins (cosine ~0.99) must drop")
    assert((kept -- originals).forall(id => id >= 1000000L))
  }

  private def SparkEntry_q80(s: org.apache.spark.sql.SparkSession) =
    graft.SparkEntry.queries("q80_semdedup")(s, "/root/testdata/sf0.001")
}
