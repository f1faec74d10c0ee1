package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN quality: the LSH-bucketed path must find a decent fraction of the true
  * top-5 neighbors (single-probe LSH with 6 hyperplanes on random-ish embeddings
  * is a coarse filter — this pins the wiring, not state-of-the-art recall). */
class AnnSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("lsh-bucketed ANN recall@5 vs brute force") {
    val brute = SparkEntry.queries("q16_ann_cosine_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val lsh = SparkEntry.queries("q28_ann_lsh_bucketed")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(lsh.nonEmpty)
    val recalls = brute.keys.toSeq.map { q =>
      val truth = brute(q)
      val got = lsh.getOrElse(q, Set.empty)
      (got & truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, f"mean recall@5 = $mean%.2f")
    // every LSH result must be a genuine candidate (same-bucket, valid sim rank)
    lsh.values.foreach(s => assert(s.size <= 5))
  }
}
