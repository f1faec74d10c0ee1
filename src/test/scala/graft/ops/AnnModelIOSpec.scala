package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.pipeline.CatalogIO

class AnnModelIOSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def freshDir(kind: String): String =
    Files.createTempDirectory(s"graft-$kind-model").toString + "/t"

  test("defaultModelRoot: warehouse-dir default, spark-conf override, env precedence") {
    // no env override in the test JVM: the root must resolve under the
    // session's warehouse dir — the cluster-visible location — NOT
    // java.io.tmpdir (the r07-verdict footgun: node-local /tmp silently
    // defeated the train-once contract across drivers)
    assume(sys.env.get("GRAFT_MODEL_DIR").isEmpty)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val whPath = if (wh.startsWith("file:")) new java.net.URI(wh).getPath else wh
    assert(AnnModelIO.defaultModelRoot == whPath + "/graft-models")
    assert(AnnModelIO.modelDir("ivf", "/some/corpus", "k16")
      .startsWith(whPath + "/graft-models/ivf-k16-"))
    // per-application spark-conf override wins over the warehouse default
    spark.conf.set("spark.graft.modelDir", "/tmp/graft-conf-models")
    try assert(AnnModelIO.defaultModelRoot == "/tmp/graft-conf-models")
    finally spark.conf.unset("spark.graft.modelDir")
    assert(AnnModelIO.defaultModelRoot == whPath + "/graft-models")
  }

  test("centroids: write/read roundtrip is bit-identical and manifested") {
    val dir = freshDir("ivf")
    val trained = IvfAnn.trainCentroids(emb, "embedding", "vec_id", k = 8, iters = 2)
    AnnModelIO.writeCentroids(spark, dir, trained, "r1")
    val back = AnnModelIO.readCentroids(spark, dir)
    // Seq[Seq[Double]] equality is element-exact — parquet doubles are lossless
    assert(back == trained)
    assert(CatalogIO.latestSnapshot(spark, dir).isDefined)
  }

  test("pq: write/read roundtrip preserves m, dsub, and every codebook entry") {
    val dir = freshDir("pq")
    val trained = IvfPq.trainPq(emb, "embedding", "vec_id", dim = 64, m = 8, ksub = 8, iters = 1)
    AnnModelIO.writePq(spark, dir, trained, "r1")
    val back = AnnModelIO.readPq(spark, dir)
    assert(back == trained)
  }

  test("centroidsFor trains exactly once: the committed model serves later calls") {
    import spark.implicits._
    val dir = freshDir("ivf-once")
    val first = AnnModelIO.centroidsFor(emb, "embedding", "vec_id",
      k = 8, iters = 2, sampleDenominator = 1, dir)
    // second call hands a DIFFERENT (garbage) corpus: if it retrained, the
    // result would differ (or blow up on the empty frame) — a committed
    // model table must make the call search-only
    val garbage = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val second = AnnModelIO.centroidsFor(garbage, "embedding", "vec_id",
      k = 8, iters = 2, sampleDenominator = 1, dir)
    assert(second == first)
    // exactly one snapshot — no silent re-commit
    assert(CatalogIO.listSnapshots(spark, dir).size == 1)
  }

  test("pqFor trains exactly once and read-back search equals in-memory search") {
    import spark.implicits._
    val dir = freshDir("pq-once")
    val cdir = freshDir("ivf-for-pq")
    val centroids = AnnModelIO.centroidsFor(emb, "embedding", "vec_id",
      k = 8, iters = 2, sampleDenominator = 1, cdir)
    val inMem = IvfPq.trainPq(emb, "embedding", "vec_id", dim = 64, m = 8, ksub = 8, iters = 1)
    val first = AnnModelIO.pqFor(emb, "embedding", "vec_id", dim = 64,
      m = 8, ksub = 8, iters = 1, sampleDenominator = 1, dir)
    assert(first == inMem, "persisted-path model must equal direct training")
    val garbage = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val second = AnnModelIO.pqFor(garbage, "embedding", "vec_id", dim = 64,
      m = 8, ksub = 8, iters = 1, sampleDenominator = 1, dir)
    assert(second == first)
    // and the search result is the same frame-for-frame either way (the
    // q94 contract: persisting the model can never change an answer)
    val a = IvfPq.topK(emb, "embedding", "vec_id", col("vec_id") < 5,
      centroids, inMem, k = 3, nProbe = 8, refine = 1 << 16).collect().toSeq
    val b = IvfPq.topK(emb, "embedding", "vec_id", col("vec_id") < 5,
      centroids, second, k = 3, nProbe = 8, refine = 1 << 16).collect().toSeq
    assert(a == b)
  }

  test("readCentroids refuses an unmanifested dir (half-written models stay invisible)") {
    val dir = freshDir("ivf-uncommitted")
    intercept[IllegalArgumentException] {
      AnnModelIO.readCentroids(spark, dir)
    }
  }
}
