package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * IVF (inverted-file) approximate nearest neighbor over embedding columns —
 * the classic coarse-quantizer scale path (Sivic & Zisserman video-google
 * posting lists; FAISS IVF): k-means centroids partition the corpus into k
 * lists; a query exactly ranks only the vectors in its nProbe nearest lists.
 *
 * Spark-first shape:
 *  - training is a few Lloyd iterations entirely in DataFrame ops
 *    (assign = argmax dot with a centroid LITERAL, mean = posexplode + avg);
 *    only k×dim doubles ever reach the driver (metadata-sized at any corpus
 *    size; at 10^10+ rows train on a sample(fraction) first);
 *  - search shuffles on list_id: queries explode to nProbe list keys and join
 *    the inverted lists — candidate volume is ~ nProbe/k of the corpus per
 *    query instead of a full cross join;
 *  - assignment/probing are NATIVE fused-loop expressions (ArgMaxDotExpr /
 *    TopDotIndicesExpr — higher-order-function dots are interpreted per row),
 *    no UDFs; centroids ride in the plan as referenced constants so executors
 *    need no side input.
 *
 * Determinism: init centroids are the k rows with smallest xxhash64(id);
 * Lloyd uses exact averages — identical results at any partitioning.
 */
object IvfAnn {

  private def dvec(v: Column): Column = transform(v, x => x.cast("double"))

  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(e)
  private def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)

  /** L2-normalized double vector (cosine becomes a plain dot product).
    * NOT for per-row hot paths: projection collapse inlines the norm into the
    * transform lambda, recomputing it per ELEMENT — and any consumer that
    * evaluates the vector k times (k dots against centroids) multiplies that
    * again. Assignment/probing use raw doubles instead: with UNIT centroids,
    * argmax/ordering of dot(v, c) is invariant to scaling v. */
  def normalized(v: Column): Column = {
    val d = dvec(v)
    val n = sqrt(aggregate(zip_with(d, d, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x))
    transform(d, x => x / n)
  }

  /** argmax-dot list assignment against UNIT-norm centroids; `v` may be raw
    * (unnormalized) doubles — the argmax is scale-invariant. NATIVE fused
    * loop (ArgMaxDotExpr): the transform/aggregate form was interpreted per
    * row, and assignment runs once per corpus row per Lloyd iteration. */
  def assignList(v: Column, centroids: Seq[Seq[Double]]): Column =
    bridge(graft.expr.ArgMaxDotExpr(exprOf(v), centroids))

  /** The query's nProbe nearest centroid list ids (descending dot,
    * deterministic ascending-index tie-break); same scale-invariance and
    * native-loop rationale as assignList. */
  def probeLists(v: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    bridge(graft.expr.TopDotIndicesExpr(exprOf(v), centroids, nProbe))

  /** Train k centroids with `iters` Lloyd iterations. Deterministic; returns
    * unit-norm centroids (cosine k-means). Collect size = k × dim.
    *
    * sampleDenominator > 1 trains on the deterministic 1/denominator slice
    * `xxhash64(id) % denominator == 0` — at 10^10+ rows full-corpus Lloyd
    * scans are waste (quantizer quality saturates long before that), and a
    * HASH sample (unlike df.sample) is partition-invariant, keeping training
    * reproducible. Pick denominator so corpus/denominator ≫ k; if the slice
    * yields fewer than k seed rows, training falls back to the full corpus. */
  def trainCentroids(df: DataFrame, vecCol: String, idCol: String,
                     k: Int, iters: Int = 3, sampleDenominator: Int = 1): Seq[Seq[Double]] = {
    val base =
      if (sampleDenominator > 1)
        df.filter(pmod(xxhash64(col(idCol)), lit(sampleDenominator)) === 0)
      else df
    // each Lloyd iteration re-reads the vectors — persist for the duration of
    // training (init + iters scans), released before returning. Raw doubles
    // for assignment (scale-invariant); the unit-norm view feeds the means.
    val vecs = base.select(col(idCol).as("_id"), dvec(col(vecCol)).as("_dv"),
        normalized(col(vecCol)).as("_v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val out = trainOn(vecs, k, iters)
      if (out.length >= k || sampleDenominator <= 1) out
      else { // sample too thin to seed k lists — retrain on everything
        vecs.unpersist(blocking = false)
        trainCentroids(df, vecCol, idCol, k, iters)
      }
    } finally vecs.unpersist(blocking = false)
  }

  private def trainOn(vecs: DataFrame, k: Int, iters: Int): Seq[Seq[Double]] = {
    def renorm(c: Array[Double]): Seq[Double] = {
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c.toSeq else c.map(_ / n).toSeq
    }
    var centroids: Seq[Seq[Double]] =
      vecs.orderBy(xxhash64(col("_id")), col("_id"))
        .limit(k).select(col("_v")).collect()
        .map(_.getSeq[Double](0).toSeq).toSeq
    var it = 0
    while (it < iters) {
      val means = vecs
        .withColumn("_list", assignList(col("_dv"), centroids))
        .select(col("_list"), posexplode(col("_v")).as(Seq("_pos", "_x")))
        .groupBy(col("_list"), col("_pos"))
        // exact decimal average: double summation order varies with the
        // partitioning and would make training partition-dependent in the ulps
        .agg(avg(col("_x").cast("decimal(38,18)")).cast("double").as("_m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (list, rows) =>
          list -> renorm(rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray)
        }
      // empty lists keep their previous centroid
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i)))
      it += 1
    }
    centroids
  }

  /** Corpus with an IVF list assignment column (the inverted file). */
  def assign(df: DataFrame, vecCol: String, centroids: Seq[Seq[Double]]): DataFrame =
    df.withColumn("_dv", dvec(col(vecCol)))
      .withColumn("ivf_list", assignList(col("_dv"), centroids))

  /** Inverted file truncated to maxListSize members per list (deterministic:
    * smallest ids kept, one window over the SAME ivf_list shuffle key the
    * probe join uses). A skewed corpus puts most rows in one hot list, and an
    * uncapped probe join against it re-creates the near-cross-join IVF exists
    * to avoid. Unlike the LSH bucket caps (which must DROP degenerate buckets
    * entirely — any member pair is a candidate), truncation is right for ANN:
    * queries probing the hot list still rank a bounded candidate subset. */
  def cappedLists(df: DataFrame, vecCol: String, idCol: String,
                  centroids: Seq[Seq[Double]], maxListSize: Int): DataFrame = {
    val w = Window.partitionBy(col("ivf_list")).orderBy(col(idCol).asc)
    assign(df, vecCol, centroids)
      .withColumn("_lrank", row_number().over(w))
      .filter(col("_lrank") <= maxListSize)
      .drop("_lrank")
  }

  /** Top-k cosine neighbors for each query row, probing nProbe lists.
    * `queryPred` selects the query rows out of `df` (self-search shape).
    * maxListSize > 0 bounds per-query candidate volume to nProbe×maxListSize
    * on skewed corpora (see cappedLists); 0 = exact lists. */
  def topK(df: DataFrame, vecCol: String, idCol: String,
           queryPred: Column, centroids: Seq[Seq[Double]],
           k: Int = 5, nProbe: Int = 4, maxListSize: Int = 0): DataFrame = {
    // the exact re-rank uses the ORIGINAL (unnormalized) doubles with the same
    // cosine formula as the brute-force baseline, so IVF-with-total-recall is
    // bit-identical to brute force (normalized dots round differently in ulps)
    val dv = dvec(col(vecCol))
    val inverted =
      if (maxListSize > 0) cappedLists(df, vecCol, idCol, centroids, maxListSize)
      else assign(df, vecCol, centroids)
    val corpus = inverted
      .select(col(idCol).as("neighbor_id"), dv.as("nv"), col("ivf_list"))
    val queries = df.filter(queryPred)
      .select(col(idCol).as("query_id"), dv.as("qv"),
        explode(probeLists(dv, centroids, nProbe)).as("ivf_list"))
    val pairs = queries.join(corpus, Seq("ivf_list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", graft.functions.cosine_sim(col("qv"), col("nv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 4).as("sim"), col("rank"))
  }
}
