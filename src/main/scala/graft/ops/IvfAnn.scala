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
 *  - everything is codegen'd builtins (zip_with/aggregate dot products), no
 *    UDFs; centroids ride in the plan as a literal so executors need no side
 *    input.
 *
 * Determinism: init centroids are the k rows with smallest xxhash64(id);
 * Lloyd uses exact averages — identical results at any partitioning.
 */
object IvfAnn {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  private def dvec(v: Column): Column = transform(v, x => x.cast("double"))

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

  /** argmax-dot list assignment against a UNIT-norm centroid literal; `v` may
    * be raw (unnormalized) doubles — the argmax is scale-invariant. */
  def assignList(v: Column, centroids: Column): Column = {
    val scores = transform(centroids, c => dot(v, c))
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** The query's nProbe nearest centroid list ids (deterministic tie-break);
    * same scale-invariance as assignList. */
  def probeLists(v: Column, centroids: Column, nProbe: Int): Column =
    transform(
      slice(array_sort(transform(centroids, (c, i) =>
        struct((-dot(v, c)).as("neg"), i.as("idx")))), 1, nProbe),
      s => s.getField("idx"))

  /** Train k centroids with `iters` Lloyd iterations. Deterministic; returns
    * unit-norm centroids (cosine k-means). Collect size = k × dim. */
  def trainCentroids(df: DataFrame, vecCol: String, idCol: String,
                     k: Int, iters: Int = 3): Seq[Seq[Double]] = {
    // each Lloyd iteration re-reads the vectors — persist for the duration of
    // training (init + iters scans), released before returning. Raw doubles
    // for assignment (scale-invariant); the unit-norm view feeds the means.
    val vecs = df.select(col(idCol).as("_id"), dvec(col(vecCol)).as("_dv"),
        normalized(col(vecCol)).as("_v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try trainOn(vecs, k, iters)
    finally vecs.unpersist(blocking = false)
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
      val lit = typedlit(centroids)
      val means = vecs
        .withColumn("_list", assignList(col("_dv"), lit))
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
      .withColumn("ivf_list", assignList(col("_dv"), typedlit(centroids)))

  /** Top-k cosine neighbors for each query row, probing nProbe lists.
    * `queryPred` selects the query rows out of `df` (self-search shape). */
  def topK(df: DataFrame, vecCol: String, idCol: String,
           queryPred: Column, centroids: Seq[Seq[Double]],
           k: Int = 5, nProbe: Int = 4): DataFrame = {
    val cLit = typedlit(centroids)
    // the exact re-rank uses the ORIGINAL (unnormalized) doubles with the same
    // cosine formula as the brute-force baseline, so IVF-with-total-recall is
    // bit-identical to brute force (normalized dots round differently in ulps)
    val dv = dvec(col(vecCol))
    val corpus = assign(df, vecCol, centroids)
      .select(col(idCol).as("neighbor_id"), dv.as("nv"), col("ivf_list"))
    val queries = df.filter(queryPred)
      .select(col(idCol).as("query_id"), dv.as("qv"),
        explode(probeLists(dv, cLit, nProbe)).as("ivf_list"))
    val pairs = queries.join(corpus, Seq("ivf_list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", graft.functions.cosine_sim(col("qv"), col("nv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 4).as("sim"), col("rank"))
  }
}
