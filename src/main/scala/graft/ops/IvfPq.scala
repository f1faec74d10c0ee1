package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * IVF-PQ: product quantization over the IVF inverted file (Jégou et al.
 * 2011, "Product quantization for nearest neighbor search") — the standard
 * 100 TB ANN shape. `IvfAnn.topK` re-ranks with EXACT float vectors riding
 * every candidate row; at 10^10-10^12 embeddings that raw-vector shuffle
 * dominates the probe join. Here the inverted file carries an M-BYTE code
 * per vector instead of dim doubles: the candidate stage ranks by
 * asymmetric-distance cosine (float query × per-code centroid sums), and
 * only the k·refine shortlisted ids join back to exact vectors for the
 * final cosine re-rank — candidate shuffle bytes shrink by ~(8·dim)/M
 * (64× at dim=64, M=8; spec-measured ≥4× end-to-end on the fixture).
 *
 * Deviation (documented): codes quantize the RAW vector, not the
 * list-centroid residual (FAISS `by_residual=false`) — assignment and
 * encoding decouple, and the exhaustive-probe + full-refine path stays
 * bit-identical to brute force (the q37 oracle pattern) because the final
 * re-rank uses the same exact cosine as the baseline.
 *
 * Determinism: subspace Lloyd mirrors IvfAnn.trainCentroids (smallest-hash
 * seeds, exact decimal means, ties → first index) — identical codebooks at
 * any partitioning; only m·ksub·dsub doubles reach the driver.
 */
object IvfPq {

  /** Per-subspace codebooks: codebooks(s)(c) is the dsub-wide centroid c of
    * subspace s (vector positions [s·dsub, (s+1)·dsub)). */
  final case class PqModel(m: Int, dsub: Int, codebooks: Seq[Seq[Seq[Double]]])

  private def dvec(v: Column): Column = transform(v, x => x.cast("double"))
  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(e)
  private def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)

  def pqCode(v: Column, model: PqModel): Column =
    bridge(graft.expr.PqEncodeExpr(exprOf(v), model.codebooks))

  def adcCosine(q: Column, code: Column, model: PqModel): Column =
    bridge(graft.expr.PqAdcCosineExpr(exprOf(q), exprOf(code), model.codebooks))

  /** Train the M subspace quantizers (ksub centroids each, plain Euclidean
    * Lloyd — PQ is L2 in each subspace, no renorm). `dim` must be divisible
    * by m. One persisted scan feeds all m·iters assignment jobs; the slices
    * are column prunes of it, so training cost is bounded by the sample. */
  def trainPq(df: DataFrame, vecCol: String, idCol: String, dim: Int,
              m: Int, ksub: Int = 16, iters: Int = 3,
              sampleDenominator: Int = 1): PqModel = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    require(ksub >= 1 && ksub <= 256, "codes are one byte: ksub in [1, 256]")
    val dsub = dim / m
    val base =
      if (sampleDenominator > 1)
        df.filter(pmod(xxhash64(col(idCol)), lit(sampleDenominator)) === 0)
      else df
    val vecs = base.select(col(idCol).as("_id"), dvec(col(vecCol)).as("_dv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // deterministic seeds: the ksub smallest-hash rows, collected ONCE and
      // sliced driver-side — one job instead of one per subspace
      val seedRows: Seq[Seq[Double]] =
        vecs.orderBy(xxhash64(col("_id")), col("_id")).limit(ksub)
          .select(col("_dv")).collect()
          .map(_.getSeq[Double](0).toSeq).toSeq
      // a too-thin hash sample must fail at TRAINING, not as an
      // ArrayIndexOutOfBounds inside pqAdcCosine at query eval: fall back
      // to the full corpus like trainCentroids, and require data at all
      if (seedRows.length < ksub && sampleDenominator > 1) {
        vecs.unpersist(blocking = false)
        return trainPq(df, vecCol, idCol, dim, m, ksub, iters)
      }
      require(seedRows.nonEmpty,
        s"trainPq: no rows to seed codebooks from (input empty)")
      val books = (0 until m).map { s =>
        val sl = slice(col("_dv"), s * dsub + 1, dsub)
        var cb: Seq[Seq[Double]] =
          seedRows.map(_.slice(s * dsub, (s + 1) * dsub))
        var it = 0
        while (it < iters) {
          val means = vecs
            .withColumn("_c", bridge(graft.expr.ArgMinL2Expr(exprOf(sl), cb)))
            .select(col("_c"), posexplode(sl).as(Seq("_pos", "_x")))
            .groupBy(col("_c"), col("_pos"))
            .agg(avg(col("_x").cast("decimal(38,18)")).cast("double").as("_m"))
            .collect()
            .groupBy(_.getInt(0))
            .map { case (c, rows) =>
              c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
            }
          cb = cb.indices.map(i => means.getOrElse(i, cb(i)))
          it += 1
        }
        cb
      }
      PqModel(m, dsub, books)
    } finally vecs.unpersist(blocking = false)
  }

  /** The candidate stage alone: k·refine ADC-ranked neighbor ids per query
    * as (query_id, neighbor_id). This is the part whose shuffle volume
    * dominates at corpus scale — exposed so the spec can meter it against
    * the raw-vector path like for like. */
  def shortlist(df: DataFrame, vecCol: String, idCol: String, queryPred: Column,
                centroids: Seq[Seq[Double]], model: PqModel,
                k: Int = 5, nProbe: Int = 4, refine: Int = 4,
                maxListSize: Int = 0): DataFrame = {
    val dv = dvec(col(vecCol))
    val inverted =
      (if (maxListSize > 0) IvfAnn.cappedLists(df, vecCol, idCol, centroids, maxListSize)
       else IvfAnn.assign(df, vecCol, centroids))
        .select(col(idCol).as("neighbor_id"), col("ivf_list"),
          pqCode(col("_dv"), model).as("_code"))
    val queries = df.filter(queryPred)
      .select(col(idCol).as("query_id"), dv.as("_qv"),
        explode(IvfAnn.probeLists(dv, centroids, nProbe)).as("ivf_list"))
    // ADC is computed AT the probe-join output and both float vectors are
    // dropped before the rank shuffle: candidate rows travel as
    // (query_id, neighbor_id, adc) — the probe join's big (corpus) side
    // carries M-byte codes and the window shuffle carries 24 bytes/row,
    // where the raw-vector path shuffles dim doubles on BOTH
    val cand = queries.join(inverted, Seq("ivf_list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        adcCosine(col("_qv"), col("_code"), model).as("_adc"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("_adc").desc, col("neighbor_id").asc)
    cand.withColumn("_crank", row_number().over(wAdc))
      .filter(col("_crank") <= k.toLong * refine)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** Top-k cosine neighbors per query over the PQ-coded inverted file:
    * probe nProbe lists, rank candidates by ADC cosine (codes only — no
    * float vectors in the candidate shuffle), shortlist k·refine per query,
    * then exact-cosine re-rank over the shortlist joined back to the float
    * vectors by id (the shortlist is k·refine·|queries| rows — broadcast
    * territory, so the corpus id→vector side never shuffles). Exhaustive
    * probing + refine ≥ corpus ⇒ bit-identical to brute force. */
  def topK(df: DataFrame, vecCol: String, idCol: String, queryPred: Column,
           centroids: Seq[Seq[Double]], model: PqModel,
           k: Int = 5, nProbe: Int = 4, refine: Int = 4,
           maxListSize: Int = 0): DataFrame = {
    val dv = dvec(col(vecCol))
    val sl = shortlist(df, vecCol, idCol, queryPred, centroids, model,
      k, nProbe, refine, maxListSize)
    val exactSide = df.select(col(idCol).as("neighbor_id"), dv.as("_nv"))
    val querySide = df.filter(queryPred).select(col(idCol).as("query_id"), dv.as("_qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    sl.join(exactSide, Seq("neighbor_id")).join(querySide, Seq("query_id"))
      .withColumn("sim", graft.functions.cosine_sim(col("_qv"), col("_nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 4).as("sim"), col("rank"))
  }
}
