package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.PageRow

/** Spark-side fixture corpus: rows are generated *inside executors* from
  * (seed, index) — no driver materialization, so bench corpora scale to any
  * size without a driver bottleneck. */
object Corpus {

  def pages(spark: SparkSession, n: Long, seed: Long = CorpusGen.DefaultSeed,
            parallelism: Int = 0): DataFrame = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, par)
      .mapPartitions(_.map { i =>
        val p = CorpusGen.page(i, seed)
        PageRow(p.url, p.warcTs, p.html, p.text, p.lang)
      })
      .toDF()
  }

  /** Driver-side truth for tests: url → (kind, expected extraction). */
  def truth(n: Int, seed: Long = CorpusGen.DefaultSeed): Map[String, (String, String)] =
    CorpusGen.corpus(n, seed).map(p => p.url -> (p.kind, p.expected)).toMap
}
