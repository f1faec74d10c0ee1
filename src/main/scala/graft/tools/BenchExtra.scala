package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-rehearsal bench (NOT the driver contract — graft.Bench is frozen):
 * times the heavy-operator family at 1× and N× the sf corpus rows, so the
 * plan-shape claims ("one shuffle on the band key", "no quadratic bucket")
 * get an empirical scaling point instead of shape audits alone.
 *
 * Methodology differences from graft.Bench, both per the optimization
 * guide §1.4: work is forced with the NOOP SINK (computes every column,
 * no count-only pruning, no output cost), and each op is labeled via
 * setJobDescription. Corpus scaling replicates the documents table with
 * disjoint id bands and a per-replica salt token appended to the text, so
 * near-dup cluster SIZES stay constant (×N rows ⇒ ×N clusters — the
 * linear-scaling regime the operators claim); un-salted replication would
 * grow every cluster N× and measure the fixture's quadratic pair growth,
 * not the operator. Embedding ops get splitmix-derived vectors (near-dups
 * rare) for the same reason.
 *
 * Usage: runMain graft.tools.BenchExtra <sfDir> <repl> [op,...]
 * Prints one JSON line per (op, scale) with rows and seconds (min of 2
 * trials). Index/model dirs are fresh temp dirs per run — build cost is
 * reported as its own op, search warm.
 */
object BenchExtra {

  // BY-NAME on purpose: DataFrame CONSTRUCTION is inside the clock — several
  // operators run real jobs at construction (connectedComponents' probe
  // collect, pageRank's per-iteration probes/checkpoints, indexFor's
  // build-and-commit), and excluding them would time only the final stage
  private def timeNoop(f: => DataFrame): Double = {
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  private def bestOf(n: Int)(f: => Double): Double =
    (0 until n).map { _ => System.gc(); f }.min

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repl = if (args.length > 1) args(1).toInt else 10
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))

    /** repl disjoint id bands; replica i's text goes through an alphabet
      * ROTATION (injective per-char map) so cross-replica shingle sets are
      * disjoint and near-dup cluster sizes stay CONSTANT under replication.
      * (A trailing salt token was tried first and is a trap: base_i+" r2"
      * vs base_i+" r5" still have Jaccard ≈ 0.95, so clusters grew ×k and
      * pairs ×k² — measuring fixture growth, not the operator.) Band 0 is
      * the original corpus. */
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def docsAt(k: Int): DataFrame =
      (0 until k).map { i =>
        val rot = alpha.drop(i % 26) + alpha.take(i % 26)
        base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          (if (i == 0) col("text")
           else translate(col("text"), alpha, rot)).as("text"),
          col("source"), col("n_chars"))
      }.reduce(_ unionByName _)

    def mutated(docs: DataFrame, off: Long): DataFrame =
      docs.select((col("doc_id") + off).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))

    def tmp(name: String): String =
      java.nio.file.Files.createTempDirectory(s"graft-bx-$name").toString + "/t"

    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    def run(op: String, k: Int, rows: Long)(df: => DataFrame): Unit =
      if (only.isEmpty || only(op)) {
        spark.sparkContext.setJobDescription(s"bx:$op@${k}x")
        val sec = bestOf(2)(timeNoop(df))
        spark.sparkContext.setJobDescription(null)
        val line =
          f"""{"op":"$op","repl":$k,"rows":$rows,"sec":$sec%.3f}"""
        results += line
        System.out.println(line)
      }

    for (k <- Seq(1, repl)) {
      val docs = docsAt(k).select(col("doc_id"), col("text"))
      val nd = docs.count() // outside any timed region

      // q13 shape: minhash near-dup pairs over docs + token-dropped copies
      run("minhash_pairs", k, 2 * nd) {
        graft.ops.DedupOps.nearDupPairs(
          docs.unionByName(mutated(docs, 1000000L)), "text", "doc_id", 0.5)
      }
      // q39 shape: two-level mutation chains resolved by CC, min-id keeper
      val chain3 = {
        val m1 = mutated(docs, 1000000L)
        docs.unionByName(m1).unionByName(mutated(m1, 1000000L))
      }
      run("cc_dedup", k, 3 * nd) {
        graft.ops.DedupOps.dropNearDupsCC(chain3, "text", "doc_id",
          threshold = 0.8, candidateThreshold = 0.4, rowsPerBand = 3)
      }
      // q104 shape: quality keeper
      run("cc_keeper", k, 3 * nd) {
        graft.ops.DedupOps.dropNearDupsCC(
          chain3.withColumn("quality",
            pmod(graft.functions.splitmix64(col("doc_id")), lit(1000L))),
          "text", "doc_id", threshold = 0.8, candidateThreshold = 0.4,
          rowsPerBand = 3, qualityCol = Some("quality"))
      }
      // q72 machinery: 64-bit fingerprint Hamming join (hashes mostly
      // distinct — measures the block-join, not fixture dup growth)
      run("fingerprint_pairs", k, nd) {
        graft.ops.DedupOps.fingerprintNearDupPairs(
          docs.select(col("doc_id"),
            graft.functions.splitmix64(col("doc_id")).as("fp")),
          "fp", "doc_id", maxHamming = 3)
      }
      // q97 shape: dangling-mass PageRank; host count scales with k
      run("pagerank_dangling", k, 3 * nd) {
        val hosts = 7 * k
        val m = (col("doc_id") % 50).cast("string")
        val url = concat(lit("https://h"), (col("doc_id") % hosts).cast("string"),
          lit(".example/dir/page"), (col("doc_id") % 3).cast("string"))
        val html = concat(
          lit("<html><body><a href=\"/p/"), m, lit("\">x</a> "),
          lit("<a href=\"//cdn.example/r/"), m, lit("\">z</a> "),
          lit("<a href=\"https://abs"), m, lit(".example/z\">w</a></body></html>"))
        val edges = docs
          .withColumn("link",
            explode(graft.functions.extract_links(encode(html, "UTF-8"), url)))
          .select(parse_url(url, lit("HOST")).as("src"),
            parse_url(col("link"), lit("HOST")).as("dst"))
        graft.ops.GraphOps.pageRank(edges, "src", "dst", iters = 2,
          redistributeDangling = true)
      }
      // q98 shape: committed index build (cold cost, fresh dir per trial)
      // then batch classify against a pre-committed index (warm, untimed
      // build outside the clock)
      run("dedup_index_build", k, nd) {
        graft.ops.DedupOps.indexFor(docs, "text", "doc_id", tmp(s"dedupidx-$k-cold"))
      }
      val idxDir = tmp(s"dedupidx-$k")
      graft.ops.DedupOps.indexFor(docs, "text", "doc_id", idxDir) // pre-commit
      run("dedup_incremental_warm", k, nd) {
        val index = graft.ops.DedupOps.indexFor(docs, "text", "doc_id", idxDir)
        val id = col("doc_id").cast("string")
        val batch = docs.select((col("doc_id") + 100000000L).as("doc_id"),
          when(col("doc_id") % 3 === 0, col("text"))
            .when(col("doc_id") % 3 === 1,
              expr("substring(text, instr(text, ' ') + 1)"))
            .otherwise(concat(lit("zx"), id, lit(" qv"), id)).as("text"))
        graft.ops.DedupOps.dedupAgainstIndex(batch, index, "text", "doc_id", 0.5)
      }
      // q99 shape: BM25 against a committed inverted file (uncapped like q99)
      run("bm25_index_build", k, nd) {
        graft.ops.Bm25.indexFor(docs, "text", "doc_id", tmp(s"bm25-$k-cold"))
      }
      val bmDir = tmp(s"bm25-$k")
      graft.ops.Bm25.indexFor(docs, "text", "doc_id", bmDir) // pre-commit
      run("bm25_topk_warm", k, nd) {
        val terms = Seq("q0" -> "join", "q0" -> "hash", "q1" -> "scan",
          "q1" -> "slow", "q1" -> "fast", "q2" -> "customer", "q2" -> "order",
          "q2" -> "line", "q3" -> "vector", "q3" -> "column", "q4" -> "window",
          "q4" -> "merge", "q4" -> "batch").toDF("query_id", "term")
        graft.ops.Bm25.topK(
          graft.ops.Bm25.indexFor(docs, "text", "doc_id", bmDir),
          terms, "doc_id", k = 10, maxDfPermille = 1000)
      }
      // q49 shape: two-phase host cap
      run("host_cap", k, nd) {
        graft.ops.CurationOps.hostCap(
          docs.withColumn("host",
            concat(lit("h"), (col("doc_id") % 7).cast("string"), lit(".example"))),
          "host", "doc_id", k = 100)
      }
      // q85 shape: sequence packing (two-level prefix sum)
      run("pack_sequences", k, nd) {
        graft.ops.CurationOps.packSequences(docs, "text", "doc_id", seqLen = 128)
      }
      // q103 shape: token-budget mixture
      run("token_mix", k, nd) {
        graft.ops.CurationOps.tokenBudgetMix(
          docsAt(k).select(col("doc_id"), col("source"), col("n_chars")),
          "doc_id", "source", "n_chars",
          Seq("src0" -> 400L, "src1" -> 300L, "src2" -> 200L, "src3" -> 0L),
          budget = 10000L * k)
      }
      // q34/q41 machinery: embedding LSH + CC over splitmix vectors
      val emb = spark.range(2000L * k).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          (graft.functions.splitmix64(col("id") * 64 + i)
            .cast("double") / lit(9.223372036854776e18)).cast("float"))
          .as("embedding"))
      run("embedding_pairs", k, 2000L * k) {
        graft.ops.SimilarityOps.embeddingNearDupPairs(
          emb, "embedding", "vec_id", threshold = 0.95, approxRows = 2000L * k)
      }
      run("embedding_cc", k, 2000L * k) {
        graft.ops.SimilarityOps.dropEmbeddingDupsCC(
          emb, "embedding", "vec_id", threshold = 0.95, approxRows = 2000L * k)
      }
    }
    System.out.println(results.mkString("[", ",", "]"))
    spark.stop()
  }
}
