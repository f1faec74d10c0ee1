package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/**
 * Two-cluster-size scaling evidence (BASELINE.json north rule: ≥0.8 throughput
 * scaling efficiency from N to 4N executors). No real cluster exists in this
 * sandbox, so the same job runs at two parallelism levels (e.g. local[8] vs
 * local[32]) on the same parquet input; efficiency = (docsPerSec_4N / docsPerSec_N) / 4.
 *
 * Methodology notes (learned the hard way):
 *  - corpus materialized to parquet once, outside timing (the metric is docs/sec
 *    extracted *from a table*, the pipeline's real input shape);
 *  - ONE measurement per JVM: JIT state must not leak between the two runs
 *    (a shared JVM gave the second run a fully-C2-compiled extractor and a
 *    nonsense 5× "efficiency");
 *  - a 10%-of-data warmup pass precedes the timed pass (C2 compilation of the
 *    tokenizer/parser loops needs ~10^4 invocations);
 *  - the job must be big enough that task-scheduling overhead doesn't floor
 *    wall time (40k docs ≈ 8 CPU-s measures only overhead).
 *
 * Usage:
 *   ScalingBench gen <nDocs> <dir>          — materialize corpus parquet
 *   ScalingBench measure <cores> <nDocs> <dir>  — one timed run, one JSON line
 */
object ScalingBench {

  private def session(cores: Int, name: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def corpusPath(dir: String, nDocs: Long) = s"$dir/pages_$nDocs"

  def main(args: Array[String]): Unit = args.toList match {
    case "gen" :: n :: dir :: Nil =>
      val nDocs = n.toLong
      val s = session(32, "graft-scaling-gen")
      val p = new org.apache.hadoop.fs.Path(corpusPath(dir, nDocs))
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) {
        graft.fixtures.Corpus.pages(s, nDocs, 42L, parallelism = 256)
          .write.mode("overwrite").parquet(p.toString)
        println(s"""{"gen":"$p","n_docs":$nDocs}""")
      } else println(s"""{"gen":"$p","n_docs":$nDocs,"cached":true}""")
      s.stop()

    case "measure" :: c :: n :: dir :: Nil =>
      measureAt(c.toInt, corpusPath(dir, n.toLong), maxTrials = 8)

    // direct-path variant (graft.Bench spawns this in fresh child JVMs for the
    // in-artifact local[2]-vs-local[8] scaling pair); optional trials cap
    case "measurePath" :: c :: path :: rest if rest.length <= 1 =>
      measureAt(c.toInt, path, maxTrials = rest.headOption.map(_.toInt).getOrElse(8))

    case _ =>
      System.err.println("usage: ScalingBench gen <nDocs> <dir> | measure <cores> <nDocs> <dir> | measurePath <cores> <path> [maxTrials]")
      sys.exit(2)
  }

  private def measureAt(cores: Int, path: String, maxTrials: Int): Unit = {
      val s = session(cores, s"graft-scaling-$cores")
      // ≥4 input splits per core so the long tail doesn't idle the extra cores
      val total = {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).getContentSummary(p).getLength
      }
      val splitBytes = math.max(2L << 20, total / (cores * 4L))
      s.conf.set("spark.sql.files.maxPartitionBytes", splitBytes.toString)
      s.conf.set("spark.sql.files.openCostInBytes", (256 << 10).toString)
      def pass(): Long =
        s.read.parquet(path)
          .select(graft.functions.text_digest(graft.functions.extract_any_text(col("html"))).as("d"))
          .filter(col("d").isNotNull).count()
      pass() // warmup: full pass (C2 + page cache) — JIT needs ~10^4 invocations
      // run-until-stable (same rule as graft.Bench): the sandbox is a shared
      // host; keep timing until the two best trials agree within 15% (min 3,
      // cap 8) so a monotone-improving sequence isn't cut off mid-descent
      val trials = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      var stable = false
      while (!stable && trials.length < maxTrials) {
        val t0 = System.nanoTime()
        val counted = pass()
        trials += ((counted, (System.nanoTime() - t0) / 1e9))
        if (trials.length >= 3) {
          val best = trials.map(_._2).sorted.take(2)
          stable = best(1) <= best(0) * 1.15
        }
      }
      // per-JVM raw-parallel sentinel, measured ADJACENT to the trials in the
      // SAME (ActiveProcessorCount-pinned) process: this JVM's deliverable
      // extraction rate at `cores` threads right now. A Spark rate far below
      // it means the trial windows were starved by host tenants — keep timing
      // within the cap (the headline's adaptive trick); whatever remains is
      // printed so the parent artifact can condemn a still-bad level instead
      // of certifying it (the round-4 failure: a starved local[2] child read
      // 19.5k against a healthy local[8] and published efficiency 2.39).
      var sentinel = RawSentinel.parallel(cores, 2)
      def bestRate = trials.map(t => t._1 / t._2).max
      while (trials.length < maxTrials + 4 && bestRate < 0.5 * sentinel) {
        val t0 = System.nanoTime()
        val counted = pass()
        trials += ((counted, (System.nanoTime() - t0) / 1e9))
        sentinel = math.max(sentinel, RawSentinel.parallel(cores, 1))
      }
      val (counted, sec) = trials.minBy(_._2)
      val all = trials.map(t => f"${t._2}%.2f").mkString("[", ",", "]")
      println(
        f"""{"cores":$cores,"master":"${s.sparkContext.master}","n_docs":$counted,"sec":$sec%.2f,"trials_sec":$all,"docs_per_sec":${counted / sec}%.1f,"sentinel_parallel_docs_per_sec":$sentinel%.1f}""")
      s.stop()
  }
}
