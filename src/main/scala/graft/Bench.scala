package graft

import org.apache.spark.sql.SparkSession

/**
 * Per-round benchmark main (driver-run): times every SparkEntry query on
 * SPARK_GRAFT_SF_DIR, plus the extraction-pipeline headline (docs/sec over the
 * deterministic fixture corpus — the BASELINE.json metric). Prints ONE JSON
 * line as the LAST stdout line and mirrors it to BENCH_LOCAL.json in the cwd.
 *
 * Methodology (same as tools.ScalingBench, the repo's measured-ladder source):
 *  - corpus materialized to parquet once, OUTSIDE timing;
 *  - ≥1M docs so the timed job is ≥30 CPU-seconds (smaller jobs measure task
 *    scheduling, not extraction — the round-1 default of 100k docs reported
 *    4.2× below the repo's own ladder for exactly this reason);
 *  - corpus parquet bytes pre-touched (sequential read to /dev/null) so the
 *    first timed pass isn't paying cold page cache after a corpus (re)gen;
 *  - one full warmup pass (C2 compilation of tokenizer/parser loops);
 *  - run-until-stable timed passes: keep timing until the two best trials
 *    agree within 15% (min 3, cap 8 trials) — fixed best-of-3 recorded a
 *    strictly-decreasing [32.5, 20.2, 13.7] in round 2, i.e. it stopped
 *    before the measurement converged;
 *  - TWO raw-extractor sentinels (no Spark in the loop) recorded in the JSON:
 *    1-thread (~40-55k docs/s/thread quiet — detects a generally-slow host)
 *    and cpus-thread (detects CORE STARVATION, which a 1-thread sentinel
 *    cannot see: one free core keeps it fast). Read the headline against
 *    sentinel_parallel: Spark ≈ raw-parallel means the host had that many
 *    effective cores and the pipeline is at parity; Spark ≪ raw-parallel
 *    would be a genuine pipeline regression;
 *  - an in-artifact scaling pair: the same extraction job on the same corpus
 *    in fresh child JVMs pinned to 2 and 8 cores (the sandbox stand-in for
 *    N vs 4N executors), scaling_eff_2_to_8 = rate8 / (4 × rate2). Each
 *    child carries its OWN raw-parallel sentinel; a child whose Spark rate
 *    sits below half its sentinel was starved by host tenants and re-runs
 *    (cap 3), and the JSON labels the final pair scaling_pair_status
 *    "ok"/"starved" — a pair with eff outside [0.5, 1.1] is never published
 *    unannotated;
 *  - input split size tuned to ≥4 splits per core.
 *
 * The full measured ladder (separate JVMs at local[2..32]) is produced by
 * graft.tools.ScalingBench and recorded in BASELINE.md.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // sf0.1 sweep queries shuffle kilobytes: let AQE coalesce their shuffles
      // to a handful of partitions instead of 32 near-empty tasks each — the
      // 43-query sweep is mostly scheduling floor, and fewer tasks also
      // shrinks the host-contention surface the driver runs keep tripping on
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // warm the JVM/codegen once on the smallest scale
    try SparkEntry.queries.values.foreach(q => q(spark, "/root/testdata/sf0.001").count())
    catch { case _: Throwable => }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try time(fn(spark, sfDir).count()) catch { case _: Throwable => -1.0 }
      name -> sec
    }

    // extraction headline: docs/sec from a materialized parquet table (the
    // BASELINE.json metric shape); corpus gen excluded from timing
    val extractionDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "1000000").toLong
    // cache key includes a generator fingerprint: a stale corpus from an older
    // CorpusGen would otherwise be silently reused and the headline would
    // compare different inputs across rounds
    val genTag = {
      val p = graft.fixtures.CorpusGen.page(0L)
      f"${java.util.Arrays.hashCode(p.html) ^ p.url.hashCode}%08x"
    }
    val corpusPath = s"/tmp/graft-bench-pages-$extractionDocs-$genTag"
    // evict stale sibling corpora (older generator tags) — each is multi-GB
    // and /tmp would otherwise accumulate one per generator change
    Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s"graft-bench-pages-$extractionDocs-") &&
        f.getPath != corpusPath)
      .foreach { stale =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete()
        }
        rm(stale)
      }
    import org.apache.spark.sql.functions.col
    if (!new java.io.File(corpusPath).exists())
      graft.fixtures.Corpus.pages(spark, extractionDocs, parallelism = 256)
        .write.mode("overwrite").parquet(corpusPath)
    // ≥4 input splits per core so the long tail doesn't idle cores
    val totalBytes = {
      val p = new org.apache.hadoop.fs.Path(corpusPath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).getContentSummary(p).getLength
    }
    val splitBytes = math.max(2L << 20, totalBytes / (cpus.toInt * 4L))
    spark.conf.set("spark.sql.files.maxPartitionBytes", splitBytes.toString)
    spark.conf.set("spark.sql.files.openCostInBytes", (256 << 10).toString)

    // pre-touch: stream every corpus file through a discard buffer so the OS
    // page cache is warm before the warmup pass (eviction of stale corpora
    // above can leave this round's corpus cold on first read)
    locally {
      val buf = new Array[Byte](1 << 20)
      def touch(f: java.io.File): Unit =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(touch)
        else {
          val in = new java.io.FileInputStream(f)
          try { while (in.read(buf) >= 0) () } finally in.close()
        }
      touch(new java.io.File(corpusPath))
    }

    def extractPass(): Long =
      spark.read.parquet(corpusPath)
        .select(graft.functions.text_digest(graft.functions.extract_any_text(col("html"))).as("d"))
        .filter(col("d").isNotNull).count()
    extractPass() // warmup (C2)

    // run-until-stable: keep timing until the two best trials agree within
    // 15% (a strictly-decreasing fixed-count series means the measurement
    // never converged); System.gc() between trials so one pass's allocation
    // debt isn't charged to the next
    def stableMin(minTrials: Int, cap: Int)(f: => Double): (Double, Seq[Double]) = {
      val ts = scala.collection.mutable.ArrayBuffer.empty[Double]
      var stable = false
      while (!stable && ts.length < cap) {
        System.gc()
        ts += f
        if (ts.length >= minTrials) {
          val best = ts.sorted.take(2)
          stable = best(1) <= best(0) * 1.15
        }
      }
      (ts.min, ts.toSeq)
    }
    // contention sentinels: raw extractor docs/s with NO Spark in the loop
    // (graft.tools.RawSentinel — shared with ScalingBench children), measured
    // ADJACENT to the headline trials so they describe the same host window.
    // 1-thread (~40-55k/s/thread quiet) detects a generally-slow host;
    // cpus-thread detects CORE STARVATION, which a 1-thread sentinel cannot
    // see (one free core keeps it fast — round-3 verdict). Read the headline
    // against raw-parallel: Spark ≈ raw-parallel ⇒ the gap to BASELINE.md is
    // the host's free-core count, not a pipeline regression; Spark ≪
    // raw-parallel ⇒ genuine pipeline fault.
    import graft.tools.RawSentinel
    def oneThreadSentinel(): Double = RawSentinel.oneThread()
    def parallelSentinel(passes: Int): Double = RawSentinel.parallel(cpus.toInt, passes)

    val (_, trials0) = stableMin(3, 8)(time(extractPass()))
    val trials = scala.collection.mutable.ArrayBuffer(trials0: _*)
    var sentinelParallel = parallelSentinel(2)
    // adaptive: the quiet-host pipeline runs at ≳1× the raw-parallel rate
    // (parquet decode amortizes; measured 674k Spark vs 520k raw). A best
    // trial far below what the raw sentinel proves the host can deliver
    // RIGHT NOW means the trial window was starved — keep timing within the
    // cap instead of certifying a contended reading (the round-1..3 failure:
    // three driver artifacts recorded starved windows as the headline).
    while (trials.length < 8 && extractionDocs / trials.min < 0.5 * sentinelParallel) {
      System.gc()
      trials += time(extractPass())
      sentinelParallel = math.max(sentinelParallel, parallelSentinel(1))
    }
    val extractSec = trials.min
    val docsPerSec = extractionDocs / extractSec
    val sentinel = oneThreadSentinel()

    // scaling evidence IN the artifact: the same extraction job on the same
    // corpus in two FRESH child JVMs at local[2] and local[8] — the ladder
    // methodology (one measurement per JVM; a shared JVM leaks C2 state into
    // the second run) and the sandbox's stand-in for the N-vs-4N-executor
    // criterion. Efficiency = rate(8) / (4 × rate(2)). An in-JVM coalesce(p)
    // variant was tried first and under-reads: capping tasks to p removes
    // multi-wave balancing from the wide level only, charging the tail to
    // scaling. Children inherit this JVM's exact flags (add-opens, ParallelGC).
    def childRun(cores: Int): (Double, Double) = {
      import scala.jdk.CollectionConverters._
      val javaBin = java.nio.file.Paths.get(System.getProperty("java.home"), "bin", "java").toString
      val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments.asScala.toSeq
      // ActiveProcessorCount pins the child to its "cluster size": GC threads,
      // netty pools, availableProcessors all see `cores` — without it the
      // 2-core level borrows the whole machine's GC threads and reads fast,
      // understating scaling efficiency
      val cmd = Seq(javaBin) ++ inherited ++ Seq(s"-XX:ActiveProcessorCount=$cores",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.ScalingBench", "measurePath", cores.toString, corpusPath, "6")
      val proc = new ProcessBuilder(cmd.asJava).redirectErrorStream(true).start()
      val out = new String(proc.getInputStream.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      proc.waitFor()
      def grab(key: String): Double =
        ("\"" + key + "\":([0-9.]+)").r.findAllMatchIn(out).toSeq.lastOption
          .map(_.group(1).toDouble).getOrElse(-1.0)
      (grab("docs_per_sec"), grab("sentinel_parallel_docs_per_sec"))
    }
    // a child level is STARVED when its Spark rate sits far below what its
    // OWN in-process raw sentinel proves those cores could deliver in the
    // same window — the r04 failure mode (a starved local[2] child against a
    // healthy local[8] published efficiency 2.39). Starved levels re-run
    // (fresh JVM, fresh window, cap 3); whatever remains is labeled in the
    // artifact instead of silently certified.
    def healthyChild(cores: Int): (Double, Double, Boolean) = {
      var attempt = 0
      var bestRate = -1.0
      var bestSent = -1.0
      var ok = false
      while (!ok && attempt < 3) {
        val (rate, sent) = childRun(cores)
        bestRate = math.max(bestRate, rate)
        bestSent = math.max(bestSent, sent) // the host's PROVEN capability
        // verdict from the PUBLISHED pair, not this attempt's: the best Spark
        // rate must reach half of the best raw rate any window demonstrated —
        // otherwise the JSON would carry a rate its own sentinel condemns
        ok = bestRate > 0 && bestSent > 0 && bestRate >= 0.5 * bestSent
        attempt += 1
      }
      (bestRate, bestSent, ok)
    }
    val (p2Rate, p2Sent, p2Ok) = healthyChild(2)
    val (p8Rate, p8Sent, p8Ok) = healthyChild(8)
    val scalingEff = if (p2Rate > 0 && p8Rate > 0) p8Rate / (4.0 * p2Rate) else -1.0
    // the artifact judges its own pair: "ok" requires both children at raw
    // parity AND an efficiency inside the physically meaningful band — an
    // eff above 1.1 cannot come from scaling, only from a starved narrow level
    val pairStatus =
      if (p2Ok && p8Ok && scalingEff >= 0.5 && scalingEff <= 1.1) "ok" else "starved"

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val trialsJson = trials.map(t => f"$t%.3f").mkString("[", ",", "]")
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","extract_docs":$extractionDocs,"extract_sec":$extractSec%.3f,"extract_trials_sec":$trialsJson,"extract_docs_per_sec":$docsPerSec%.1f,"extract_p2_docs_per_sec":$p2Rate%.1f,"extract_p8_docs_per_sec":$p8Rate%.1f,"extract_p2_sentinel_docs_per_sec":$p2Sent%.1f,"extract_p8_sentinel_docs_per_sec":$p8Sent%.1f,"scaling_eff_2_to_8":$scalingEff%.3f,"scaling_pair_status":"$pairStatus","sentinel_1thr_docs_per_sec":$sentinel%.1f,"sentinel_parallel_docs_per_sec":$sentinelParallel%.1f,"cpus":"$cpus"}"""
    // file mirror first (driver fallback), then the bare line LAST on stdout
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), json + "\n")
    catch { case _: Throwable => }
    spark.stop() // stop before the final println so no log line trails the JSON
    System.out.println(json)
    System.out.flush()
  }
}
