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
 *  - a 1-thread raw-extractor sentinel (ThreadBench logic) recorded in the
 *    JSON: the extractor sustains ~40-55k docs/s/thread on this host when
 *    quiet (band re-measured after the corpus gained filter-chain PDFs), so a low sentinel marks a contended-host run as such;
 *  - input split size tuned to ≥4 splits per core.
 *
 * Scaling evidence (local[8] vs local[32]) is produced by graft.tools.ScalingBench
 * and recorded in BASELINE.md.
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

    // run-until-stable: stop once the two best trials agree within 15%
    val trials = scala.collection.mutable.ArrayBuffer.empty[Double]
    var stable = false
    while (!stable && trials.length < 8) {
      trials += time(extractPass())
      if (trials.length >= 3) {
        val best = trials.sorted.take(2)
        stable = best(1) <= best(0) * 1.15
      }
    }
    val extractSec = trials.min
    val docsPerSec = extractionDocs / extractSec

    // contention sentinel: raw 1-thread extractor docs/s (no Spark in the
    // loop). ~40-55k/s on a quiet host; proportionally lower when other
    // tenants hold the cores — lets a reader discount a low headline.
    val sentinel = {
      val docs = (0 until 4000).map(i => graft.fixtures.CorpusGen.page(i.toLong).html).toArray
      def pass(n: Int): Double = {
        val t0 = System.nanoTime()
        var i = 0
        var acc = 0L
        while (i < n) {
          val d = docs(i % docs.length)
          acc += (if (graft.pdf.PdfExtract.isPdfMagic(d)) graft.pdf.PdfExtract.text(d)
                  else graft.html.HtmlExtract.extract(d)).length
          i += 1
        }
        if (acc == -1) println("impossible")
        n / ((System.nanoTime() - t0) / 1e9)
      }
      pass(8000) // C2 warmup (already warm from Spark passes, but cheap)
      pass(30000)
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val trialsJson = trials.map(t => f"$t%.3f").mkString("[", ",", "]")
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","extract_docs":$extractionDocs,"extract_sec":$extractSec%.3f,"extract_trials_sec":$trialsJson,"extract_docs_per_sec":$docsPerSec%.1f,"sentinel_1thr_docs_per_sec":$sentinel%.1f,"cpus":"$cpus"}"""
    // file mirror first (driver fallback), then the bare line LAST on stdout
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), json + "\n")
    catch { case _: Throwable => }
    spark.stop() // stop before the final println so no log line trails the JSON
    System.out.println(json)
    System.out.flush()
  }
}
