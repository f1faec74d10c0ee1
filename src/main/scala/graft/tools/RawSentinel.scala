package graft.tools

/**
 * Raw-extractor contention sentinels (NO Spark in the loop) shared by
 * graft.Bench and graft.tools.ScalingBench: the same HTML/PDF extraction the
 * pipeline runs, driven by a plain thread pool over a fixed in-memory slice
 * of the fixture corpus. Read any Spark throughput against these — Spark ≈
 * raw-parallel means the host delivered that many effective cores and the
 * pipeline ran at parity; Spark ≪ raw-parallel (measured in the SAME process
 * and window) is a genuine pipeline fault or a starved trial window.
 */
object RawSentinel {

  private lazy val docs: Array[Array[Byte]] =
    (0 until 4000).map(i => graft.fixtures.CorpusGen.page(i.toLong).html).toArray

  def rawLoop(n: Int, offset: Int): Long = {
    val d0 = docs
    var i = 0
    var acc = 0L
    while (i < n) {
      val d = d0((i + offset) % d0.length)
      acc += (if (graft.pdf.PdfExtract.isPdfMagic(d)) graft.pdf.PdfExtract.text(d)
              else graft.html.HtmlExtract.extract(d)).length
      i += 1
    }
    acc
  }

  /** Single-thread docs/s (~40-55k on a quiet host): detects a generally-slow
    * host. Best-of-3 — one pass can eat a descheduling blip or a stray GC
    * pause and understate the host 10×. */
  def oneThread(): Double = {
    def pass(n: Int): Double = {
      val t0 = System.nanoTime()
      if (rawLoop(n, 0) == -1) println("impossible")
      n / ((System.nanoTime() - t0) / 1e9)
    }
    pass(8000) // C2 warmup
    (0 until 3).map(_ => pass(30000)).max
  }

  /** nThreads-wide docs/s: detects CORE STARVATION, which a 1-thread probe
    * cannot see (one free core keeps it fast). Max over `passes` timed passes
    * after a pool warmup. */
  def parallel(nThreads: Int, passes: Int): Double = {
    val perThread = 20000
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    try {
      def pass(): Double = {
        val t0 = System.nanoTime()
        val tasks = (0 until nThreads).map { t =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = rawLoop(perThread, t * 37)
          })
        }
        if (tasks.map(_.get()).sum == -1) println("impossible")
        nThreads.toLong * perThread / ((System.nanoTime() - t0) / 1e9)
      }
      pass() // warm the pool
      (0 until passes).map(_ => pass()).max
    } finally pool.shutdown()
  }
}
