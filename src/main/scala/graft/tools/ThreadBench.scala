package graft.tools

import graft.fixtures.CorpusGen
import graft.html.HtmlExtract
import graft.pdf.PdfExtract

/** Spark-free extraction microbenchmark: isolates extractor thread-scaling from
  * Spark plumbing (used to diagnose flat scaling in ScalingBench). */
object ThreadBench {
  def main(args: Array[String]): Unit = {
    val nThreads = args.headOption.map(_.toInt).getOrElse(8)
    val docsPerThread = args.lift(1).map(_.toInt).getOrElse(30000)
    val kindFilter = args.lift(2) // html | pdf | all
    val docs = (0 until 20000).map(i => CorpusGen.page(i.toLong))
      .filter(p => kindFilter.forall(k => k == "all" || p.kind == k))
      .map(_.html).toArray
    require(docs.nonEmpty, "no docs after kind filter")
    (0 until 30000).foreach { i =>
      val d = docs(i % docs.length)
      if (PdfExtract.isPdfMagic(d)) PdfExtract.text(d) else HtmlExtract.extract(d)
    }
    val stage = args.lift(3).getOrElse("extract") // extract | decode
    val t0 = System.nanoTime()
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        var i = 0
        var acc = 0L
        while (i < docsPerThread) {
          val d = docs((t * 7919 + i) % docs.length)
          val n = stage match {
            case "decode" => HtmlExtract.decode(d).length
            case _ =>
              (if (PdfExtract.isPdfMagic(d)) PdfExtract.text(d) else HtmlExtract.extract(d)).length
          }
          acc += n
          i += 1
        }
        if (acc == -1) println("impossible")
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    val total = nThreads.toLong * docsPerThread
    println(f"threads=$nThreads docs=$total sec=$sec%.2f docs_per_sec=${total / sec}%.1f per_thread_per_sec=${total / sec / nThreads}%.1f")
  }
}
