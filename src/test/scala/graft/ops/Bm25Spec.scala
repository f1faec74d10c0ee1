package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class Bm25Spec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def queries(pairs: (String, String)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("query_id", "term")
  }

  /** Exact reference BM25 on driver-side text, with the SAME fixed-point
    * contract (milli k1/b, floor divs, micro-nat idf) — an independent
    * implementation, not a replay of the Spark plan. */
  private def referenceScores(texts: Map[Long, String], terms: Seq[String],
                              k1Milli: Long = 1200, bMilli: Long = 750): Map[Long, Long] = {
    val toks = texts.map { case (id, t) => id -> t.split(' ').filter(_.nonEmpty).toSeq }
    val n = toks.size.toLong
    val sumdl = toks.values.map(_.size.toLong).sum
    val avgdlMilli = (1000L * sumdl) / n
    val df = terms.map(t => t -> toks.values.count(_.contains(t)).toLong).toMap
    toks.map { case (id, tk) =>
      val dl = tk.size.toLong
      val score = terms.map { term =>
        val tf = tk.count(_ == term).toLong
        if (tf == 0 || df(term) == 0) 0L
        else {
          val idf = math.floor(1e6 * math.log((2.0 * n + 2) / (2.0 * df(term) + 1))).toLong
          val norm = (1000 - bMilli) + (bMilli * dl * 1000) / avgdlMilli
          val denom = tf * 1000 + (k1Milli * norm) / 1000
          val sat = (tf * (1000 + k1Milli) * 1000) / denom
          (idf * sat) / 1000
        }
      }.sum
      id -> score
    }
  }

  test("search matches an independent exact BM25 on every returned row") {
    val terms = Seq("join", "hash", "vector")
    // maxDfPermille = 1000: the synthetic vocabulary puts every term in
    // ~77% of docs, and this test checks the UNCAPPED exact contract
    val out = Bm25.search(docs, queries(terms.map("q0" -> _): _*),
        "text", "doc_id", k = 10, maxDfPermille = 1000)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ref = referenceScores(texts, terms)
    // ranks are 1..10 with descending scores, doc_id ascending on ties
    assert(out.map(_._1).toSeq == (1 to 10))
    out.sliding(2).foreach { case Array((_, idA, sA), (_, idB, sB)) =>
      assert(sA > sB || (sA == sB && idA < idB), s"order violated: $sA/$idA vs $sB/$idB")
    }
    // every returned score is the reference score, and the top-1 is the
    // reference argmax (min id on ties)
    out.foreach { case (_, id, s) => assert(s == ref(id), s"doc $id: $s vs ${ref(id)}") }
    val best = ref.toSeq.sortBy { case (id, s) => (-s, id) }.head
    assert((out.head._2, out.head._3) == best)
  }

  test("per-query isolation: scores depend only on that query's terms") {
    val both = Bm25.search(docs,
        queries("qa" -> "join", "qb" -> "vector", "qb" -> "merge"),
        "text", "doc_id", k = 5, maxDfPermille = 1000)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val solo = Bm25.search(docs, queries("qa" -> "join"), "text", "doc_id",
        k = 5, maxDfPermille = 1000)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(both.filter(_._1 == "qa") == solo)
  }

  test("maxDf cap drops stop-word terms from the candidate join") {
    // 'join' appears in nearly every synthetic doc; with a 100-permille df
    // cap its postings never join, so a join+rare query equals the rare-only
    // query, while the default cap keeps it
    val capped = Bm25.search(docs, queries("q" -> "join", "q" -> "vector"),
        "text", "doc_id", k = 5, maxDfPermille = 100)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    val rareOnly = Bm25.search(docs, queries("q" -> "vector"),
        "text", "doc_id", k = 5, maxDfPermille = 100)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(capped == rareOnly)
    val uncapped = Bm25.search(docs, queries("q" -> "join", "q" -> "vector"),
        "text", "doc_id", k = 5, maxDfPermille = 1000)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(uncapped != capped)
  }

  test("DEFAULT maxDf cap is on: a corpus-frequency stop word never reaches the rank window") {
    // 'join' sits in ~77% of the synthetic docs (> the 500-permille default),
    // so the library default must drop its postings from the candidate join
    // — the r07-verdict footgun: an uncapped default dragged a most-of-corpus
    // postings list into ONE per-query window partition
    val dflt = Bm25.search(docs, queries("q" -> "join", "q" -> "vector"),
        "text", "doc_id", k = 5)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    val rareOnly = Bm25.search(docs, queries("q" -> "vector"),
        "text", "doc_id", k = 5)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(dflt == rareOnly)
  }

  test("two-level rank window: any fanout returns the identical ranking") {
    // the salted local top-k prunes only rows that cannot be in the global
    // top-k, so output is bit-identical at every fanout (incl. disabled)
    val q = queries("q0" -> "join", "q0" -> "vector", "q1" -> "merge")
    def rows(fanout: Int) =
      Bm25.search(docs, q, "text", "doc_id", k = 7,
          maxDfPermille = 1000, rankFanout = fanout)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
        .sortBy(t => (t._1, t._2))
    val base = rows(1) // local level disabled: the single-window reference
    assert(rows(0) == base)   // auto fanout
    assert(rows(4) == base)
    assert(rows(97) == base)
  }

  test("committed inverted file: ranked results identical, index built exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("bm25-idx").toString
    val q = queries("q0" -> "join", "q0" -> "vector")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val fresh = rows(Bm25.search(docs, q, "text", "doc_id", k = 10))
    val committed = rows(Bm25.topK(
      Bm25.indexFor(docs, "text", "doc_id", dir), q, "doc_id", k = 10))
    assert(committed == fresh)
    // second indexFor reads, never rebuilds (manifest + data untouched)
    def stamps = {
      def walk(f: java.io.File): Seq[String] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(f.getPath + ":" + f.lastModified())
      walk(new java.io.File(dir)).sorted
    }
    val before = stamps
    val again = rows(Bm25.topK(
      Bm25.indexFor(docs, "text", "doc_id", dir), q, "doc_id", k = 10))
    assert(stamps == before, "indexFor rewrote a committed index")
    assert(again == fresh)
    // a half-write (data, no manifest) must be refused, not half-read
    val dir2 = java.nio.file.Files.createTempDirectory("bm25-idx-half").toString
    Bm25.buildIndex(docs, "text", "doc_id").write.parquet(s"$dir2/data")
    intercept[IllegalArgumentException] {
      graft.pipeline.CatalogIO.readDerived(spark, dir2)
    }
  }

  test("docs matching no query term never appear; k bounds each query") {
    val out = Bm25.search(docs,
        queries("q0" -> "join", "q1" -> "nosuchtokenanywhere"), "text", "doc_id",
        k = 3, maxDfPermille = 1000)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(out.count(_._1 == "q0") == 3)
    assert(!out.exists(_._1 == "q1")) // zero candidates, zero rows
    assert(out.forall(_._3 > 0)) // every emitted score strictly positive
  }
}
