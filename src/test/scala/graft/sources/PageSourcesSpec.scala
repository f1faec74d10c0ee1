package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.fixtures.CorpusGen

class PageSourcesSpec extends AnyFunSuite with SparkTestBase {

  test("binaryDir scans nested *.pdf/*.html like the reference's recursive glob") {
    val root = Files.createTempDirectory("graft-src")
    val sub = Files.createDirectory(root.resolve("nested"))
    val corpus = CorpusGen.corpus(100)
    val pdfs = corpus.filter(_.kind == "pdf").take(3)
    val htmls = corpus.filter(_.kind == "html").take(3)
    pdfs.zipWithIndex.foreach { case (p, i) =>
      Files.write(root.resolve(s"doc$i.pdf"), p.html)
    }
    htmls.zipWithIndex.foreach { case (p, i) =>
      Files.write(sub.resolve(s"page$i.html"), p.html)
    }
    Files.write(root.resolve("ignored.txt"), "not a doc".getBytes)

    val df = PageSources.binaryDir(spark, root.toString)
    assert(df.count() == 6) // txt excluded by glob; nested html found
    assert(df.columns.toSeq == Seq("url", "warc_ts", "html", "text", "lang"))

    // rows are pipeline-ready: extraction produces the by-construction text
    val got = df.withColumn("t", graft.functions.extract_any_text(col("html")))
      .select("url", "t").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    pdfs.zipWithIndex.foreach { case (p, i) =>
      val k = got.keys.find(_.endsWith(s"doc$i.pdf")).get
      assert(got(k) == p.expected)
    }
    val flat = PageSources.binaryDir(spark, root.toString, recursive = false)
    assert(flat.count() == 3) // only top-level pdfs
  }
}
