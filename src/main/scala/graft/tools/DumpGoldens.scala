package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import graft.fixtures.CorpusGen

/** One-time generator for the committed golden-digest fixture
  * (FIXTURES.md §4): url \t kind \t sha256(expected-utf8). Goldens are
  * generated from the by-construction expected text — never from the
  * pipeline under test — and committed; GoldenDigestsSpec pins the
  * extractors to them. */
object DumpGoldens {
  def sha256Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(s.getBytes(StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val out = args.lift(1).getOrElse("src/test/resources/golden_digests.tsv")
    val lines = CorpusGen.corpus(n).collect {
      case p if p.expected != null => s"${p.url}\t${p.kind}\t${sha256Hex(p.expected)}"
    }
    Files.createDirectories(Paths.get(out).getParent)
    Files.write(Paths.get(out), (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${lines.size} goldens to $out")
  }
}
