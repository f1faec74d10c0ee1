package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.expr.AhoCorasick

/** The blocklist gate at its own documented scale: 10^5-entry lists must
  * plan and execute (the per-entry Column form died in codegen at 10^4),
  * and the matching semantics must be unchanged from the OR-chain era. */
class BlocklistSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def docs(urls: Seq[String]) =
    urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("doc_id", "url")

  test("domain semantics: exact, subdomain, case, null-survives, no substring leak") {
    val d = docs(Seq(
      "http://spam.example/x",          // exact — drop
      "http://a.b.SPAM.example/x",      // deep subdomain — drop
      "http://notspam.example/x",       // suffix of label, NOT dot-suffix — keep
      "http://spam.example.com/x",      // different registrable domain — keep
      null,                             // null url — survive
      "http://ok.example/x"))
    val kept = CurationOps.urlBlocklistFilter(d, "url", Seq("spam.example"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L, 5L))
  }

  test("substring semantics: case-insensitive containment, null-survives") {
    val d = docs(Seq(
      "http://a.example/TAG/7",         // case-insensitive hit — drop
      "http://a.example/article/7",     // keep
      null))
    val kept = CurationOps.urlBlocklistFilter(d, "url", Nil, Seq("/tag/"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("10^5-entry domain list plans and executes (the round-5 scale-killer)") {
    val domains = (0 until 100000).map(i => s"blocked$i.example")
    val d = docs(Seq(
      "http://blocked0.example/x",
      "http://www.blocked99999.example/x",
      "http://fine.example/x",
      "http://blocked100000.example/x")) // not in the list
    val t0 = System.nanoTime()
    val kept = CurationOps.urlBlocklistFilter(d, "url", domains)
      .select("doc_id").as[Long].collect().toSet
    val secs = (System.nanoTime() - t0) / 1e9
    assert(kept == Set(2L, 3L))
    assert(secs < 60.0, s"planning+execution took ${secs}s — the expression-tree era is back")
  }

  test("10^5-entry substring list via Aho-Corasick matches a contains-chain oracle") {
    val pats = (0 until 100000).map(i => s"/frag$i/")
    val d = docs(Seq(
      "http://a.example/frag0/x",
      "http://a.example/frag99999/x",
      "http://a.example/frag100000/x",   // looks close but /frag100000/ not in list... contains /frag10000 + "0/" — careful
      "http://a.example/clean/x"))
    val kept = CurationOps.urlBlocklistFilter(d, "url", Nil, pats)
      .select("doc_id").as[Long].collect().toSet
    // "/frag100000/" CONTAINS no listed pattern? It contains "/frag10000" but
    // patterns end with '/' — "/frag10000/" is not a substring of
    // "/frag100000/". So only doc 3 and doc 2 survive.
    assert(kept == Set(2L, 3L))
  }

  test("Aho-Corasick agrees with naive multi-contains on adversarial overlaps") {
    val pats = Array("abc", "bcd", "c", "cdcd", "dd", "xyzzy")
    val ac = new AhoCorasick(pats)
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val s = (0 until rnd.nextInt(30)).map(_ => "abcdxyz".charAt(rnd.nextInt(7))).mkString
      val naive = pats.exists(s.contains(_))
      assert(ac.containsAny(s) == naive, s"mismatch on '$s'")
    }
    assert(!ac.containsAny(""))
    assert(!new AhoCorasick(Array.empty[String]).containsAny("anything"))
    assert(!new AhoCorasick(Array("")).containsAny("x"), "empty pattern must never match")
  }

  test("the domain gate stays a narrow filter: no join, no explode in the plan") {
    val d = docs(Seq("http://a.example/x"))
    val plan = CurationOps.urlBlocklistFilter(d, "url",
      (0 until 1000).map(i => s"b$i.example"), Seq("/t/"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "blocklist must not join the corpus")
    assert(!plan.contains("Generate"), "blocklist must not explode the corpus")
  }
}
