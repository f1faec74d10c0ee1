package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Fixed-point PageRank on a hand-computable graph. All arithmetic is Long
  * floor division, so every expected value below is derived by replaying the
  * documented recurrence by hand. */
class GraphOpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // a -> b, a -> c, b -> c; c dangles (contributes nothing)
  private def edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")

  test("pageRank: two hand-unrolled iterations on a 3-node chain") {
    // r0 = 1_000_000 each; deg(a)=2, deg(b)=1
    // iter1: in(b) = 1000000 div 2 = 500000 ; in(c) = 500000 + 1000000
    //   r1(a) = 150000 ; r1(b) = 150000 + 850*500000 div 1000 = 575000
    //   r1(c) = 150000 + 850*1500000 div 1000 = 1425000
    // iter2: in(b) = 150000 div 2 = 75000 ; in(c) = 75000 + 575000 = 650000
    //   r2(a) = 150000 ; r2(b) = 150000 + 850*75000 div 1000 = 213750
    //   r2(c) = 150000 + 850*650000 div 1000 = 702500
    val got = GraphOps.pageRank(edges, "src", "dst", iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("a" -> 150000L, "b" -> 213750L, "c" -> 702500L))
  }

  test("pageRank: zero iterations returns the uniform init; multi-edges count once") {
    val got0 = GraphOps.pageRank(edges, "src", "dst", iters = 0)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got0 == Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L))
    val dup = edges.unionByName(edges) // same edges twice
    val got = GraphOps.pageRank(dup, "src", "dst", iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("c") == 702500L, "duplicate edges must not double-count contributions")
  }

  test("pageRank: partition-count invariance (Long floor math, no float sums)") {
    val e = (0L until 400L).map(i => (s"h${i % 20}", s"h${(i * 7 + 3) % 20}")).toDF("src", "dst")
    val a = GraphOps.pageRank(e.repartition(1), "src", "dst", iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = GraphOps.pageRank(e.repartition(17), "src", "dst", iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("hostDegrees: in/out rollup with zero-fill on one-sided hosts") {
    val got = GraphOps.hostDegrees(edges, "src", "dst")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 2L, 0L), ("b", 1L, 1L), ("c", 0L, 2L)))
  }

  test("deep runs stay computable (the every-10-iterations lineage checkpoint)") {
    // 25 iterations on a cycle: total rank is conserved by the recurrence up
    // to floor truncation, and the run must not blow up analysis time
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val got = GraphOps.pageRank(e, "src", "dst", iters = 25)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // a 3-cycle with outdeg 1 everywhere sits exactly AT the fixed point:
    // r = 150000 + 850*1000000 div 1000 = 1000000, no truncation drift
    assert(got.values.toSet == Set(1000000L), got.toString)
  }

  test("null endpoints drop out of the edge set") {
    val e = Seq((Some("a"), Some("b")), (None, Some("b")), (Some("a"), None))
      .toDF("src", "dst")
    val got = GraphOps.pageRank(e, "src", "dst", iters = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // one edge a->b: r1(a)=150000, r1(b)=150000+850*1000000 div 1000=1000000
    assert(got == Map("a" -> 150000L, "b" -> 1000000L))
  }
}
