package graft.expr

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Blocklist gates that hold at their own documented scale (RefinedWeb §3.1
 * lists are 10^4-10^6 entries). The naive per-entry Column forms — one
 * `host === d || endsWith` OR-term per domain, one `contains` per substring —
 * build an O(n)-node expression tree: at 10^4 terms codegen blows the 64KB
 * JVM method limit and constant-folding time, at 10^6 the driver dies in
 * analysis. These expressions instead ship the list ONCE per executor as a
 * TorrentBroadcast (the same transport a broadcast join uses) and probe it
 * per row in O(host labels) / O(url length) — the predicate stays a narrow
 * per-row filter (no corpus explode, no row multiplication, pushdown-safe).
 */
object BlocklistRuntime {
  /** host (already lowercased) matches iff the set contains the host itself
    * or any of its dot-suffixes ("a.b.c" probes a.b.c, b.c, c). */
  def hostSuffixHit(host: UTF8String, set: java.util.HashSet[String]): Boolean = {
    val h = host.toString
    var from = 0
    while (from < h.length) {
      if (set.contains(if (from == 0) h else h.substring(from))) return true
      val dot = h.indexOf('.', from)
      if (dot < 0) return false
      from = dot + 1
    }
    false
  }
}

/** True iff the (lowercased) host column equals a blocked domain or is a
  * subdomain of one. NULL host → NULL (callers coalesce to pick the
  * survive-side, matching every other gate's quarantine-downstream stance). */
case class HostInDomainSet(child: Expression, domains: Broadcast[Array[String]])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, domains.value.length * 2))
    domains.value.foreach(d => s.add(d))
    s
  }
  def probe(host: UTF8String): Boolean = BlocklistRuntime.hostSuffixHit(host, set)

  override protected def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("domSet", this, classOf[HostInDomainSet].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): HostInDomainSet =
    copy(child = newChild)
}

/** Aho-Corasick multi-pattern containment: true iff the input contains ANY of
  * the broadcast patterns — O(input length) per row regardless of pattern
  * count (a per-pattern `contains` chain is O(patterns × length)). The
  * automaton builds once per executor from the broadcast pattern array. */
case class ContainsAnyPattern(child: Expression, patterns: Broadcast[Array[String]])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  @transient private lazy val ac = new AhoCorasick(patterns.value)
  def probe(s: UTF8String): Boolean = ac.containsAny(s.toString)

  override protected def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acSet", this, classOf[ContainsAnyPattern].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): ContainsAnyPattern =
    copy(child = newChild)
}

/** Classic Aho-Corasick goto/fail automaton over UTF-16 chars. Built once
  * (BFS fail links); `containsAny` walks the text once, following fail links
  * on mismatch — any node flagged terminal (directly or via fail chain) ends
  * the scan. Empty pattern set never matches; an empty pattern is rejected
  * (it would match everything, which a blocklist never intends). */
private[graft] final class AhoCorasick(patterns0: Array[String]) extends Serializable {
  private val patterns = patterns0.filter(p => p != null && p.nonEmpty)

  // trie as growable parallel arrays; children as per-node HashMap (pattern
  // alphabets are tiny vs Char range — a flat 64K×nodes table would be 100×
  // the memory for no lookup win at build sizes of 10^5-10^6 chars)
  private val children = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[Char, Int]())
  private val fail = scala.collection.mutable.ArrayBuffer(0)
  private val hit = scala.collection.mutable.ArrayBuffer(false)

  { // build trie
    patterns.foreach { p =>
      var node = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        node = if (children(node).containsKey(c)) children(node).get(c) else {
          children += new java.util.HashMap[Char, Int]()
          fail += 0
          hit += false
          val id = children.length - 1
          children(node).put(c, id)
          id
        }
        i += 1
      }
      hit(node) = true
    }
    // BFS fail links; hit propagates along fail chains so containsAny never
    // walks them at query time
    val q = new java.util.ArrayDeque[Int]()
    val rootIt = children(0).entrySet().iterator()
    while (rootIt.hasNext) { val e = rootIt.next(); fail(e.getValue) = 0; q.add(e.getValue) }
    while (!q.isEmpty) {
      val u = q.poll()
      val it = children(u).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getKey
        val v = e.getValue
        var f = fail(u)
        while (f != 0 && !children(f).containsKey(c)) f = fail(f)
        fail(v) = if (children(f).containsKey(c) && children(f).get(c) != v) children(f).get(c) else 0
        hit(v) = hit(v) || hit(fail(v))
        q.add(v)
      }
    }
  }

  def containsAny(s: String): Boolean = {
    if (patterns.isEmpty) return false
    var node = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      while (node != 0 && !children(node).containsKey(c)) node = fail(node)
      if (children(node).containsKey(c)) node = children(node).get(c)
      if (hit(node)) return true
      i += 1
    }
    false
  }
}
