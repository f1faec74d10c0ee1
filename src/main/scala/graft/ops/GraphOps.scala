package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Host-level link-graph analytics over extracted outlinks (HtmlLinks /
 * extract_links) — the quality/spam prior a web corpus computes beside
 * content signals (Common Crawl publishes exactly this as its host-level
 * ranks; Page et al. 1999 for the recurrence).
 *
 * FIXED-POINT ranks: all arithmetic is Long micro-units with floor division,
 * so results are bit-identical across engines and partitionings (the q57
 * micro-nat trick applied to a recurrence) — a float PageRank would make
 * every iteration's sum order-dependent. Semantics (documented contract):
 *   r_0(v)    = 1_000_000 for every node (src ∪ dst of the edge set)
 *   contrib_t(u) = r_t(u) div outdeg(u)        (per distinct edge u→v)
 *   r_{t+1}(v)   = 150_000 + (850 * Σ_{u→v} contrib_t(u)) div 1000
 * i.e. damping 0.85 with the classic map-reduce simplification that dangling
 * mass is dropped (nodes without outlinks contribute nothing) — or, with
 * `redistributeDangling = true`, conserved by adding its uniform share per
 * iteration (integer floor math, hand-unrollable either way). Multi-edges
 * count once (the edge set is deduped on (src, dst)).
 *
 * Scale shape: edges dedupe with ONE shuffle on (src, dst); outdegrees are
 * a map-side-combined count reusing the src key; each iteration is one join
 * of the (host, rank:long) frame against the narrow edge list + one groupBy
 * on dst — never a collect, never a cross join. The rank frame is two
 * columns at any graph size. Iterations are a FIXED small count (the
 * analytics-prior use); the rank frame localCheckpoints every 10 iterations
 * so deep runs don't bloat plan lineage — same stance as connectedComponents.
 */
object GraphOps {

  val InitRank = 1000000L

  /** @param convergeDelta stop early once max |Δrank_micro| over all nodes
    *   falls to ≤ this value (0 disables — exactly `iters` iterations run,
    *   the replayable-oracle contract). The convergence probe is one extra
    *   metadata-cheap agg per iteration, so it is opt-in.
    * @param redistributeDangling classic dangling-mass handling: each
    *   iteration adds 850·(Σ rank of outlink-less nodes) div (1000·N)
    *   uniformly to every node, conserving total rank up to floor
    *   truncation instead of dropping it (the default, which matches the
    *   q83 oracle's documented simplification). Costs one localCheckpoint of
    *   the narrow rank frame plus one scalar agg per iteration AFTER the
    *   first (the probe action would otherwise replay the whole
    *   uncheckpointed iteration lineage; iteration 0's mass is the closed
    *   form nDangling·InitRank because the initial ranks are uniform, and
    *   later probes filter a precomputed dangling flag carried on the rank
    *   frame — no per-iteration join) — integer arithmetic, so
    *   partition-invariance holds either way. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 2, convergeDelta: Long = 0L,
               redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 0 && iters <= 50, s"iters out of range: $iters")
    import org.apache.spark.storage.StorageLevel
    // (src, dst, deg) — PERSISTED across iterations once there are ≥3: a
    // lazy frame would re-execute the edge distinct + degree agg in every
    // iteration's plan (ReusedExchange cannot cross the per-iteration
    // localCheckpoint), which at link-graph scale is 10-20 redundant
    // full-edge shuffles. At ≤2 iterations the doubled lazy scan is cheaper
    // than materializing the cache (measured ~2× on the q83 fixture), so
    // the persist engages at 3+ (and whenever the convergence probe runs —
    // its per-iteration actions would otherwise rebuild the chain).
    val usePersist = iters >= 3 || convergeDelta > 0L || redistributeDangling
    def cached(df: DataFrame): DataFrame =
      if (usePersist) df.persist(StorageLevel.MEMORY_AND_DISK) else df
    // the deduped edge set is persisted FIRST: withDeg/nodes all derive from
    // it, and without this cache each of their first materializations re-runs
    // the whole upstream extraction (3× the scan at link-extraction cost —
    // measured 3.98 s → ~1.5 s on the q97 shape)
    val e = cached(edges.select(col(srcCol).cast("string").as("_src"),
        col(dstCol).cast("string").as("_dst"))
      .filter(col("_src").isNotNull && col("_dst").isNotNull)
      .distinct())
    val deg = e.groupBy(col("_src")).agg(count(lit(1)).as("_deg"))
    val withDeg = cached(e.join(deg, Seq("_src")))
    // dangling = nodes with no outgoing edges; membership is iteration-
    // invariant, so it is attached ONCE as a boolean flag on the node frame
    // (one left join at build time) and rides the two-column rank frame from
    // then on — the per-iteration mass probe is a filter+agg over the already-
    // materialized rank blocks instead of a semi-join against a separate
    // cached dangling frame (one fewer join and one fewer cache per run,
    // same integer arithmetic)
    val nodesBase = e.select(col("_src").as("host"))
      .unionByName(e.select(col("_dst").as("host"))).distinct()
    val nodes = cached(
      if (redistributeDangling)
        nodesBase.join(deg.select(col("_src").as("host"), lit(true).as("_out")),
            Seq("host"), "left")
          .select(col("host"), col("_out").isNull.as("_dangling"))
      else nodesBase)
    // one setup job yields BOTH counts (node total and dangling total); the
    // first iteration's ranks are uniform (InitRank), so its dangling mass is
    // the closed form nDangling·InitRank — no probe job at it=0
    // scalar probe actions are labeled (guide-style job descriptions) so the
    // UI — and the job-count spec — can tell setup from per-iteration probes
    def labeled[A](desc: String)(f: => A): A = {
      val sc = edges.sparkSession.sparkContext
      val prev = sc.getLocalProperty("spark.job.description")
      sc.setJobDescription(desc)
      try f finally sc.setJobDescription(prev)
    }
    val (nNodes, nDangling) =
      if (redistributeDangling) {
        val r = labeled("pagerank: node+dangling setup counts")(
          nodes.agg(count(lit(1)),
            coalesce(sum(col("_dangling").cast("long")), lit(0L))).first())
        (math.max(1L, r.getLong(0)), r.getLong(1))
      } else (1L, 0L)
    var ranks = nodes.withColumn("rank_micro", lit(InitRank))
    var it = 0
    var converged = false
    var prevStep: DataFrame = null
    // true while `ranks` is materialized (initial frame over the persisted
    // nodes, or a localCheckpoint) — i.e. an action on it is one stage, not
    // a replay of the whole iteration lineage
    var ranksMaterialized = true
    try {
      while (it < iters && !converged) {
        // truncate lineage periodically: 50 chained join+agg plans would bloat
        // analysis/optimization time long before the data is the problem
        if (it > 0 && it % 10 == 0 && !ranksMaterialized) {
          ranks = ranks.localCheckpoint(true)
          ranksMaterialized = true
        }
        // the dangling-share probe below runs a first() action against
        // `ranks` EVERY iteration — on a lazy frame that action would replay
        // every prior iteration's join+agg (up to 9 of them between periodic
        // checkpoints), so this path checkpoints each step like the
        // convergence probe does, keeping the documented cost at one
        // checkpoint + one scalar agg per iteration
        if (redistributeDangling && !ranksMaterialized) {
          val ck = ranks.localCheckpoint(true)
          if (prevStep != null) prevStep.unpersist(blocking = false)
          prevStep = ck
          ranks = ck
          ranksMaterialized = true
        }
        val contrib = withDeg
          .join(ranks.withColumnRenamed("host", "_src"), Seq("_src"))
          .select(col("_dst"), expr("rank_micro div _deg").as("_c"))
          .groupBy(col("_dst")).agg(sum(col("_c")).as("_in"))
        // uniform share of the dangling nodes' rank mass (0 when off); the
        // first iteration's ranks are uniform so its sum is closed-form —
        // later iterations probe the flagged rows of the materialized rank
        // frame (filter+agg, no join)
        val share =
          if (redistributeDangling) {
            val dsum =
              if (it == 0) nDangling * InitRank
              else labeled(s"pagerank: dangling mass probe it=$it")(
                ranks.filter(col("_dangling"))
                  .agg(coalesce(sum(col("rank_micro")), lit(0L))).first().getLong(0))
            850L * dsum / (1000L * nNodes)
          } else 0L
        val carry: Seq[Column] =
          if (redistributeDangling) Seq(col("host"), col("_dangling"))
          else Seq(col("host"))
        val next = nodes.join(contrib.withColumnRenamed("_dst", "host"), Seq("host"), "left")
          .select(carry :+
            (lit(150000L + share) + expr("850 * coalesce(_in, 0L) div 1000")).as("rank_micro"): _*)
        if (convergeDelta > 0L && it + 1 < iters) {
          // materialize the step once, probe the max delta on the (host,
          // rank) frames — two-column rows, never the edge set
          val stepped = next.localCheckpoint(true)
          // explicit two-column projections: with the dangling flag on, both
          // sides carry _dangling and an unprojected join would emit it twice
          val delta = stepped.select(col("host"), col("rank_micro").as("_new"))
            .join(ranks.select(col("host"), col("rank_micro").as("_old")), Seq("host"))
            .agg(max(abs(col("_new") - col("_old")))).first()
          converged = delta.isNullAt(0) || delta.getLong(0) <= convergeDelta
          // the superseded step's checkpoint blocks are dead once the delta
          // probe has read them
          if (prevStep != null) prevStep.unpersist(blocking = false)
          prevStep = stepped
          ranks = stepped
          ranksMaterialized = true
        } else {
          ranks = next
          ranksMaterialized = false
        }
        it += 1
      }
      // materialize the result WHILE the iteration frames are still cached
      // (the loop is lazy — without this, unpersist would silently discard
      // the reuse and the first action would rebuild every iteration); the
      // lazy ≤2-iteration shape has nothing cached to protect, so it skips
      // the eager checkpoint and lets the caller's action fuse the plan
      val out =
        if (usePersist && !ranksMaterialized) ranks.localCheckpoint(true) else ranks
      // the last probe/dangling checkpoint may BE the output frame — its
      // blocks must survive the cleanup; the internal flag column never
      // reaches the caller (drop is a no-op when the flag was never attached)
      if (prevStep != null && !(prevStep eq out)) prevStep.unpersist(blocking = false)
      out.drop("_dangling")
    } finally {
      if (usePersist) {
        e.unpersist(blocking = false)
        withDeg.unpersist(blocking = false)
        nodes.unpersist(blocking = false)
      }
    }
  }

  /** Host in/out-degree rollup over the deduped edge set — the cheap
    * link-graph prior (one shuffle; a full outer join of the two rollups). */
  def hostDegrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("string").as("_src"),
        col(dstCol).cast("string").as("_dst"))
      .filter(col("_src").isNotNull && col("_dst").isNotNull)
      .distinct()
    val out = e.groupBy(col("_src").as("host")).agg(count(lit(1)).as("out_degree"))
    val in = e.groupBy(col("_dst").as("host")).agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("host"), "full_outer")
      .select(col("host"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }
}
