package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/**
 * Driver contract (see SURVEY.md §2 operator inventory): every implemented
 * operator surfaces as a named query over the driver-generated parquet tables;
 * oracleSql carries the DuckDB-equivalent for hash-compared correctness.
 *
 * Conventions for oracle parity:
 *  - every computed column aliased identically in both engines;
 *  - floating aggregates rounded to 4 (money to 2) decimals;
 *  - every window/topk query totally ordered with explicit tie-breaks;
 *  - extraction round-trips construct payloads from table text *inside the
 *    query* (deterministic string building), so the oracle can state the
 *    expected output in plain SQL.
 */
object SparkEntry {

  // Table-relation memo: `s.read.parquet` re-lists the path and re-reads
  // parquet footers for schema on EVERY call — pure metadata work repeated
  // ~150× per bench sweep (plus once per query construction anywhere else).
  // The memo caches the resolved DataFrame (the logical relation: file
  // listing + schema), NOT data — every execution still scans the parquet
  // from disk. Session-keyed: DataFrames are session-bound. Stale-listing
  // caveat: a table dir mutated in place mid-JVM would serve the old file
  // list, same stance as Spark's own filesourcePartitionFileCache; the
  // driver's testdata dirs are immutable per run.
  private val tableMemo =
    new scala.collection.concurrent.TrieMap[(SparkSession, String, String), DataFrame]
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    tableMemo.getOrElseUpdate((s, dir, name), s.read.parquet(s"$dir/$name.parquet"))

  // Deterministic fixture payloads are PLAN CONSTANTS — building them
  // (codec encoders, PdfCrypto's iterated-KDF encrypts) is driver-side work
  // that used to re-run on EVERY query construction, sitting squarely in the
  // timed region of each bench trial (guide §5: the driver should do almost
  // no data work). Memoized per query key: first construction (the bench's
  // warmup pass) pays it once per JVM; the payload bytes, and therefore
  // every query result, are identical either way. This is constant-folding
  // of fixture INPUTS, never caching of computed results — each invocation
  // still computes everything from the parquet tables.
  private val fixtureMemo =
    new scala.collection.concurrent.TrieMap[String, AnyRef]
  private def memoFixture[A <: AnyRef](key: String)(build: => A): A =
    fixtureMemo.getOrElseUpdate(key, build).asInstanceOf[A]

  // q80 SemDeDup centroids: 4 explicit unit vectors (splitmix-derived, the
  // lshPlanes generator) riding the plan as constants AND interpolated into
  // the DuckDB oracle as double literals (shortest-round-trip toString —
  // both engines parse back the identical double)
  private lazy val semCentroids: Seq[Seq[Double]] =
    graft.ops.SimilarityOps.lshPlanes(4, 64, seed = 0xC3AL).map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / n)
    }

  private def q80OracleSql: String = {
    val lits = semCentroids.map(_.mkString("[", ", ", "]::DOUBLE[]"))
    // argmax over UNIT centroids: cosine ≡ dot up to the constant |v| factor,
    // and list_cosine_similarity matches CosineSim bit-wise (the q16 contract);
    // first-wins >= chains replicate ArgMaxDotExpr's strict-> smallest-index
    // tie-break. The drop rule: x is dropped iff an earlier same-cluster
    // member (y.vec_id < x.vec_id — the min_id keeper) has cosine >= eps.
    s"""WITH orig AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |allv AS (
       |  SELECT vec_id, v FROM orig
       |  UNION ALL
       |  SELECT vec_id + 1000000,
       |    list_prepend(v[1] * CAST(1.2 AS DOUBLE) + CAST(0.1 AS DOUBLE), v[2:]) FROM orig),
       |cl AS (
       |  SELECT vec_id, v,
       |    CASE WHEN s0 >= s1 AND s0 >= s2 AND s0 >= s3 THEN 0
       |         WHEN s1 >= s2 AND s1 >= s3 THEN 1
       |         WHEN s2 >= s3 THEN 2 ELSE 3 END AS cl
       |  FROM (SELECT vec_id, v,
       |      list_cosine_similarity(v, ${lits(0)}) AS s0,
       |      list_cosine_similarity(v, ${lits(1)}) AS s1,
       |      list_cosine_similarity(v, ${lits(2)}) AS s2,
       |      list_cosine_similarity(v, ${lits(3)}) AS s3
       |    FROM allv))
       |SELECT x.vec_id FROM cl x
       |WHERE NOT EXISTS (SELECT 1 FROM cl y WHERE y.cl = x.cl AND y.vec_id < x.vec_id
       |  AND list_cosine_similarity(x.v, y.v) >= 0.95)
       |ORDER BY x.vec_id""".stripMargin
  }

  // deterministic HTML wrapper around a text column (see q17/q18 oracles)
  private def htmlOf(text: Column): Column =
    concat(
      lit("<html><head><title>x</title></head><body><nav><a href=\"/\">home</a> <a href=\"/\">about</a></nav><p>"),
      text,
      lit("</p><footer>footer words here</footer></body></html>"))

  // deterministic minimal PDF wrapper: single page, single Tj of the text
  // (documents text is [a-z ] only — no PDF string escaping needed)
  private def pdfOf(text: Column): Column = {
    val content = concat(lit("BT /F1 12 Tf 72 720 Td ("), text, lit(") Tj ET"))
    encode(concat(
      lit("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
        "4 0 obj\n<< /Length "),
      length(content).cast("string"),
      lit(" >>\nstream\n"), content, lit("\nendstream\nendobj\n%%EOF\n")), "UTF-8")
  }

  /**
   * splitmix64-in-DuckDB oracle builders (q14/q15/q32 + the minhash family):
   * the engine's text hashing (graft.text.TextHash) is pure wrapping 64-bit
   * arithmetic, so it is exactly expressible in DuckDB. Naive textual macro
   * expansion explodes exponentially (each splitmix step duplicates its
   * argument ~8x); every step binds its input as a lambda parameter via a
   * single-element list_transform chain. Arithmetic lives in UBIGINT (see
   * USql64) - the original HUGEINT mod-2^64 formulation spent ~35 microseconds
   * per splitmix in 128-bit software division (the 64-hash minhash oracle took
   * 4 minutes at sf0.01); UBIGINT wrap arithmetic is ~100x faster and
   * value-identical. Token hashes are memoized over DISTINCT tokens.
   */
  private def simhashCtes: String = {
    val pows = (0 until 64).map(b => s"${java.lang.Long.toUnsignedString(1L << b)}::UBIGINT")
      .mkString("[", ",", "]")
    s"""tok AS (
       |  SELECT doc_id, t AS tok
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
       |  WHERE len(t) > 0
       |),
       |utok AS (SELECT DISTINCT tok FROM tok),
       |uth AS (SELECT tok, ${USql64.htok("tok", 0x5151L)} AS h FROM utok),
       |th AS (SELECT t.doc_id AS doc_id, u.h AS h FROM tok t JOIN uth u USING (tok)),
       |bits AS (
       |  SELECT doc_id, pw,
       |    CASE WHEN 2 * sum(CAST((h // pw) % 2 AS BIGINT)) > count(*) THEN pw ELSE 0::UBIGINT END AS contrib
       |  FROM th, (SELECT unnest($pows) AS pw)
       |  GROUP BY doc_id, pw
       |),
       |sims AS (SELECT doc_id, ${USql64.toI64("CAST(sum(contrib) AS UBIGINT)")} AS sim FROM bits GROUP BY doc_id)""".stripMargin
  }

  private def q14OracleSql: String =
    s"""WITH $simhashCtes
       |SELECT d.doc_id, coalesce(printf('%x', s.sim), '0') AS simhash_hex
       |FROM documents d LEFT JOIN sims s ON d.doc_id = s.doc_id""".stripMargin

  /**
   * UBIGINT-domain splitmix64 (q13/q31 minhash oracles): DuckDB's HUGEINT `%`
   * and `//` are software 128-bit division (~35 µs per splitmix at sf0.01 scale
   * — a 64-hash minhash oracle took 4 minutes). Native UBIGINT ops are ~100×
   * faster but overflow-checked, so wrapping arithmetic is built explicitly:
   * add via a compare-and-borrow CASE, multiply-by-constant via 32-bit limb
   * split (every intermediate < 2^64), and SIGNED min order (Spark's Long min)
   * via sign-bit xor. `<<` overflow-checks even for in-range UBIGINT shifts in
   * DuckDB 1.x — multiplication by 2^32 replaces it.
   */
  private object USql64 {
    private val MaxU = "18446744073709551615::UBIGINT"
    private val M32 = "4294967295::UBIGINT"
    val SignBit = "9223372036854775808::UBIGINT"
    /** u64 bit pattern reinterpreted as signed i64 (Spark Long semantics). */
    def toI64(u: String): String =
      s"(CASE WHEN ($u) >= $SignBit THEN CAST(($u) - $SignBit AS BIGINT) + (-9223372036854775807 - 1) " +
        s"ELSE CAST(($u) AS BIGINT) END)"
    def wadd(a: String, b: String): String =
      s"(CASE WHEN ($a) > xor($MaxU, ($b)) THEN ($a) - xor($MaxU, ($b)) - 1 ELSE ($a) + ($b) END)"
    def wmul(v: String, b: Long): String = {
      val bl = b & 0xFFFFFFFFL
      val bh = (b >>> 32) & 0xFFFFFFFFL
      val lo = s"((($v) & $M32) * ${bl}::UBIGINT)"
      val cross = s"((((($v) & $M32) * ${bh}::UBIGINT) & $M32) + (((($v) >> 32) * ${bl}::UBIGINT) & $M32))"
      wadd(lo, s"((($cross) & $M32) * 4294967296::UBIGINT)")
    }
    /** splitmix64 finalizer (TextHash.mix), let-bound per step like Sql64. */
    def sm(x: String): String = {
      val s1 = wadd("z1", "11400714819323198485::UBIGINT")
      val s2 = "xor(z2, z2 >> 30)"
      val s3 = wmul("z3", 0xbf58476d1ce4e5b9L)
      val s4 = "xor(z4, z4 >> 27)"
      val s5 = wmul("z5", 0x94d049bb133111ebL)
      val s6 = "xor(z6, z6 >> 31)"
      s"(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(" +
        s"[$x], z1 -> $s1), z2 -> $s2), z3 -> $s3), z4 -> $s4), z5 -> $s5), z6 -> $s6))[1]"
    }
    /** TextHash.hashToken over a token column (UBIGINT domain). */
    def htok(tok: String, seed: Long): String = {
      val init = sm(s"xor(${seed}::UBIGINT, CAST(len($tok) AS UBIGINT))")
      val chars = s"list_transform(range(1, len($tok)+1), ci -> CAST(ascii(substr($tok, ci, 1)) AS UBIGINT))"
      s"list_reduce(list_prepend($init, $chars), (a, b) -> ${sm("xor(a, b)")})"
    }
  }

  /**
   * Full MinHash-LSH pipeline replayed in DuckDB (the q13/q31 oracle):
   * token hashes (distinct-token memoized) → 3-shingle hashes (distinct-triple
   * memoized; duplicate shingles collapse — min is idempotent) → 64-value
   * signature (signed min via sign-bit xor) → 8 band keys (splitmix fold,
   * band index salted with 0xbeef) → band-collision candidates (a < b) →
   * estimated Jaccard = matching signature positions / 64. Mirrors
   * TextHash.minhash/bandKeys and DedupOps.nearDupPairs exactly; the bucket
   * cap is a no-op at oracle scale (largest band ≪ 2^13).
   */
  private def minhashOracleSql(docsCte: String, threshold: Double, outCols: String,
                               numHashes: Int = 64, rowsPerBand: Int = 8): String =
    s"""WITH docs AS ($docsCte),
       |${minhashSigBandsCtes(numHashes, rowsPerBand)},
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y ON x.bkey = y.bkey AND x.doc_id < y.doc_id
       |),
       |est AS (
       |  SELECT c.a, c.b,
       |    len(list_filter(range($numHashes), i -> sx.sig[i+1] = sy.sig[i+1])) / $numHashes.0 AS ej
       |  FROM cand c JOIN sig sx ON c.a = sx.doc_id JOIN sig sy ON c.b = sy.doc_id
       |)
       |SELECT $outCols FROM est WHERE ej >= $threshold ORDER BY a, b""".stripMargin

  /** The shared token→shingle→signature→band-key CTE chain (expects a
    * preceding `docs(doc_id, text)` CTE; yields `sig(doc_id, sig)` and
    * `bands(doc_id, bnd, bkey)`). Factored out so the self-join oracles
    * (q13/q31) and the incremental index oracle (q98) replay the SAME
    * hashing pipeline. Returned text is final-form (margins stripped). */
  private def minhashSigBandsCtes(numHashes: Int = 64, rowsPerBand: Int = 8): String = {
    val k = 3
    val seedMult = 0xabcdef1234567L
    s"""tok AS (
       |  SELECT doc_id, t AS tok, i
       |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS t,
       |               unnest(range(len(string_split(text,' ')))) AS i FROM docs)
       |  WHERE len(t) > 0
       |),
       |utok AS (SELECT DISTINCT tok FROM tok),
       |uth AS (SELECT tok, ${USql64.htok("tok", 0x7a7aL)} AS h FROM utok),
       |th AS (SELECT t.doc_id, t.i, u.h FROM tok t JOIN uth u USING (tok)),
       |ths AS (SELECT doc_id, list(h ORDER BY i) AS hs FROM th GROUP BY doc_id),
       |trip AS (
       |  SELECT doc_id, ti, hs[ti+1 : ti+least($k, len(hs))] AS tr
       |  FROM ths CROSS JOIN LATERAL unnest(range(greatest(1, len(hs) - ${k - 1}))) u(ti)
       |),
       |utrip AS (SELECT DISTINCT tr FROM trip),
       |ush AS (
       |  SELECT tr, list_reduce(list_prepend(11400714819323198485::UBIGINT, tr),
       |    (a, b) -> ${USql64.sm("xor(a, b)")}) AS sh
       |  FROM utrip
       |),
       |docsh AS (SELECT DISTINCT t.doc_id, u.sh FROM trip t JOIN ush u USING (tr)),
       |seeds AS (SELECT i, CAST(i * $seedMult + 1 AS UBIGINT) AS seed FROM range($numHashes) t(i)),
       |sigv AS (
       |  SELECT h.doc_id, s.i,
       |    xor(min(xor(${USql64.sm("xor(h.sh, s.seed)")}, ${USql64.SignBit})), ${USql64.SignBit}) AS sv
       |  FROM docsh h CROSS JOIN seeds s
       |  GROUP BY h.doc_id, s.i
       |),
       |sig AS (SELECT doc_id, list(sv ORDER BY i) AS sig FROM sigv GROUP BY doc_id),
       |bands AS (
       |  SELECT g.doc_id, b.bnd,
       |    list_reduce(list_prepend(${USql64.sm("xor(CAST(b.bnd AS UBIGINT), 48879::UBIGINT)")},
       |      g.sig[b.bnd*$rowsPerBand+1 : b.bnd*$rowsPerBand+$rowsPerBand]),
       |      (a, c) -> ${USql64.sm("xor(a, c)")}) AS bkey
       |  FROM sig g CROSS JOIN (SELECT unnest(range(${numHashes / rowsPerBand})) AS bnd) b
       |)""".stripMargin
  }

  /** SQL text of the q98 three-arm batch mutation, shared verbatim between
    * the documentation here and q98OracleSql: every third doc is re-sent
    * unchanged (exact), shifted by one token (near), or replaced by four
    * doc-id-salted tokens that overlap nothing (fresh). */
  private val q98BatchCase =
    """CASE WHEN doc_id % 3 = 0 THEN text
      |     WHEN doc_id % 3 = 1 THEN substring(text, instr(text, ' ') + 1)
      |     ELSE 'zx' || CAST(doc_id AS VARCHAR) || ' qv' || CAST(doc_id AS VARCHAR) ||
      |          ' wm' || CAST(doc_id AS VARCHAR) || ' rk' || CAST(doc_id AS VARCHAR) END""".stripMargin

  /**
   * Incremental dedup replayed in DuckDB: the committed index IS
   * buildDedupIndex(documents) (deterministic — splitmix64, no sampling), so
   * the oracle recomputes signatures/bands for BOTH sides with the shared CTE
   * chain, takes exact hits by text equality (≡ sha-256 digest equality),
   * band-collision candidates restricted to new×index, and the best near
   * match (max estimate, ties to min indexed id) — mirroring
   * DedupOps.dedupAgainstIndex exactly. The index-side bucket cap is a no-op
   * at oracle scale (largest band ≪ 2^13), as in q13/q31.
   */
  private def q98OracleSql(threshold: Double = 0.5, numHashes: Int = 64): String =
    s"""WITH base AS (SELECT doc_id, text FROM documents),
       |newb AS (
       |  SELECT doc_id + 1000000 AS doc_id,
       |    $q98BatchCase AS text
       |  FROM base
       |),
       |docs AS (SELECT doc_id, text FROM base UNION ALL SELECT doc_id, text FROM newb),
       |${minhashSigBandsCtes(numHashes)},
       |exact AS (
       |  SELECT n.doc_id AS a, min(b.doc_id) AS xid
       |  FROM newb n JOIN base b ON n.text = b.text
       |  GROUP BY n.doc_id
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS iid
       |  FROM bands x JOIN bands y ON x.bkey = y.bkey
       |  WHERE x.doc_id >= 1000000 AND y.doc_id < 1000000
       |),
       |est AS (
       |  SELECT c.a, c.iid,
       |    len(list_filter(range($numHashes), i -> sx.sig[i+1] = sy.sig[i+1])) / $numHashes.0 AS ej
       |  FROM cand c JOIN sig sx ON c.a = sx.doc_id JOIN sig sy ON c.iid = sy.doc_id
       |),
       |best AS (
       |  SELECT a, iid, ej,
       |    row_number() OVER (PARTITION BY a ORDER BY ej DESC, iid ASC) AS rn
       |  FROM est WHERE ej >= $threshold
       |)
       |SELECT n.doc_id AS doc_id,
       |  CASE WHEN e.xid IS NOT NULL THEN 'exact'
       |       WHEN b.iid IS NOT NULL THEN 'near'
       |       ELSE 'fresh' END AS status,
       |  CASE WHEN e.xid IS NOT NULL THEN e.xid ELSE b.iid END AS matched_id,
       |  CASE WHEN e.xid IS NULL THEN round(b.ej, 4) END AS est_jaccard
       |FROM newb n
       |LEFT JOIN exact e ON n.doc_id = e.a
       |LEFT JOIN (SELECT a, iid, ej FROM best WHERE rn = 1) b ON n.doc_id = b.a
       |ORDER BY doc_id""".stripMargin

  /** The q99 query set as one VALUES list — interpolated verbatim into BOTH
    * the Spark-side `VALUES ... AS t(query_id, term)` and the oracle's CTE,
    * so the two sides cannot drift. Terms chosen from the synthetic corpus
    * vocabulary with mixed document frequencies. */
  private val q99Queries: String =
    Seq("q0" -> "join", "q0" -> "hash",
        "q1" -> "scan", "q1" -> "slow", "q1" -> "fast",
        "q2" -> "customer", "q2" -> "order", "q2" -> "line",
        "q3" -> "vector", "q3" -> "column",
        "q4" -> "window", "q4" -> "merge", "q4" -> "batch")
      .map { case (q, t) => s"('$q','$t')" }.mkString(", ")

  /**
   * BM25 replayed end-to-end in DuckDB: the same inverted file (string_split
   * tokenization — agrees with ws_tokens on this corpus, the q54 contract),
   * the same Long floor-div chain (avgdl/norm/saturation in milli-units,
   * contributions in micro-units summed exactly), and idf floored to
   * micro-nats from the one double ln both engines compute on exact-integer
   * inputs (the q57 quantize-before-aggregate discipline). k1=1.2, b=0.75,
   * k=10, ties broken by ascending doc_id.
   */
  private def q99OracleSql(k: Int = 10, k1Milli: Long = 1200, bMilli: Long = 750): String =
    s"""WITH docs AS (SELECT doc_id, text FROM documents),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM docs),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |                 CAST(sum(dl) AS BIGINT) AS sumdl FROM dl),
       |q(query_id, term) AS (VALUES $q99Queries),
       |df AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
       |  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term
       |),
       |sc AS (
       |  SELECT q.query_id, tf.doc_id,
       |    CAST(floor(1000000 * ln((2 * s.n + 2) / (2.0 * df.df + 1))) AS BIGINT) AS idf,
       |    (1000 * s.sumdl) // s.n AS avgdl_milli,
       |    tf.tf, dl.dl
       |  FROM q JOIN tf USING (term) JOIN df USING (term)
       |       JOIN dl USING (doc_id) CROSS JOIN stats s
       |),
       |contrib AS (
       |  SELECT query_id, doc_id,
       |    (idf * ((tf * ${1000 + k1Milli} * 1000) //
       |       (tf * 1000 + ($k1Milli * ((1000 - $bMilli) + ($bMilli * dl * 1000) // avgdl_milli)) // 1000)
       |     )) // 1000 AS c
       |  FROM sc
       |),
       |scored AS (
       |  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY CAST(sum(c) AS BIGINT) DESC, doc_id ASC) AS INT) AS rank
       |  FROM contrib GROUP BY query_id, doc_id
       |)
       |SELECT query_id, rank, doc_id, score_micro FROM scored
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /**
   * DSIR replayed end-to-end in DuckDB: memoized token hashes (seed 0x7a7a)
   * → strict 1/2-gram windows folded from the splitmix golden constant
   * (TextHash.shingleHash) → pmod bucketing in signed BIGINT → per-bucket
   * add-one-smoothed log-ratios quantized to integer micro-nats (so the
   * per-doc sum is an exact Long sum — float summation order cannot matter)
   * → per-doc weight. Target side = every 13th document, same as the query.
   */
  private def q57OracleSql: String = {
    val B = 10000
    s"""WITH tok AS (
       |  SELECT doc_id, t AS tok, i
       |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS t,
       |               unnest(range(len(string_split(text,' ')))) AS i FROM documents)
       |  WHERE len(t) > 0
       |),
       |utok AS (SELECT DISTINCT tok FROM tok),
       |uth AS (SELECT tok, ${USql64.htok("tok", 0x7a7aL)} AS h FROM utok),
       |th AS (SELECT t.doc_id AS doc_id, t.i AS i, u.h AS h FROM tok t JOIN uth u USING (tok)),
       |ths AS (SELECT doc_id, list(h ORDER BY i) AS hs FROM th GROUP BY doc_id),
       |grams AS (
       |  SELECT doc_id, hs[ti+1 : ti+1] AS tr
       |  FROM ths CROSS JOIN LATERAL unnest(range(len(hs))) u(ti)
       |  UNION ALL
       |  SELECT doc_id, hs[ti+1 : ti+2] AS tr
       |  FROM ths CROSS JOIN LATERAL unnest(range(len(hs) - 1)) u(ti)
       |),
       |ugr AS (SELECT DISTINCT tr FROM grams),
       |ugh AS (
       |  SELECT tr, list_reduce(list_prepend(11400714819323198485::UBIGINT, tr),
       |    (a, b) -> ${USql64.sm("xor(a, b)")}) AS gh
       |  FROM ugr
       |),
       |db AS (
       |  SELECT g.doc_id, ((${USql64.toI64("u.gh")} % $B) + $B) % $B AS b
       |  FROM grams g JOIN ugh u USING (tr)
       |),
       |pair AS (SELECT doc_id, b, count(*) AS c FROM db GROUP BY doc_id, b),
       |rc AS (SELECT b, sum(c) AS r FROM pair GROUP BY b),
       |tc AS (SELECT b, sum(c) AS t FROM pair WHERE doc_id % 13 = 0 GROUP BY b),
       |tot AS (SELECT (SELECT sum(c) FROM pair) AS nr,
       |               (SELECT coalesce(sum(c), 0) FROM pair WHERE doc_id % 13 = 0) AS nt),
       |ratio AS (
       |  SELECT rc.b,
       |    CAST(round((ln(CAST(coalesce(tc.t, 0) + 1 AS DOUBLE)) - ln(CAST(rc.r + 1 AS DOUBLE))
       |      + ln(CAST(tot.nr + $B AS DOUBLE)) - ln(CAST(tot.nt + $B AS DOUBLE))) * 1000000) AS BIGINT) AS lri
       |  FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot
       |),
       |per AS (
       |  SELECT p.doc_id, sum(p.c) AS nf, sum(p.c * ratio.lri) AS s
       |  FROM pair p JOIN ratio USING (b) GROUP BY p.doc_id
       |)
       |SELECT d.doc_id,
       |  CAST(coalesce(nf, 0) AS INT) AS n_features,
       |  round(coalesce(s, 0) / 1000000.0, 4) AS dsir_logweight
       |FROM documents d LEFT JOIN per USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** q10/q92: language-ID replay — the trained model interpolates as (gram,
    * lang, micro-nat logp) literals (LangId froze every logarithm to an
    * integer at train time), DuckDB re-extracts code-point bigrams of the
    * padded text with substr (character semantics = the Scala code-point
    * contract), sums Longs per language, argmaxes with the same
    * score-DESC-lang-ASC tie-break, and applies the same integer und gate
    * (kept-gram hits·1000 vs total-grams·threshold — count(m.lp) counts
    * exactly the matched grams). `textCte` supplies (k, s) rows to
    * classify; `finalSelect` maps k back to doc ids. */
  private def langIdOracleSql(textCte: String, finalSelect: String): String = {
    import graft.text.LangId
    val model = LangId.modelRows
      .map { case (g, l, lp) => s"('${sqlEsc(g)}','$l',${lp}::BIGINT)" }
      .mkString(",\n    ")
    val oov = LangId.oovRows.map { case (l, lp) => s"('$l',${lp}::BIGINT)" }.mkString(", ")
    s"""WITH model(g, l, lp) AS (VALUES
       |    $model),
       |  oov(l, olp) AS (VALUES $oov),
       |  txt(k, s) AS ($textCte),
       |  padded AS (SELECT k, ' ' || substr(s, 1, ${LangId.MaxCodePoints}) || ' ' AS p FROM txt),
       |  pos AS (SELECT k, p, unnest(range(1, length(p))) AS i FROM padded),
       |  grams AS (SELECT k, substr(p, CAST(i AS BIGINT), 2) AS g FROM pos),
       |  scores AS (SELECT k, o.l AS l, CAST(sum(coalesce(m.lp, o.olp)) AS BIGINT) AS sc,
       |      count(m.lp) AS hits, count(*) AS tot
       |    FROM grams gr CROSS JOIN oov o
       |    LEFT JOIN model m ON m.g = gr.g AND m.l = o.l
       |    GROUP BY k, o.l),
       |  best0 AS (SELECT k, l, sc, hits, tot,
       |      row_number() OVER (PARTITION BY k ORDER BY sc DESC, l ASC) AS rn
       |    FROM scores),
       |  best AS (SELECT k,
       |      CASE WHEN hits * 1000 >= tot * ${LangId.MinCoveragePermille}
       |           THEN l ELSE '${LangId.Und}' END AS l,
       |      sc, rn
       |    FROM best0)
       |$finalSelect""".stripMargin
  }

  private def sqlEsc(s: String) = s.replace("'", "''")

  /** q30: the decoded arms (JPEG/GIF/WAV flat fixtures) state their
    * features in plain SQL; the sketch arm (MP3 — the declared table-data-
    * codec stub) pins the 20 deterministic sketch constants computed at
    * plan-build time from the SAME fixed payloads, mirrored through the
    * query's exact quantization (float sums → double ×1e4 → HALF_UP → long).
    * A pinned constant is a regression anchor, not a derivation — the q24
    * golden-digest pattern applied to sketch stability. */
  /** q108 payload families: repetition grows with the index so the deflate
    * ratio falls across families; text depends ONLY on the index, letting
    * the oracle pin each family's exact lengths as plan-build constants. */
  private def q108Payload(i: Int): String =
    (s"tok$i alpha beta " * (4 + 2 * i)) + s"tail-${i * 31} unique ending."

  private def q108OracleSql(): String = {
    val arms = (0 until 50).map { i =>
      val b = q108Payload(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val dl = graft.expr.TextExprRuntime.deflateLen(b)
      s"(${i}, ${b.length}, $dl, ${dl * 1000000L / b.length})"
    }.mkString(",\n  ")
    s"""WITH f(m, raw_len, deflate_len, ratio_micro) AS (VALUES $arms)
       |SELECT doc_id, CAST(raw_len AS BIGINT) AS raw_len,
       |  CAST(deflate_len AS BIGINT) AS deflate_len,
       |  CAST(ratio_micro AS BIGINT) AS ratio_micro,
       |  ratio_micro BETWEEN 150000 AND 900000 AS keep
       |FROM documents JOIN f ON doc_id % 50 = f.m ORDER BY doc_id""".stripMargin
  }

  private def q30OracleSql: String = {
    def e4(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val sketch = (0 until 20).map { i =>
      val f = graft.media.MediaSniff.features(graft.media.AvEncode.mp3Silent(i + 1))
      (i, e4(f(0).toDouble * 10000.0),
        e4((f(1) + f(2) + f(3)).toDouble * 10000.0),
        e4(f(4).toDouble * 10000.0),
        e4((f(5) + f(6) + f(7)).toDouble * 10000.0))
    }
    val vals = sketch.map { case (i, a, b, c, d) =>
      s"($i, ${a}::BIGINT, ${b}::BIGINT, ${c}::BIGINT, ${d}::BIGINT)"
    }.mkString(",\n    ")
    s"""WITH sk(i, s1, s234, s5, s678) AS (VALUES
       |    $vals)
       |SELECT d.doc_id,
       |  CASE WHEN d.doc_id % 4 = 3 THEN sk.s1
       |       ELSE (d.doc_id % 200) * 10000 END AS f1_e4,
       |  CASE WHEN d.doc_id % 4 = 1
       |         THEN (((d.doc_id % 200) * 3) % 256 + ((d.doc_id % 200) * 7) % 256) * 10000
       |       WHEN d.doc_id % 4 = 3 THEN sk.s234
       |       ELSE 0 END AS f234_e4,
       |  CASE WHEN d.doc_id % 4 = 3 THEN sk.s5 ELSE 0 END AS var_e4,
       |  CASE WHEN d.doc_id % 4 = 3 THEN sk.s678 ELSE 0 END AS rest_e4
       |FROM documents d LEFT JOIN sk ON sk.i = (d.doc_id % 200) % 20
       |ORDER BY d.doc_id""".stripMargin
  }

  private def q92OracleSql: String = {
    import graft.text.LangId
    val txts = LangId.HeldOut.zipWithIndex
      .map { case ((_, s0), i) => s"($i, '${sqlEsc(s0)}')" }.mkString(",\n    ")
    langIdOracleSql(
      s"VALUES\n    $txts",
      s"""SELECT d.doc_id, b.l AS pred_lang, b.sc AS score_micro
         |FROM documents d JOIN best b ON b.k = d.doc_id % ${LangId.HeldOut.size} AND b.rn = 1
         |ORDER BY d.doc_id""".stripMargin)
  }

  /** q10 re-classifies the REAL document text — the strongest oracle form:
    * DuckDB recomputes every gram lookup over the corpus column itself. */
  private def q10OracleSql: String =
    langIdOracleSql(
      "SELECT doc_id, text FROM documents",
      """SELECT k AS doc_id, l AS pred_lang, sc AS score_micro
        |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin)

  /** q70: the hashed-bigram LM cross-entropy replayed exactly — token hashes
    * (ngram_hashes seed), unigram-gram splitmix fold → B buckets, packed
    * consecutive-bucket keys, add-one-smoothed target counts, per-key costs
    * ln(c1+B) − ln(c2+1) quantized to integer micro-nats BEFORE the per-doc
    * Long sum (summation-order independent), mean per bigram at the end. */
  private def q70OracleSql: String =
    s"""$q70CtePrefix
       |SELECT d.doc_id,
       |  CAST(coalesce(n, 0) AS INT) AS n_bigrams,
       |  CASE WHEN coalesce(n, 0) = 0 THEN 0.0 ELSE round(s / 1000000.0 / n, 4) END AS ce_nats
       |FROM documents d LEFT JOIN per USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** q84: q70's exact score replay + the integer tercile-threshold contract
    * (3·cum ≥ n / 3·cum ≥ 2n over the per-language score histogram). */
  private def q84OracleSql: String =
    s"""$q70CtePrefix,
       |scored AS (
       |  SELECT d.doc_id, d.lang,
       |    CASE WHEN coalesce(n, 0) = 0 THEN 0.0 ELSE round(s / 1000000.0 / n, 4) END AS ce_nats
       |  FROM documents d LEFT JOIN per USING (doc_id)
       |),
       |hist AS (SELECT lang, ce_nats, count(*) AS c FROM scored GROUP BY lang, ce_nats),
       |cum AS (SELECT lang, ce_nats,
       |    sum(c) OVER (PARTITION BY lang ORDER BY ce_nats) AS cm,
       |    sum(c) OVER (PARTITION BY lang) AS n
       |  FROM hist),
       |thr AS (SELECT lang,
       |    min(CASE WHEN cm * 3 >= n THEN ce_nats END) AS t1,
       |    min(CASE WHEN cm * 3 >= 2 * n THEN ce_nats END) AS t2
       |  FROM cum GROUP BY lang)
       |SELECT s.doc_id, s.lang, s.ce_nats,
       |  CASE WHEN s.ce_nats <= t1 THEN 'head'
       |       WHEN s.ce_nats <= t2 THEN 'middle' ELSE 'tail' END AS ppl_bucket
       |FROM scored s JOIN thr USING (lang) ORDER BY s.doc_id""".stripMargin

  private def q70CtePrefix: String = {
    val B = 10000
    val g1 = USql64.sm("xor(11400714819323198485::UBIGINT, h)")
    s"""WITH tok AS (
       |  SELECT doc_id, t AS tok, i
       |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS t,
       |               unnest(range(len(string_split(text,' ')))) AS i FROM documents)
       |  WHERE len(t) > 0
       |),
       |utok AS (SELECT DISTINCT tok FROM tok),
       |uth AS (SELECT tok, ${USql64.htok("tok", 0x7a7aL)} AS h FROM utok),
       |ubk AS (SELECT tok, ((${USql64.toI64(g1)} % $B) + $B) % $B AS b FROM uth),
       |tb AS (SELECT t.doc_id, t.i, u.b FROM tok t JOIN ubk u USING (tok)),
       |bls AS (SELECT doc_id, list(b ORDER BY i) AS bl FROM tb GROUP BY doc_id),
       |keys AS (
       |  SELECT doc_id, bl[ti+1] * $B + bl[ti+2] AS k
       |  FROM bls CROSS JOIN LATERAL unnest(range(len(bl) - 1)) u(ti)
       |),
       |pair AS (SELECT doc_id, k, count(*) AS c FROM keys GROUP BY doc_id, k),
       |ln2 AS (
       |  SELECT k, CAST(round(ln(CAST(sum(c) + 1 AS DOUBLE)) * 1000000) AS BIGINT) AS l2
       |  FROM pair WHERE doc_id % 13 = 0 GROUP BY k
       |),
       |ln1 AS (
       |  SELECT k // $B AS b1,
       |    CAST(round(ln(CAST(sum(c) + $B AS DOUBLE)) * 1000000) AS BIGINT) AS l1
       |  FROM pair WHERE doc_id % 13 = 0 GROUP BY k // $B
       |),
       |per AS (
       |  SELECT p.doc_id, sum(p.c) AS n,
       |    sum(p.c * (coalesce(ln1.l1, CAST(round(ln(CAST($B AS DOUBLE)) * 1000000) AS BIGINT))
       |               - coalesce(ln2.l2, 0))) AS s
       |  FROM pair p
       |  LEFT JOIN ln2 ON p.k = ln2.k
       |  LEFT JOIN ln1 ON p.k // $B = ln1.b1
       |  GROUP BY p.doc_id
       |)""".stripMargin
  }

  private def q32OracleSql: String =
    s"""WITH $simhashCtes
       |SELECT x.doc_id AS a, y.doc_id AS b,
       |  CAST(bit_count(xor(x.sim, y.sim)) AS INT) AS hamming
       |FROM sims x JOIN sims y ON x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.sim, y.sim)) <= 3
       |ORDER BY a, b""".stripMargin

  private def q15OracleSql: String = {
    val n = 8
    s"""WITH tok AS (
       |  SELECT doc_id, t AS tok, i
       |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS t,
       |               unnest(range(len(string_split(text,' ')))) AS i FROM documents)
       |  WHERE len(t) > 0
       |),
       |utok AS (SELECT DISTINCT tok FROM tok),
       |uth AS (SELECT tok, ${USql64.htok("tok", 0x7a7aL)} AS h FROM utok),
       |th AS (SELECT t.doc_id AS doc_id, t.i AS i, u.h AS h FROM tok t JOIN uth u USING (tok)),
       |ths AS (SELECT doc_id, list(h ORDER BY i) AS hs FROM th GROUP BY doc_id),
       |fps AS (
       |  SELECT doc_id,
       |    list_aggregate(list_transform(
       |      list_transform(range(greatest(1, len(hs) - $n + 1)),
       |        ti -> list_reduce(list_prepend(11400714819323198485::UBIGINT,
       |                hs[ti+1 : ti+least($n, len(hs))]), (a, b) -> ${USql64.sm("xor(a, b)")})),
       |      u -> ${USql64.toI64("u")}), 'min') AS fp
       |  FROM ths
       |)
       |SELECT d.doc_id, coalesce(printf('%x', f.fp), '0') AS fp_hex
       |FROM documents d LEFT JOIN fps f ON d.doc_id = f.doc_id""".stripMargin
  }

  /** Flagship: HTML-extraction round-trip over sf0.001 documents. */
  def entry(spark: SparkSession): DataFrame =
    queries("q17_extract_html_roundtrip")(spark, "/root/testdata/sf0.001")


  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------- relational core (SURVEY.md §2 D/E/F analogs) ----------------
    "q01_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("cnt"))
    }),
    "q02_join_broadcast_segment" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
    }),
    "q03_topk_orders_per_cust" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("price"), col("rn"))
    }),
    "q04_recent_activity" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(lit("event").as("kind"), col("event_id").as("id"), col("ts"))
      val or = t(s, dir, "orders").select(lit("order").as("kind"), col("o_orderkey").as("id"), col("o_orderdate").as("ts"))
      ev.unionByName(or).orderBy(col("ts").desc, col("kind").asc, col("id").asc).limit(100)
    }),
    "q05_region_rollup" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 2).as("sum_acctbal"))
    }),
    "q06_status_rollup" -> ((s, dir) =>
      t(s, dir, "orders").groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))),
    "q07_sliding_avg" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-99, 0)
      // integer-cents sum keeps the sliding aggregate exact (float avg differs
      // in the last ulp between engines' window accumulation algorithms)
      t(s, dir, "events")
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .select(col("event_id"), col("user_id"),
          sum(col("cents")).over(w).as("msum_cents"),
          count(lit(1)).over(w).as("mcount"))
    }),
    "q21_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        // microsecond-exact gap compare: unix_timestamp truncates to seconds
        // while DuckDB's epoch() keeps micros — a gap straddling the 1800s
        // boundary by <1s would diverge (events carry microsecond precision)
        // events.ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP (session TZ
        // is UTC, so the cast is value-preserving and applied to both operands)
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts").cast("timestamp")) -
              unix_micros(col("prev_ts").cast("timestamp")) > 1800000000L, 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),
    "q22_props_buckets" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", regexp_extract(col("props"), "[0-9]+", 0).cast("int"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value"))
    }),
    "q23_event_type_rollup" -> ((s, dir) =>
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value"))),

    // ---------------- text analysis over documents ----------------
    "q08_text_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_tokens"),
          length(col("text")).as("len_chars"),
          size(array_distinct(col("toks"))).as("n_unique_tokens"),
          round((length(col("text")) - (size(col("toks")) - 1)).cast("double") / size(col("toks")), 4)
            .as("avg_token_len"))
    }),
    "q09_quality" -> ((s, dir) => {
      val stops = Seq("the", "a", "of", "and", "to", "in")
      t(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("stop_tokens", size(filter(col("toks"), w => w.isin(stops.map(lit): _*))))
        .select(
          col("doc_id"),
          col("stop_tokens"),
          round(col("stop_tokens").cast("double") / size(col("toks")), 4).as("stop_ratio"),
          (size(col("toks")) >= 20 && col("stop_tokens") > 0).as("is_quality"))
    }),
    // REAL language ID over the corpus text itself (the round-5 stopword
    // vote is gone): the char-bigram Naive Bayes classifies every document,
    // and the oracle RE-CLASSIFIES the same column from the interpolated
    // model table — no fixture literals anywhere (q92 keeps the held-out
    // multi-script accuracy contract; this is the production path)
    "q10_langid" -> ((s, dir) => {
      val lid = lang_id(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          lid.getField("lang").as("pred_lang"),
          lid.getField("score_micro").as("score_micro"))
        .orderBy(col("doc_id"))
    }),

    // BPE-style pre-tokenization (GPT-2 pattern family, lookahead-free so the
    // same regex runs on Java regex and DuckDB's RE2): contraction suffixes,
    // space-prefixed letter/digit runs, punctuation runs — the token COUNT a
    // training pipeline budgets by, vs the whitespace count of q08
    "q38_bpe_tokens" -> ((s, dir) => {
      val pat = "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"
      t(s, dir, "documents")
        .withColumn("toks", regexp_extract_all(col("text"), lit(pat), lit(0)))
        .select(col("doc_id"),
          size(col("toks")).as("n_bpe_tokens"),
          // try_element_at: ANSI element_at throws on an empty match array
          // (empty text); DuckDB's toks[1] yields NULL — match that
          try_element_at(col("toks"), lit(1)).as("first_tok"),
          try_element_at(col("toks"), lit(-1)).as("last_tok"))
    }),

    // ---------------- dedup family ----------------
    "q11_dedup_stats" -> ((s, dir) =>
      t(s, dir, "documents").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_texts"),
        (count(lit(1)) - countDistinct(col("text"))).as("n_dup_docs"))),
    "q12_exact_dup_groups" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(sha2(encode(col("text"), "UTF-8"), 256).as("text_sha256"))
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))
        .filter(col("cnt") > 1)),
    // near-dup detection: corpus unioned with a mutated copy (first token dropped,
    // doc_id offset) — near-dup pairs exist by construction; MinHash-LSH bucket
    // join finds them without an O(n²) compare (SURVEY-scale path: band keys
    // shuffle-join, candidates verified by signature similarity).
    "q13_minhash_near_dups" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val mutated = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
      graft.ops.DedupOps.nearDupPairs(docs.unionByName(mutated), "text", "doc_id", 0.5)
        .select(col("a"), col("b"), col("est_jaccard").as("est_sim"))
        .orderBy(col("a"), col("b"))
    }),
    // near-dup detection over the table's own content: the driver's documents
    // table contains genuine near-dup clusters (J>0.95), which these surface
    "q31_near_dup_pairs" -> ((s, dir) =>
      graft.ops.DedupOps.nearDupPairs(
        t(s, dir, "documents").select(col("doc_id"), col("text")), "text", "doc_id", 0.5)
        .orderBy(col("a"), col("b"))),
    // Manku-style block-permuted multi-table SimHash (d=3, 4 tables of 16
    // bits): FULL recall for hamming<=3 by pigeonhole, unlike a single prefix
    "q32_simhash_near_dups" -> ((s, dir) =>
      graft.ops.DedupOps.simhashNearDupPairs(
        t(s, dir, "documents").select(col("doc_id"), col("text")), "text", "doc_id",
        maxHamming = 3)
        .orderBy(col("a"), col("b"))),
    // two-phase dedup: LSH candidates verified by exact shingle Jaccard.
    // rowsPerBand=4 (16 bands): J≥0.8 pairs miss a band with p≈2e-4, giving
    // total candidate recall on this corpus — so the output IS the exact
    // {pairs: J ≥ 0.8} set, statable in plain SQL over string shingles
    "q33_verified_near_dups" -> ((s, dir) =>
      graft.ops.DedupOps.verifiedNearDupPairs(
        t(s, dir, "documents").select(col("doc_id"), col("text")), "text", "doc_id",
        threshold = 0.8, candidateThreshold = 0.4, rowsPerBand = 4)
        .orderBy(col("a"), col("b"))),
    // embedding-cosine near-dup via bucketed multi-probe LSH; testdata embeddings
    // have no genuine near-dups (max pairwise cosine ≈ 0.49), so the corpus is
    // unioned with perturbed copies (one component nudged; cosine ≈ 0.99) that
    // the LSH buckets must recover
    "q34_embedding_near_dups" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val perturbed = emb.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = 0, x * 1.2f + 0.1f, x))").as("embedding"))
      // (k, L) multi-table LSH at auto parameters recovers every perturbed
      // pair (cosine ≈ 0.99) — the pair SET is the oracle contract (cosine
      // VALUES are covered by q16's oracle; float-vs-double rounding at the
      // 4th decimal would make them a flaky hash compare here).
      // approxRows: k sizing needs only the order of magnitude, so the cheap
      // column-less parquet count stands in for scanning the union
      graft.ops.SimilarityOps.embeddingNearDupPairs(
        emb.unionByName(perturbed), "embedding", "vec_id", threshold = 0.95,
        approxRows = 2 * t(s, dir, "embeddings").count())
        .select(col("a"), col("b"))
        .orderBy(col("a"), col("b"))
    }),
    // cluster-semantics dedup: two-level mutation chains (doc ~ drop-1 ~
    // drop-2) plus the table's genuine near-dup clusters, resolved by
    // connected components; exactly one canonical (min-id) row per cluster
    // survives. rowsPerBand=3 (21 bands): J>=0.8 pairs miss all bands with
    // p≈3e-7 — exact on this corpus — while same-vocab random pairs (J≈0.1)
    // rarely collide (rows=2 went quadratic in candidates at sf0.1)
    "q39_dedup_cc" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val m1 = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
      val m2 = m1.select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
      graft.ops.DedupOps.dropNearDupsCC(docs.unionByName(m1).unionByName(m2),
        "text", "doc_id", threshold = 0.8, candidateThreshold = 0.4, rowsPerBand = 3)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // cluster-semantics embedding dedup: every original pairs with exactly its
    // perturbed copy (the q34 contract), so CC keeps the originals — composing
    // the LSH candidate join with connectedComponents end-to-end
    "q41_embedding_dedup_cc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val perturbed = emb.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = 0, x * 1.2f + 0.1f, x))").as("embedding"))
      graft.ops.SimilarityOps.dropEmbeddingDupsCC(
        emb.unionByName(perturbed), "embedding", "vec_id", threshold = 0.95,
        approxRows = 2 * t(s, dir, "embeddings").count())
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),
    // url canonicalization (the dedup-by-url pass BEFORE content dedup):
    // messy urls constructed in-query from doc_id — mixed-case host, default
    // ports, fragments, tracking params, unsorted query — so the oracle can
    // state the canonical form in plain SQL
    "q43_url_canonicalize" -> ((s, dir) => {
      val messy = concat(
        when(col("doc_id") % 2 === 0, lit("HTTP://")).otherwise(lit("https://")),
        lit("WWW.Example"), (col("doc_id") % 7).cast("string"), lit(".COM"),
        when(col("doc_id") % 2 === 0, lit(":80")).otherwise(lit(":443")),
        when(col("doc_id") % 3 === 0, lit("")).otherwise(concat(lit("/Path/"), (col("doc_id") % 5).cast("string"))),
        lit("?z="), (col("doc_id") % 9).cast("string"),
        lit("&utm_source=feed&a="), (col("doc_id") % 4).cast("string"),
        lit("&gclid=xyz#frag"), (col("doc_id") % 3).cast("string"))
      t(s, dir, "documents")
        .select(col("doc_id"), canonical_url(messy).as("canon"))
    }),
    // corpus curation staple: exact token-count distribution (min/max + EXACT
    // interpolated percentiles — percentile(), not approx_percentile, so the
    // oracle can state the same linear-interpolation quantiles)
    // exact quantiles via the HISTOGRAM shape, not percentile(): token counts
    // are small integers, so groupBy(n_tok) map-side-combines 10^10 rows down
    // to #distinct values BEFORE the shuffle, where exact percentile() buffers
    // every raw value in one ObjectHashAggregate reducer. The cumulative
    // window then reads off quantile_cont semantics (v_lo + frac·(v_hi−v_lo)
    // at rank p·(n−1)) in closed form — bit-compatible with DuckDB's.
    "q42_token_quantiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hist = t(s, dir, "documents")
        .select(size(split(col("text"), " ")).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("c"))
      // one window spec for both the running and the total sum — a second
      // partitioning (e.g. partitionBy(1) vs global orderBy) would add an
      // exchange; with one spec both sums ride a single Window node. The
      // remaining ~0.3s at sf0.1 is the text scan+split plus 4 stages of
      // scheduling floor — the histogram itself is #distinct-token-count rows.
      val wSpec = Window.partitionBy(lit(1)).orderBy(col("v"))
      val cum = hist
        .withColumn("cum", sum(col("c")).over(
          wSpec.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("c")).over(
          wSpec.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      def quant(p: Double) = {
        // rank is needed per-row (inside the aggregate filters) AND as an
        // aggregate (the interpolation term); n is constant per row, so the
        // per-row form and max(n) agree by construction
        val rRow = lit(p) * (col("n") - 1)
        val lo = min(when(col("cum") >= floor(rRow) + 1, col("v")))
        val hi = min(when(col("cum") >= ceil(rRow) + 1, col("v")))
        val rAgg = lit(p) * (max(col("n")) - 1)
        round(lo + (rAgg - floor(rAgg)) * (hi - lo), 4)
      }
      cum.agg(
        max(col("n")).as("n_docs"),
        min(col("v")).as("min_tok"),
        max(col("v")).as("max_tok"),
        quant(0.5).as("p50"), quant(0.9).as("p90"), quant(0.99).as("p99"))
    }),

    // ---------------- corpus curation (named LLM-data-pipeline stages) ----------------
    // benchmark decontamination (GPT-3 appendix A shape): flag documents
    // sharing any 13-token gram with a benchmark set — the benchmark here is
    // constructed from the table itself (tokens 4..16 of every 17th doc), so
    // the oracle can state the overlap in plain SQL over token strings (the
    // Spark side joins 64-bit gram hashes; splitmix collisions at this
    // cardinality are ~1e-9 and the dataset is fixed)
    "q47_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 17 === 0)
        .select(array_join(slice(split(col("text"), " "), 4, 13), " ").as("bench_text"))
      graft.ops.CurationOps.decontaminate(docs, "text", "doc_id", bench, "bench_text", n = 13)
        .orderBy(col("doc_id"))
    }),
    // Gopher-style repetition signals (duplicate n-gram fraction, top-bigram
    // mass) — the published MassiveText quality rules' repetition family
    "q48_repetition_stats" -> ((s, dir) =>
      graft.ops.CurationOps.repetitionStats(
        t(s, dir, "documents").select(col("doc_id"), col("text")), "text", "doc_id", n = 3)
        .orderBy(col("doc_id"))),
    // crawl balancing: keep at most 40 documents per host (hosts constructed
    // in-query: 7 hosts via doc_id % 7, order by doc_id)
    "q49_host_cap" -> ((s, dir) => {
      val host = concat(lit("www.example"), (col("doc_id") % 7).cast("string"), lit(".com"))
      graft.ops.CurationOps.hostCap(
        t(s, dir, "documents").select(col("doc_id"), host.as("host")), "host", "doc_id", 40)
        .select(col("doc_id"), col("host")).orderBy(col("doc_id"))
    }),
    // deterministic stratified sampling: ~30% per row via splitmix64(doc_id ^
    // seed) — reproducible across runs/partitionings (never rand()); the
    // oracle replays the same splitmix chain in DuckDB UBIGINT arithmetic
    "q50_stratified_sample" -> ((s, dir) =>
      graft.ops.CurationOps.stratifiedSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")), "doc_id", pct = 30)
        .select(col("doc_id"), col("lang")).orderBy(col("doc_id"))),

    // CCNet-style line dedup: three-line docs constructed in-query — a
    // corpus-wide boilerplate line, the doc's own text, a per-group footer —
    // each duplicated line survives only in its (min doc_id, min line) home
    "q51_line_dedup" -> ((s, dir) => {
      val txt = concat(
        lit("all rights reserved footer\n"),
        col("text"),
        lit("\nfooter group "), (col("doc_id") % 5).cast("string"))
      graft.ops.CurationOps.dropDuplicatedLines(
        t(s, dir, "documents").select(col("doc_id"), txt.as("text")), "text", "doc_id")
        .orderBy(col("doc_id"))
    }),
    // PII redaction to typed placeholders; the payload is constructed so the
    // oracle can state the redacted form as a closed-form literal (no regex
    // dialect in the oracle at all)
    "q52_pii_redact" -> ((s, dir) => {
      val messy = concat(
        col("text"),
        lit(" contact user"), (col("doc_id") % 9).cast("string"),
        lit(".name@mail"), (col("doc_id") % 4).cast("string"), lit(".example.com now"),
        lit(" call +1 555 0"), (col("doc_id") % 10).cast("string"), lit(" 42"),
        lit(" ip 10.0.0."), (col("doc_id") % 250).cast("string"), lit(" end"))
      t(s, dir, "documents")
        .select(col("doc_id"), graft.ops.CurationOps.redactPii(messy).as("clean"))
    }),

    "q14_simhash" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), lower(hex(simhash64(col("text")))).as("simhash_hex"))),
    "q15_rolling_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), lower(hex(rolling_fingerprint(col("text"), 8))).as("fp_hex"))),

    // ---------------- similarity search over embeddings ----------------
    "q16_ann_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      val q = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val pairs = q.crossJoin(emb.select(col("vec_id").as("neighbor_id"), col("v").as("nv")))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", cosine_sim(col("qv"), col("nv")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
      pairs.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), round(col("sim"), 4).as("sim"), col("rank"))
    }),

    // ANN scale path: hyperplane-LSH bucketing (sign bits of dot products with
    // deterministic pseudo-random hyperplanes) — queries join only their
    // probed buckets' candidates instead of the full cross join. PRODUCTION
    // parameterization: k sign-bit planes grown with corpus size (planesFor)
    // and plane dimension read from the data — the same sizing q34 uses. HERE
    // probe radius = k enumerates every bucket, making the search exhaustive
    // (the q37 nProbe=k trick): the bucket machinery runs end-to-end while the
    // output equals brute force, so the oracle is plain SQL. Production
    // probing is radius=1 (its recall is pinned in AnnSpec).
    "q28_ann_lsh_bucketed" -> ((s, dir) => {
      import graft.ops.SimilarityOps
      val embT = t(s, dir, "embeddings")
      val nPlanes = SimilarityOps.planesFor(embT.count())
      val planes = SimilarityOps.lshPlanes(nPlanes, SimilarityOps.embeddingDim(embT, "embedding"))
      val emb = embT
        .withColumn("v", transform(col("embedding"), x => x.cast("double")))
        .withColumn("bucket", SimilarityOps.lshBucket(col("v"), planes))
      val q = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          explode(SimilarityOps.probeBuckets(col("bucket"), nPlanes, radius = nPlanes)).as("bucket"))
      val cands = emb.select(col("vec_id").as("neighbor_id"), col("v").as("nv"), col("bucket"))
      val pairs = q.join(cands, Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", cosine_sim(col("qv"), col("nv")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
      pairs.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), round(col("sim"), 4).as("sim"), col("rank"))
    }),

    // IVF (inverted-file) ANN — the trained-coarse-quantizer scale path
    // (k-means lists; queries rank only their nProbe nearest lists). The
    // testdata embeddings are random (no cluster structure), so partial
    // probing is genuinely lossy there — its recall curve is pinned in
    // IvfAnnSpec; HERE nProbe=k validates the full machinery (train → assign
    // → probe → list join → exact re-rank) against the brute-force oracle.
    "q37_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // the coarse quantizer is a PERSISTED model table (train once on the
      // deterministic 1/4 hash sample — the 10^10-row shape — commit via
      // the CatalogIO manifest, read at every search): quantizer training
      // in the query path is the anti-pattern at 100×, and the model is
      // bit-identical read-back vs retrained. nProbe = k makes the search
      // EXACT regardless of centroids, which is the oracle contract.
      val centroids = graft.ops.AnnModelIO.centroidsFor(emb, "embedding", "vec_id",
        k = 16, iters = 3, sampleDenominator = 4,
        dir = graft.ops.AnnModelIO.modelDir("ivf", dir, "k16-i3-s4"))
      graft.ops.IvfAnn.topK(emb, "embedding", "vec_id", col("vec_id") < 20,
        centroids, k = 5, nProbe = 16)
    }),

    // IVF-PQ (Jégou 2011) — the compressed-vector 100 TB ANN shape: the
    // inverted file carries M-byte PQ codes instead of dim doubles, the
    // candidate stage ranks by asymmetric-distance cosine over codes alone
    // (spec-metered ≥4× shuffle-byte reduction), and only the k·refine
    // shortlist re-ranks against exact floats. nProbe = k + refine ≥ corpus
    // makes the result bit-identical to brute force (the q37 oracle
    // contract); the lossy recall curve is pinned in IvfPqSpec.
    "q94_ann_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // both models are PERSISTED tables (see q37): search-only after the
      // first commit — the ~3.5-4 s in-query training floor was the one
      // perf-weak item of round 6. One Lloyd pass for PQ: the
      // exhaustive-probe oracle contract is independent of codebook quality
      // (the exact re-rank decides).
      val centroids = graft.ops.AnnModelIO.centroidsFor(emb, "embedding", "vec_id",
        k = 16, iters = 3, sampleDenominator = 4,
        dir = graft.ops.AnnModelIO.modelDir("ivf", dir, "k16-i3-s4"))
      val pq = graft.ops.AnnModelIO.pqFor(emb, "embedding", "vec_id", dim = 64,
        m = 8, ksub = 16, iters = 1, sampleDenominator = 4,
        dir = graft.ops.AnnModelIO.modelDir("pq", dir, "d64-m8-k16-i1-s4"))
      graft.ops.IvfPq.topK(emb, "embedding", "vec_id", col("vec_id") < 20,
        centroids, pq, k = 5, nProbe = 16, refine = 1 << 16)
    }),

    // ---------------- extraction round-trips (the engine core, oracle-checked) ----------------
    "q17_extract_html_roundtrip" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("html", encode(htmlOf(col("text")), "UTF-8"))
        .withColumn("extracted", extract_main_content(col("html")))
        .select(
          col("doc_id"),
          col("extracted"),
          text_digest(col("extracted")).as("extracted_sha256"))),
    "q18_extract_blocks_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("blocks", extract_blocks(encode(htmlOf(col("text")), "UTF-8")))
        .select(
          col("doc_id"),
          size(col("blocks")).as("n_blocks"),
          size(filter(col("blocks"), b => b.getField("is_content"))).as("n_content"),
          expr("aggregate(blocks, 0, (acc, b) -> acc + IF(b.is_content, b.words, 0))").as("content_words"))),
    "q19_pdf_roundtrip" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("pdf", pdfOf(col("text")))
        .select(col("doc_id"), parse_pdf_text(col("pdf")).as("pdf_text"))),
    "q20_pdf_preflight" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("payload", encode(
          when(col("doc_id") % 3 === 0, lit("%PDF-1.4\nplain data"))
            .when(col("doc_id") % 3 === 1, lit("%PDF-abc\nbad version"))
            .otherwise(lit("%PDF-1.5\n<< /Encrypt 9 0 R >>")), "UTF-8"))
        .withColumn("pf", pdf_preflight(col("payload")))
        .select(
          col("doc_id"),
          col("pf.is_pdf").as("is_pdf"),
          col("pf.encrypted").as("encrypted"))),

    // reading-order invariant under shuffle (SURVEY.md D1/F6): explode PDF word
    // spans with their position index, force a shuffle, regroup + sort by index —
    // the reassembled text must equal the original (collect_list alone is NOT
    // order-stable; the explicit index is the point)
    "q25_spans_order_under_shuffle" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("pdf", pdfOf(col("text")))
        .select(col("doc_id"), posexplode(parse_pdf_spans(col("pdf"))).as(Seq("pos", "span")))
        .repartition(col("span.word")) // adversarial shuffle: scatter words of a doc
        .groupBy(col("doc_id"), col("span.page").as("page"))
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("span.word").as("word")))),
            x => x.getField("word")), " ").as("reassembled"))
    }),
    "q26_pagination" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(50).limit(50)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))),
    "q27_sanitize" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          substring(regexp_replace(upper(col("source")), "[^A-Z0-9]", "_"), 1, 4).as("src_clean"),
          when(col("lang").isin("en", "de", "es", "fr", "zh"), col("lang"))
            .otherwise(lit("unknown")).as("lang_clean"))),

    // multimodal binary columns: REAL header parsing (PNG IHDR big-endian,
    // GIF LE screen descriptor, JPEG SOF scan) over payloads constructed
    // in-query, so the oracle can state the expected metadata in plain SQL
    "q29_media_sniff" -> ((s, dir) => {
      val w = (col("doc_id") % 50 + 100).cast("int")
      val h = (col("doc_id") % 30 + 200).cast("int")
      val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"),
        lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"))
      val gifHex = concat(lit("474946383961"), // "GIF89a"
        lpad(hex(w), 2, "0"), lit("00"), lpad(hex(h), 2, "0"), lit("00")) // u16 LE, w/h < 256
      val jpgHex = concat(lit("FFD8FFC0001108"), lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"))
      t(s, dir, "documents")
        .withColumn("payload", unhex(
          when(col("doc_id") % 3 === 0, pngHex)
            .when(col("doc_id") % 3 === 1, gifHex)
            .otherwise(jpgHex)))
        .withColumn("m", media_sniff(col("payload")))
        .select(col("doc_id"), col("m.format").as("format"),
          col("m.width").as("width"), col("m.height").as("height"))
    }),
    // the media_features DISPATCH surface end-to-end: three real decoders
    // (JPEG, GIF, WAV — flat fixtures, closed-form means/variances) plus the
    // declared hash-sketch arm (MP3 payloads — table-data codec, no real
    // decode by design). Everything quantizes to integer 1e-4 units so the
    // whole query is hash-checked: decoded rows state their features in
    // plain SQL, sketch rows pin the deterministic sketch constants computed
    // at plan-build time from the same fixed payloads (a regression anchor
    // for sketch stability, the q24 golden-digest pattern)
    "q30_media_features" -> ((s, dir) => {
      val m = (col("doc_id") % 200).cast("int")
      val jpegHex = memoFixture("q30-jpeg") { (0 until 200).map { v =>
        graft.media.JpegEncode.flatGray(16, 16, v).map(b => f"${b & 0xff}%02X").mkString
      } }
      val gifHex = memoFixture("q30-gif") { (0 until 200).map { v =>
        graft.media.GifEncode.flatColor(8, 8, v, (v * 3) % 256, (v * 7) % 256)
          .map(b => f"${b & 0xff}%02X").mkString
      } }
      def le32(v: Int) = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X${(v >> 16) & 0xff}%02X${(v >> 24) & 0xff}%02X"
      def le16(v: Int) = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X"
      val wavHeadHex = "52494646" + le32(36 + 256) + "57415645" +
        "666D7420" + le32(16) + le16(1) + le16(1) + le32(8000) +
        le32(8000) + le16(1) + le16(8) + "64617461" + le32(256)
      val mp3Hex = memoFixture("q30-mp3") { (0 until 20).map { i =>
        graft.media.AvEncode.mp3Silent(i + 1).map(b => f"${b & 0xff}%02X").mkString
      } }
      val payload = unhex(
        when(col("doc_id") % 4 === 0, element_at(array(jpegHex.map(lit): _*), m + 1))
          .when(col("doc_id") % 4 === 1, element_at(array(gifHex.map(lit): _*), m + 1))
          .when(col("doc_id") % 4 === 2,
            concat(lit(wavHeadHex), repeat(lpad(hex(m), 2, "0"), 256)))
          .otherwise(element_at(array(mp3Hex.map(lit): _*), (m % 20) + 1)))
      val f = media_features(payload)
      def e4(c: Column) = round(c.cast("double") * 10000).cast("long")
      t(s, dir, "documents")
        .withColumn("f", f)
        .select(col("doc_id"),
          e4(element_at(col("f"), 1)).as("f1_e4"),
          e4(element_at(col("f"), 2) + element_at(col("f"), 3) + element_at(col("f"), 4))
            .as("f234_e4"),
          e4(element_at(col("f"), 5)).as("var_e4"),
          e4(element_at(col("f"), 6) + element_at(col("f"), 7) + element_at(col("f"), 8))
            .as("rest_e4"))
    }),
    // REAL PNG decode (PngDecode: inflate + un-filter): a valid grayscale PNG
    // is built in-query — stored-deflate block, vertical gradient row y =
    // doc_id%200 + y — so the per-channel mean/variance features are statable
    // in closed form. h = 16 (power of two) keeps mean = base + 7.5 and
    // variance = (16²−1)/12 = 21.25 exactly representable in float, making
    // the hash compare deterministic.
    "q40_png_features" -> ((s, dir) => {
      val h = 16
      val base = (col("doc_id") % 200).cast("int")
      // scanline y: filter byte 00 + 8 pixels of value base+y (stride 8, gray)
      val rawHex = array_join(
        transform(sequence(lit(0), lit(h - 1)),
          y => concat(lit("00"), repeat(lpad(hex(base + y), 2, "0"), 8))), "")
      // raw len = 16×9 = 144 (0x90); stored-deflate: final+stored, len LE,
      // ~len LE; IDAT data len = 2(zlib hdr)+5(block hdr)+144+4(adler) = 155
      val pngHex = concat(
        lit("89504E470D0A1A0A" +          // signature
          "0000000D" + "49484452" +       // IHDR len + type
          "00000008" + "00000010" +       // width 8, height 16
          "08" + "00" + "00" + "00" + "00" + "00000000" + // 8-bit gray + CRC (unchecked)
          "0000009B" + "49444154" +       // IDAT len 155 + type
          "7801" + "01" + "9000" + "6FFF"), // zlib hdr + stored-final block hdr
        rawHex,
        lit("00000000" +                  // adler (unchecked: raw inflate)
          "00000000" +                    // IDAT CRC
          "00000000" + "49454E44" + "00000000")) // IEND
      t(s, dir, "documents")
        .withColumn("f", media_features(unhex(pngHex)))
        .select(col("doc_id"),
          round(element_at(col("f"), 1).cast("double"), 4).as("mean_c0"),
          round(element_at(col("f"), 5).cast("double"), 4).as("var_c0"),
          round((element_at(col("f"), 2) + element_at(col("f"), 3) + element_at(col("f"), 4) +
            element_at(col("f"), 6) + element_at(col("f"), 7) + element_at(col("f"), 8))
            .cast("double"), 4).as("other_channels"))
    }),

    // REAL baseline-JPEG decode (JpegDecode: marker parse + Huffman + dequant
    // + IDCT): 200 flat grayscale JPEGs encoded at plan-build time by
    // JpegEncode (quantizer ≡ 1 — a flat block survives the DCT round-trip
    // EXACTLY), selected per row by doc_id. Decoding must recover the flat
    // value, so mean = doc_id % 200 and variance = 0 in closed form — the
    // same fixture-with-closed-form-oracle pattern as q40's PNG.
    "q44_jpeg_features" -> ((s, dir) => {
      val jpegHex = memoFixture("q44-jpeg") { (0 until 200).map { v =>
        graft.media.JpegEncode.flatGray(16, 16, v).map(b => f"${b & 0xff}%02X").mkString
      } }
      t(s, dir, "documents")
        .withColumn("f", media_features(unhex(
          element_at(array(jpegHex.map(lit): _*), (col("doc_id") % 200 + 1).cast("int")))))
        .select(col("doc_id"),
          round(element_at(col("f"), 1).cast("double"), 4).as("mean_c0"),
          round(element_at(col("f"), 5).cast("double"), 4).as("var_c0"),
          round((element_at(col("f"), 2) + element_at(col("f"), 3) + element_at(col("f"), 4) +
            element_at(col("f"), 6) + element_at(col("f"), 7) + element_at(col("f"), 8))
            .cast("double"), 4).as("other_channels"))
    }),

    // REAL GIF decode (GifDecode: LZW + palette → RGB): 200 tiny flat-color
    // GIFs (palette entry 0 = gray level doc_id % 200) built at plan-build
    // time by GifEncode.flatColor — decode must recover the palette color on
    // every pixel, so all three channel means equal the level and every
    // variance is 0, statable in closed form
    "q45_gif_features" -> ((s, dir) => {
      val gifHex = memoFixture("q45-gif") { (0 until 200).map { v =>
        graft.media.GifEncode.flatColor(8, 8, v, v, v).map(b => f"${b & 0xff}%02X").mkString
      } }
      t(s, dir, "documents")
        .withColumn("f", media_features(unhex(
          element_at(array(gifHex.map(lit): _*), (col("doc_id") % 200 + 1).cast("int")))))
        .select(col("doc_id"),
          round(element_at(col("f"), 1).cast("double"), 4).as("mean_r"),
          round(element_at(col("f"), 2).cast("double"), 4).as("mean_g"),
          round(element_at(col("f"), 3).cast("double"), 4).as("mean_b"),
          round((element_at(col("f"), 4) + element_at(col("f"), 5) + element_at(col("f"), 6) +
            element_at(col("f"), 7) + element_at(col("f"), 8)).cast("double"), 4).as("rest"))
    }),

    // REAL WAV PCM decode (WavDecode): an 8-bit mono RIFF/WAVE payload is
    // built IN-QUERY (static header + the sample value doc_id % 200 repeated
    // 256 times), so the oracle states mean = value, variance = 0 in plain
    // SQL — audio's q40/q44 analog
    "q46_wav_features" -> ((s, dir) => {
      val nSamples = 256
      def le32(v: Int) = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X${(v >> 16) & 0xff}%02X${(v >> 24) & 0xff}%02X"
      def le16(v: Int) = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X"
      def headerHex(fmtTag: Int, bits: Int) = {
        val dataLen = nSamples * bits / 8
        "52494646" + le32(36 + dataLen) + "57415645" + // RIFF size WAVE
          "666D7420" + le32(16) + le16(fmtTag) + le16(1) + le32(8000) +
          le32(8000 * bits / 8) + le16(bits / 8) + le16(bits) +
          "64617461" + le32(dataLen)
      }
      // two encodings with the SAME oracle: u8 PCM passes k through exactly,
      // and float32 of (k−128)/128 — exactly representable, so
      // round(f·32768) = (k−128)·256 and the normalization returns k
      val floatHex = (0 until 200).map { k =>
        le32(java.lang.Float.floatToIntBits((k - 128) / 128.0f))
      }
      val payload = when(col("doc_id") % 2 === 0,
        concat(lit(headerHex(1, 8)),
          repeat(lpad(hex((col("doc_id") % 200).cast("int")), 2, "0"), nSamples)))
        .otherwise(concat(lit(headerHex(3, 32)),
          repeat(element_at(array(floatHex.map(lit): _*),
            (col("doc_id") % 200 + 1).cast("int")), nSamples)))
      t(s, dir, "documents")
        .withColumn("f", media_features(unhex(payload)))
        .select(col("doc_id"),
          round(element_at(col("f"), 1).cast("double"), 4).as("mean_c0"),
          round(element_at(col("f"), 5).cast("double"), 4).as("var_c0"),
          round((element_at(col("f"), 2) + element_at(col("f"), 3) + element_at(col("f"), 4) +
            element_at(col("f"), 6) + element_at(col("f"), 7) + element_at(col("f"), 8))
            .cast("double"), 4).as("other_channels"))
    }),

    // REAL audio/video container metadata (AvMeta: MP4 box walk, MP3 Layer III
    // frame walk, FLAC STREAMINFO bit unpack): minimal valid payloads built at
    // plan-build time by AvEncode with doc_id-derived parameters, so duration /
    // sample-rate / dimensions are all statable in closed form — the metadata
    // half of the video/audio surface is thereby real and oracle-checked; only
    // codec payload DECODE remains the declared stub
    "q53_av_meta" -> ((s, dir) => {
      val mp4Hex = memoFixture("q53-mp4") { (0 until 200).map { m =>
        graft.media.AvEncode.mp4Video(m % 50 + 100, m % 30 + 200, (m + 1) * 500L, 1000L)
          .map(b => f"${b & 0xff}%02X").mkString
      } }
      val mp3Hex = memoFixture("q53-mp3") { (0 until 20).map { m =>
        graft.media.AvEncode.mp3Silent(m + 1).map(b => f"${b & 0xff}%02X").mkString
      } }
      val flacHex = memoFixture("q53-flac") { (0 until 200).map { m =>
        graft.media.AvEncode.flacStreamInfo((m + 1) * 800L).map(b => f"${b & 0xff}%02X").mkString
      } }
      val m = (col("doc_id") % 200).cast("int")
      val payload = unhex(
        when(col("doc_id") % 3 === 0, element_at(array(mp4Hex.map(lit): _*), m + 1))
          .when(col("doc_id") % 3 === 1, element_at(array(mp3Hex.map(lit): _*), (m % 20) + 1))
          .otherwise(element_at(array(flacHex.map(lit): _*), m + 1)))
      t(s, dir, "documents")
        .withColumn("a", av_meta(payload))
        .select(col("doc_id"), col("a.format").as("format"),
          col("a.duration_ms").as("duration_ms"), col("a.sample_rate").as("sample_rate"),
          col("a.channels").as("channels"), col("a.width").as("width"),
          col("a.height").as("height"))
    }),

    // duplicated-passage signal (Lee et al. 2022 EXACTSUBSTR): a shared
    // 6-token sentence is appended to every third document, so cross-doc
    // duplicated 5-gram windows exist by construction; the oracle replays the
    // same windows as token STRINGS (the q47 pattern — the Spark side joins
    // 64-bit gram hashes)
    "q54_dup_spans" -> ((s, dir) => {
      val txt = concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" alpha beta gamma delta epsilon zeta"))
          .otherwise(lit("")))
      graft.ops.CurationOps.duplicatedSpanStats(
        t(s, dir, "documents").select(col("doc_id"), txt.as("text")), "text", "doc_id", n = 5)
        .orderBy(col("doc_id"))
    }),

    // EXACTSUBSTR REMOVAL (Lee et al. 2022 §4.1 — the transform whose counts
    // q54 measures): the injected 6-token boilerplate run is shared by every
    // 3rd doc, so its two fully-inside 5-token windows are corpus-duplicated
    // and the whole suffix is removed from every copy; corpus-level exact-dup
    // docs (q11's n_dup_docs) collapse to empty strings. The oracle replays
    // windows as token strings (q47's collision argument) and rebuilds via
    // string_agg ORDER BY pos.
    "q81_remove_dup_spans" -> ((s, dir) => {
      val txt = concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" alpha beta gamma delta epsilon zeta"))
          .otherwise(lit("")))
      graft.ops.CurationOps.removeDuplicatedSpans(
        t(s, dir, "documents").select(col("doc_id"), txt.as("text")), "text", "doc_id", n = 5)
        .orderBy(col("doc_id"))
    }),

    // outlink extraction (HtmlLinks): every RFC 3986 resolution case in one
    // page — root-relative, relative with dot segments, scheme-relative
    // (unquoted attr), absolute with an entity-encoded &amp;, query-only,
    // plus dropped mailto:/#fragment edges, a commented-out anchor, and a
    // decoy anchor inside script raw text. The oracle states each resolved
    // link closed-form.
    "q82_extract_links" -> ((s, dir) => {
      val k = (col("doc_id") % 7).cast("string")
      val j = (col("doc_id") % 3).cast("string")
      val m = (col("doc_id") % 50).cast("string")
      val url = concat(lit("https://h"), k, lit(".example/dir/page"), j)
      val html = concat(
        lit("<html><head><title>t</title><script>var a='<a href=\"/not/a/link\">';</script></head><body>"),
        lit("<!-- <a href=\"/commented/out\">c</a> --><a href=\"/p/"), m, lit("\">x</a> "),
        lit("<a href='a/b/../c"), m, lit("'>y</a> <a href=//cdn.example/r/"), m, lit(">z</a> "),
        lit("<a href=\"https://abs"), m, lit(".example/z?q="), m, lit("&amp;r=1\">w</a> "),
        lit("<a href=\"mailto:a@b.c\">m</a> <a href=\"#top\">t</a> <a href=\"?only="), m, lit("\">q</a> "),
        lit("<a name=\"x\">no href</a></body></html>"))
      t(s, dir, "documents")
        .withColumn("links", extract_links(encode(html, "UTF-8"), url))
        .select(col("doc_id"), posexplode(col("links")).as(Seq("pos", "link")))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // anchor-text harvest (the retrieval-signal side of the link graph —
    // anchor text describes the TARGET page): nested inline tags contribute
    // their text, entities decode, whitespace collapses, a new <a>
    // auto-closes the previous one (the browser rule — the unclosed anchor
    // case is in-fixture), and dropped pseudo-links contribute no row
    "q86_anchor_text" -> ((s, dir) => {
      val k = (col("doc_id") % 7).cast("string")
      val m = (col("doc_id") % 50).cast("string")
      val url = concat(lit("https://h"), k, lit(".example/dir/page"))
      val html = concat(
        lit("<html><body><a href=\"/p/"), m, lit("\">read   <b>doc "), m,
        lit("</b> now</a> <a href=\"mailto:x@y\">not a link</a> "),
        lit("<a href=\"/unclosed/"), m, lit("\">first &amp; unclosed "),
        lit("<a href=\"https://t"), m, lit(".example/\">second</a></body></html>"))
      t(s, dir, "documents")
        .select(col("doc_id"), posexplode(html_anchors(encode(html, "UTF-8"), url)).as(Seq("pos", "a")))
        .select(col("doc_id"), col("pos"), col("a.href").as("href"), col("a.text").as("text"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // base-href re-basing + meta-refresh redirect extraction: the first
    // <base href> (itself document-resolved) re-bases relative links; the
    // refresh target comes from html_meta's refresh_url (delay; url= syntax,
    // quotes optional) — both crawl-graph correctness details
    "q91_base_refresh" -> ((s, dir) => {
      val m = (col("doc_id") % 50).cast("string")
      val url = concat(lit("https://h"), (col("doc_id") % 7).cast("string"), lit(".example/dir/page"))
      val html = concat(
        lit("<html><head><base href=\"https://b"), m, lit(".example/x/\">"),
        lit("<meta http-equiv=\"refresh\" content=\"0; URL='/go/"), m, lit("'\">"),
        lit("</head><body><a href=\"a"), m, lit("\">r</a></body></html>"))
      val payload = encode(html, "UTF-8")
      t(s, dir, "documents")
        .select(col("doc_id"),
          html_meta(payload).getField("refresh_url").as("refresh_url"),
          element_at(extract_links(payload, url), 1).as("first_link"))
        .orderBy(col("doc_id"))
    }),

    // empty-user-password PDF recovery (PdfCrypto — ISO 32000-1/-2 §7.6
    // standard handler): variants rotate ALL FOUR supported schemes — RC4
    // V1/40, RC4 V2/128, V4/AESV2 (crypt filters + JDK AES-CBC), V5/R6
    // AESV3 (SHA-2 2.B hash + AES-256); every 10th variant carries a
    // corrupted /U (a REAL user password) and must stay locked. The
    // decrypted bytes flow through the normal extractor — recovered text is
    // the closed-form plaintext, locked rows extract nothing
    "q96_pdf_decrypt" -> ((s, dir) => {
      import java.nio.charset.StandardCharsets
      val hexes = memoFixture("q96-pdf") { (0 until 200).map { m =>
        val text = s"Recovered secret $m"
        val content = s"BT /F1 12 Tf 72 720 Td ($text) Tj ET"
        val clear = ("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
          "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
          "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
          s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n%%EOF\n")
          .getBytes(StandardCharsets.US_ASCII)
        val locked = m % 10 == 3
        val enc = (m % 4) match {
          case 0 => graft.pdf.PdfCrypto.encryptRc4(clear, v = 1, idSeed = 42L + m, corruptU = locked)
          case 1 => graft.pdf.PdfCrypto.encryptRc4(clear, v = 2, idSeed = 42L + m, corruptU = locked)
          case 2 => graft.pdf.PdfCrypto.encryptAes(clear, v = 4, idSeed = 42L + m, corruptU = locked)
          case _ => graft.pdf.PdfCrypto.encryptAes(clear, v = 5, idSeed = 42L + m, corruptU = locked)
        }
        enc.map(x => f"${x & 0xff}%02X").mkString
      } }
      val payload = unhex(
        element_at(array(hexes.map(lit): _*), (col("doc_id") % 200 + 1).cast("int")))
      val dec = pdf_decrypt(payload)
      t(s, dir, "documents")
        .select(col("doc_id"),
          dec.isNotNull.as("recovered"),
          when(dec.isNotNull, parse_pdf_text(dec)).otherwise(lit("")).as("text"))
        .orderBy(col("doc_id"))
    }),

    // crawl-frontier composition (FrontierOps): anchors + meta-refresh +
    // feed items from ONE payload scan, gated by RFC 9309 robots (even
    // hosts disallow /p/), the broadcast blocklist (spam.example), and a
    // seen anti-join (even-m t-targets already fetched), deduplicated on
    // the canonical url with the min-struct keeper — every surviving row
    // is closed-form from (doc_id % 50, doc_id % 7); every 10th m the page
    // IS an RSS feed, exercising the feed branch
    "q95_frontier" -> ((s, dir) => {
      val m = (col("doc_id") % 50).cast("string")
      val h = (col("doc_id") % 7).cast("string")
      val url = concat(lit("https://h"), h, lit(".example/dir/page"))
      val html = concat(
        lit("<html><head><meta http-equiv=\"refresh\" content=\"1; url=/go/"), m,
        lit("\"></head><body><a href=\"/p/"), m,
        lit("\">a</a> <a rel=\"nofollow\" href=\"/nf/"), m,
        lit("\">n</a> <a href=\"https://spam.example/x"), m,
        lit("\">s</a> <a href=\"https://t"), m,
        lit(".example/only\">t</a></body></html>"))
      val rss = concat(
        lit("<?xml version=\"1.0\"?><rss version=\"2.0\"><channel><title>c</title>"),
        lit("<item><title>i</title><link>https://f"), m,
        lit(".example/item</link></item></channel></rss>"))
      val payload = encode(when(col("doc_id") % 50 % 10 === 9, rss).otherwise(html), "UTF-8")
      val pages = t(s, dir, "documents").select(url.as("url"), payload.as("payload"))
      val robots = s.range(7).select(
        concat(lit("h"), col("id").cast("string"), lit(".example")).as("host"),
        when(col("id") % 2 === 0, lit("User-agent: *\nDisallow: /p/"))
          .otherwise(lit("User-agent: *\nDisallow:")).as("robots_txt"))
      val seen = s.range(50).filter(col("id") % 2 === 0)
        .select(concat(lit("https://t"), col("id").cast("string"),
          lit(".example/only")).as("url"))
      graft.ops.FrontierOps.frontier(pages, "url", "payload",
        robots = Some(robots), blockedDomains = Seq("spam.example"),
        seen = Some(seen), seenUrlCol = "url")
        .select(col("url"), col("host"), col("kind"), col("discovered_from"))
        .orderBy(col("url"), col("kind"))
    }),

    // real language ID (the CCNet §4.3 classifier gate): char-bigram Naive
    // Bayes over 17 languages / 8 scripts plus the coverage-gated 'und'
    // class, integer micro-nat scores — texts are held-out sentences
    // (including three uncovered-script rows that MUST land 'und') rotated
    // per doc_id % |HeldOut|, and the oracle RE-CLASSIFIES from the
    // interpolated model table (no closed-form answer key: DuckDB recomputes
    // every gram lookup, the Long sum, the argmax, and the integer und gate)
    "q92_langid_nb" -> ((s, dir) => {
      val cases = graft.text.LangId.HeldOut
      val k = pmod(col("doc_id"), lit(cases.size.toLong))
      val txt = cases.zipWithIndex.drop(1).foldLeft(
        when(k === 0, lit(cases.head._2))) { case (acc, ((_, sent), i)) =>
        acc.when(k === i, lit(sent))
      }.otherwise(lit(""))
      val lid = lang_id(txt)
      t(s, dir, "documents")
        .select(col("doc_id"),
          lid.getField("lang").as("pred_lang"),
          lid.getField("score_micro").as("score_micro"))
        .orderBy(col("doc_id"))
    }),

    // RSS 2.0 + Atom feed extraction: docs alternate dialects — RSS items
    // carry element-text links and CDATA titles; Atom entries carry
    // href-attribute links (the rel=alternate preference is in-fixture via a
    // leading rel=self link that must NOT win) and <updated> dates
    "q90_feed_items" -> ((s, dir) => {
      val m = (col("doc_id") % 50).cast("string")
      val rss = concat(
        lit("<?xml version=\"1.0\"?><rss version=\"2.0\"><channel><title>c</title>"),
        lit("<item><title><![CDATA[story "), m, lit("]]></title>"),
        lit("<link>https://r.example/p/"), m, lit("</link><pubDate>Mon, 0"), (col("doc_id") % 9 + 1).cast("string"),
        lit(" Jan 2024 00:00:00 GMT</pubDate></item>"),
        lit("<item><title>plain &amp; second</title><link>https://r.example/q/"), m,
        lit("</link></item></channel></rss>"))
      val atom = concat(
        lit("<?xml version=\"1.0\"?><feed xmlns=\"http://www.w3.org/2005/Atom\">"),
        lit("<entry><title>entry   "), m, lit("</title>"),
        lit("<link rel=\"self\" href=\"https://a.example/self\"/>"),
        lit("<link rel=\"alternate\" href=\"https://a.example/e/"), m, lit("\"/>"),
        lit("<updated>2024-01-0"), (col("doc_id") % 9 + 1).cast("string"), lit("T00:00:00Z</updated>"),
        lit("</entry></feed>"))
      val payload = encode(when(col("doc_id") % 2 === 0, rss).otherwise(atom), "UTF-8")
      t(s, dir, "documents")
        .select(col("doc_id"), feed_kind(payload).as("kind"),
          posexplode(feed_items(payload)).as(Seq("pos", "it")))
        .select(col("doc_id"), col("kind"), col("pos"),
          col("it.title").as("title"), col("it.link").as("link"), col("it.date").as("date"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // JSON-LD structured data (schema.org): the custom byte-level extractor
    // pulls raw ld+json blocks (type attr case/params variants, script
    // raw-text bodies, decoy plain-script skipped), then Spark's own
    // from_json parses them — the idiomatic custom-expression + built-in
    // composition. Two blocks per page pin multiplicity and order.
    "q88_ldjson" -> ((s, dir) => {
      val m = (col("doc_id") % 50).cast("string")
      val html = concat(
        lit("<html><head><script>var notLd = {\"@type\":\"Decoy\"};</script>"),
        lit("<script type=\"application/ld+json\">{\"@type\":\"Article\",\"headline\":\"story "), m,
        lit("\",\"wordCount\":"), m, lit("}</script>"),
        lit("<script type='APPLICATION/LD+JSON; charset=utf-8'>{\"@type\":\"Product\",\"name\":\"item "), m,
        lit("\"}</script></head><body>b</body></html>"))
      val schema = "STRUCT<`@type`: STRING, headline: STRING, wordCount: INT>"
      t(s, dir, "documents")
        .withColumn("blocks", ldjson_blocks(encode(html, "UTF-8")))
        .withColumn("first", expr(s"from_json(blocks[0], '$schema')"))
        .select(col("doc_id"),
          size(col("blocks")).as("n_blocks"),
          col("first.`@type`").as("type"),
          col("first.headline").as("headline"),
          col("first.wordCount").as("word_count"))
    }),

    // RFC 9309 robots.txt evaluation: group selection (named agent vs *,
    // case-insensitive), wildcard + $ anchors, longest-match-wins, Allow on
    // ties — six paths per doc against a two-group policy, agent alternating
    "q89_robots" -> ((s, dir) => {
      val m = (col("doc_id") % 50).cast("string")
      val robots = lit("# policy\nUser-agent: graftbot\nDisallow: /g-only\n\n" +
        "User-agent: *\nDisallow: /private\nAllow: /private/ok$\n" +
        "Disallow: /t*.pdf$\nSitemap: https://x.example/s.xml\n")
      val agent = when(col("doc_id") % 2 === 0, lit("GraftBot")).otherwise(lit("otherbot"))
      val paths = array(
        concat(lit("/public/"), m),
        concat(lit("/private/"), m),
        lit("/private/ok"),
        concat(lit("/t"), m, lit(".pdf")),
        concat(lit("/t"), m, lit(".pdfx")),
        concat(lit("/g-only/"), m))
      t(s, dir, "documents")
        .select(col("doc_id"), agent.as("agent"), posexplode(paths).as(Seq("pos", "path")))
        .withColumn("allowed", robots_allowed(robots, col("agent"), col("path")))
        .select(col("doc_id"), col("pos"), col("allowed"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // nofollow extraction (the PageRank-edge exclusion flag): rel is a
    // case-insensitive space-separated token LIST — "ugc nofollow" flags,
    // "sponsored" and the non-token "nofollowed" do not; unquoted rel and
    // absent rel covered
    "q87_nofollow_links" -> ((s, dir) => {
      val m = (col("doc_id") % 50).cast("string")
      val url = concat(lit("https://h"), (col("doc_id") % 7).cast("string"), lit(".example/"))
      val html = concat(
        lit("<html><body><a href=\"/n/"), m, lit("\" rel=\"nofollow\">n</a>"),
        lit("<a href=\"/u/"), m, lit("\" rel=\"UGC nofollow\">u</a>"),
        lit("<a href=\"/q/"), m, lit("\" rel=nofollow>q</a>"),
        lit("<a href=\"/s/"), m, lit("\" rel=\"sponsored\">s</a>"),
        lit("<a href=\"/x/"), m, lit("\" rel=\"nofollowed\">x</a>"),
        lit("<a href=\"/p/"), m, lit("\">p</a></body></html>"))
      t(s, dir, "documents")
        .select(col("doc_id"), posexplode(html_anchors(encode(html, "UTF-8"), url)).as(Seq("pos", "a")))
        .select(col("doc_id"), col("pos"), col("a.href").as("href"), col("a.nofollow").as("nofollow"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // host-level PageRank over the extracted link graph (GraphOps.pageRank):
    // end-to-end extract_links -> host edges -> 2 fixed-point iterations in
    // Long micro-units (floor division — bit-identical across engines, the
    // q57 quantization stance applied to a recurrence). The oracle rebuilds
    // the closed-form edge set and unrolls the same two iterations in SQL.
    "q83_host_pagerank" -> ((s, dir) => {
      val k = (col("doc_id") % 7).cast("string")
      val m = (col("doc_id") % 50).cast("string")
      val url = concat(lit("https://h"), k, lit(".example/dir/page"), (col("doc_id") % 3).cast("string"))
      val html = concat(
        lit("<html><body><a href=\"/p/"), m, lit("\">x</a> "),
        lit("<a href=\"//cdn.example/r/"), m, lit("\">z</a> "),
        lit("<a href=\"https://abs"), m, lit(".example/z\">w</a></body></html>"))
      val edges = t(s, dir, "documents")
        .withColumn("link", explode(extract_links(encode(html, "UTF-8"), url)))
        .select(parse_url(url, lit("HOST")).as("src"), parse_url(col("link"), lit("HOST")).as("dst"))
      graft.ops.GraphOps.pageRank(edges, "src", "dst", iters = 2)
        .orderBy(col("host"))
    }),

    // dangling-mass-CONSERVING PageRank (the q83 recurrence with
    // redistributeDangling=true): the q83 edge set's cdn/abs hosts have no
    // outlinks, so each iteration redistributes 850·(Σ dangling rank) div
    // (1000·N) uniformly — the oracle unrolls both iterations INCLUDING the
    // integer share terms, pinning conservation semantics in DuckDB (the
    // mode was previously spec-covered only)
    "q97_pagerank_dangling" -> ((s, dir) => {
      val k = (col("doc_id") % 7).cast("string")
      val m = (col("doc_id") % 50).cast("string")
      val url = concat(lit("https://h"), k, lit(".example/dir/page"), (col("doc_id") % 3).cast("string"))
      val html = concat(
        lit("<html><body><a href=\"/p/"), m, lit("\">x</a> "),
        lit("<a href=\"//cdn.example/r/"), m, lit("\">z</a> "),
        lit("<a href=\"https://abs"), m, lit(".example/z\">w</a></body></html>"))
      val edges = t(s, dir, "documents")
        .withColumn("link", explode(extract_links(encode(html, "UTF-8"), url)))
        .select(parse_url(url, lit("HOST")).as("src"), parse_url(col("link"), lit("HOST")).as("dst"))
      graft.ops.GraphOps.pageRank(edges, "src", "dst", iters = 2,
        redistributeDangling = true)
        .orderBy(col("host"))
    }),

    // incremental dedup against a COMMITTED signature index — the crawl-update
    // shape at corpus scale: the history's text is scanned once per snapshot
    // (indexFor read-if-committed, the q37/q94 model-table contract) and each
    // arriving batch classifies exact/near/fresh against the ~50×-narrower
    // index, never rescanning historic text. The batch re-sends every third
    // doc unchanged (exact by digest), token-shifted (near by MinHash), or
    // replaced by doc-id-salted tokens (fresh); the oracle replays the full
    // hashing pipeline for both sides in UBIGINT wrap arithmetic
    "q98_dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val idxDir = graft.ops.AnnModelIO.modelDir("dedupidx", dir, "h64k3b8")
      val index = graft.ops.DedupOps.indexFor(docs, "text", "doc_id", idxDir)
      val id = col("doc_id").cast("string")
      val batch = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        when(col("doc_id") % 3 === 0, col("text"))
          .when(col("doc_id") % 3 === 1,
            expr("substring(text, instr(text, ' ') + 1)"))
          .otherwise(concat(lit("zx"), id, lit(" qv"), id,
            lit(" wm"), id, lit(" rk"), id)).as("text"))
      graft.ops.DedupOps.dedupAgainstIndex(batch, index, "text", "doc_id", 0.5)
        .orderBy(col("doc_id"))
    }),

    // BM25 top-k retrieval over a COMMITTED inverted file (ops/Bm25) —
    // keyword twin of the ANN paths AND of their model-table discipline: the
    // corpus tokenizes once per snapshot (indexFor read-if-committed), every
    // later run ranks against the committed narrow table. Five multi-term
    // queries; every score an exact Long in micro-units (milli k1/b,
    // floor-div length norm and tf saturation, idf floored to micro-nats at
    // birth), so the oracle replays the ranking bit-for-bit in DuckDB `//`
    "q99_bm25_topk" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val queries = s.sql(
        s"SELECT * FROM VALUES $q99Queries AS t(query_id, term)")
      val idxDir = graft.ops.AnnModelIO.modelDir("bm25idx", dir, "ws")
      // maxDfPermille = 1000 EXPLICITLY: the oracle replays the uncapped
      // ranking, and the synthetic vocabulary puts every query term in
      // ~77% of documents — the library's 500‰ stop-word default (which
      // protects real crawl corpora) would drop them all. The oracle SQL is
      // frozen, so the query pins the configuration it was checked under.
      graft.ops.Bm25.topK(
          graft.ops.Bm25.indexFor(docs, "text", "doc_id", idxDir),
          queries, "doc_id", k = 10, maxDfPermille = 1000)
        .orderBy(col("query_id"), col("rank"))
    }),

    // XML sitemap discovery (sitemaps.org protocol): urlset entries with
    // entity-decoded/trimmed loc + raw lastmod/changefreq/priority strings,
    // index payloads yielding their child sitemap urls, a loc-less <url> and
    // a <urlx> name-boundary decoy skipped; plus the robots.txt `Sitemap:`
    // directive (group-independent, case-insensitive key, duplicate-
    // collapsed) harvested from the same site's policy fetch
    "q100_sitemap" -> ((s, dir) => {
      val m = (col("doc_id") % 50).cast("string")
      val dd = (col("doc_id") % 9 + 1).cast("string")
      val urlset = concat(
        lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>"),
        lit("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
        lit("<url><loc>https://s.example/p/"), m, lit("?a=1&amp;b=2</loc>"),
        lit("<lastmod>2024-01-0"), dd, lit("</lastmod>"),
        lit("<changefreq>daily</changefreq><priority>0.8</priority></url>"),
        lit("<urlx><loc>https://decoy.example/x</loc></urlx>"),
        lit("<url><loc>  https://s.example/q/"), m, lit("  </loc></url>"),
        lit("<url><lastmod>2024-03-01</lastmod></url></urlset>"))
      val index = concat(
        lit("<?xml version=\"1.0\"?><sitemapindex>"),
        lit("<sitemap><loc>https://s.example/maps/part-"), m, lit(".xml</loc>"),
        lit("<lastmod>2024-02-0"), dd, lit("</lastmod></sitemap>"),
        lit("<sitemap><loc>https://s.example/maps/extra.xml</loc></sitemap>"),
        lit("</sitemapindex>"))
      val payload = encode(when(col("doc_id") % 2 === 0, urlset).otherwise(index), "UTF-8")
      val robotsTxt = concat(
        lit("User-agent: *\nDisallow: /tmp\nSitemap: https://s.example/maps/root-"), m,
        lit(".xml\nSitemap: https://s.example/maps/root-"), m,
        lit(".xml\nsitemap: https://s.example/maps/alt.xml # comment\n"))
      t(s, dir, "documents")
        .select(col("doc_id"), sitemap_kind(payload).as("kind"),
          robots_sitemaps(robotsTxt).as("_maps"),
          posexplode(sitemap_entries(payload)).as(Seq("pos", "e")))
        .select(col("doc_id"), col("kind"), col("pos"),
          col("e.loc").as("loc"), col("e.lastmod").as("lastmod"),
          col("e.changefreq").as("changefreq"), col("e.priority").as("priority"),
          element_at(col("_maps"), 1).as("robots_map0"),
          size(col("_maps")).as("n_robots_maps"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // CDXJ capture-index parse (sources/CdxSource — the Common Crawl/IA
    // index line format addressing a WARC corpus): split(limit=3) +
    // from_json, all built-ins; every 10th line is malformed JSON whose
    // meta fields must null out (guarded casts, never a throw)
    "q101_cdx" -> ((s, dir) => {
      val m = (col("doc_id") % 50).cast("string")
      val dd = (col("doc_id") % 9 + 1).cast("string")
      val off = (col("doc_id") % 7 * 1000).cast("string")
      val good = concat(
        lit("com,example)/p/"), m, lit(" 2024010100000"), dd,
        lit(" {\"url\": \"https://example.com/p/"), m,
        lit("\", \"mime\": \"text/html\", \"status\": \"200\", \"digest\": \"sha1:D"), m,
        lit("\", \"length\": \"1234\", \"offset\": \""), off,
        lit("\", \"filename\": \"part-"), m, lit(".warc.gz\"}"))
      val bad = lit("org,broken)/x 2024 {not json")
      val line = when(col("doc_id") % 10 === 9, bad).otherwise(good)
      graft.sources.CdxSource.project(
        t(s, dir, "documents").select(col("doc_id"), line.as("line")),
        "line", keep = Seq("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // SURT keys (surt_url — reversed comma-joined host labels so one host
    // sorts contiguous): www/case/default-port/tracking/fragment
    // normalization, non-default port kept, non-http(s) null — four url
    // shapes rotate per doc_id
    "q102_surt" -> ((s, dir) => {
      val m = (col("doc_id") % 50).cast("string")
      val k = (col("doc_id") % 7).cast("string")
      val u = when(col("doc_id") % 4 === 0, concat(
          lit("HTTPS://WWW.Example"), k, lit(".COM/Path/"), m,
          lit("?b=2&utm_source=x&a=1#frag")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("http://h"), k, lit(".example.org:8080/x/"), m))
        .when(col("doc_id") % 4 === 2, lit("http://a.example.net:80/"))
        .otherwise(concat(lit("ftp://x.example/"), m))
      t(s, dir, "documents")
        .select(col("doc_id"), u.as("url"), surt_url(u).as("surt"))
        .orderBy(col("doc_id"))
    }),

    // BPE tokenizer TRAINING (Sennrich §3 — the corpus→merge-table step
    // before q38/q63's budgeting): every doc contributes the same three
    // words, so pair frequencies are uniform and the merge order is decided
    // entirely by the documented determinism contract (max count, ties to
    // the lexicographically smallest pair) — the oracle states the exact
    // hand-derived sequence: (a,a) first by tie-break, then (a,b), then
    // (aa,ab) over (aa,b) because "ab" < "b"
    "q111_bpe_train" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select(lit("aaab aab cab").as("text"))
      graft.text.Bpe.trainFromCorpus(docs, "text", numMerges = 3)
        .zipWithIndex.map { case ((l, r), i) => (i, l, r) }
        .toDF("rank", "left", "right").orderBy(col("rank"))
    }),

    // publication-date harvest (the date-filter key temporal curation needs):
    // JSON-LD datePublished wins, /yyyy/mm/ url-path segments are the
    // fallback, neither → null — pure composition of the existing ld+json
    // extractor with built-ins (from_json, regexp_extract), no new operator
    "q110_pub_date" -> ((s, dir) => {
      val m = (col("doc_id") % 50).cast("string")
      val dd = (col("doc_id") % 9 + 1).cast("string")
      val arm = col("doc_id") % 3
      val ldHtml = concat(
        lit("<html><head><script type=\"application/ld+json\">"),
        lit("{\"@type\": \"Article\", \"datePublished\": \"2024-0"), dd,
        lit("-15\"}</script></head><body>x</body></html>"))
      val plain = lit("<html><body>plain page</body></html>")
      val url = when(arm === 0, concat(lit("https://d.example/a/"), m))
        .when(arm === 1, concat(lit("https://d.example/2023/0"), dd, lit("/post-"), m))
        .otherwise(concat(lit("https://d.example/p/"), m))
      val payload = encode(when(arm === 0, ldHtml).otherwise(plain), "UTF-8")
      val ldDate = get_json_object(
        get(ldjson_blocks(payload), lit(0)), "$.datePublished")
      val urlDate = translate(nullif(
        regexp_extract(url, "/(20[0-9]{2}/[01][0-9])/", 1), lit("")), "/", "-")
      t(s, dir, "documents")
        .select(col("doc_id"), url.as("url"),
          coalesce(substring(ldDate, 1, 7), urlDate).as("pub_month"),
          when(ldDate.isNotNull, lit("ldjson"))
            .when(urlDate.isNotNull, lit("url")).otherwise(lit("none")).as("source"))
        .orderBy(col("doc_id"))
    }),

    // compression-ratio quality signal (deflate level 6): machine repetition
    // compresses far below natural text — 50 payload families whose
    // repetition grows with the family index, each family's exact
    // (raw_len, deflate_len) pinned as plan-build constants from the SAME
    // JVM/zlib (the q30 sketch-arm pattern; zlib output is deterministic
    // per JDK, never recomputed cross-engine)
    "q108_compression_signal" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(50L))
      val txt = (1 until 50).foldLeft(when(m === 0, lit(q108Payload(0)))) {
        (acc, i) => acc.when(m === i, lit(q108Payload(i)))
      }.otherwise(lit(""))
      t(s, dir, "documents")
        .select(col("doc_id"), encode(txt, "UTF-8").as("_p"))
        .select(col("doc_id"),
          octet_length(col("_p")).cast("long").as("raw_len"),
          deflate_len(col("_p")).as("deflate_len"))
        .withColumn("ratio_micro", expr("deflate_len * 1000000 div raw_len"))
        .withColumn("keep", col("ratio_micro").between(150000, 900000))
        .orderBy(col("doc_id"))
    }),

    // host-level prior table: docs, exact-dup share, token mass, near-empty
    // share per host — every 5th doc within a host carries the host's
    // boilerplate string, so dup_rows is closed-form checkable while the
    // token aggregates replay from the real text
    "q109_host_profile" -> ((s, dir) => {
      val k = (col("doc_id") % 7).cast("string")
      val url = concat(lit("https://h"), k, lit(".example/p/"), col("doc_id").cast("string"))
      val txt = when(col("doc_id") % 5 === 0,
        concat(lit("duplicate boilerplate for host "), k)).otherwise(col("text"))
      graft.ops.CurationOps.hostProfile(
        t(s, dir, "documents").select(url.as("url"), txt.as("text")), "url", "text")
        .orderBy(col("host"))
    }),

    // recrawl snapshot delta: added/removed/changed between two corpus
    // snapshots by content digest — one full-outer shuffle on the id, the
    // unchanged majority excluded (downstream recrawl work fans out from
    // the other three arms); every arm constructed closed-form
    "q107_snapshot_delta" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val oldS = docs.select(col("doc_id"),
        sha2(encode(col("text"), "UTF-8"), 256).as("digest"))
      val newBase = docs.filter(col("doc_id") % 5 =!= 1)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      val added = docs.filter(col("doc_id") % 5 === 2)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val newS = newBase.unionByName(added)
        .select(col("doc_id"), sha2(encode(col("text"), "UTF-8"), 256).as("digest"))
      graft.ops.DedupOps.snapshotDelta(oldS, newS, "doc_id", "digest")
        .orderBy(col("doc_id"))
    }),

    // politeness schedule: per-host fetch slots spaced by the host's crawl
    // delay (null → the 1000 ms default), rank = url order within host —
    // a coordination-free rate limit the oracle replays as the same window
    "q106_fetch_schedule" -> ((s, dir) => {
      val k = col("doc_id") % 7
      val targets = t(s, dir, "documents").select(
        concat(lit("https://h"), k.cast("string"), lit(".example/p/"),
          col("doc_id").cast("string")).as("url"),
        concat(lit("h"), k.cast("string"), lit(".example")).as("host"),
        when(k % 2 === 0, (k + 1) * 1000).otherwise(lit(null).cast("long"))
          .as("crawl_delay_ms"))
      graft.ops.FrontierOps.schedule(targets).orderBy(col("url"))
    }),

    // de-facto Crawl-delay politeness directive: named-vs-* group
    // selection (the isAllowed rule), decimal seconds → millis truncation,
    // first-valid-wins, invalid/absent → null, hostile overflow capped at
    // 24 h — every arm closed-form per doc_id
    "q105_crawl_delay" -> ((s, dir) => {
      val k = (col("doc_id") % 5).cast("string")
      val robotsTxt =
        when(col("doc_id") % 4 === 0, concat(
          lit("User-agent: graftbot\nCrawl-delay: "), k,
          lit(".5\nDisallow: /x\nUser-agent: *\nCrawl-delay: 9\nDisallow:\n")))
        .when(col("doc_id") % 4 === 1, concat(
          lit("User-agent: *\nCrawl-delay: bogus\nCrawl-delay: "), k,
          lit("\nDisallow: /y\n")))
        .when(col("doc_id") % 4 === 2,
          lit("User-agent: *\nCrawl-delay: 99999999999\nDisallow:\n"))
        .otherwise(lit("User-agent: *\nDisallow: /z\n"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          robots_crawl_delay(robotsTxt, lit("graftbot")).as("delay_named"),
          robots_crawl_delay(robotsTxt, lit("otherbot")).as("delay_star"))
        .orderBy(col("doc_id"))
    }),

    // cluster dedup with a QUALITY keeper: the q39 corpus (doc + two
    // token-dropped mirrors per cluster) but the keeper is the member with
    // the highest pseudo-random quality score, ties → min id — so mirrors
    // beat originals wherever their hash says so, exercising the non-min-id
    // path the default contract never takes
    "q104_dedup_cc_keeper" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val m1 = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
      val m2 = m1.select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
      val all = docs.unionByName(m1).unionByName(m2)
        .withColumn("quality", pmod(splitmix64(col("doc_id")), lit(1000L)))
      graft.ops.DedupOps.dropNearDupsCC(all, "text", "doc_id",
        threshold = 0.8, candidateThreshold = 0.4, rowsPerBand = 3,
        qualityCol = Some("quality"))
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // training-mixture construction: ABSOLUTE per-domain token budgets
    // (target = budget·w‰ floor) filled in splitmix64 permutation order —
    // prefix-rule admission so a budget is never exceeded; zero-weight and
    // unweighted domains contribute nothing. The two-level prefix sum's
    // range bucketing preserves h order, so it is identical to one window
    // ordered (h, id) — exactly how the oracle replays it
    "q103_token_mix" -> ((s, dir) => {
      graft.ops.CurationOps.tokenBudgetMix(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        "doc_id", "source", "n_chars",
        Seq("src0" -> 400L, "src1" -> 300L, "src2" -> 200L, "src3" -> 0L),
        budget = 10000L)
        .orderBy(col("doc_id"))
    }),

    // the full Gopher/MassiveText §A1.1 quality rule set (word-count bounds,
    // mean word length, symbol ratio, bullet/ellipsis lines, alpha fraction,
    // required stop words) — bullet/ellipsis/symbol payloads constructed
    // in-query so every rule fires on some rows; all per-row integer-exact
    // ratios, replayed in DuckDB list ops
    "q55_gopher_quality" -> ((s, dir) => {
      val txt = concat(col("text"),
        when(col("doc_id") % 5 === 0,
          lit("\n- bullet line one\n- bullet line two\ntrailing thought..."))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(" ### #### #")).otherwise(lit("")))
      graft.ops.CurationOps.gopherQualitySignals(
        t(s, dir, "documents").select(col("doc_id"), txt.as("text")), "text", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // C4/T5 cleanup (Raffel et al. §2.2): terminal-punctuation line filter +
    // page-level lorem-ipsum/brace/sentence-count rules — lines constructed
    // in-query so every rule fires; the cleaned text itself is compared, not
    // just the verdict
    "q56_c4_filter" -> ((s, dir) => {
      val txt = concat(
        lit("First sentence here.\n"),
        col("text"),
        when(col("doc_id") % 3 === 0, lit(" ends here!")).otherwise(lit(" ends here")),
        lit("\ntoo short\n"),
        when(col("doc_id") % 4 === 0, lit("lorem ipsum inserted\n")).otherwise(lit("")),
        lit("Question line? Answer line! Final line."))
      graft.ops.CurationOps.c4Filter(
        t(s, dir, "documents").select(col("doc_id"), txt.as("text")), "text", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // SUBSAMPLED (4:2:0) color JPEG decode — the dominant web-JPEG layout,
    // previously part of the declared stub: flat Y/Cb/Cr planes survive the
    // MCU walk + chroma upsample exactly (q44's closed-form pattern)
    "q58_jpeg420_features" -> ((s, dir) => {
      val jpegHex = memoFixture("q58-jpeg") { (0 until 200).map { v =>
        graft.media.JpegEncode.flatColor(16, 16, v, (v + 40) % 256, (v + 80) % 256)
          .map(b => f"${b & 0xff}%02X").mkString
      } }
      t(s, dir, "documents")
        .withColumn("f", media_features(unhex(
          element_at(array(jpegHex.map(lit): _*), (col("doc_id") % 200 + 1).cast("int")))))
        .select(col("doc_id"),
          round(element_at(col("f"), 1).cast("double"), 4).as("mean_y"),
          round(element_at(col("f"), 2).cast("double"), 4).as("mean_cb"),
          round(element_at(col("f"), 3).cast("double"), 4).as("mean_cr"),
          round((element_at(col("f"), 4) + element_at(col("f"), 5) + element_at(col("f"), 6) +
            element_at(col("f"), 7) + element_at(col("f"), 8)).cast("double"), 4).as("rest"))
    }),

    // PROGRESSIVE (SOF2) JPEG decode — multi-scan spectral selection +
    // successive approximation, the other common web-JPEG coding: 4:2:0
    // color fixtures with 4-level DC refinement and EOB-run AC scans decode
    // back to their flat values exactly
    "q59_jpeg_progressive_features" -> ((s, dir) => {
      val jpegHex = memoFixture("q59-jpeg") { (0 until 200).map { v =>
        graft.media.JpegEncode.progressiveFlat(16, 16,
          Array(v, (v + 40) % 256, (v + 80) % 256), dcAl = 4)
          .map(b => f"${b & 0xff}%02X").mkString
      } }
      t(s, dir, "documents")
        .withColumn("f", media_features(unhex(
          element_at(array(jpegHex.map(lit): _*), (col("doc_id") % 200 + 1).cast("int")))))
        .select(col("doc_id"),
          round(element_at(col("f"), 1).cast("double"), 4).as("mean_y"),
          round(element_at(col("f"), 2).cast("double"), 4).as("mean_cb"),
          round(element_at(col("f"), 3).cast("double"), 4).as("mean_cr"),
          round((element_at(col("f"), 4) + element_at(col("f"), 5) + element_at(col("f"), 6) +
            element_at(col("f"), 7) + element_at(col("f"), 8)).cast("double"), 4).as("rest"))
    }),

    // REAL FLAC audio decode (FlacDecode: frame walk, Rice residuals, fixed/
    // LPC predictors, channel decorrelation): constant-subframe fixtures
    // (multi-frame, signed values) decode to exactly value+128 in the u8
    // domain — non-PCM audio leaves the declared stub
    "q61_flac_features" -> ((s, dir) => {
      val flacHex = memoFixture("q61-flac") { (0 until 200).map { m =>
        graft.media.AvEncode.flacConstant(4500, m - 100).map(b => f"${b & 0xff}%02X").mkString
      } }
      t(s, dir, "documents")
        .withColumn("f", media_features(unhex(
          element_at(array(flacHex.map(lit): _*), (col("doc_id") % 200 + 1).cast("int")))))
        .select(col("doc_id"),
          round(element_at(col("f"), 1).cast("double"), 4).as("mean_c0"),
          round(element_at(col("f"), 5).cast("double"), 4).as("var_c0"),
          round((element_at(col("f"), 2) + element_at(col("f"), 3) + element_at(col("f"), 4) +
            element_at(col("f"), 6) + element_at(col("f"), 7) + element_at(col("f"), 8))
            .cast("double"), 4).as("other_channels"))
    }),

    // unicode normalization (ftfy/CCNet-style cleanup): typographic noise is
    // constructed in-query, so the oracle states the normalized form as a
    // closed-form literal (no regex dialect in the oracle)
    "q62_normalize_text" -> ((s, dir) => {
      val messy = concat(col("text"),
        lit(" “quoted” – dash… a b  c ​d﻿ "))
      t(s, dir, "documents")
        .select(col("doc_id"), graft.ops.CurationOps.normalizeText(messy).as("clean"))
    }),

    // RefinedWeb-style URL blocklist gate: urls constructed in-query (blocked
    // domain, blocked subdomain, blocked path fragment, clean) so the
    // surviving set is closed-form
    "q68_url_blocklist" -> ((s, dir) => {
      val url = when(col("doc_id") % 5 === 0, lit("http://spam.example/page"))
        .when(col("doc_id") % 5 === 1, lit("http://sub.spam.example/other"))
        .when(col("doc_id") % 5 === 2,
          concat(lit("http://ok.example/tag/"), col("doc_id").cast("string")))
        .otherwise(concat(lit("http://ok.example/article/"), col("doc_id").cast("string")))
      graft.ops.CurationOps.urlBlocklistFilter(
        t(s, dir, "documents").select(col("doc_id"), url.as("url")),
        "url", blockedDomains = Seq("spam.example"), blockedSubstrings = Seq("/tag/"))
        .select(col("doc_id"), col("url")).orderBy(col("doc_id"))
    }),

    // CCNet-style LM filtering (Wenzek §4.3): cross-entropy under a hashed
    // bigram LM trained on a small target slice (every 13th doc — the q47/q57
    // target convention); micro-nat quantization makes the DuckDB replay
    // bit-exact. Target-like docs score LOW (they contributed their own
    // bigrams); the oracle replays hashing, bucketing, smoothing and the
    // Long sum exactly.
    "q70_lm_filter" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      graft.ops.CurationOps.lmCrossEntropy(
        docs, "text", "doc_id", docs.filter(col("doc_id") % 13 === 0), "text")
        .orderBy(col("doc_id"))
    }),

    // CCNet head/middle/tail perplexity buckets (Wenzek et al. 2020 §4.4):
    // q70's exact LM scores split into per-language terciles via the integer
    // histogram-threshold contract (3·cum ≥ n) — no per-language document
    // sort anywhere (q42's histogram trick per language)
    "q84_ppl_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
      val scored = graft.ops.CurationOps.lmCrossEntropy(
        docs, "text", "doc_id", docs.filter(col("doc_id") % 13 === 0), "text")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      graft.ops.CurationOps.perplexityBuckets(scored, "ce_nats", "lang")
        .select(col("doc_id"), col("lang"), col("ce_nats"), col("ppl_bucket"))
        .orderBy(col("doc_id"))
    }),

    // sequence packing (the GPT-style training-shard layout): doc token
    // streams + EOS concatenated in doc_id order, split into 128-token
    // chunks — offsets via the two-level prefix sum (bucketWidth 64 forces
    // multiple buckets at every sf; the result is bucketWidth-invariant,
    // spec-pinned). The oracle replays the offsets with a plain cumulative
    // sum and the same floor-div chunk-span arithmetic.
    "q85_pack_sequences" -> ((s, dir) =>
      graft.ops.CurationOps.packSequences(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "text", "doc_id", seqLen = 128, bucketWidth = 64)
        .orderBy(col("chunk_id"))),

    // REAL companded-audio payload decode (ITU-T G.711 μ-law and A-law — WAV
    // format tags 7/6): the q46 flat-WAV pattern, every sample the same
    // companded byte k, expanded by WavDecode's closed-form segment
    // arithmetic to 16-bit PCM then normalized like PCM16. The oracle
    // REPLAYS the G.711 expansion in DuckDB integer arithmetic — mean is
    // exact, variance 0. (Lossy transform codecs — MP3/AAC spectral payloads
    // — stay in q30's declared sketch: a conformant Layer III decoder needs
    // the ISO 11172-3 Huffman code tables and the 512-tap synthesis window,
    // which are pure table data with no defining formula; see README.)
    "q69_g711_features" -> ((s, dir) => {
      val dataLen = 256
      def le32(v: Int) = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X${(v >> 16) & 0xff}%02X${(v >> 24) & 0xff}%02X"
      def le16(v: Int) = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X"
      def headerHex(fmtTag: Int) = "52494646" + le32(36 + dataLen) + "57415645" +
        "666D7420" + le32(16) + le16(fmtTag) + le16(1) + le32(8000) + le32(8000) + le16(1) + le16(8) +
        "64617461" + le32(dataLen)
      val hdr = when(col("doc_id") % 2 === 0, lit(headerHex(7))).otherwise(lit(headerHex(6)))
      t(s, dir, "documents")
        .withColumn("f", media_features(unhex(concat(hdr,
          repeat(lpad(hex((col("doc_id") % 200).cast("int")), 2, "0"), dataLen)))))
        .select(col("doc_id"),
          round(element_at(col("f"), 1).cast("double"), 4).as("mean_c0"),
          round(element_at(col("f"), 5).cast("double"), 4).as("var_c0"))
    }),

    // REAL Vorbis payload decode (in-band codebooks → Huffman → floor1 →
    // residue VQ → iMDCT → lapped windows; VorbisDecode): 200 fixture
    // streams rotate channels, block plans (incl. long/short window
    // switching), rates, and floor Y values; the VQ delta is zero, so the
    // decoded PCM is EXACTLY silent and every output is an integer —
    // n_samples replays the lapping arithmetic (frame i contributes
    // n(i-1)/4 + n(i)/4, clamped by the end granule), floor_y_sum replays
    // the Huffman-decoded per-frame/per-channel floor values, and
    // sum_abs_micro = 0 certifies the silence byte-for-byte
    "q93_vorbis_pcm" -> ((s, dir) => {
      import graft.media.VorbisEncode
      import graft.media.VorbisEncode.Frame
      val hexes = memoFixture("q93-vorbis") { (0 until 200).map { m =>
        val ch = 1 + m % 2
        val (y0, y1, y2) = (m % 256, (m * 3) % 256, m % 4)
        def fr(long: Boolean) = Frame(long, y0, y1, y2)
        val (plan, clamp) = (m % 4) match {
          case 0 => (Seq(fr(false), fr(false), fr(false), fr(false)), -1L)
          case 1 => (Seq(fr(false), fr(true), fr(true), fr(false)), -1L)
          case 2 => (Seq(fr(true), fr(true), fr(true), fr(true), fr(true)), -1L)
          case _ => (Seq(fr(false), fr(false), fr(false)), 50L)
        }
        VorbisEncode.stream(8000 + 100 * (m % 7), ch, 64, 256, plan,
          granuleOverride = clamp).map(x => f"${x & 0xff}%02X").mkString
      } }
      val v = vorbis_features(unhex(
        element_at(array(hexes.map(lit): _*), (col("doc_id") % 200 + 1).cast("int"))))
      t(s, dir, "documents")
        .select(col("doc_id"),
          v.getField("sample_rate").as("sample_rate"),
          v.getField("channels").as("channels"),
          v.getField("n_samples").as("n_samples"),
          v.getField("n_packets").as("n_packets"),
          v.getField("floor_y_sum").as("floor_y_sum"),
          v.getField("sum_abs_micro").as("sum_abs_micro"))
        .orderBy(col("doc_id"))
    }),

    // Perceptual image dedup by 64-bit difference hash (the crawl-pipeline
    // near-dup key: same composition re-encoded or RESIZED hashes
    // identically). Fixture: vertical-stripe BMPs on the dHash 9-column grid
    // — pattern p = doc_id%200%100 picks which stripes take the bright tone,
    // and docs 100 apart render the SAME pattern at DIFFERENT resolutions
    // (18×16 vs 36×32), so each pattern's small and large renditions land in
    // one hash group: n_same_hash counts resolution-invariant matches. The
    // hash is closed-form from the pattern: bit cy·8+cx set iff stripe cx is
    // bright and cx+1 is dark ⇒ dhash = 0x0101010101010101 · (p & ~(p>>1)),
    // replayed verbatim in DuckDB integer bit arithmetic.
    "q71_image_dhash" -> ((s, dir) => {
      val bmpHex = memoFixture("q71-bmp") { (0 until 200).map { m =>
        val p = m % 100
        val (w, h) = if (m < 100) (18, 16) else (36, 32)
        graft.media.ImageEncode.bmpVStripes(w, h, p, (200, 150, 100), (10, 30, 5))
          .map(x => f"${x & 0xff}%02X").mkString
      } }
      // per-group counts via a window for row-per-doc oracle comparison; the
      // dedup ACTION at corpus scale is the exact-dedup shape instead — ONE
      // map-side-combinable groupBy(dhash).agg(min(id)) shuffle (q12's plan),
      // with Hamming-band grouping via the SimHash table machinery (q32)
      // when near-exact matching is wanted
      val hashW = org.apache.spark.sql.expressions.Window.partitionBy(col("dhash"))
      t(s, dir, "documents")
        .withColumn("dhash", image_dhash(unhex(
          element_at(array(bmpHex.map(lit): _*), (col("doc_id") % 200 + 1).cast("int")))))
        .withColumn("n_same_hash", count(lit(1)).over(hashW))
        .select(col("doc_id"), col("dhash"), col("n_same_hash"))
    }),

    // Perceptual image NEAR-dup pairs: the q32 block-permuted Hamming join
    // (full recall ≤ maxHamming by pigeonhole) run over image_dhash instead
    // of text SimHash — DedupOps.fingerprintNearDupPairs is the ONE shared
    // machinery, near-dup keys being 64-bit fingerprints whatever modality
    // produced them. Fixture: a DIFFERENT stripe pattern per dHash grid row
    // ((m0 + 17r) mod 128 — row-wise variation keeps hashes distinct per
    // base doc; a single pattern per doc would cap diversity at the ~55
    // 8-bit no-adjacent-ones edge masks and grow exact-dup groups — and
    // pair output — quadratically with corpus size); ODD docs render their
    // even twin's rows with stripe bit 0 flipped in ONE row, so twins sit at
    // hamming 0-1: the result carries exact-dup groups (same m, both
    // resolutions) AND genuine hamming-1 near-dups. The oracle replays the
    // closed-form row masks and brute-forces popcount over all pairs — the
    // LSH output must equal it exactly
    "q72_image_near_dups" -> ((s, dir) => {
      val bmpHex = memoFixture("q72-bmp") { (0 until 200).map { m =>
        val m0 = m - (m % 2)
        val rows = (0 until 8).map { r =>
          val p = (m0 + 17 * r) % 128
          if (m % 2 == 1 && r == m % 8) p ^ 1 else p
        }
        // smallest dims that land one/two pixels per hash cell: the pair
        // join references the payload subtree on BOTH sides, so literal
        // bytes count double in plan processing — 9×8/18×16 keeps the
        // 200-payload plan constant ~150 KB instead of ~1 MB
        val (w, h) = if (m % 2 == 0) (9, 8) else (18, 16)
        graft.media.ImageEncode.bmpRowStripes(w, h, rows, (200, 150, 100), (10, 30, 5))
          .map(x => f"${x & 0xff}%02X").mkString
      } }
      val fp = t(s, dir, "documents")
        .withColumn("dhash", image_dhash(unhex(
          element_at(array(bmpHex.map(lit): _*), (col("doc_id") % 200 + 1).cast("int")))))
        .select(col("doc_id"), col("dhash"))
      graft.ops.DedupOps.fingerprintNearDupPairs(fp, "dhash", "doc_id", maxHamming = 3)
        .orderBy(col("a"), col("b"))
    }),

    // REAL WebP-lossless decode (WebpDecode: in-stream prefix codes, LZ77
    // through the distance plane map, color cache, meta tree-groups, and
    // all four transforms): nine bit-level encodings whose decoded pixels
    // are closed-form — flat variants (simple codes / SUBTRACT_GREEN /
    // color cache / cross-COLOR) and column-stripe variants (normal
    // code-length-coded codes / LZ77 both plane-mapped and direct /
    // PREDICTOR / COLOR_INDEXING bundling / META halves). A decoder fault
    // on any variant drops that doc to the hash-sketch fallback and breaks
    // the hash compare.
    "q73_webp_features" -> ((s, dir) => {
      val e = graft.media.WebpEncode
      val webpHex = memoFixture("q73-webp") { (0 until 200).map { m =>
        val r = 10 + m // avoids the predictor builder's excluded residuals 0/5/251
        val g = (m + 60) % 256
        val b = (m + 120) % 256
        ((m % 9) match {
          case 0 => e.vp8lFlat(16, 8, r, g, b)
          case 1 => e.vp8lSubGreenFlat(16, 8, r, g, b)
          case 2 => e.vp8lStripes(16, 8, r, r + 5, g, b)
          case 3 => e.vp8lLz77Stripes(16, 8, r, r + 5, g, b, direct = m % 2 == 1)
          case 4 => e.vp8lCacheFlat(16, 8, r, g, b, cacheBits = 1 + m % 11)
          case 5 => e.vp8lPredictorStripes(16, 8, r, r + 5, g, b)
          case 6 => e.vp8lColorTransformFlat(16, 8, r, g, b, t = 0x35)
          case 7 => e.vp8lPalettedStripes(16, 8, r, r + 5, g, b)
          case _ => e.vp8lMetaHalves(16, 8, r, r + 5, g, b)
        }).map(x => f"${x & 0xff}%02X").mkString
      } }
      t(s, dir, "documents")
        .withColumn("f", media_features(unhex(
          element_at(array(webpHex.map(lit): _*), (col("doc_id") % 200 + 1).cast("int")))))
        .select(col("doc_id"),
          round(element_at(col("f"), 1).cast("double"), 4).as("mean_r"),
          round(element_at(col("f"), 2).cast("double"), 4).as("mean_g"),
          round(element_at(col("f"), 3).cast("double"), 4).as("mean_b"),
          round(element_at(col("f"), 4).cast("double"), 4).as("mean_a"),
          round((element_at(col("f"), 5) + element_at(col("f"), 6) +
            element_at(col("f"), 7) + element_at(col("f"), 8)).cast("double"), 4).as("var_sum"))
    }),

    // REAL ICO (favicon) decode (IcoDecode: ICONDIR walk, largest-entry
    // pick, DIB-with-doubled-height through the shared BmpDecode, PNG
    // entries through PngDecode, AND-mask / 32-bit XOR alpha as a 4th
    // channel): six directory layouts whose decoded pixels are closed-form.
    // A decoder fault on any variant drops that doc to the hash-sketch
    // fallback and breaks the hash compare.
    "q74_ico_features" -> ((s, dir) => {
      val e = graft.media.ImageEncode
      val icoHex = memoFixture("q74-ico") { (0 until 200).map { m =>
        val r = 10 + m
        val g = (m + 60) % 256
        val b = (m + 120) % 256
        ((m % 6) match {
          case 0 => e.icoBmp24Flat(16, 16, r, g, b)
          case 1 => e.icoBmp32AlphaHalf(16, 16, r, g, b)
          case 2 => e.icoPaletted4Flat(16, 16, 7, r, g, b)
          case 3 => e.icoPngGrayFlat(16, 16, m)
          case 4 => e.icoMulti(16, 16, r, g, b)
          case _ => e.icoBmp24Masked(16, 16, r, g, b)
        }).map(x => f"${x & 0xff}%02X").mkString
      } }
      t(s, dir, "documents")
        .withColumn("f", media_features(unhex(
          element_at(array(icoHex.map(lit): _*), (col("doc_id") % 200 + 1).cast("int")))))
        .select(col("doc_id"),
          round(element_at(col("f"), 1).cast("double"), 4).as("mean_1"),
          round(element_at(col("f"), 2).cast("double"), 4).as("mean_2"),
          round(element_at(col("f"), 3).cast("double"), 4).as("mean_3"),
          round(element_at(col("f"), 4).cast("double"), 4).as("mean_4"),
          round((element_at(col("f"), 5) + element_at(col("f"), 6) +
            element_at(col("f"), 7) + element_at(col("f"), 8)).cast("double"), 4).as("var_sum"))
    }),

    // SVG + AVIF/HEIF sniffing (vector favicons and the modern still-image
    // family): SVG dims come from the root tag's width/height attrs on even
    // m and through the viewBox FALLBACK (width="100%" defeats the attr
    // path) on odd m; AVIF/HEIC dims via the ISO-BMFF meta/iprp/ipco/ispe
    // box walk — every dimension closed-form from doc_id
    "q75_svg_avif_sniff" -> ((s, dir) => {
      def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02X").mkString
      val svgHex = (0 until 200).map { m =>
        val w = m + 10; val h = m % 40 + 8
        val doc = if (m % 2 == 0)
          s"""<?xml version="1.0"?><svg width="$w" height="$h" xmlns="http://www.w3.org/2000/svg"></svg>"""
        else
          s"""<svg width="100%" height="100%" viewBox="0 0 $w $h"></svg>"""
        hex(doc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      val avifHex = (0 until 200).map(m =>
        hex(graft.media.ImageEncode.avifIspe(m + 100, m % 50 + 60)))
      val heifHex = (0 until 200).map(m =>
        hex(graft.media.ImageEncode.avifIspe(m + 320, m % 30 + 240, brand = "heic")))
      val m = (col("doc_id") % 200).cast("int")
      val payload = unhex(
        when(col("doc_id") % 3 === 0, element_at(array(svgHex.map(lit): _*), m + 1))
          .when(col("doc_id") % 3 === 1, element_at(array(avifHex.map(lit): _*), m + 1))
          .otherwise(element_at(array(heifHex.map(lit): _*), m + 1)))
      t(s, dir, "documents")
        .withColumn("i", media_sniff(payload))
        .select(col("doc_id"), col("i.format").as("format"),
          col("i.width").as("width"), col("i.height").as("height"))
    }),

    // GIF animation metadata through av_meta (structural block walk — frame
    // count = image descriptors, duration = Σ GCE delays ×10 ms; no pixel
    // decode): animated fixtures alternate with static ones, which must
    // read frames=1 / duration 0
    "q76_gif_anim_meta" -> ((s, dir) => {
      val gifHex = memoFixture("q76-gif") { (0 until 200).map { m =>
        val bytes =
          if (m % 2 == 0)
            graft.media.GifEncode.animFlat(12, 6, frames = m % 5 + 2, delayCs = m % 9 + 1,
              (m + 10) % 256, (m + 60) % 256, (m + 120) % 256)
          else graft.media.GifEncode.flatColor(12, 6,
            (m + 10) % 256, (m + 60) % 256, (m + 120) % 256)
        bytes.map(x => f"${x & 0xff}%02X").mkString
      } }
      val m = (col("doc_id") % 200).cast("int")
      t(s, dir, "documents")
        .withColumn("a", av_meta(unhex(element_at(array(gifHex.map(lit): _*), m + 1))))
        .select(col("doc_id"), col("a.format").as("format"),
          col("a.duration_ms").as("duration_ms"),
          col("a.width").as("width"), col("a.height").as("height"),
          col("a.frames").as("frames"))
    }),

    // APNG + animated-WebP metadata (the other two web animation families
    // next to q76's GIF): frames from acTL resp. ANMF count, duration from
    // Σ fcTL delays resp. Σ ANMF 24-bit ms fields — all structural walks,
    // no pixel decode, closed-form from doc_id
    "q77_anim_meta" -> ((s, dir) => {
      val hexArr = memoFixture("q77-anim") { (0 until 200).map { m =>
        val bytes =
          if (m % 2 == 0)
            graft.media.ImageEncode.apngFlat(10 + m % 30, 8, frames = m % 4 + 2,
              delayCs = m % 7 + 1, v = m % 256)
          else
            graft.media.ImageEncode.webpAnim(12 + m % 20, 9, frames = m % 5 + 2,
              frameMs = m % 11 + 1)
        bytes.map(x => f"${x & 0xff}%02X").mkString
      } }
      val m = (col("doc_id") % 200).cast("int")
      t(s, dir, "documents")
        .withColumn("a", av_meta(unhex(element_at(array(hexArr.map(lit): _*), m + 1))))
        .select(col("doc_id"), col("a.format").as("format"),
          col("a.duration_ms").as("duration_ms"),
          col("a.width").as("width"), col("a.height").as("height"),
          col("a.frames").as("frames"))
    }),

    // HTML head metadata (HtmlMeta: one linear head scan, stops at </head>/
    // <body>) + the two curation keys it feeds: the robots-noindex gate and
    // the canonical-URL dedup key (coalesce(canonical, url) — collapses
    // mirror/tracking-parameter variants BEFORE content dedup). Payload
    // variants rotate attribute case/quoting/order and entity titles.
    "q78_html_meta" -> ((s, dir) => {
      val langs = Seq("en", "de", "fr")
      val htmlHex = memoFixture("q78-html") { (0 until 200).map { m =>
        val canon =
          if (m % 3 != 0) s"""<link href='https://ex.com/c/${m % 40}' rel=canonical>""" else ""
        val robots = (m % 4) match {
          case 0 => """<meta name="robots" content="NOINDEX, nofollow">"""
          case 1 => """<meta content="index, follow" name=ROBOTS>"""
          case _ => ""
        }
        val lang = if (m % 7 != 0) s""" lang="${langs(m % 3)}"""" else ""
        val title = if (m % 5 == 0) s"T &amp; $m" else s"Title  $m" // entity + ws collapse
        val doc = s"""<html$lang><head><title>$title</title>$canon$robots""" +
          s"""</head><body><meta name=robots content=noindex>spam</body></html>"""
        doc.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .map(x => f"${x & 0xff}%02X").mkString
      } }
      val m = (col("doc_id") % 200).cast("int")
      t(s, dir, "documents")
        .withColumn("h", html_meta(unhex(element_at(array(htmlHex.map(lit): _*), m + 1))))
        .select(col("doc_id"), col("h.title").as("title"),
          col("h.canonical").as("canonical"), col("h.robots").as("robots"),
          col("h.lang").as("lang"),
          coalesce(contains(col("h.robots"), lit("noindex")), lit(false)).as("noindex"),
          coalesce(col("h.canonical"),
            concat(lit("https://ex.com/u/"), col("doc_id").cast("string"))).as("dedup_key"))
    }),

    // EXIF metadata (ExifMeta: JPEG APP1 marker walk or bare TIFF, IFD walk
    // incl. the Exif sub-IFD datetime fallback and the GPS-IFD location-PII
    // flag): payloads rotate the JPEG/TIFF wrapping, the sub-IFD relocation,
    // and GPS presence — every field closed-form from doc_id
    "q79_exif_meta" -> ((s, dir) => {
      val exifHex = memoFixture("q79-exif") { (0 until 200).map { m =>
        val orient = m % 8 + 1
        val make = s"Cam${m % 10}"
        val dt = f"2020:01:${m % 28 + 1}%02d 10:00:00"
        val gps = m % 3 == 0
        val sub = m % 5 == 0
        val bytes =
          if (m % 2 == 0) graft.media.ImageEncode.exifJpeg(orient, make, dt, gps, sub)
          else graft.media.ImageEncode.exifTiffBody(orient, make, dt, gps, sub)
        bytes.map(x => f"${x & 0xff}%02X").mkString
      } }
      val m = (col("doc_id") % 200).cast("int")
      t(s, dir, "documents")
        .withColumn("e", exif_meta(unhex(element_at(array(exifHex.map(lit): _*), m + 1))))
        .select(col("doc_id"), col("e.orientation").as("orientation"),
          col("e.has_gps").as("has_gps"), col("e.make").as("make"),
          col("e.datetime").as("datetime"))
    }),

    // SemDeDup (Abbas et al. 2023): k-means-cluster + within-cluster pairwise
    // cosine — the CLUSTER-based embedding dedup complementing q41's LSH path.
    // Centroids here are EXPLICIT unit plan constants (semCentroids), so the
    // oracle replays assignment (argmax cosine ≡ argmax dot for unit
    // centroids) and the drop rule in plain SQL; production training is
    // IvfAnn.trainCentroids (deterministic, the q37 contract). The
    // perturbation runs in DOUBLE end-to-end so both engines see bit-equal
    // vectors; keeper=min_id is the exactly-replayable contract (the paper's
    // low-centroid-sim keeper is spec-pinned on controlled fixtures). A
    // perturbed twin is dropped only when it CO-CLUSTERS with its original —
    // the within-cluster-only contract both engines must agree on.
    "q80_semdedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val orig = emb.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding"))
      val perturbed = emb.select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = 0, CAST(x AS DOUBLE) * 1.2d + 0.1d, CAST(x AS DOUBLE)))").as("embedding"))
      graft.ops.SimilarityOps.semDedup(
        orig.unionByName(perturbed), "embedding", "vec_id",
        centroids = semCentroids, eps = 0.95, keeper = "min_id")
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    // REAL TIFF decode (TiffDecode: endian-aware IFD, strips, photometric):
    // gray little-endian fixtures alternate with RGB big-endian ones — the
    // multi-strip and offset-indirected-array paths are spec-covered
    "q67_tiff_features" -> ((s, dir) => {
      // four encodings of the SAME flat pixels, so the closed-form oracle is
      // invariant to which one a doc gets: uncompressed, LZW (TIFF 6.0 §13 —
      // the shared MSB-first early-change core), LZW + horizontal predictor
      // (§14), PackBits (§9). A decoder fault on any variant drops that doc
      // to the hash-sketch fallback and breaks the hash compare.
      val grayHex = memoFixture("q67-gray") { (0 until 200).map { m =>
        val (comp, pred) = (m % 4) match {
          case 0 => (1, 1); case 1 => (5, 1); case 2 => (5, 2); case _ => (32773, 1)
        }
        graft.media.ImageEncode.tiffFlat(16, 8, Seq(m), littleEndian = true,
            compression = comp, predictor = pred)
          .map(b => f"${b & 0xff}%02X").mkString
      } }
      val rgbHex = memoFixture("q67-rgb") { (0 until 200).map { m =>
        val (comp, pred) = (m % 4) match {
          case 0 => (1, 1); case 1 => (5, 1); case 2 => (5, 2); case _ => (32773, 1)
        }
        graft.media.ImageEncode.tiffFlat(16, 8, Seq(m, (m + 60) % 256, (m + 120) % 256),
            littleEndian = false, compression = comp, predictor = pred)
          .map(b => f"${b & 0xff}%02X").mkString
      } }
      val m = (col("doc_id") % 200).cast("int")
      val payload = unhex(
        when(col("doc_id") % 2 === 0, element_at(array(grayHex.map(lit): _*), m + 1))
          .otherwise(element_at(array(rgbHex.map(lit): _*), m + 1)))
      t(s, dir, "documents")
        .withColumn("f", media_features(payload))
        .select(col("doc_id"),
          round(element_at(col("f"), 1).cast("double"), 4).as("mean_1"),
          round(element_at(col("f"), 2).cast("double"), 4).as("mean_2"),
          round(element_at(col("f"), 3).cast("double"), 4).as("mean_3"),
          round((element_at(col("f"), 4) + element_at(col("f"), 5) + element_at(col("f"), 6) +
            element_at(col("f"), 7) + element_at(col("f"), 8)).cast("double"), 4).as("rest"))
    }),

    // REAL BMP decode (BmpDecode: stride/padding, bottom-up flip, BGR→RGB,
    // paletted index resolution, RLE escape codes): four encodings of the
    // SAME flat 17×9 pixels (odd width exercises row/nibble padding), so the
    // closed-form oracle is invariant to which one a doc gets — 24-bit,
    // 8-bit paletted, RLE8 (incl. an absolute-mode segment), RLE4
    "q66_bmp_features" -> ((s, dir) => {
      val bmpHex = memoFixture("q66-bmp") { (0 until 200).map { m =>
        val e = graft.media.ImageEncode
        val (r, g, b) = (m, (m + 60) % 256, (m + 120) % 256)
        ((m % 4) match {
          case 0 => e.bmpFlat(17, 9, r, g, b)
          case 1 => e.bmpPalettedFlat(17, 9, 8, idx = m % 256, r, g, b)
          case 2 => e.bmpRle8Flat(17, 9, idx = m % 256, r, g, b)
          case _ => e.bmpRle4Flat(17, 9, idx = m % 16, r, g, b)
        }).map(x => f"${x & 0xff}%02X").mkString
      } }
      t(s, dir, "documents")
        .withColumn("f", media_features(unhex(
          element_at(array(bmpHex.map(lit): _*), (col("doc_id") % 200 + 1).cast("int")))))
        .select(col("doc_id"),
          round(element_at(col("f"), 1).cast("double"), 4).as("mean_r"),
          round(element_at(col("f"), 2).cast("double"), 4).as("mean_g"),
          round(element_at(col("f"), 3).cast("double"), 4).as("mean_b"),
          round((element_at(col("f"), 4) + element_at(col("f"), 5) + element_at(col("f"), 6) +
            element_at(col("f"), 7) + element_at(col("f"), 8)).cast("double"), 4).as("rest"))
    }),

    // sniff-level dims for the REST of the web image family (BMP LE header,
    // endian-aware TIFF IFD walk, WebP VP8X/VP8/VP8L bit layouts) — the
    // q29 pattern with builder-made payloads
    "q65_image_sniff" -> ((s, dir) => {
      def hexArr(key: String)(f: Int => Array[Byte]) = memoFixture(key) {
        (0 until 200).map(m => f(m).map(b => f"${b & 0xff}%02X").mkString)
      }
      val bmpHex = hexArr("q65-bmp")(m => graft.media.ImageEncode.bmp(m + 100, m % 50 + 60))
      val tifHex = hexArr("q65-tif")(m => graft.media.ImageEncode.tiff(m + 100, m % 50 + 60, littleEndian = false))
      val v8xHex = hexArr("q65-v8x")(m => graft.media.ImageEncode.webpVp8x(m + 100, m % 50 + 60))
      val v8lHex = hexArr("q65-v8l")(m => graft.media.ImageEncode.webpVp8l(m + 100, m % 50 + 60))
      val m = (col("doc_id") % 200).cast("int")
      val payload = unhex(
        when(col("doc_id") % 4 === 0, element_at(array(bmpHex.map(lit): _*), m + 1))
          .when(col("doc_id") % 4 === 1, element_at(array(tifHex.map(lit): _*), m + 1))
          .when(col("doc_id") % 4 === 2, element_at(array(v8xHex.map(lit): _*), m + 1))
          .otherwise(element_at(array(v8lHex.map(lit): _*), m + 1)))
      t(s, dir, "documents")
        .withColumn("i", media_sniff(payload))
        .select(col("doc_id"), col("i.format").as("format"),
          col("i.width").as("width"), col("i.height").as("height"))
    }),

    // Ogg container metadata (RFC 3533 page walk + Vorbis id header):
    // duration from the last page's granule position — (m+1)·441 samples at
    // 44100 Hz is exactly (m+1)·10 ms
    "q64_ogg_meta" -> ((s, dir) => {
      val oggHex = memoFixture("q64-ogg") { (0 until 200).map { m =>
        graft.media.AvEncode.oggVorbis(44100, m % 2 + 1, (m + 1) * 441L)
          .map(b => f"${b & 0xff}%02X").mkString
      } }
      val m = (col("doc_id") % 200).cast("int")
      t(s, dir, "documents")
        .withColumn("a", av_meta(unhex(element_at(array(oggHex.map(lit): _*), m + 1))))
        .select(col("doc_id"), col("a.format").as("format"),
          col("a.duration_ms").as("duration_ms"), col("a.sample_rate").as("sample_rate"),
          col("a.channels").as("channels"))
    }),

    // REAL BPE tokenization (merge-table loop, not q38's pre-tokenizer):
    // text constructed from a fixed vocabulary whose per-word token splits
    // are hand-derived, so counts AND the token sequence are closed-form
    "q63_bpe_encode" -> ((s, dir) => {
      val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
        ("an", "d"), ("e", "r"), ("o", "n"), ("on", "e"))
      // hand-derived splits: the→[the] and→[and] in→[in]
      // other→[o,the,r] banana→[b,an,an,a] xyz→[x,y,z]
      val vocab = Seq("the", "and", "in", "other", "banana", "xyz")
      val word = element_at(array(vocab.map(lit): _*), (col("doc_id") % 6 + 1).cast("int"))
      val k = (col("doc_id") % 5 + 1).cast("int")
      val txt = array_join(array_repeat(word, k), " ")
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(bpe_tokens(txt, merges)).as("n_bpe"),
          array_join(bpe_tokens(word, merges), "|").as("word_tokens"))
    }),

    // DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    // profile scored against a target corpus (every 13th doc, the q47
    // pattern); the oracle replays token hashing, gram folding, bucketing,
    // and the micro-nat-quantized log-ratios exactly in DuckDB
    "q57_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val target = docs.filter(col("doc_id") % 13 === 0).select(col("text").as("tgt_text"))
      graft.ops.CurationOps.dsirWeights(docs, "text", "doc_id", target, "tgt_text")
        .orderBy(col("doc_id"))
    }),

    // one-pass curation funnel: BOTH per-row rule sets (Gopher + C4) and the
    // exact-dup collapse counted in ONE scan + aggregation — never a count()
    // job per stage; q56's construction plus injected exact duplicates makes
    // every funnel column meaningful
    "q60_curation_funnel" -> ((s, dir) => {
      val body = when(col("doc_id") % 11 === 0, lit("exact duplicate body of this document"))
        .otherwise(col("text"))
      val txt = concat(
        lit("First sentence here.\n"),
        body,
        when(col("doc_id") % 3 === 0, lit(" ends here!")).otherwise(lit(" ends here")),
        lit("\ntoo short\n"),
        when(col("doc_id") % 4 === 0, lit("lorem ipsum inserted\n")).otherwise(lit("")),
        lit("Question line? Answer line! Final line."))
      graft.ops.CurationOps.curationFunnel(
        t(s, dir, "documents").select(txt.as("text")), "text")
    }),

    // hOCR word-span parse (the reference's literal core operator,
    // ocr_combined.py:73-82): hOCR constructed in-query from document tokens
    // with deterministic bboxes, so the oracle states the spans in plain SQL
    "q35_hocr_spans" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val spansHtml = array_join(transform(toks, (w, i) =>
        concat(lit("<span class=\"ocrx_word\" title=\"bbox "),
          (i * 100).cast("string"), lit(" 50 "),
          (i * 100 + 80).cast("string"), lit(" 62; x_wconf 95\">"), w, lit("</span> "))), "")
      val hocr = concat(
        lit("<html><body><div class=\"ocr_page\" id=\"page_1\" title=\"bbox 0 0 2480 3508\">"),
        spansHtml, lit("</div></body></html>"))
      t(s, dir, "documents")
        .withColumn("sp", explode(parse_hocr_spans(encode(hocr, "UTF-8"))))
        .select(col("doc_id"),
          col("sp.page").as("page"), col("sp.x1").as("x1"), col("sp.y1").as("y1"),
          col("sp.x2").as("x2"), col("sp.y2").as("y2"), col("sp.word").as("word"))
    }),

    // C8 per-row extraction-failure classification: payloads constructed
    // in-query (healthy PDF / object-less PDF / healthy HTML) so the expected
    // status+reason is plain SQL
    "q36_error_class" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("payload",
          when(col("doc_id") % 3 === 0, pdfOf(col("text")))
            .when(col("doc_id") % 3 === 1,
              encode(lit("%PDF-1.4\nnothing resembling an object"), "UTF-8"))
            .otherwise(encode(concat(lit("<html><body><nav><a href=\"/\">home</a></nav><p>"),
              col("text"), lit("</p></body></html>")), "UTF-8")))
        .withColumn("d", extract_doc(col("payload")))
        .select(col("doc_id"),
          when(col("d.error").isNotNull, "error").otherwise("extracted").as("status"),
          col("d.error").as("error_class"))),

    // ---------------- fixture-corpus extraction (golden-digest oracle; full pipeline surface) ----------------
    "q24_fixture_extract" -> ((s, dir) => {
      // sfDir-independent deterministic corpus; exercises dispatch + quarantine.
      // Output is the corpus-level golden: row count + sha256 over the sorted
      // per-url digests — byte-identity of all 877 extractions in one row the
      // oracle can state as a pinned literal (regenerated only on deliberate
      // extraction-semantics changes, like FIXTURES.md goldens)
      val pages = graft.fixtures.Corpus.pages(s, 1000, 42)
      val (valid, _) = graft.pipeline.ExtractPipeline.validate(pages, graft.pipeline.ExtractPipeline.Config())
      valid.select(col("url"), text_digest(extract_any_text(col("html"))).as("d"))
        .agg(
          count(lit(1)).as("n_docs"),
          sha2(encode(concat_ws("\n",
            sort_array(collect_list(concat_ws("\t", col("url"), col("d"))))), "UTF-8"), 256)
            .as("corpus_digest"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_join_broadcast_segment" ->
      """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q03_topk_orders_per_cust" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
        |FROM orders QUALIFY rn <= 3""".stripMargin,
    "q04_recent_activity" ->
      """SELECT kind, id, ts FROM (
        |  SELECT 'event' AS kind, event_id AS id, ts FROM events
        |  UNION ALL
        |  SELECT 'order' AS kind, o_orderkey AS id, o_orderdate AS ts FROM orders
        |) ORDER BY ts DESC, kind ASC, id ASC LIMIT 100""".stripMargin,
    "q05_region_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q06_status_rollup" ->
      "SELECT o_orderstatus, count(*) AS cnt FROM orders GROUP BY o_orderstatus",
    "q07_sliding_avg" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN 99 PRECEDING AND CURRENT ROW) AS BIGINT) AS msum_cents,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN 99 PRECEDING AND CURRENT ROW) AS mcount
        |FROM events""".stripMargin,
    "q21_sessionize" ->
      """SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |) GROUP BY user_id""".stripMargin,
    "q22_props_buckets" ->
      """SELECT CAST(regexp_extract(props, '[0-9]+') AS INT) % 10 AS k_bucket,
        |  count(*) AS cnt, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,
    "q23_event_type_rollup" ->
      "SELECT event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value FROM events GROUP BY event_type",
    "q08_text_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  CAST(len(text) AS INT) AS len_chars,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_unique_tokens,
        |  round(CAST(len(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE) / len(string_split(text, ' ')), 4) AS avg_token_len
        |FROM documents""".stripMargin,
    "q09_quality" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in'))) AS INT) AS stop_tokens,
        |  round(CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |    / len(string_split(text, ' ')), 4) AS stop_ratio,
        |  (len(string_split(text, ' ')) >= 20 AND
        |   len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in'))) > 0) AS is_quality
        |FROM documents""".stripMargin,
    // real classifier over the corpus column — full model-table replay
    "q10_langid" -> q10OracleSql,
    "q38_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_bpe_tokens,
        |  toks[1] AS first_tok,
        |  toks[-1] AS last_tok
        |FROM (SELECT doc_id,
        |  regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+') AS toks
        |FROM documents)""".stripMargin,
    "q11_dedup_stats" ->
      """SELECT count(*) AS n_docs, count(DISTINCT text) AS n_distinct_texts,
        |  count(*) - count(DISTINCT text) AS n_dup_docs FROM documents""".stripMargin,
    "q12_exact_dup_groups" ->
      """SELECT sha256(text) AS text_sha256, count(*) AS cnt, min(doc_id) AS keeper
        |FROM documents GROUP BY text HAVING count(*) > 1""".stripMargin,
    "q16_ann_cosine_topk" ->
      """SELECT query_id, neighbor_id, round(sim, 4) AS sim, CAST(rank AS INT) AS rank FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS sim,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC, b.vec_id ASC) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < 20 AND a.vec_id <> b.vec_id
        |) WHERE rank <= 5""".stripMargin,
    // LSH at probe radius = k enumerates every bucket → must equal brute force
    "q28_ann_lsh_bucketed" ->
      """SELECT query_id, neighbor_id, round(sim, 4) AS sim, CAST(rank AS INT) AS rank FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS sim,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC, b.vec_id ASC) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < 20 AND a.vec_id <> b.vec_id
        |) WHERE rank <= 5""".stripMargin,
    // IVF at nProbe=k is exhaustive → must equal the brute-force baseline
    "q37_ann_ivf" ->
      """SELECT query_id, neighbor_id, round(sim, 4) AS sim, CAST(rank AS INT) AS rank FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS sim,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC, b.vec_id ASC) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < 20 AND a.vec_id <> b.vec_id
        |) WHERE rank <= 5""".stripMargin,
    // IVF-PQ at nProbe=k with refine covering the corpus: the exact float
    // re-rank over an exhaustive shortlist ≡ brute force, independent of
    // codebook quality (the q37 contract, now through the PQ candidate path)
    "q94_ann_ivfpq" ->
      """SELECT query_id, neighbor_id, round(sim, 4) AS sim, CAST(rank AS INT) AS rank FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS sim,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC, b.vec_id ASC) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < 20 AND a.vec_id <> b.vec_id
        |) WHERE rank <= 5""".stripMargin,
    "q17_extract_html_roundtrip" ->
      "SELECT doc_id, text AS extracted, sha256(text) AS extracted_sha256 FROM documents",
    "q18_extract_blocks_stats" ->
      """SELECT doc_id, 4 AS n_blocks, 1 AS n_content,
        |  CAST(len(string_split(text, ' ')) AS INT) AS content_words FROM documents""".stripMargin,
    "q19_pdf_roundtrip" ->
      "SELECT doc_id, text AS pdf_text FROM documents",
    "q25_spans_order_under_shuffle" ->
      "SELECT doc_id, 0 AS page, text AS reassembled FROM documents",
    "q26_pagination" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50 OFFSET 50""".stripMargin,
    "q29_media_sniff" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'gif' ELSE 'jpeg' END AS format,
        |  CAST(doc_id % 50 + 100 AS INT) AS width,
        |  CAST(doc_id % 30 + 200 AS INT) AS height
        |FROM documents""".stripMargin,
    "q30_media_features" -> q30OracleSql,
    "q27_sanitize" ->
      """SELECT doc_id,
        |  substring(regexp_replace(upper(source), '[^A-Z0-9]', '_', 'g'), 1, 4) AS src_clean,
        |  CASE WHEN lang IN ('en','de','es','fr','zh') THEN lang ELSE 'unknown' END AS lang_clean
        |FROM documents""".stripMargin,
    // the gradient PNG's statistics in closed form: mean of base..base+15 is
    // base+7.5; population variance of 16 consecutive ints is 21.25
    "q40_png_features" ->
      """SELECT doc_id,
        |  CAST(doc_id % 200 + 7.5 AS DOUBLE) AS mean_c0,
        |  CAST(21.25 AS DOUBLE) AS var_c0,
        |  CAST(0.0 AS DOUBLE) AS other_channels
        |FROM documents""".stripMargin,
    // flat JPEG decoded through the full baseline pipeline: mean is the flat
    // value exactly, variance 0 (quantizer ≡ 1; DC-only block IDCT rounds
    // back to the constant)
    "q44_jpeg_features" ->
      """SELECT doc_id,
        |  CAST(doc_id % 200 AS DOUBLE) AS mean_c0,
        |  CAST(0.0 AS DOUBLE) AS var_c0,
        |  CAST(0.0 AS DOUBLE) AS other_channels
        |FROM documents""".stripMargin,
    // flat-color GIF: every pixel is palette entry 0 = (v,v,v)
    "q45_gif_features" ->
      """SELECT doc_id,
        |  CAST(doc_id % 200 AS DOUBLE) AS mean_r,
        |  CAST(doc_id % 200 AS DOUBLE) AS mean_g,
        |  CAST(doc_id % 200 AS DOUBLE) AS mean_b,
        |  CAST(0.0 AS DOUBLE) AS rest
        |FROM documents""".stripMargin,
    // flat 8-bit PCM: every sample is the value, one channel
    "q46_wav_features" ->
      """SELECT doc_id,
        |  CAST(doc_id % 200 AS DOUBLE) AS mean_c0,
        |  CAST(0.0 AS DOUBLE) AS var_c0,
        |  CAST(0.0 AS DOUBLE) AS other_channels
        |FROM documents""".stripMargin,
    // 13-token-gram overlap replayed over token STRINGS (join-equivalent to
    // the engine's gram-hash join, see query comment)
    "q47_decontaminate" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bench AS (
        |  SELECT array_to_string(t[4:16], ' ') AS g FROM tk
        |  WHERE doc_id % 17 = 0 AND len(t) >= 16
        |),
        |grams AS (
        |  SELECT doc_id, array_to_string(t[i:i+12], ' ') AS g
        |  FROM tk CROSS JOIN LATERAL unnest(range(1, greatest(1, len(t) - 11))) u(i)
        |  WHERE len(t) >= 13
        |),
        |hit AS (SELECT DISTINCT doc_id FROM grams WHERE g IN (SELECT g FROM bench))
        |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
        |FROM documents d LEFT JOIN hit h USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q48_repetition_stats" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g3 AS (
        |  SELECT doc_id, list_transform(range(1, len(t) - 1),
        |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS gs
        |  FROM tk WHERE len(t) >= 3
        |),
        |top2 AS (
        |  SELECT doc_id, max(c) AS m, CAST(sum(c) AS BIGINT) AS tot FROM (
        |    SELECT doc_id, b, count(*) AS c FROM (
        |      SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS b
        |      FROM tk WHERE len(t) >= 2)
        |    GROUP BY doc_id, b)
        |  GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  CAST(coalesce(len(g3.gs), 0) AS INT) AS n_grams,
        |  CAST(coalesce(len(list_distinct(g3.gs)), 0) AS INT) AS n_distinct_grams,
        |  CASE WHEN coalesce(len(g3.gs), 0) = 0 THEN 0.0
        |       ELSE round(1.0 - CAST(len(list_distinct(g3.gs)) AS DOUBLE) / len(g3.gs), 4) END AS dup_gram_frac,
        |  CASE WHEN t2.tot IS NULL THEN 0.0
        |       ELSE round(CAST(t2.m AS DOUBLE) / t2.tot, 4) END AS top_bigram_frac
        |FROM documents d
        |LEFT JOIN g3 ON d.doc_id = g3.doc_id
        |LEFT JOIN top2 t2 ON d.doc_id = t2.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q49_host_cap" ->
      """SELECT doc_id, 'www.example' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS host
        |FROM documents
        |QUALIFY row_number() OVER (PARTITION BY doc_id % 7 ORDER BY doc_id) <= 40
        |ORDER BY doc_id""".stripMargin,
    "q50_stratified_sample" -> {
      val key = USql64.toI64(USql64.sm("xor(CAST(doc_id AS UBIGINT), 24301::UBIGINT)"))
      s"""SELECT doc_id, lang FROM documents
         |WHERE ((($key) % 100) + 100) % 100 < 30
         |ORDER BY doc_id""".stripMargin
    },
    // first-occurrence-keeps semantics replayed with a window over lines
    "q51_line_dedup" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    'all rights reserved footer' || chr(10) || text || chr(10) ||
        |    'footer group ' || CAST(doc_id % 5 AS VARCHAR) AS txt
        |  FROM documents
        |),
        |lines AS (
        |  SELECT doc_id, CAST(ln - 1 AS BIGINT) AS ln, line FROM (
        |    SELECT doc_id,
        |      unnest(string_split(txt, chr(10))) AS line,
        |      unnest(range(1, len(string_split(txt, chr(10))) + 1)) AS ln
        |    FROM base)
        |),
        |kept AS (
        |  SELECT doc_id, ln, line FROM (
        |    SELECT doc_id, ln, line,
        |      row_number() OVER (PARTITION BY line ORDER BY doc_id, ln) AS rn
        |    FROM lines) WHERE rn = 1
        |)
        |SELECT b.doc_id, coalesce(k.t, '') AS text_deduped
        |FROM base b LEFT JOIN (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY ln) AS t FROM kept GROUP BY doc_id
        |) k USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,
    // the redacted payload in closed form — the constructed email/phone/ip
    // shapes each collapse to their placeholder
    "q52_pii_redact" ->
      """SELECT doc_id,
        |  text || ' contact [EMAIL] now call [PHONE] ip [IP] end' AS clean
        |FROM documents""".stripMargin,
    // the AvEncode parameters are doc_id-derived, so every metadata field is a
    // closed-form expression; integer durations floor exactly as the engine's
    // Long division does (// on positive BIGINTs)
    "q53_av_meta" ->
      """WITH m AS (SELECT doc_id, CAST(doc_id % 200 AS BIGINT) AS m FROM documents)
        |SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'mp4' WHEN 1 THEN 'mp3' ELSE 'flac' END AS format,
        |  CAST(CASE doc_id % 3
        |    WHEN 0 THEN (m + 1) * 500
        |    WHEN 1 THEN ((m % 20) + 1) * 1152 * 1000 // 44100
        |    ELSE (m + 1) * 100 END AS BIGINT) AS duration_ms,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN -1 WHEN 1 THEN 44100 ELSE 8000 END AS INT) AS sample_rate,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN -1 ELSE 1 END AS INT) AS channels,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN m % 50 + 100 ELSE -1 END AS INT) AS width,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN m % 30 + 200 ELSE -1 END AS INT) AS height
        |FROM m""".stripMargin,
    // the engine joins 64-bit gram hashes; the oracle replays the identical
    // windows as token strings (q47's collision argument applies)
    "q54_dup_spans" ->
      """WITH base AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' alpha beta gamma delta epsilon zeta' ELSE '' END AS txt
        |  FROM documents
        |),
        |tk AS (SELECT doc_id, string_split(txt, ' ') AS t FROM base),
        |grams AS (
        |  SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g
        |  FROM tk CROSS JOIN LATERAL unnest(range(1, greatest(1, len(t) - 3))) u(i)
        |  WHERE len(t) >= 5
        |),
        |cnt AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
        |per AS (
        |  SELECT doc_id, count(*) AS nw, sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS dw
        |  FROM grams JOIN cnt USING (g) GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  CAST(coalesce(nw, 0) AS INT) AS n_windows,
        |  CAST(coalesce(dw, 0) AS INT) AS dup_windows,
        |  CASE WHEN coalesce(nw, 0) = 0 THEN 0.0
        |       ELSE round(CAST(dw AS DOUBLE) / nw, 4) END AS dup_frac
        |FROM documents d LEFT JOIN per USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // q54's windows as strings -> covered positions (window i covers tokens
    // i..i+4) -> tokens surviving the coverage anti-join, rebuilt in order
    "q81_remove_dup_spans" ->
      """WITH base AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' alpha beta gamma delta epsilon zeta' ELSE '' END AS txt
        |  FROM documents
        |),
        |tk AS (SELECT doc_id, string_split(txt, ' ') AS t FROM base),
        |grams AS (
        |  SELECT doc_id, i, array_to_string(t[i:i+4], ' ') AS g
        |  FROM tk CROSS JOIN LATERAL unnest(range(1, greatest(1, len(t) - 3))) u(i)
        |  WHERE len(t) >= 5
        |),
        |cnt AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
        |cov AS (
        |  SELECT DISTINCT doc_id, p
        |  FROM grams JOIN cnt USING (g) CROSS JOIN LATERAL unnest(range(i, i + 5)) v(p)
        |  WHERE c > 1
        |),
        |toks AS (
        |  SELECT doc_id, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS pos FROM tk
        |),
        |kept AS (
        |  SELECT x.doc_id, string_agg(x.tok, ' ' ORDER BY x.pos) AS clean, count(*) AS k
        |  FROM toks x LEFT JOIN cov ON cov.doc_id = x.doc_id AND cov.p = x.pos
        |  WHERE cov.p IS NULL GROUP BY x.doc_id
        |)
        |SELECT b.doc_id, coalesce(clean, '') AS clean_text,
        |  CAST(len(b.t) - coalesce(k, 0) AS INT) AS removed_tokens
        |FROM tk b LEFT JOIN kept USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,
    // each anchor's RFC 3986 resolution stated closed-form, in document
    // order; mailto/#fragment/commented/script-decoy anchors emit nothing
    "q82_extract_links" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(doc_id % 7 AS VARCHAR) AS k, CAST(doc_id % 3 AS VARCHAR) AS j,
        |  CAST(doc_id % 50 AS VARCHAR) AS m FROM documents)
        |SELECT doc_id, CAST(pos AS INT) AS pos, link FROM (
        |  SELECT doc_id, 0 AS pos, 'https://h' || k || '.example/p/' || m AS link FROM d
        |  UNION ALL SELECT doc_id, 1, 'https://h' || k || '.example/dir/a/c' || m FROM d
        |  UNION ALL SELECT doc_id, 2, 'https://cdn.example/r/' || m FROM d
        |  UNION ALL SELECT doc_id, 3, 'https://abs' || m || '.example/z?q=' || m || '&r=1' FROM d
        |  UNION ALL SELECT doc_id, 4, 'https://h' || k || '.example/dir/page' || j || '?only=' || m FROM d
        |) ORDER BY doc_id, pos""".stripMargin,
    // refresh target and re-based first link, both closed-form
    "q91_base_refresh" ->
      """SELECT doc_id,
        |  '/go/' || CAST(doc_id % 50 AS VARCHAR) AS refresh_url,
        |  'https://b' || CAST(doc_id % 50 AS VARCHAR) || '.example/x/a'
        |    || CAST(doc_id % 50 AS VARCHAR) AS first_link
        |FROM documents ORDER BY doc_id""".stripMargin,
    // empty-password recovery: every 10th variant is genuinely locked
    "q96_pdf_decrypt" ->
      """SELECT doc_id,
        |  (doc_id % 200) % 10 <> 3 AS recovered,
        |  CASE WHEN (doc_id % 200) % 10 <> 3
        |    THEN 'Recovered secret ' || CAST(doc_id % 200 AS VARCHAR) ELSE '' END AS text
        |FROM documents ORDER BY doc_id""".stripMargin,
    // frontier replay: the four candidate families from the distinct
    // (m, h) grid, each WHERE clause one gate — odd h passes robots for
    // /p/, refreshes always pass, odd-m t-targets are unseen, feeds ride
    // the m%10=9 RSS pages; keeper = min discoverer (h0 exists for every m)
    "q95_frontier" ->
      """WITH d AS (SELECT DISTINCT doc_id % 50 AS m, doc_id % 7 AS h FROM documents),
        |cand AS (
        |  SELECT 'https://h' || CAST(h AS VARCHAR) || '.example/p/' || CAST(m AS VARCHAR) AS url,
        |         'h' || CAST(h AS VARCHAR) || '.example' AS host, 'anchor' AS kind,
        |         'https://h' || CAST(h AS VARCHAR) || '.example/dir/page' AS dfrom
        |  FROM d WHERE m % 10 <> 9 AND h % 2 = 1
        |  UNION ALL
        |  SELECT 'https://h' || CAST(h AS VARCHAR) || '.example/go/' || CAST(m AS VARCHAR),
        |         'h' || CAST(h AS VARCHAR) || '.example', 'refresh',
        |         'https://h' || CAST(h AS VARCHAR) || '.example/dir/page'
        |  FROM d WHERE m % 10 <> 9
        |  UNION ALL
        |  SELECT 'https://t' || CAST(m AS VARCHAR) || '.example/only',
        |         't' || CAST(m AS VARCHAR) || '.example', 'anchor',
        |         'https://h' || CAST(h AS VARCHAR) || '.example/dir/page'
        |  FROM d WHERE m % 10 <> 9 AND m % 2 = 1
        |  UNION ALL
        |  SELECT 'https://f' || CAST(m AS VARCHAR) || '.example/item',
        |         'f' || CAST(m AS VARCHAR) || '.example', 'feed',
        |         'https://h' || CAST(h AS VARCHAR) || '.example/dir/page'
        |  FROM d WHERE m % 10 = 9
        |)
        |SELECT url, host, kind, min(dfrom) AS discovered_from
        |FROM cand GROUP BY url, host, kind
        |ORDER BY url, kind""".stripMargin,
    // language-ID: full model-table replay (no closed-form answer key)
    "q92_langid_nb" -> q92OracleSql,
    // RSS docs emit two items (CDATA title; entity title; absent pubDate ->
    // NULL); Atom docs emit one (alternate link beats the leading self link)
    "q90_feed_items" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 50 AS VARCHAR) AS m,
        |  CAST(doc_id % 9 + 1 AS VARCHAR) AS dd FROM documents)
        |SELECT doc_id, kind, CAST(pos AS INT) AS pos, title, link, "date" FROM (
        |  SELECT doc_id, 'rss' AS kind, 0 AS pos, 'story ' || m AS title,
        |    'https://r.example/p/' || m AS link,
        |    'Mon, 0' || dd || ' Jan 2024 00:00:00 GMT' AS "date" FROM d WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 'rss', 1, 'plain & second',
        |    'https://r.example/q/' || m, NULL FROM d WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 'atom', 0, 'entry ' || m,
        |    'https://a.example/e/' || m,
        |    '2024-01-0' || dd || 'T00:00:00Z' FROM d WHERE doc_id % 2 = 1
        |) ORDER BY doc_id, pos""".stripMargin,
    // both ld+json blocks land (the decoy script does not); the first parses
    // to the closed-form Article fields
    "q88_ldjson" ->
      """SELECT doc_id, CAST(2 AS INT) AS n_blocks, 'Article' AS type,
        |  'story ' || CAST(doc_id % 50 AS VARCHAR) AS headline,
        |  CAST(doc_id % 50 AS INT) AS word_count
        |FROM documents""".stripMargin,
    // named-agent group excludes the * rules; * group evaluates prefix,
    // $-anchored wildcard, and the longest-match Allow override
    "q89_robots" ->
      """SELECT doc_id, CAST(pos AS INT) AS pos,
        |  CASE WHEN doc_id % 2 = 0 THEN gb ELSE ob END AS allowed
        |FROM documents CROSS JOIN (VALUES
        |  (0, true, true), (1, true, false), (2, true, true),
        |  (3, true, false), (4, true, true), (5, false, true)) v(pos, gb, ob)
        |ORDER BY doc_id, pos""".stripMargin,
    // six anchors, flags per the rel token-list rule
    "q87_nofollow_links" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(doc_id % 7 AS VARCHAR) AS k, CAST(doc_id % 50 AS VARCHAR) AS m FROM documents)
        |SELECT doc_id, CAST(pos AS INT) AS pos,
        |  'https://h' || k || '.example/' || seg || '/' || m AS href, nf AS nofollow
        |FROM d CROSS JOIN (VALUES (0, 'n', true), (1, 'u', true), (2, 'q', true),
        |  (3, 's', false), (4, 'x', false), (5, 'p', false)) v(pos, seg, nf)
        |ORDER BY doc_id, pos""".stripMargin,
    // three anchors closed-form: collapsed nested-inline text, the entity in
    // the auto-closed anchor, the final closed one; the mailto never lands
    "q86_anchor_text" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(doc_id % 7 AS VARCHAR) AS k, CAST(doc_id % 50 AS VARCHAR) AS m FROM documents)
        |SELECT doc_id, CAST(pos AS INT) AS pos, href, text FROM (
        |  SELECT doc_id, 0 AS pos,
        |    'https://h' || k || '.example/p/' || m AS href,
        |    'read doc ' || m || ' now' AS text FROM d
        |  UNION ALL SELECT doc_id, 1,
        |    'https://h' || k || '.example/unclosed/' || m, 'first & unclosed' FROM d
        |  UNION ALL SELECT doc_id, 2,
        |    'https://t' || m || '.example/', 'second' FROM d
        |) ORDER BY doc_id, pos""".stripMargin,
    // the closed-form edge set (hK self-loop, hK->cdn, hK->absM) + the same
    // two fixed-point iterations unrolled — BIGINT floor division throughout
    "q83_host_pagerank" ->
      """WITH d AS (SELECT DISTINCT CAST(doc_id % 7 AS VARCHAR) AS k,
        |    CAST(doc_id % 50 AS VARCHAR) AS m FROM documents),
        |edges AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT 'h' || k || '.example' AS src, 'h' || k || '.example' AS dst FROM d
        |    UNION ALL SELECT 'h' || k || '.example', 'cdn.example' FROM d
        |    UNION ALL SELECT 'h' || k || '.example', 'abs' || m || '.example' FROM d)),
        |nodes AS (SELECT DISTINCT host FROM
        |  (SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
        |deg AS (SELECT src, count(*) AS dg FROM edges GROUP BY src),
        |r0 AS (SELECT host, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (SELECT dst, sum(r // dg) AS s FROM edges JOIN deg USING (src)
        |  JOIN r0 ON r0.host = edges.src GROUP BY dst),
        |r1 AS (SELECT host, 150000 + (850 * coalesce(s, 0)) // 1000 AS r
        |  FROM nodes LEFT JOIN c1 ON c1.dst = nodes.host),
        |c2 AS (SELECT dst, sum(r // dg) AS s FROM edges JOIN deg USING (src)
        |  JOIN r1 ON r1.host = edges.src GROUP BY dst),
        |r2 AS (SELECT host, 150000 + (850 * coalesce(s, 0)) // 1000 AS r
        |  FROM nodes LEFT JOIN c2 ON c2.dst = nodes.host)
        |SELECT host, CAST(r AS BIGINT) AS rank_micro FROM r2 ORDER BY host""".stripMargin,
    // q83's unrolled recurrence plus the per-iteration dangling share:
    // share_t = (850 · Σ_{dangling} r_t) // (1000 · N) added uniformly —
    // all integer floor math, bit-identical across engines
    "q97_pagerank_dangling" ->
      """WITH d AS (SELECT DISTINCT CAST(doc_id % 7 AS VARCHAR) AS k,
        |    CAST(doc_id % 50 AS VARCHAR) AS m FROM documents),
        |edges AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT 'h' || k || '.example' AS src, 'h' || k || '.example' AS dst FROM d
        |    UNION ALL SELECT 'h' || k || '.example', 'cdn.example' FROM d
        |    UNION ALL SELECT 'h' || k || '.example', 'abs' || m || '.example' FROM d)),
        |nodes AS (SELECT DISTINCT host FROM
        |  (SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
        |deg AS (SELECT src, count(*) AS dg FROM edges GROUP BY src),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |dang AS (SELECT host FROM nodes WHERE host NOT IN (SELECT src FROM edges)),
        |r0 AS (SELECT host, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |sh0 AS (SELECT (850 * CAST((SELECT sum(r0.r) FROM r0 JOIN dang USING (host)) AS BIGINT))
        |    // (1000 * (SELECT n FROM nn)) AS s),
        |c1 AS (SELECT dst, sum(r // dg) AS s FROM edges JOIN deg USING (src)
        |  JOIN r0 ON r0.host = edges.src GROUP BY dst),
        |r1 AS (SELECT host, 150000 + (SELECT s FROM sh0) + (850 * coalesce(s, 0)) // 1000 AS r
        |  FROM nodes LEFT JOIN c1 ON c1.dst = nodes.host),
        |sh1 AS (SELECT (850 * CAST((SELECT sum(r1.r) FROM r1 JOIN dang USING (host)) AS BIGINT))
        |    // (1000 * (SELECT n FROM nn)) AS s),
        |c2 AS (SELECT dst, sum(r // dg) AS s FROM edges JOIN deg USING (src)
        |  JOIN r1 ON r1.host = edges.src GROUP BY dst),
        |r2 AS (SELECT host, 150000 + (SELECT s FROM sh1) + (850 * coalesce(s, 0)) // 1000 AS r
        |  FROM nodes LEFT JOIN c2 ON c2.dst = nodes.host)
        |SELECT host, CAST(r AS BIGINT) AS rank_micro FROM r2 ORDER BY host""".stripMargin,
    // the committed index is deterministic, so the oracle recomputes it from
    // the documents table and replays the exact/near/fresh classification
    // (shared sig/band CTE chain, new×index candidates, best-match window)
    "q98_dedup_incremental" -> q98OracleSql(),
    // same inverted file, same Long floor-div chain, same micro-nat idf — the
    // whole ranking replays in DuckDB // arithmetic (ties to ascending doc_id)
    "q99_bm25_topk" -> q99OracleSql(),
    // urlset rows closed-form (entity decoded, padding trimmed, the loc-less
    // entry and the <urlx> decoy absent); index rows carry lastmod only; the
    // robots directive columns collapse the duplicate and keep file order
    "q100_sitemap" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 50 AS VARCHAR) AS m,
        |  CAST(doc_id % 9 + 1 AS VARCHAR) AS dd FROM documents)
        |SELECT doc_id, kind, CAST(pos AS INT) AS pos, loc, lastmod, changefreq,
        |  priority, 'https://s.example/maps/root-' || m || '.xml' AS robots_map0,
        |  CAST(2 AS INT) AS n_robots_maps
        |FROM (
        |  SELECT doc_id, m, 'urlset' AS kind, 0 AS pos,
        |    'https://s.example/p/' || m || '?a=1&b=2' AS loc,
        |    '2024-01-0' || dd AS lastmod, 'daily' AS changefreq, '0.8' AS priority
        |  FROM d WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, m, 'urlset', 1, 'https://s.example/q/' || m,
        |    NULL, NULL, NULL FROM d WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, m, 'sitemapindex', 0,
        |    'https://s.example/maps/part-' || m || '.xml', '2024-02-0' || dd,
        |    NULL, NULL FROM d WHERE doc_id % 2 = 1
        |  UNION ALL SELECT doc_id, m, 'sitemapindex', 1,
        |    'https://s.example/maps/extra.xml', NULL, NULL, NULL
        |  FROM d WHERE doc_id % 2 = 1
        |) ORDER BY doc_id, pos""".stripMargin,
    // good lines reconstruct closed-form; the malformed-JSON arm keeps its
    // surt/ts split but nulls every meta-derived field
    "q101_cdx" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 50 AS VARCHAR) AS m,
        |  CAST(doc_id % 9 + 1 AS VARCHAR) AS dd FROM documents)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 9 THEN 'org,broken)/x'
        |       ELSE 'com,example)/p/' || m END AS surt_key,
        |  CASE WHEN doc_id % 10 = 9 THEN '2024'
        |       ELSE '2024010100000' || dd END AS ts,
        |  CASE WHEN doc_id % 10 = 9 THEN NULL
        |       ELSE 'https://example.com/p/' || m END AS url,
        |  CASE WHEN doc_id % 10 = 9 THEN NULL ELSE 'text/html' END AS mime,
        |  CAST(CASE WHEN doc_id % 10 = 9 THEN NULL ELSE 200 END AS INT) AS status,
        |  CASE WHEN doc_id % 10 = 9 THEN NULL ELSE 'sha1:D' || m END AS digest,
        |  CAST(CASE WHEN doc_id % 10 = 9 THEN NULL ELSE 1234 END AS BIGINT) AS length,
        |  CAST(CASE WHEN doc_id % 10 = 9 THEN NULL
        |       ELSE doc_id % 7 * 1000 END AS BIGINT) AS offset,
        |  CASE WHEN doc_id % 10 = 9 THEN NULL
        |       ELSE 'part-' || m || '.warc.gz' END AS filename
        |FROM d ORDER BY doc_id""".stripMargin,
    // each rotation arm's key is closed-form: label reversal, www strip,
    // lowercasing, tracking removal + param sort, kept non-default port,
    // stripped default port, null non-http(s)
    "q102_surt" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 50 AS VARCHAR) AS m,
        |  CAST(doc_id % 7 AS VARCHAR) AS k FROM documents)
        |SELECT doc_id, url, surt FROM (
        |  SELECT doc_id,
        |    'HTTPS://WWW.Example' || k || '.COM/Path/' || m || '?b=2&utm_source=x&a=1#frag' AS url,
        |    'com,example' || k || ')/path/' || m || '?a=1&b=2' AS surt
        |  FROM d WHERE doc_id % 4 = 0
        |  UNION ALL SELECT doc_id, 'http://h' || k || '.example.org:8080/x/' || m,
        |    'org,example,h' || k || ':8080)/x/' || m FROM d WHERE doc_id % 4 = 1
        |  UNION ALL SELECT doc_id, 'http://a.example.net:80/',
        |    'net,example,a)/' FROM d WHERE doc_id % 4 = 2
        |  UNION ALL SELECT doc_id, 'ftp://x.example/' || m, NULL FROM d WHERE doc_id % 4 = 3
        |) ORDER BY doc_id""".stripMargin,
    // the hand-derived merge sequence (derivation in the query comment)
    "q111_bpe_train" ->
      """SELECT * FROM (VALUES (CAST(0 AS INT), 'a', 'a'),
        |  (CAST(1 AS INT), 'a', 'b'), (CAST(2 AS INT), 'aa', 'ab'))
        |t("rank", "left", "right") ORDER BY "rank"""".stripMargin,
    // three closed-form arms: ld+json month, url-path month, null
    "q110_pub_date" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 50 AS VARCHAR) AS m,
        |  CAST(doc_id % 9 + 1 AS VARCHAR) AS dd FROM documents)
        |SELECT doc_id, url, pub_month, source FROM (
        |  SELECT doc_id, 'https://d.example/a/' || m AS url,
        |    '2024-0' || dd AS pub_month, 'ldjson' AS source
        |  FROM d WHERE doc_id % 3 = 0
        |  UNION ALL SELECT doc_id, 'https://d.example/2023/0' || dd || '/post-' || m,
        |    '2023-0' || dd, 'url' FROM d WHERE doc_id % 3 = 1
        |  UNION ALL SELECT doc_id, 'https://d.example/p/' || m, NULL, 'none'
        |  FROM d WHERE doc_id % 3 = 2
        |) ORDER BY doc_id""".stripMargin,
    // per-family lengths interpolated as plan-build constants (same JVM,
    // same zlib — the q30 sketch-arm determinism pattern)
    "q108_compression_signal" -> q108OracleSql(),
    // one groupBy replayed in SQL: dup arm closed-form (every 5th doc per
    // host shares the boilerplate digest), token aggregates from real text
    "q109_host_profile" ->
      """WITH d AS (SELECT doc_id,
        |  'h' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS host,
        |  CASE WHEN doc_id % 5 = 0 THEN 'duplicate boilerplate for host ' ||
        |    CAST(doc_id % 7 AS VARCHAR) ELSE text END AS txt FROM documents)
        |SELECT host, count(*) AS n_docs,
        |  CAST(count(DISTINCT sha256(txt)) AS BIGINT) AS n_unique,
        |  CAST(sum(len(list_filter(string_split_regex(txt, '\s+'), x -> len(x) > 0))) AS BIGINT)
        |    AS tokens_total,
        |  CAST(sum(CASE WHEN len(list_filter(string_split_regex(txt, '\s+'),
        |    x -> len(x) > 0)) < 5 THEN 1 ELSE 0 END) AS BIGINT) AS short_docs,
        |  count(*) - CAST(count(DISTINCT sha256(txt)) AS BIGINT) AS dup_rows,
        |  (count(*) - CAST(count(DISTINCT sha256(txt)) AS BIGINT)) * 1000 // count(*)
        |    AS dup_permille
        |FROM d GROUP BY host ORDER BY host""".stripMargin,
    // the three non-unchanged arms reconstruct closed-form; DuckDB sha256
    // matches Spark sha2(…, 256) hex-for-hex
    "q107_snapshot_delta" ->
      """WITH d AS (SELECT doc_id, text, sha256(text) AS dig FROM documents)
        |SELECT doc_id, old_digest, new_digest, change FROM (
        |  SELECT doc_id, dig AS old_digest, sha256(text || ' v2') AS new_digest,
        |    'changed' AS change FROM d WHERE doc_id % 5 = 0
        |  UNION ALL SELECT doc_id, dig, NULL, 'removed' FROM d WHERE doc_id % 5 = 1
        |  UNION ALL SELECT doc_id + 1000000, NULL, dig, 'added' FROM d
        |  WHERE doc_id % 5 = 2
        |) ORDER BY doc_id""".stripMargin,
    // the same per-host window in DuckDB; null delays take the 1000 ms
    // default inside the product only
    "q106_fetch_schedule" ->
      """WITH t AS (SELECT doc_id, doc_id % 7 AS k,
        |  'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example/p/' ||
        |    CAST(doc_id AS VARCHAR) AS url FROM documents)
        |SELECT url, 'h' || CAST(k AS VARCHAR) || '.example' AS host,
        |  CAST(CASE WHEN k % 2 = 0 THEN (k + 1) * 1000 END AS BIGINT) AS crawl_delay_ms,
        |  CAST((row_number() OVER (PARTITION BY k ORDER BY url) - 1) *
        |    (CASE WHEN k % 2 = 0 THEN (k + 1) * 1000 ELSE 1000 END) AS BIGINT)
        |    AS fetch_offset_ms
        |FROM t ORDER BY url""".stripMargin,
    // named group beats *, first VALID value wins, decimal truncates to
    // millis, overflow caps at 24 h, absent is null — all closed-form
    "q105_crawl_delay" ->
      """WITH d AS (SELECT doc_id, doc_id % 5 AS k FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN k * 1000 + 500
        |       WHEN doc_id % 4 = 1 THEN k * 1000
        |       WHEN doc_id % 4 = 2 THEN 86400000 END AS BIGINT) AS delay_named,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 9000
        |       WHEN doc_id % 4 = 1 THEN k * 1000
        |       WHEN doc_id % 4 = 2 THEN 86400000 END AS BIGINT) AS delay_star
        |FROM d ORDER BY doc_id""".stripMargin,
    // the q39 CTE chain (shingles → Jaccard pairs → recursive reach → min
    // components) plus the keeper ranking: quality = splitmix64(doc_id) mod
    // 1000 replayed in UBIGINT arithmetic, row_number per component ordered
    // (quality DESC, id) — rank 1 survives, the rest drop
    "q104_dedup_cc_keeper" -> {
      val q = USql64.toI64(USql64.sm("CAST(doc_id AS UBIGINT)"))
      s"""WITH RECURSIVE base AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, substring(text, strpos(text, ' ') + 1) FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000,
         |         substring(substring(text, strpos(text, ' ') + 1),
         |                   strpos(substring(text, strpos(text, ' ') + 1), ' ') + 1)
         |  FROM documents
         |),
         |s AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
         |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM base)
         |),
         |p AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b
         |  FROM s x JOIN s y ON x.doc_id < y.doc_id
         |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |        / len(list_distinct(x.sh || y.sh)) >= 0.8
         |),
         |edges AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
         |reach(src, node) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
         |),
         |comp AS (SELECT src AS id, min(node) AS component FROM reach GROUP BY src),
         |qual AS (SELECT doc_id, ((($q) % 1000) + 1000) % 1000 AS quality FROM base),
         |ranked AS (
         |  SELECT c.id, row_number() OVER (PARTITION BY c.component
         |    ORDER BY q.quality DESC, c.id) AS rn
         |  FROM comp c JOIN qual q ON q.doc_id = c.id
         |)
         |SELECT doc_id FROM base
         |WHERE doc_id NOT IN (SELECT id FROM ranked WHERE rn > 1)
         |ORDER BY doc_id""".stripMargin
    },
    // the splitmix64 permutation and the prefix rule replayed as ONE window
    // per domain ordered (h, id) — the two-level scheme's range bucketing is
    // order-preserving, so the single window IS its semantics; integer
    // targets interpolate closed-form
    "q103_token_mix" -> {
      val h64 = USql64.toI64(USql64.sm("xor(CAST(doc_id AS UBIGINT), 24301::UBIGINT)"))
      s"""WITH w(source, cap) AS (VALUES ('src0', 4000), ('src1', 3000),
         |  ('src2', 2000), ('src3', 0)),
         |h AS (SELECT doc_id, source, n_chars, ($h64) AS h64 FROM documents),
         |c AS (SELECT doc_id, source, n_chars,
         |  CAST(sum(n_chars) OVER (PARTITION BY source
         |    ORDER BY h64, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM h)
         |SELECT doc_id, source, n_chars FROM c JOIN w USING (source)
         |WHERE cum <= cap ORDER BY doc_id""".stripMargin
    },
    // every Gopher rule replayed in DuckDB list ops; all ratios are
    // integer-over-integer divisions, so the keep verdict is deterministic
    // on both engines
    "q55_gopher_quality" ->
      """WITH base AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 5 = 0 THEN chr(10) || '- bullet line one' || chr(10) ||
        |      '- bullet line two' || chr(10) || 'trailing thought...' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' ### #### #' ELSE '' END AS txt
        |  FROM documents
        |),
        |w AS (
        |  SELECT doc_id, txt,
        |    list_filter(string_split(txt, ' '), x -> len(x) > 0) AS words,
        |    string_split(txt, chr(10)) AS lines
        |  FROM base
        |),
        |sig AS (
        |  SELECT doc_id,
        |    len(words) AS wc,
        |    CASE WHEN len(words) = 0 THEN 0.0
        |         ELSE CAST(coalesce(list_sum(list_transform(words, x -> len(x))), 0) AS DOUBLE) / len(words) END AS mean_len,
        |    len(txt) - len(replace(txt, '#', '')) AS hashes,
        |    (len(txt) - len(replace(txt, '...', ''))) // 3 AS ellipses,
        |    len(lines) AS n_lines,
        |    len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '•%')) AS bullet_lines,
        |    len(list_filter(lines, l -> l LIKE '%...')) AS ellipsis_lines,
        |    len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha_words,
        |    len(list_intersect(list_distinct(words),
        |        ['the','be','to','of','and','that','have','with'])) AS n_stops
        |  FROM w
        |)
        |SELECT doc_id,
        |  CAST(wc AS INT) AS word_count,
        |  round(mean_len, 4) AS mean_word_len,
        |  round(CASE WHEN wc = 0 THEN 0.0 ELSE CAST(hashes + ellipses AS DOUBLE) / wc END, 4) AS symbol_word_ratio,
        |  round(CAST(bullet_lines AS DOUBLE) / n_lines, 4) AS bullet_line_frac,
        |  round(CAST(ellipsis_lines AS DOUBLE) / n_lines, 4) AS ellipsis_line_frac,
        |  round(CASE WHEN wc = 0 THEN 0.0 ELSE CAST(alpha_words AS DOUBLE) / wc END, 4) AS alpha_word_frac,
        |  CAST(n_stops AS INT) AS n_required_stops,
        |  (wc >= 50 AND wc <= 100000 AND mean_len >= 3.0 AND mean_len <= 10.0
        |   AND (CASE WHEN wc = 0 THEN 0.0 ELSE CAST(hashes + ellipses AS DOUBLE) / wc END) <= 0.1
        |   AND CAST(bullet_lines AS DOUBLE) / n_lines <= 0.9
        |   AND CAST(ellipsis_lines AS DOUBLE) / n_lines <= 0.3
        |   AND (CASE WHEN wc = 0 THEN 0.0 ELSE CAST(alpha_words AS DOUBLE) / wc END) >= 0.8
        |   AND n_stops >= 2) AS keep
        |FROM sig ORDER BY doc_id""".stripMargin,
    // line filter + page rules replayed in DuckDB list ops; the cleaned text
    // is string-compared (DuckDB regexp_replace needs the 'g' flag — Spark's
    // is global by default)
    "q56_c4_filter" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    'First sentence here.' || chr(10) ||
        |    text || CASE WHEN doc_id % 3 = 0 THEN ' ends here!' ELSE ' ends here' END || chr(10) ||
        |    'too short' || chr(10) ||
        |    CASE WHEN doc_id % 4 = 0 THEN 'lorem ipsum inserted' || chr(10) ELSE '' END ||
        |    'Question line? Answer line! Final line.' AS txt
        |  FROM documents
        |),
        |k AS (
        |  SELECT doc_id, txt,
        |    list_filter(string_split(txt, chr(10)), l ->
        |      (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?' OR l LIKE '%"')
        |      AND len(string_split(l, ' ')) >= 3) AS kept
        |  FROM base
        |),
        |c AS (
        |  SELECT doc_id, txt, kept, array_to_string(kept, chr(10)) AS text_clean,
        |    (contains(lower(txt), 'lorem ipsum') OR contains(txt, '{')) AS flagged
        |  FROM k
        |)
        |SELECT doc_id, text_clean,
        |  CAST(len(kept) AS INT) AS n_kept_lines,
        |  CAST(len(text_clean) - len(regexp_replace(text_clean, '[.!?]', '', 'g')) AS INT) AS n_sentences,
        |  flagged,
        |  (len(text_clean) - len(regexp_replace(text_clean, '[.!?]', '', 'g')) >= 5
        |   AND NOT flagged) AS keep
        |FROM c ORDER BY doc_id""".stripMargin,
    // flat 4:2:0 planes decode to exactly their encoded values — channel
    // means are the constructor parameters, every variance 0
    "q58_jpeg420_features" ->
      """SELECT doc_id,
        |  CAST(doc_id % 200 AS DOUBLE) AS mean_y,
        |  CAST((doc_id % 200 + 40) % 256 AS DOUBLE) AS mean_cb,
        |  CAST((doc_id % 200 + 80) % 256 AS DOUBLE) AS mean_cr,
        |  0.0 AS rest
        |FROM documents""".stripMargin,
    // same closed form as q58 — flat planes survive the progressive scans
    "q59_jpeg_progressive_features" ->
      """SELECT doc_id,
        |  CAST(doc_id % 200 AS DOUBLE) AS mean_y,
        |  CAST((doc_id % 200 + 40) % 256 AS DOUBLE) AS mean_cb,
        |  CAST((doc_id % 200 + 80) % 256 AS DOUBLE) AS mean_cr,
        |  0.0 AS rest
        |FROM documents""".stripMargin,
    // both rule sets replayed per row, then one aggregation; n_unique via
    // DISTINCT text (the engine's sha-256 digest is injective on this data)
    "q60_curation_funnel" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    'First sentence here.' || chr(10) ||
        |    (CASE WHEN doc_id % 11 = 0 THEN 'exact duplicate body of this document' ELSE text END) ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' ends here!' ELSE ' ends here' END || chr(10) ||
        |    'too short' || chr(10) ||
        |    CASE WHEN doc_id % 4 = 0 THEN 'lorem ipsum inserted' || chr(10) ELSE '' END ||
        |    'Question line? Answer line! Final line.' AS txt
        |  FROM documents
        |),
        |w AS (
        |  SELECT doc_id, txt,
        |    list_filter(string_split(txt, ' '), x -> len(x) > 0) AS words,
        |    string_split(txt, chr(10)) AS lines,
        |    array_to_string(list_filter(string_split(txt, chr(10)), l ->
        |      (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?' OR l LIKE '%"')
        |      AND len(string_split(l, ' ')) >= 3), chr(10)) AS tc
        |  FROM base
        |),
        |sig AS (
        |  SELECT txt,
        |    (len(words) >= 50 AND len(words) <= 100000
        |     AND (CASE WHEN len(words) = 0 THEN 0.0
        |          ELSE CAST(coalesce(list_sum(list_transform(words, x -> len(x))), 0) AS DOUBLE) / len(words) END)
        |         BETWEEN 3.0 AND 10.0
        |     AND (CASE WHEN len(words) = 0 THEN 0.0
        |          ELSE CAST((len(txt) - len(replace(txt, '#', ''))) +
        |               ((len(txt) - len(replace(txt, '...', ''))) // 3) AS DOUBLE) / len(words) END) <= 0.1
        |     AND CAST(len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '•%')) AS DOUBLE) / len(lines) <= 0.9
        |     AND CAST(len(list_filter(lines, l -> l LIKE '%...')) AS DOUBLE) / len(lines) <= 0.3
        |     AND (CASE WHEN len(words) = 0 THEN 0.0
        |          ELSE CAST(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / len(words) END) >= 0.8
        |     AND len(list_intersect(list_distinct(words),
        |         ['the','be','to','of','and','that','have','with'])) >= 2) AS gk,
        |    (len(tc) - len(regexp_replace(tc, '[.!?]', '', 'g')) >= 5
        |     AND NOT (contains(lower(txt), 'lorem ipsum') OR contains(txt, '{'))) AS ck
        |  FROM w
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN gk THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_keep,
        |  CAST(sum(CASE WHEN ck THEN 1 ELSE 0 END) AS BIGINT) AS n_c4_keep,
        |  CAST(sum(CASE WHEN gk AND ck THEN 1 ELSE 0 END) AS BIGINT) AS n_both_keep,
        |  CAST(count(DISTINCT txt) AS BIGINT) AS n_unique_docs
        |FROM sig""".stripMargin,
    // flat FLAC decodes to value+128 exactly: mean = doc_id%200 - 100 + 128
    "q61_flac_features" ->
      """SELECT doc_id,
        |  CAST(doc_id % 200 + 28 AS DOUBLE) AS mean_c0,
        |  0.0 AS var_c0,
        |  0.0 AS other_channels
        |FROM documents""".stripMargin,
    // the constructed typographic junk collapses to a closed-form literal
    "q62_normalize_text" ->
      """SELECT doc_id,
        |  text || ' "quoted" - dash... a b c d' AS clean
        |FROM documents""".stripMargin,
    // per-word splits are hand-derived literals; the repeated-text count is
    // repeats × tokens-per-word
    "q63_bpe_encode" ->
      """SELECT doc_id,
        |  CAST((doc_id % 5 + 1) *
        |    (CASE doc_id % 6 WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 1
        |                     WHEN 3 THEN 3 WHEN 4 THEN 4 ELSE 3 END) AS INT) AS n_bpe,
        |  CASE doc_id % 6 WHEN 0 THEN 'the' WHEN 1 THEN 'and' WHEN 2 THEN 'in'
        |       WHEN 3 THEN 'o|the|r' WHEN 4 THEN 'b|an|an|a' ELSE 'x|y|z' END AS word_tokens
        |FROM documents""".stripMargin,
    "q68_url_blocklist" ->
      """SELECT doc_id,
        |  'http://ok.example/article/' || CAST(doc_id AS VARCHAR) AS url
        |FROM documents
        |WHERE doc_id % 5 IN (3, 4)
        |ORDER BY doc_id""".stripMargin,
    "q70_lm_filter" -> q70OracleSql,
    "q84_ppl_buckets" -> q84OracleSql,
    // offsets as a plain cumulative sum; chunk spans by BIGINT floor division
    "q85_pack_sequences" ->
      """WITH n AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 0)) + 1 AS BIGINT) AS nt
        |  FROM documents),
        |o AS (SELECT doc_id, nt,
        |    CAST(sum(nt) OVER (ORDER BY doc_id) - nt AS BIGINT) AS off FROM n),
        |spans AS (
        |  SELECT doc_id, off, nt, unnest(range(off // 128, (off + nt - 1) // 128 + 1)) AS chunk
        |  FROM o)
        |SELECT CAST(chunk AS BIGINT) AS chunk_id,
        |  CAST(sum(least((chunk + 1) * 128, off + nt) - greatest(chunk * 128, off)) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM spans GROUP BY chunk ORDER BY chunk""".stripMargin,
    // G.711 expansion replayed in integer arithmetic: μ-law (even doc_id)
    // complements the byte then expands segment exp/mantissa with bias 132;
    // A-law (odd) XORs 0x55 and shifts segments; both are then normalized
    // exactly like the engine's PCM16 path (floor(pcm/256) + 128)
    "q69_g711_features" ->
      """SELECT doc_id,
        |  CAST(CAST(floor(pcm / 256.0) AS INT) + 128 AS DOUBLE) AS mean_c0,
        |  CAST(0.0 AS DOUBLE) AS var_c0
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN
        |      CASE WHEN u >= 128 THEN -umag ELSE umag END
        |    ELSE
        |      CASE WHEN a >= 128 THEN amag ELSE -amag END
        |    END AS pcm
        |  FROM (
        |    SELECT doc_id, u, a,
        |      (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))) - 132 AS umag,
        |      CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
        |           ELSE ((a % 16) * 16 + 264) * (1 << ((a // 16) % 8 - 1)) END AS amag
        |    FROM (SELECT doc_id, 255 - (doc_id % 200) AS u,
        |                 xor(doc_id % 200, 85) AS a FROM documents)
        |  )
        |)""".stripMargin,
    // Vorbis fixtures are silent by construction (zero VQ delta), so every
    // column is integer closed-form: the lapped sample count per block plan
    // (joins of n/4 + n/4, end-granule clamp on pattern 3) and the floor-Y
    // sum the decoder recovers through the in-band Huffman codebooks
    "q93_vorbis_pcm" ->
      """SELECT doc_id,
        |  CAST(8000 + 100 * (m % 7) AS INT) AS sample_rate,
        |  CAST(1 + m % 2 AS INT) AS channels,
        |  CAST(CASE m % 4 WHEN 0 THEN 96 WHEN 1 THEN 288 WHEN 2 THEN 512 ELSE 50 END AS BIGINT) AS n_samples,
        |  CAST(CASE m % 4 WHEN 0 THEN 4 WHEN 1 THEN 4 WHEN 2 THEN 5 ELSE 3 END AS INT) AS n_packets,
        |  CAST((CASE m % 4 WHEN 2 THEN 5 WHEN 3 THEN 3 ELSE 4 END) * (1 + m % 2)
        |       * ((m % 256) + ((m * 3) % 256) + (m % 4)) AS BIGINT) AS floor_y_sum,
        |  CAST(0 AS BIGINT) AS sum_abs_micro
        |FROM (SELECT doc_id, doc_id % 200 AS m FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // dHash replay: stripes land exactly on the 9×8 grid cells, bright tone
    // (BT.601 luma ≈ 159) for pattern bit 1, dark (≈ 21) for 0, so bit
    // cy·8+cx is set iff p has a 1→0 transition at cx — one byte per grid row
    "q71_image_dhash" ->
      """SELECT doc_id, dhash,
        |  COUNT(*) OVER (PARTITION BY dhash) AS n_same_hash
        |FROM (
        |  SELECT doc_id,
        |    72340172838076673 * ((p & ~(p >> 1)) & 255) AS dhash
        |  FROM (SELECT doc_id, (doc_id % 200) % 100 AS p FROM documents)
        |)""".stripMargin,
    // closed-form hashes (one edge-mask byte per grid row, generated term
    // per row; odd docs substitute the bit-0-flipped pattern's mask in their
    // perturbed row), then a brute-force popcount join over all pairs — the
    // LSH result must equal it exactly (full recall at hamming <= 3, no
    // bucket cap trips at this corpus size)
    "q72_image_near_dups" -> {
      def e(x: String) = s"(($x) & ~(($x) >> 1) & 255)"
      val terms = (0 until 8).map { r =>
        val p = s"((m0 + ${17 * r}) % 128)"
        s"(CASE WHEN m % 2 = 1 AND m % 8 = $r THEN ${e(s"xor($p, 1)")} ELSE ${e(p)} END << ${8 * r})"
      }.mkString("\n        |    + ")
      s"""WITH hsh AS (
        |  SELECT doc_id,
        |    $terms AS dhash
        |  FROM (SELECT doc_id, doc_id % 200 AS m,
        |               (doc_id % 200) - (doc_id % 200) % 2 AS m0 FROM documents)
        |)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |  CAST(bit_count(xor(x.dhash, y.dhash)) AS INT) AS hamming
        |FROM hsh x JOIN hsh y ON x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.dhash, y.dhash)) <= 3
        |ORDER BY a, b""".stripMargin
    },
    // the nine VP8L encodings decode to either a flat (r,g,b,255) plane or
    // exact half/half red stripes of {r, r+5} — mean r+2.5, variance
    // ((5/2)^2) = 6.25, every value dyadic-exact in float32
    "q73_webp_features" ->
      """SELECT doc_id,
        |  CASE WHEN (doc_id % 200) % 9 IN (2, 3, 5, 7, 8)
        |       THEN 10 + doc_id % 200 + 2.5
        |       ELSE CAST(10 + doc_id % 200 AS DOUBLE) END AS mean_r,
        |  CAST((doc_id % 200 + 60) % 256 AS DOUBLE) AS mean_g,
        |  CAST((doc_id % 200 + 120) % 256 AS DOUBLE) AS mean_b,
        |  255.0 AS mean_a,
        |  CASE WHEN (doc_id % 200) % 9 IN (2, 3, 5, 7, 8)
        |       THEN 6.25 ELSE 0.0 END AS var_sum
        |FROM documents""".stripMargin,
    // the six ICO layouts decode to flat (r,g,b) with alpha 255 (opaque
    // mask), 127.5 (half-transparent via AND mask or 32-bit XOR alpha), or
    // a 1-channel flat-gray PNG entry; alpha variance 127.5^2 = 16256.25,
    // every value dyadic-exact in float32
    // every dimension is a closed-form function of doc_id; the svg branch
    // alternates attr-carried and viewBox-fallback dims by the same parity
    // the query uses
    "q75_svg_avif_sniff" ->
      """WITH m AS (SELECT doc_id, doc_id % 200 AS m FROM documents)
        |SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'svg' WHEN 1 THEN 'avif' ELSE 'heif' END AS format,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN m + 10 WHEN 1 THEN m + 100 ELSE m + 320 END AS INT) AS width,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN m % 40 + 8 WHEN 1 THEN m % 50 + 60
        |       ELSE m % 30 + 240 END AS INT) AS height
        |FROM m""".stripMargin,
    // animated fixtures: frames = m%5+2 descriptors each carrying a GCE
    // delay of m%9+1 centiseconds; static fixtures have one descriptor, no
    // GCE, so duration is 0
    "q76_gif_anim_meta" ->
      """WITH m AS (SELECT doc_id, doc_id % 200 AS m FROM documents)
        |SELECT doc_id, 'gif' AS format,
        |  CAST(CASE WHEN m % 2 = 0 THEN (m % 5 + 2) * (m % 9 + 1) * 10 ELSE 0 END AS BIGINT) AS duration_ms,
        |  CAST(12 AS INT) AS width, CAST(6 AS INT) AS height,
        |  CAST(CASE WHEN m % 2 = 0 THEN m % 5 + 2 ELSE 1 END AS INT) AS frames
        |FROM m""".stripMargin,
    // fixture parameters replayed directly; the JPEG-vs-TIFF wrapping and
    // the sub-IFD relocation must be invisible in the extracted values
    "q79_exif_meta" ->
      """WITH m AS (SELECT doc_id, doc_id % 200 AS m FROM documents)
        |SELECT doc_id,
        |  CAST(m % 8 + 1 AS INT) AS orientation,
        |  (m % 3 = 0) AS has_gps,
        |  'Cam' || (m % 10) AS make,
        |  '2020:01:' || lpad(CAST(m % 28 + 1 AS VARCHAR), 2, '0') || ' 10:00:00' AS datetime
        |FROM m""".stripMargin,
    // every field closed-form from doc_id: the engine lowercases robots,
    // decodes the &amp; entity, collapses title whitespace, and ignores the
    // body's spam meta — the oracle states the post-normalization values
    "q78_html_meta" ->
      """WITH m AS (SELECT doc_id, doc_id % 200 AS m FROM documents)
        |SELECT doc_id,
        |  CASE WHEN m % 5 = 0 THEN 'T & ' || m ELSE 'Title ' || m END AS title,
        |  CASE WHEN m % 3 <> 0 THEN 'https://ex.com/c/' || (m % 40) END AS canonical,
        |  CASE m % 4 WHEN 0 THEN 'noindex, nofollow' WHEN 1 THEN 'index, follow' END AS robots,
        |  CASE WHEN m % 7 = 0 THEN NULL
        |       ELSE CASE m % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END END AS lang,
        |  (m % 4 = 0) AS noindex,
        |  CASE WHEN m % 3 <> 0 THEN 'https://ex.com/c/' || (m % 40)
        |       ELSE 'https://ex.com/u/' || doc_id END AS dedup_key
        |FROM m""".stripMargin,
    // apng: frames = m%4+2 each delaying (m%7+1)/100 s → (m%7+1)·10 ms;
    // webp: frames = m%5+2 each lasting m%11+1 ms
    "q77_anim_meta" ->
      """WITH m AS (SELECT doc_id, doc_id % 200 AS m FROM documents)
        |SELECT doc_id,
        |  CASE WHEN m % 2 = 0 THEN 'png' ELSE 'webp' END AS format,
        |  CAST(CASE WHEN m % 2 = 0 THEN (m % 4 + 2) * (m % 7 + 1) * 10
        |       ELSE (m % 5 + 2) * (m % 11 + 1) END AS BIGINT) AS duration_ms,
        |  CAST(CASE WHEN m % 2 = 0 THEN 10 + m % 30 ELSE 12 + m % 20 END AS INT) AS width,
        |  CAST(CASE WHEN m % 2 = 0 THEN 8 ELSE 9 END AS INT) AS height,
        |  CAST(CASE WHEN m % 2 = 0 THEN m % 4 + 2 ELSE m % 5 + 2 END AS INT) AS frames
        |FROM m""".stripMargin,
    "q74_ico_features" ->
      """SELECT doc_id,
        |  CASE WHEN (doc_id % 200) % 6 = 3 THEN CAST(doc_id % 200 AS DOUBLE)
        |       ELSE CAST(10 + doc_id % 200 AS DOUBLE) END AS mean_1,
        |  CASE WHEN (doc_id % 200) % 6 = 3 THEN 0.0
        |       ELSE CAST((doc_id % 200 + 60) % 256 AS DOUBLE) END AS mean_2,
        |  CASE WHEN (doc_id % 200) % 6 = 3 THEN 0.0
        |       ELSE CAST((doc_id % 200 + 120) % 256 AS DOUBLE) END AS mean_3,
        |  CASE WHEN (doc_id % 200) % 6 = 3 THEN 0.0
        |       WHEN (doc_id % 200) % 6 IN (1, 5) THEN 127.5
        |       ELSE 255.0 END AS mean_4,
        |  CASE WHEN (doc_id % 200) % 6 IN (1, 5) THEN 16256.25
        |       ELSE 0.0 END AS var_sum
        |FROM documents""".stripMargin,
    "q67_tiff_features" ->
      """SELECT doc_id,
        |  CAST(doc_id % 200 AS DOUBLE) AS mean_1,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE (doc_id % 200 + 60) % 256 END AS DOUBLE) AS mean_2,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE (doc_id % 200 + 120) % 256 END AS DOUBLE) AS mean_3,
        |  0.0 AS rest
        |FROM documents""".stripMargin,
    "q66_bmp_features" ->
      """SELECT doc_id,
        |  CAST(doc_id % 200 AS DOUBLE) AS mean_r,
        |  CAST((doc_id % 200 + 60) % 256 AS DOUBLE) AS mean_g,
        |  CAST((doc_id % 200 + 120) % 256 AS DOUBLE) AS mean_b,
        |  0.0 AS rest
        |FROM documents""".stripMargin,
    "q65_image_sniff" ->
      """SELECT doc_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'bmp' WHEN 1 THEN 'tiff' ELSE 'webp' END AS format,
        |  CAST(doc_id % 200 + 100 AS INT) AS width,
        |  CAST(doc_id % 200 % 50 + 60 AS INT) AS height
        |FROM documents""".stripMargin,
    "q64_ogg_meta" ->
      """SELECT doc_id, 'ogg' AS format,
        |  CAST((doc_id % 200 + 1) * 10 AS BIGINT) AS duration_ms,
        |  CAST(44100 AS INT) AS sample_rate,
        |  CAST(doc_id % 200 % 2 + 1 AS INT) AS channels
        |FROM documents""".stripMargin,
    "q57_dsir_weights" -> q57OracleSql,
    // the engine's splitmix64 hashing replayed exactly in DuckDB (UBIGINT
    // wrap arithmetic; see USql64) — deterministic functions deserve a
    // full value oracle, not a rows-only check
    "q14_simhash" -> q14OracleSql,
    "q15_rolling_fingerprint" -> q15OracleSql,
    // the FULL minhash-LSH pipeline (signature, banding, candidate join,
    // estimate) replayed in UBIGINT wrap arithmetic — candidate SET and
    // estimate VALUES both oracle-checked, not rows-only
    "q13_minhash_near_dups" -> minhashOracleSql(
      """SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, substring(text, instr(text, ' ') + 1) FROM documents""".stripMargin,
      0.5, "a, b, round(ej, 4) AS est_sim"),
    "q31_near_dup_pairs" -> minhashOracleSql(
      "SELECT doc_id, text FROM documents", 0.5, "a, b, round(ej, 4) AS est_jaccard"),
    // block-permuted multi-table SimHash guarantees the EXACT hamming<=3 pair
    // set (pigeonhole recall + popcount verify), so the oracle is the brute
    // force over the same splitmix64 simhash replayed in SQL
    "q32_simhash_near_dups" -> q32OracleSql,
    // exact token-3-shingle Jaccard over string shingles (hash-free mirror of
    // TextHash.shingleJaccard — identical cardinalities absent 64-bit hash
    // collisions); q33's banding gives total candidate recall on this corpus
    "q33_verified_near_dups" ->
      """WITH s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |)
        |SELECT a, b, jaccard FROM (
        |  SELECT x.doc_id AS a, y.doc_id AS b,
        |    round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |      / len(list_distinct(x.sh || y.sh)), 4) AS jaccard
        |  FROM s x JOIN s y ON x.doc_id < y.doc_id
        |) WHERE jaccard >= 0.8 ORDER BY a, b""".stripMargin,
    // the full cluster-dedup pipeline replayed in SQL: string-shingle Jaccard
    // pair graph (J >= 0.8) over the same constructed corpus, transitive
    // closure via a recursive CTE, keep the min id per component
    "q39_dedup_cc" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, substring(text, strpos(text, ' ') + 1) FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |         substring(substring(text, strpos(text, ' ') + 1),
        |                   strpos(substring(text, strpos(text, ' ') + 1), ' ') + 1)
        |  FROM documents
        |),
        |s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM base)
        |),
        |p AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b
        |  FROM s x JOIN s y ON x.doc_id < y.doc_id
        |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |        / len(list_distinct(x.sh || y.sh)) >= 0.8
        |),
        |edges AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
        |reach(src, node) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
        |),
        |comp AS (SELECT src AS id, min(node) AS component FROM reach GROUP BY src)
        |SELECT doc_id FROM base
        |WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
        |ORDER BY doc_id""".stripMargin,
    // every constructed perturbed pair (cosine ≈ 0.99) and nothing else — the
    // originals' max pairwise cosine is far below the 0.95 threshold
    "q34_embedding_near_dups" ->
      "SELECT vec_id AS a, vec_id + 1000000 AS b FROM embeddings ORDER BY a",
    // CC over exactly those pairs keeps the min id of each {v, v+1M} cluster
    "q41_embedding_dedup_cc" ->
      "SELECT vec_id FROM embeddings ORDER BY vec_id",
    // full replay: centroid literals -> argmax assignment -> within-cluster
    // earlier-member drop rule (see q80OracleSql)
    "q80_semdedup" -> q80OracleSql,
    // the canonical form in closed form: lowercase scheme/host, default port
    // gone, path case PRESERVED (paths are case-sensitive), tracking params
    // dropped, kept params sorted ('a=' < 'z=' in binary order), fragment gone
    "q43_url_canonicalize" ->
      """SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
        |  || '://www.example' || CAST(doc_id % 7 AS VARCHAR) || '.com'
        |  || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '/Path/' || CAST(doc_id % 5 AS VARCHAR) END)
        |  || '?a=' || CAST(doc_id % 4 AS VARCHAR) || '&z=' || CAST(doc_id % 9 AS VARCHAR) AS canon
        |FROM documents""".stripMargin,
    "q42_token_quantiles" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(n) AS INT) AS min_tok, CAST(max(n) AS INT) AS max_tok,
        |  round(quantile_cont(n, 0.5), 4) AS p50,
        |  round(quantile_cont(n, 0.9), 4) AS p90,
        |  round(quantile_cont(n, 0.99), 4) AS p99
        |FROM (SELECT len(string_split(text, ' ')) AS n FROM documents)""".stripMargin,
    // corpus-level golden for the sfDir-independent fixture extraction: the
    // digest pins byte-identity of all 877 valid extractions (FIXTURES.md
    // golden discipline — regenerate ONLY on deliberate semantic change)
    "q24_fixture_extract" ->
      """SELECT CAST(877 AS BIGINT) AS n_docs,
        |  '781ff347dc4b38ef96ff2183fe2d64e34fc5370193770496992142bbe8f772d7' AS corpus_digest""".stripMargin,
    "q35_hocr_spans" ->
      """SELECT doc_id, 1 AS page,
        |  CAST(pos*100 AS INT) AS x1, 50 AS y1,
        |  CAST(pos*100+80 AS INT) AS x2, 62 AS y2, word
        |FROM (SELECT doc_id,
        |        unnest(string_split(text,' ')) AS word,
        |        unnest(range(len(string_split(text,' ')))) AS pos
        |      FROM documents)""".stripMargin,
    "q36_error_class" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 1 THEN 'error' ELSE 'extracted' END AS status,
        |  CASE WHEN doc_id % 3 = 1 THEN 'pdf_no_objects' ELSE NULL END AS error_class
        |FROM documents""".stripMargin,
    "q20_pdf_preflight" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 1 THEN false ELSE true END AS is_pdf,
        |  CASE WHEN doc_id % 3 = 2 THEN true ELSE false END AS encrypted
        |FROM documents""".stripMargin
  )
}
