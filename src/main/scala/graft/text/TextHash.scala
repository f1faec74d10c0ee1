package graft.text

/**
 * Deterministic text hashing primitives for large-scale dedup:
 *
 * - simhash64: 64-bit SimHash over whitespace tokens (Charikar 2002, as used in
 *   Manku et al., WWW'07 near-dup detection): per-token 64-bit hash votes ±1 per
 *   bit; sign of the vote vector is the fingerprint. Near-dups have small
 *   Hamming distance.
 * - minhash: H independent min-hashes over token k-shingles (Broder 1997).
 *   Signature similarity estimates Jaccard similarity of shingle sets; banding
 *   the signature gives LSH buckets for candidate-pair generation.
 * - rollingFingerprint: minimum 64-bit rolling hash over token n-grams — a
 *   one-value winnowing-style document fingerprint.
 *
 * All hashing is splitmix64-based on the token bytes — no JVM hashCode
 * (which is stable but weak), no locale, no RNG state; identical results on
 * any executor, any partition count.
 */
object TextHash {

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit hash of a string region via splitmix over 8-byte chunks of UTF-16 chars. */
  def hashToken(s: String, from: Int, until: Int, seed: Long): Long = {
    var h = mix(seed ^ (until - from).toLong)
    var i = from
    while (i < until) {
      h = mix(h ^ s.charAt(i).toLong)
      i += 1
    }
    h
  }

  private def tokenBounds(text: String): Array[Int] = {
    // flat array of (start, end) pairs for whitespace-separated tokens
    val out = new scala.collection.mutable.ArrayBuffer[Int](64)
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && text.charAt(i).isWhitespace) i += 1
      if (i < n) {
        val s = i
        while (i < n && !text.charAt(i).isWhitespace) i += 1
        out += s; out += i
      }
    }
    out.toArray
  }

  /** SimHash64 over whitespace tokens. Empty text → 0L. */
  def simhash64(text: String): Long = {
    if (text == null || text.isEmpty) return 0L
    val b = tokenBounds(text)
    if (b.length == 0) return 0L
    val votes = new Array[Int](64)
    var t = 0
    while (t < b.length) {
      val h = hashToken(text, b(t), b(t + 1), 0x5151L)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      t += 2
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Hash of the k-shingle starting at token index ti (combining k token hashes). */
  private def shingleHash(text: String, b: Array[Int], ti: Int, k: Int): Long = {
    var h = 0x9e3779b97f4a7c15L
    var j = 0
    while (j < k) {
      h = mix(h ^ hashToken(text, b((ti + j) * 2), b((ti + j) * 2 + 1), 0x7a7aL))
      j += 1
    }
    h
  }

  /** MinHash signature: H values, each the min over shingles of mix(seed_i ^ shingle).
    * Documents with fewer than k tokens use a single whole-text shingle so the
    * signature is still defined. */
  def minhash(text: String, numHashes: Int, shingleSize: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (text == null || text.isEmpty) return sig
    val b = tokenBounds(text)
    val nTok = b.length / 2
    val nShingles = math.max(1, nTok - shingleSize + 1)
    val effK = math.min(shingleSize, math.max(1, nTok))
    var ti = 0
    while (ti < nShingles) {
      val sh = if (nTok == 0) mix(0x1234L) else shingleHash(text, b, ti, effK)
      var hi = 0
      while (hi < numHashes) {
        val v = mix(sh ^ (hi.toLong * 0xabcdef1234567L + 1L))
        if (v < sig(hi)) sig(hi) = v
        hi += 1
      }
      ti += 1
    }
    sig
  }

  /** Estimated Jaccard similarity from two signatures. */
  def minhashSim(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** Exact Jaccard over token k-shingle sets (the truth MinHash estimates). */
  def shingleJaccard(x: String, y: String, k: Int): Double = {
    def set(t: String): Set[Long] = {
      if (t == null) return Set.empty
      val b = tokenBounds(t)
      val nTok = b.length / 2
      // token-less text has an empty shingle set (mirrors the minhash guard);
      // without this the forced single shingleHash indexes an empty bounds array
      if (nTok == 0) return Set.empty
      val effK = math.min(k, nTok)
      val n = math.max(1, nTok - k + 1)
      (0 until n).map(ti => shingleHash(t, b, ti, effK)).toSet
    }
    val (sx, sy) = (set(x), set(y))
    if (sx.isEmpty && sy.isEmpty) 1.0
    else (sx & sy).size.toDouble / (sx | sy).size
  }

  /** LSH band keys: signature split into bands of `rows`; each band hashed to a key.
    * Near-dups (high estimated Jaccard) collide on ≥1 band key. */
  def bandKeys(sig: Array[Long], rows: Int): Array[Long] = {
    val nBands = sig.length / rows
    val out = new Array[Long](nBands)
    var bnd = 0
    while (bnd < nBands) {
      var h = mix(bnd.toLong ^ 0xbeefL)
      var r = 0
      while (r < rows) { h = mix(h ^ sig(bnd * rows + r)); r += 1 }
      out(bnd) = h
      bnd += 1
    }
    out
  }

  /** Public splitmix64 finalizer (deterministic sampling keys). */
  def mix64(z: Long): Long = mix(z)

  /** The tokens tokenBounds delimits, as strings — THE token model every
    * position-indexed op must share with ngramHashes (a regex "\\s+" split
    * disagrees on Unicode whitespace like U+2028/U+3000 and silently
    * misaligns token indices against gram positions). */
  def wsTokens(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val b = tokenBounds(text)
    val out = new Array[String](b.length / 2)
    var t = 0
    while (t < b.length) { out(t / 2) = text.substring(b(t), b(t + 1)); t += 2 }
    out
  }

  /** ALL token n-gram hashes in document order (decontamination overlap,
    * repetition statistics). STRICT window semantics: fewer than n tokens →
    * EMPTY (unlike rollingFingerprint's forced single shortened gram — a
    * 5-token doc must never collide with a benchmark 13-gram). */
  def ngramHashes(text: String, n: Int): Array[Long] = {
    if (text == null || text.isEmpty) return Array.emptyLongArray
    val b = tokenBounds(text)
    val nTok = b.length / 2
    if (nTok < n) return Array.emptyLongArray
    val out = new Array[Long](nTok - n + 1)
    var ti = 0
    while (ti < out.length) { out(ti) = shingleHash(text, b, ti, n); ti += 1 }
    out
  }

  /** Winnowing-style fingerprint: min rolling hash over token n-grams. */
  def rollingFingerprint(text: String, n: Int): Long = {
    if (text == null || text.isEmpty) return 0L
    val b = tokenBounds(text)
    val nTok = b.length / 2
    if (nTok == 0) return 0L
    val nGrams = math.max(1, nTok - n + 1)
    val effN = math.min(n, nTok)
    var min = Long.MaxValue
    var ti = 0
    while (ti < nGrams) {
      val h = shingleHash(text, b, ti, effN)
      if (h < min) min = h
      ti += 1
    }
    min
  }
}
