package graft.text

import org.scalatest.funsuite.AnyFunSuite

class TextHashSpec extends AnyFunSuite {

  private def words(seed: Long, n: Int): String = {
    var z = seed
    def next(): Long = { z ^= z << 13; z ^= z >>> 7; z ^= z << 17; z }
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi")
    (0 until n).map(_ => vocab(java.lang.Math.floorMod(next(), vocab.length.toLong).toInt)).mkString(" ")
  }

  test("simhash: identical text → identical hash; near-dup → small hamming; unrelated → large") {
    val a = words(1, 200)
    val aDup = a // identical
    val aNear = a.split(' ').drop(2).mkString(" ") // drop 2 of 200 tokens
    // disjoint vocabulary: simhash measures bag-of-words similarity, so an
    // "unrelated" doc must not share tokens (same-vocab word salad is ~similar)
    val b = words(99, 200).split(' ').map(_ + "zz").mkString(" ")
    assert(TextHash.simhash64(a) == TextHash.simhash64(aDup))
    val near = TextHash.hamming64(TextHash.simhash64(a), TextHash.simhash64(aNear))
    val far = TextHash.hamming64(TextHash.simhash64(a), TextHash.simhash64(b))
    assert(near <= 6, s"near-dup hamming $near")
    assert(far >= 15, s"unrelated hamming $far")
  }

  test("minhash: signature similarity tracks exact shingle Jaccard") {
    (1 to 20).foreach { seed =>
      val x = words(seed, 150)
      // mutate a fraction of tokens
      val toks = x.split(' ')
      val y = toks.zipWithIndex.map { case (w, i) => if (i % 10 == 0) w + "x" else w }.mkString(" ")
      val exact = TextHash.shingleJaccard(x, y, 3)
      val est = TextHash.minhashSim(TextHash.minhash(x, 128, 3), TextHash.minhash(y, 128, 3))
      assert(math.abs(exact - est) < 0.15, s"seed=$seed exact=$exact est=$est")
    }
  }

  test("minhash: identical → sim 1.0; disjoint → sim ~0") {
    val x = words(3, 100)
    val z = words(777, 100).split(' ').map(_ + "qq").mkString(" ")
    assert(TextHash.minhashSim(TextHash.minhash(x, 64, 3), TextHash.minhash(x, 64, 3)) == 1.0)
    assert(TextHash.minhashSim(TextHash.minhash(x, 64, 3), TextHash.minhash(z, 64, 3)) < 0.1)
  }

  test("LSH banding: near-dups (J>=0.8) collide on >=1 band; most unrelated don't") {
    var nearCollisions = 0
    var farCollisions = 0
    (1 to 30).foreach { seed =>
      val x = words(seed * 13, 200)
      val toks = x.split(' ')
      val near = toks.take(toks.length - 6).mkString(" ") // drop 6/200 tokens
      val far = words(seed * 13 + 7, 200)
      val bx = TextHash.bandKeys(TextHash.minhash(x, 64, 3), 8).toSet
      val bn = TextHash.bandKeys(TextHash.minhash(near, 64, 3), 8).toSet
      val bf = TextHash.bandKeys(TextHash.minhash(far, 64, 3), 8).toSet
      if ((bx & bn).nonEmpty) nearCollisions += 1
      if ((bx & bf).nonEmpty) farCollisions += 1
    }
    assert(nearCollisions >= 27, s"near recall $nearCollisions/30")
    assert(farCollisions <= 2, s"far false positives $farCollisions/30")
  }

  test("edge cases: empty, single token, fewer tokens than shingle size") {
    assert(TextHash.simhash64("") == 0L)
    assert(TextHash.simhash64(null) == 0L)
    TextHash.minhash("one", 16, 3) // must not throw
    TextHash.minhash("one two", 16, 3)
    assert(TextHash.rollingFingerprint("", 8) == 0L)
    assert(TextHash.rollingFingerprint("single", 8) != 0L)
    // k > token count still deterministic
    assert(TextHash.minhash("a b", 16, 5).toSeq == TextHash.minhash("a b", 16, 5).toSeq)
  }

  test("shingleJaccard: total on empty/whitespace-only text (no bounds crash)") {
    // empty docs share identical minhash signatures → always LSH candidates;
    // the verifier must not kill the task on them
    assert(TextHash.shingleJaccard("", "", 3) == 1.0)
    assert(TextHash.shingleJaccard("   ", " \t\n", 3) == 1.0)
    assert(TextHash.shingleJaccard("", "alpha beta", 3) == 0.0)
    assert(TextHash.shingleJaccard("alpha beta", "  ", 3) == 0.0)
    assert(TextHash.shingleJaccard("alpha beta", "alpha beta", 3) == 1.0)
  }

  test("rolling fingerprint: stable under suffix append beyond window coverage") {
    val x = words(5, 100)
    val fp1 = TextHash.rollingFingerprint(x, 8)
    assert(fp1 == TextHash.rollingFingerprint(x, 8))
    // a doc sharing a long prefix keeps the same min with high probability
    val extended = x + " " + words(6, 5)
    assert(TextHash.rollingFingerprint(extended, 8) <= fp1)
  }
}
