package graft.expr

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {

  private def arr(xs: Double*) = new GenericArrayData(xs.toArray)
  private def larr(xs: Long*) = new GenericArrayData(xs.toArray)

  test("cosine: fused loop matches the fold-left definition bit-for-bit") {
    val a = Seq(0.3, -1.2, 4.5, 0.0, 2.2)
    val b = Seq(1.1, 0.7, -0.4, 3.3, -2.0)
    def fold(x: Seq[Double], y: Seq[Double]) = x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
    val expected = fold(a, b) / (math.sqrt(fold(a, a)) * math.sqrt(fold(b, b)))
    assert(VectorExprRuntime.cosine(arr(a: _*), arr(b: _*)) == expected)
    // identical vectors → exactly 1 up to the division
    val c = VectorExprRuntime.cosine(arr(a: _*), arr(a: _*))
    assert(math.abs(c - 1.0) < 1e-15)
  }

  test("lshBucket: plane order is bit order, MSB first; zero dot is bit 0") {
    val planes = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.0))
    // v = (2, -3): dots = 2 (pos→1), -3 (neg→0), -2 (neg→0) → 0b100 = 4
    assert(VectorExprRuntime.lshBucket(arr(2.0, -3.0), planes) == 4)
    // zero vector: all dots 0, strictly-positive test → bucket 0
    assert(VectorExprRuntime.lshBucket(arr(0.0, 0.0), planes) == 0)
  }

  test("argMaxDot keeps the FIRST index on ties") {
    val cs = Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    assert(VectorExprRuntime.argMaxDot(arr(5.0, 0.0), cs) == 0) // tie 0 vs 1 → 0
    assert(VectorExprRuntime.argMaxDot(arr(0.0, 5.0), cs) == 2)
  }

  test("topDotIndices: descending dot, ascending index on ties, clamped nProbe") {
    val cs = Array(Array(1.0, 0.0), Array(0.5, 0.5), Array(1.0, 0.0), Array(0.0, 1.0))
    val got = VectorExprRuntime.topDotIndices(arr(2.0, 0.0), cs, 3)
    // dots: 2.0, 1.0, 2.0, 0.0 → order 0, 2 (tie by index), 1
    assert(got.toIntArray().toSeq == Seq(0, 2, 1))
    assert(VectorExprRuntime.topDotIndices(arr(2.0, 0.0), cs, 99).numElements() == 4)
  }

  test("sigMatchCount counts equal positions over the shared prefix") {
    assert(VectorExprRuntime.sigMatchCount(larr(1L, 2L, 3L, 4L), larr(1L, 9L, 3L, 4L)) == 3)
    assert(VectorExprRuntime.sigMatchCount(larr(), larr(1L)) == 0)
  }
}
