package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen entry point: one fused pass for dot and both norms. */
object VectorExprRuntime {
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  def sigMatchCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var eq = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    eq
  }

  private def dot(v: ArrayData, p: Array[Double]): Double = {
    val n = math.min(v.numElements(), p.length)
    var d = 0.0
    var i = 0
    while (i < n) { d += v.getDouble(i) * p(i); i += 1 }
    d
  }

  /** Sign-bit bucket id over the plane set (plane order = bit order, MSB
    * first — matches the fold `acc * 2 + bit`). */
  def lshBucket(v: ArrayData, planes: Array[Array[Double]]): Int = {
    var bucket = 0
    var p = 0
    while (p < planes.length) {
      bucket = bucket * 2 + (if (dot(v, planes(p)) > 0) 1 else 0)
      p += 1
    }
    bucket
  }

  /** Index of the max-dot centroid; ties keep the FIRST index (the
    * array_position(array_max) convention this replaces). */
  def argMaxDot(v: ArrayData, cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cs.length) {
      val d = dot(v, cs(c))
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  /** Index of the min-L2 centroid (plain Lloyd assignment — PQ subspace
    * quantizers are Euclidean, NOT cosine); ties keep the first index. */
  def argMinL2(v: ArrayData, cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      val p = cs(c)
      var d = 0.0
      var i = 0
      val n = math.min(v.numElements(), p.length)
      while (i < n) { val x = v.getDouble(i) - p(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Product-quantization encode: per subspace s the argmin-L2 code against
    * books(s) (ties → first index), one byte per subspace. Subspace s covers
    * vector positions [s·dsub, (s+1)·dsub). */
  def pqEncode(v: ArrayData, books: Array[Array[Array[Double]]]): Array[Byte] = {
    val out = new Array[Byte](books.length)
    var off = 0
    var s = 0
    while (s < books.length) {
      val cb = books(s)
      val dsub = if (cb.length > 0) cb(0).length else 0
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val x = (if (off + i < v.numElements()) v.getDouble(off + i) else 0.0) - cb(c)(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      off += dsub
      s += 1
    }
    out
  }

  /** Asymmetric-distance cosine: the float query against a PQ-coded
    * neighbor — Σ_s dot(q_s, c_s[code_s]) / ‖concat(c_s[code_s])‖. The
    * query's own norm is constant per query and dropped (ordering only). */
  def pqAdcCosine(q: ArrayData, codes: Array[Byte], books: Array[Array[Array[Double]]]): Double = {
    var acc = 0.0
    var nrm = 0.0
    var off = 0
    var s = 0
    val m = math.min(books.length, codes.length)
    while (s < m) {
      val cb = books(s)
      val dsub = if (cb.length > 0) cb(0).length else 0
      val cvec = cb((codes(s) & 0xff) % math.max(1, cb.length))
      var i = 0
      while (i < dsub) {
        val cx = cvec(i)
        acc += (if (off + i < q.numElements()) q.getDouble(off + i) else 0.0) * cx
        nrm += cx * cx
        i += 1
      }
      off += dsub
      s += 1
    }
    if (nrm == 0.0) 0.0 else acc / math.sqrt(nrm)
  }

  /** The nProbe centroid indices by descending dot, ties by ascending index —
    * the array_sort(struct(-dot, idx)) convention this replaces. */
  def topDotIndices(v: ArrayData, cs: Array[Array[Double]], nProbe: Int): ArrayData = {
    val k = cs.length
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) { dots(c) = dot(v, cs(c)); c += 1 }
    val idx = Array.range(0, k).sortBy(i => (-dots(i), i))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      idx.take(math.min(math.max(nProbe, 0), k)).map(Int.box(_): Any))
  }
}

/**
 * Cosine similarity of two array<double> columns as a NATIVE expression.
 * The builtin-composition form — `aggregate(zip_with(...))` three times —
 * is interpreted (higher-order functions never enter whole-stage codegen)
 * and allocates a zipped array per aggregate; on LSH-candidate verify paths
 * that costs tens of microseconds per pair. This expression is one fused
 * primitive loop (same accumulation order as the fold — bit-identical
 * results on equal-width, non-null vectors, the embedding contract).
 */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<double> inputs, got $l and $r")
  }
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorExprRuntime.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorExprRuntime.cosine($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Count of positions where two array<long> signatures agree (the MinHash
  * Jaccard estimator's numerator) — native loop; the aggregate(zip_with(...))
  * form is interpreted per candidate pair. */
case class SigMatchCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sig_match_count expects two array<long> inputs, got $l and $r")
  }
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorExprRuntime.sigMatchCount(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorExprRuntime.sigMatchCount($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigMatchCount =
    copy(left = newLeft, right = newRight)
}

/** Base for expressions carrying a constant plane/centroid matrix: the matrix
  * rides the plan as a referenced object (ctx.addReferenceObj), never as a
  * typedlit array whose dots would evaluate interpreted per row. Stored as
  * Seq for sane case-class equality; converted once per task. */
sealed trait MatrixExpr extends Expression {
  def matrix: Seq[Seq[Double]]
  @transient protected lazy val matrixArr: Array[Array[Double]] = matrix.map(_.toArray).toArray
  protected def vecTypeOk(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
}

/** LSH sign-bit bucket of an array<double> vector against constant planes. */
case class LshBucketExpr(child: Expression, matrix: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with MatrixExpr {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (vecTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"lsh_bucket expects array<double>, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    VectorExprRuntime.lshBucket(input.asInstanceOf[ArrayData], matrixArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", matrixArr, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorExprRuntime.lshBucket($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

/** argmax-dot list assignment against constant unit centroids (IVF). */
case class ArgMaxDotExpr(child: Expression, matrix: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with MatrixExpr {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (vecTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"argmax_dot expects array<double>, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    VectorExprRuntime.argMaxDot(input.asInstanceOf[ArrayData], matrixArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", matrixArr, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorExprRuntime.argMaxDot($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): ArgMaxDotExpr =
    copy(child = newChild)
}

/** min-L2 assignment against constant centroids (PQ subspace Lloyd). */
case class ArgMinL2Expr(child: Expression, matrix: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with MatrixExpr {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (vecTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"argmin_l2 expects array<double>, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    VectorExprRuntime.argMinL2(input.asInstanceOf[ArrayData], matrixArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", matrixArr, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorExprRuntime.argMinL2($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): ArgMinL2Expr =
    copy(child = newChild)
}

/** Base for expressions carrying constant PQ codebooks (m × ksub × dsub) as
  * a referenced plan object — same rationale as MatrixExpr. */
sealed trait BooksExpr extends Expression {
  def books: Seq[Seq[Seq[Double]]]
  @transient protected lazy val booksArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
}

/** PQ encode: one byte per subspace (argmin-L2 code) — the compressed
  * vector the candidate join shuffles instead of dim doubles. */
case class PqEncodeExpr(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with BooksExpr {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_encode expects array<double>, got $t")
  }
  override protected def nullSafeEval(input: Any): Any =
    VectorExprRuntime.pqEncode(input.asInstanceOf[ArrayData], booksArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", booksArr, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorExprRuntime.pqEncode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Asymmetric-distance cosine of a float query against a PQ code. */
case class PqAdcCosineExpr(left: Expression, right: Expression, books: Seq[Seq[Seq[Double]]])
    extends BinaryExpression with BooksExpr {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_cosine expects (array<double>, binary), got $l and $r")
  }
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorExprRuntime.pqAdcCosine(l.asInstanceOf[ArrayData], r.asInstanceOf[Array[Byte]], booksArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", booksArr, "double[][][]")
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorExprRuntime.pqAdcCosine($a, $b, $ref)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcCosineExpr =
    copy(left = newLeft, right = newRight)
}

/** Top-nProbe centroid indices by dot (IVF probe lists). */
case class TopDotIndicesExpr(child: Expression, matrix: Seq[Seq[Double]], nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with MatrixExpr {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (vecTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"top_dot expects array<double>, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    VectorExprRuntime.topDotIndices(input.asInstanceOf[ArrayData], matrixArr, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", matrixArr, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorExprRuntime.topDotIndices($c, $ref, $nProbe)")
  }
  override protected def withNewChildInternal(newChild: Expression): TopDotIndicesExpr =
    copy(child = newChild)
}
