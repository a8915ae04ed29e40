package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd vector folds over `array<double>` columns.
  *
  * The built-in route (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is a
  * HigherOrderFunction: per-element lambda dispatch, never inside
  * whole-stage codegen. For similarity search the dot product is the
  * innermost loop over the entire corpus — at 100 TB it runs trillions of
  * times — so it is the one place a custom `Expression` with `doGenCode`
  * is warranted (SURVEY §2.5 policy: built-ins first, codegen'd
  * Expression only for the measured hot path).
  *
  * Determinism contract: a strict sequential left-fold, bit-identical to
  * the `aggregate`-based fold and to DuckDB's `list_reduce` — results
  * stay oracle-comparable with exact equality.
  *
  * Null semantics match the built-in composition: null array → null;
  * any null element → null (null propagates through `x * y` then the sum).
  * Lengths may differ; the fold runs over the shorter prefix, matching
  * `zip_with`'s null-padding + null-propagation only when the caller
  * guarantees equal lengths (embedding corpora do).
  */
abstract class VectorFold extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  /** Per-element term in Java source, over double vars `x` and `y`. */
  protected def termJava(x: String, y: String): String
  protected def term(x: Double, y: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val n = math.min(arrA.numElements(), arrB.numElements())
    var sum = 0.0
    var k = 0
    while (k < n) {
      if (arrA.isNullAt(k) || arrB.isNullAt(k)) return null
      sum += term(arrA.getDouble(k), arrB.getDouble(k))
      k += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val sum = ctx.freshName("sum")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $k = 0; $k < $n; $k++) {
         |  if ($a.isNullAt($k) || $b.isNullAt($k)) { ${ev.isNull} = true; break; }
         |  double $x = $a.getDouble($k);
         |  double $y = $b.getDouble($k);
         |  $sum += ${termJava(x, y)};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
}

/** Sequential-fold dot product: sum(a[k] * b[k]). */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override protected def termJava(x: String, y: String): String = s"$x * $y"
  override protected def term(x: Double, y: Double): Double = x * y
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sequential-fold squared euclidean distance: sum((a[k]-b[k])^2). */
case class SquaredDistance(left: Expression, right: Expression) extends VectorFold {
  override protected def termJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def term(x: Double, y: Double): Double = (x - y) * (x - y)
  override def prettyName: String = "vec_dist2"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encode step: index of the codeword (array of
  * candidate subvectors, `array<array<double>>`) nearest to `sub` in
  * squared L2, ties to the LOWEST index (strict `<` keeps the earlier
  * candidate). The interpreted-HOF route (`aggregate(transform(...))`)
  * measured ~1.2 ms/vector on the ×10 probe — per-element lambda
  * dispatch across M·K·subdim terms; this compiled nested loop is the
  * same O(M·K·subdim) flops without the dispatch. Same sequential-fold
  * determinism contract as `vec_dist2`: per-candidate distances are
  * bit-identical to DuckDB's fold, so the argmin (with the same
  * tiebreak) is replayable by the windowed-oracle formulation.
  * Caller guarantees dense (non-null-element) vectors — embedding
  * corpora are; null ARRAYS still null-propagate via BinaryExpression.
  */
case class PqArgmin(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_argmin"

  override def checkInputDataTypes(): TypeCheckResult = {
    val okL = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okR = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (okL && okR) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<array<double>>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sub = a.asInstanceOf[ArrayData]
    val cands = b.asInstanceOf[ArrayData]
    val dim = sub.numElements()
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    val nc = cands.numElements()
    while (c < nc) {
      val cw = cands.getArray(c)
      val n = math.min(dim, cw.numElements())
      var d = 0.0
      var k = 0
      while (k < n) {
        val diff = sub.getDouble(k) - cw.getDouble(k)
        d += diff * diff
        k += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dim = ctx.freshName("dim")
      val nc = ctx.freshName("nc")
      val c = ctx.freshName("c")
      val cw = ctx.freshName("cw")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $dim = $a.numElements();
         |int $nc = $b.numElements();
         |int $best = -1;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $nc; $c++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cw = $b.getArray($c);
         |  int $n = java.lang.Math.min($dim, $cw.numElements());
         |  double $d = 0.0;
         |  for (int $k = 0; $k < $n; $k++) {
         |    double $diff = $a.getDouble($k) - $cw.getDouble($k);
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Top-`k` nearest candidates by squared L2: indices of the `k` codewords
  * (array of candidate vectors, `array<array<double>>`) nearest to `vec`,
  * ordered by (d2 asc, index asc) — [[PqArgmin]] generalized to a ranked
  * prefix. The round-19 IVF-cell kNN graph needs every corpus vector's
  * `nprobe` nearest cells: the interpreted-HOF route
  * (`slice(array_sort(transform(cents, ...)), 1, k)`) measured 26.9 s at
  * the ×10 probe (per-element lambda dispatch over n·K struct
  * allocations) where this compiled insertion loop is the same O(K·dim)
  * flops per row with a k-slot register buffer. Tiebreak contract: a
  * strictly-smaller distance displaces; equal distances keep the
  * earlier (lower-index) candidate ahead — exactly the windowed
  * oracle's ORDER BY d2 ASC, pos ASC. Same sequential-fold determinism
  * as `vec_dist2`, so the per-candidate distances are bit-identical to
  * DuckDB's fold and the ranked prefix is replayable. Caller guarantees
  * dense vectors; null ARRAYS null-propagate via BinaryExpression.
  */
case class PqArgminK(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k > 0, s"pq_argmin_k requires k > 0, got $k")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_argmin_k"

  override def checkInputDataTypes(): TypeCheckResult = {
    val okL = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okR = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (okL && okR) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<array<double>>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sub = a.asInstanceOf[ArrayData]
    val cands = b.asInstanceOf[ArrayData]
    val dim = sub.numElements()
    val nc = cands.numElements()
    val kk = math.min(k, nc)
    val dBuf = new Array[Double](math.max(kk, 1))
    val iBuf = new Array[Int](math.max(kk, 1))
    var m = 0
    var c = 0
    while (c < nc) {
      val cw = cands.getArray(c)
      val n = math.min(dim, cw.numElements())
      var d = 0.0
      var t = 0
      while (t < n) {
        val diff = sub.getDouble(t) - cw.getDouble(t)
        d += diff * diff
        t += 1
      }
      if (m < kk || d < dBuf(m - 1)) {
        var ins = if (m < kk) m else kk - 1
        while (ins > 0 && d < dBuf(ins - 1)) ins -= 1
        var s = if (m < kk) m else kk - 1
        while (s > ins) { dBuf(s) = dBuf(s - 1); iBuf(s) = iBuf(s - 1); s -= 1 }
        dBuf(ins) = d
        iBuf(ins) = c
        if (m < kk) m += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(iBuf, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dim = ctx.freshName("dim")
      val nc = ctx.freshName("nc")
      val kk = ctx.freshName("kk")
      val dBuf = ctx.freshName("dBuf")
      val iBuf = ctx.freshName("iBuf")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val cw = ctx.freshName("cw")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val ins = ctx.freshName("ins")
      val s = ctx.freshName("s")
      s"""
         |int $dim = $a.numElements();
         |int $nc = $b.numElements();
         |int $kk = java.lang.Math.min($k, $nc);
         |double[] $dBuf = new double[java.lang.Math.max($kk, 1)];
         |int[] $iBuf = new int[java.lang.Math.max($kk, 1)];
         |int $m = 0;
         |for (int $c = 0; $c < $nc; $c++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cw = $b.getArray($c);
         |  int $n = java.lang.Math.min($dim, $cw.numElements());
         |  double $d = 0.0;
         |  for (int $t = 0; $t < $n; $t++) {
         |    double $diff = $a.getDouble($t) - $cw.getDouble($t);
         |    $d += $diff * $diff;
         |  }
         |  if ($m < $kk || $d < $dBuf[$m - 1]) {
         |    int $ins = ($m < $kk) ? $m : $kk - 1;
         |    while ($ins > 0 && $d < $dBuf[$ins - 1]) $ins--;
         |    for (int $s = (($m < $kk) ? $m : $kk - 1); $s > $ins; $s--) {
         |      $dBuf[$s] = $dBuf[$s - 1]; $iBuf[$s] = $iBuf[$s - 1];
         |    }
         |    $dBuf[$ins] = $d;
         |    $iBuf[$ins] = $c;
         |    if ($m < $kk) $m++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($iBuf, $m));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
