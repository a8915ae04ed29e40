package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Single-pass Jaccard similarity over two `array<string>` columns:
  * |A∩B| / |A∪B| with set semantics (duplicates collapse, as
  * `array_intersect`/`array_union` do).
  *
  * The built-in form `size(array_intersect(a,b)) / size(array_union(a,b))`
  * builds TWO result arrays (plus their dedup hash tables) per pair; this
  * expression computes both cardinalities in one membership pass and
  * allocates no arrays. It is the verify-step inner loop of the near-dup
  * joins (`dedup_ngram_jaccard`, `dedup_minhash_lsh`) — at ×10 corpus the
  * verify join dominated the stage (ScaleProbe), which is what justifies
  * a custom Expression under the SURVEY §2.5 policy.
  *
  * Exactness contract: the two cardinalities are integers, so the final
  * double division is bit-identical to the built-in composition (pinned
  * by `JaccardSimSpec`). Empty∪empty → null, matching Spark's
  * null-on-zero-divide. Null ELEMENTS are not supported (returns null) —
  * shingle arrays never contain them.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_sim"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[Any]()
    var k = 0
    val na0 = arrA.numElements()
    while (k < na0) {
      if (arrA.isNullAt(k)) return null
      setA.add(arrA.getUTF8String(k))
      k += 1
    }
    val seenB = new java.util.HashSet[Any]()
    var c = 0
    var nb = 0
    k = 0
    val nb0 = arrB.numElements()
    while (k < nb0) {
      if (arrB.isNullAt(k)) return null
      val s = arrB.getUTF8String(k)
      if (seenB.add(s)) {
        nb += 1
        if (setA.contains(s)) c += 1
      }
      k += 1
    }
    val union = setA.size() + nb - c
    if (union == 0) null else c.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val setA = ctx.freshName("setA")
      val seenB = ctx.freshName("seenB")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val nb = ctx.freshName("nb")
      val s = ctx.freshName("s")
      val union = ctx.freshName("union")
      val done = ctx.freshName("done")
      s"""
         |boolean $done = false;
         |java.util.HashSet $setA = new java.util.HashSet();
         |for (int $k = 0; $k < $a.numElements() && !$done; $k++) {
         |  if ($a.isNullAt($k)) { ${ev.isNull} = true; $done = true; }
         |  else { $setA.add($a.getUTF8String($k)); }
         |}
         |java.util.HashSet $seenB = new java.util.HashSet();
         |int $c = 0;
         |int $nb = 0;
         |for (int $k = 0; $k < $b.numElements() && !$done; $k++) {
         |  if ($b.isNullAt($k)) { ${ev.isNull} = true; $done = true; }
         |  else {
         |    org.apache.spark.unsafe.types.UTF8String $s = $b.getUTF8String($k);
         |    if ($seenB.add($s)) {
         |      $nb++;
         |      if ($setA.contains($s)) $c++;
         |    }
         |  }
         |}
         |if (!$done) {
         |  int $union = $setA.size() + $nb - $c;
         |  if ($union == 0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = (double) $c / (double) $union; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
