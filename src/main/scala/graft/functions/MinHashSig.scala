package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass K-permutation MinHash signature over an `array<bigint>` of
  * element hashes: `sig[i] = min_j((a(i) * h(j) + b(i)) mod p)`.
  *
  * Semantically identical to the declarative form
  * `array(array_min(transform(hs, h -> (a0*h + b0) % p)), ...)` — which
  * the DuckDB oracle still runs — but that form is K interpreted
  * higher-order passes per row (K × |hs| lambda dispatches); this is a
  * single codegen'd loop, the signature step being the map-side hot
  * loop of MinHash-LSH dedup at corpus scale.
  *
  * Returns null for a null or empty input array (callers shingle-filter
  * to non-empty; the declarative form would yield an array of nulls,
  * which no downstream banding could use either).
  *
  * All arithmetic is exact Long math (`a*h + b < 2^63` for the engine's
  * constants), so results are bit-identical across engines.
  */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {

  require(a.nonEmpty && a.length == b.length, "a/b coefficient lists must match")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        val v = (a(i) * h + b(i)) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val aRef = ctx.addReferenceObj("minhashA", a.toArray, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", b.toArray, "long[]")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $k = $aRef.length;
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $h = $arr.getLong($j);
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $v = ($aRef[$i] * $h + $bRef[$i]) % $p${"L"};
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
