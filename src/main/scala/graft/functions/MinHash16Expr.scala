package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd 16-permutation MinHash signature over a shingle-id
  * array: one fused pass producing `[min_i((a_i·s + b_i) mod P)]` for the
  * fixed permutation family a_i = 12345·i + 1103515245,
  * b_i = 987654·i + 67867967, P = 2³¹−1 — the exact family the dedup
  * oracles replay in SQL (`perms` CTE: Dedup.candSqlFor) and
  * StreamingDedup computes at ingest.
  *
  * The declarative spelling — sixteen separate
  * `array_min(transform(sids, s -> (a·s + b) % P))` columns — materializes
  * sixteen intermediate arrays per row through the interpreted
  * higher-order-function path (the same defect class as the round-5 LSH
  * plane weights: HOFs are CodegenFallback). This expression reads the
  * input array ONCE, keeps sixteen running minima in locals, and stays
  * inside whole-stage codegen; it was the largest single job in the
  * dedup_minhash_lsh pipeline (~0.5 s per invocation at sf0.1).
  *
  * Semantics mirror the HOF formulation exactly: null input array → NULL;
  * null elements are skipped (array_min ignores nulls); an empty array or
  * all-null elements → NULL (array_min of an empty/all-null array). All
  * arithmetic is plain wrapping long math — identical in the SQL replay
  * because a·s + b < 2⁶³ for every s < P.
  */
case class MinHash16Expr(child: Expression) extends UnaryExpression {
  import MinHash16Expr._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash16"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash16 expects array<bigint>, got ${other.catalogString}")
  }

  private def elemIsInt: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = Array.fill(K)(Long.MaxValue)
    var seen = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        seen = true
        val s = if (elemIsInt) arr.getInt(j).toLong else arr.getLong(j)
        var i = 0
        while (i < K) {
          val v = ((12345L * i + 1103515245L) * s + (987654L * i + 67867967L)) % P
          if (v < m(i)) m(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!seen) null else new GenericArrayData(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("mins")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val seen = ctx.freshName("seen")
      val getS = if (elemIsInt) s"(long) $arr.getInt($j)" else s"$arr.getLong($j)"
      s"""
         |int $n = $arr.numElements();
         |long[] $m = new long[$K];
         |java.util.Arrays.fill($m, Long.MAX_VALUE);
         |boolean $seen = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    $seen = true;
         |    long $s = $getS;
         |    for (int $i = 0; $i < $K; $i++) {
         |      long $v = ((12345L * $i + 1103515245L) * $s + (987654L * $i + 67867967L)) % ${P}L;
         |      if ($v < $m[$i]) $m[$i] = $v;
         |    }
         |  }
         |}
         |if (!$seen) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($m);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash16Expr {
  val K = 16
  val P = 2147483647L // 2^31 - 1, the shingle-id space shared with the oracles
}
