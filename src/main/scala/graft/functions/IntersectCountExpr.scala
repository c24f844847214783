package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.ArrayIntersect
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Count of distinct common elements of two long arrays — the fused form
  * of `size(array_intersect(a, b))`, which otherwise materializes the
  * intersection ARRAY per row just to take its length (the MinHash
  * verification computes this once per candidate pair over ~100-element
  * sid arrays). Semantics match Spark's array_intersect + size exactly for
  * array<bigint>: distinct common values, a shared null element counts
  * once, a null ARRAY yields NULL.
  */
case class IntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count expects two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val seen = new java.util.HashSet[Long]()
    var leftHasNull = false
    var i = 0
    while (i < xs.numElements()) {
      if (xs.isNullAt(i)) leftHasNull = true else seen.add(xs.getLong(i))
      i += 1
    }
    val matched = new java.util.HashSet[Long]()
    var nullMatched = false
    var j = 0
    while (j < ys.numElements()) {
      if (ys.isNullAt(j)) { if (leftHasNull) nullMatched = true }
      else { val v = ys.getLong(j); if (seen.contains(v)) matched.add(v) }
      j += 1
    }
    matched.size() + (if (nullMatched) 1 else 0)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val seen = ctx.freshName("seen")
      val matched = ctx.freshName("matched")
      val lNull = ctx.freshName("lNull")
      val nMatch = ctx.freshName("nMatch")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      s"""
        final java.util.HashSet<Long> $seen = new java.util.HashSet<Long>();
        boolean $lNull = false;
        for (int $i = 0; $i < $xs.numElements(); $i++) {
          if ($xs.isNullAt($i)) $lNull = true; else $seen.add($xs.getLong($i));
        }
        final java.util.HashSet<Long> $matched = new java.util.HashSet<Long>();
        boolean $nMatch = false;
        for (int $j = 0; $j < $ys.numElements(); $j++) {
          if ($ys.isNullAt($j)) { if ($lNull) $nMatch = true; }
          else {
            final long $v = $ys.getLong($j);
            if ($seen.contains($v)) $matched.add($v);
          }
        }
        ${ev.value} = $matched.size() + ($nMatch ? 1 : 0);
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: `size(array_intersect(a, b))` over long arrays →
  * `intersect_count(a, b)`. The declarative form stays in user code; the
  * optimizer swaps in the fused kernel. Only fires for the non-legacy
  * size(NULL) semantics (NULL, not -1), which intersect_count matches.
  */
object IntersectCountRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ai @ ArrayIntersect(l, r), false)
          if ai.dataType == ArrayType(LongType, false)
            || ai.dataType == ArrayType(LongType, true) =>
        IntersectCountExpr(l, r)
    }
}
