package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 32-bit SimHash signature from an array of word hashes.
  *
  * Bit b of the result is set iff more than half of the word hashes have
  * bit b set (equivalently Σ over words of ±1, +1 when bit b of the hash
  * is 1, is > 0 — the classic unbiased SimHash rule). The HOF formulation
  * (`aggregate(sequence(0,31), ..., aggregate(hws, ...))`) runs
  * interpreted at 32 × words lambda evaluations per row and dominated the
  * pair-search runtime; this is one fused loop inside whole-stage codegen
  * — the same (b)-tier upgrade as VecDotExpr.
  *
  * Semantics mirror the DuckDB oracle exactly: a null array or a null
  * element yields NULL; word hashes are non-negative longs (bit 63 unused).
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  private val bits = 32

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val h = xs.getLong(i)
      var b = 0
      while (b < bits) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (2 * counts(b) > n) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      // the scratch flag gets its own fresh name rather than one derived
      // from ev.isNull's code text — that text need not be a bare local
      // identifier (e.g. a global field reference), so string-deriving a
      // new variable name from it is fragile.
      val anyNull = ctx.freshName("anyNull")
      s"""
        final int $n = $arr.numElements();
        final int[] $counts = new int[$bits];
        boolean $anyNull = false;
        for (int $i = 0; $i < $n && !$anyNull; $i++) {
          if ($arr.isNullAt($i)) { $anyNull = true; break; }
          final long $h = $arr.getLong($i);
          for (int $b = 0; $b < $bits; $b++) {
            $counts[$b] += (int) (($h >>> $b) & 1L);
          }
        }
        if ($anyNull) {
          ${ev.isNull} = true;
        } else {
          long $sig = 0L;
          for (int $b = 0; $b < $bits; $b++) {
            if (2 * $counts[$b] > $n) $sig |= 1L << $b;
          }
          ${ev.value} = $sig;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}
