package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two numeric arrays → double.
  *
  * The embedding workloads (near-dup cosine, ANN top-k) previously computed
  * dot products as `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (s,v) ->
  * s+v)`. Higher-order functions don't participate in whole-stage codegen —
  * each element allocates lambda variables on the interpreted path, which
  * at ~300k candidate pairs × 64 dims dominated the whole benchmark
  * (dedup_embedding_cosine alone was 20s at sf0.1). This expression is the
  * (b)-tier upgrade from SURVEY §5: a single fused loop over the two
  * `ArrayData`, staying inside whole-stage codegen.
  *
  * Semantics mirror the HOF formulation exactly so DuckDB oracles keep
  * hash-matching: elements are widened to double one at a time and summed
  * left-to-right (same IEEE ordering); a null array, a null element, or a
  * length mismatch yields NULL (zip_with pads with null → null product →
  * null sum).
  */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    // DecimalType is NumericType but its physical value is an object the
    // generated `(double)(...)` cast cannot compile — accepting it here
    // would Janino-fail the whole stage into a silent interpreted
    // fallback, so reject it at analysis instead
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(_: DecimalType, _) => false
      case ArrayType(_: NumericType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two arrays of non-decimal numeric elements " +
        s"(cast decimals to double), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    val lt = elemType(left)
    val rt = elemType(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      s += numAt(xs, lt, i) * numAt(ys, rt, i)
      i += 1
    }
    s
  }

  private def numAt(arr: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      val getA = CodeGenerator.getValue(a, elemType(left), i)
      val getB = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double)($getA) * (double)($getB);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
