package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused word n-gram → distinct STRING array kernel — the gram-string twin
  * of ShingleIdsExpr, for consumers that need the gram TEXT itself (the
  * corpus top-ngram profile ranks and REPORTS grams; an id can count but
  * not name them).
  *
  * Replicates the declarative spelling exactly —
  * `array_distinct(transform(sequence(0, size(w)-width),
  *    i -> concat_ws(' ', slice(w, i+1, width))))` —
  * which runs on the interpreted higher-order-function path: at the 100×
  * scale probe the per-gram lambda evaluation plus the java.lang.String
  * churn made the profile's scan stage the dominant job and pushed its
  * 30→100× marginal to 4× (GC-bound, not data-bound). The kernel builds
  * each gram once as UTF8String bytes inside whole-stage codegen (one
  * virtual call per row), restoring the scan to allocation-linear.
  * Contract, pinned by an equivalence spec:
  *  - grams joined with single spaces, null words skipped (concat_ws);
  *  - de-duplication on the gram string, first occurrence kept in order
  *    (array_distinct);
  *  - inputs shorter than `width` yield an empty array (callers filter
  *    size(w) >= width; the declarative form is undefined below it).
  */
case class NgramsExpr(child: Expression, width: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ngrams_ws"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if width >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> and width >= 1, got " +
        s"${child.dataType.catalogString}, width=$width")
  }

  /** Instance method invoked through a captured codegen reference
    * (ctx.addReferenceObj), same pattern as ShingleIdsExpr.compute. */
  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    if (n < width) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[UTF8String]((n - width + 1) * 2)
    val out = new java.util.ArrayList[UTF8String](n - width + 1)
    val sep = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](width)
    var i = 0
    while (i <= n - width) {
      var k = 0
      var m = 0
      while (k < width) {
        // concat_ws skips nulls entirely (no doubled separator)
        if (!input.isNullAt(i + k)) {
          parts(m) = input.getUTF8String(i + k)
          m += 1
        }
        k += 1
      }
      val gram = UTF8String.concatWs(sep, java.util.Arrays.copyOf(parts, m): _*)
      if (seen.add(gram)) out.add(gram)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramsWs", this, classOf[NgramsExpr].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.compute($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
