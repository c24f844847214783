package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused per-word md5-id mapping: array<string> → array<long>, keeping
  * duplicates and order (the SimHash fold weights words by frequency, so
  * unlike ShingleIdsExpr there is NO distinct here).
  *
  * Replaces the interpreted `transform(words, w -> <md5 extract>)` HOF
  * feeding the simhash32 folds. Three extraction modes, each byte-exact to
  * its declarative spelling (the DuckDB oracles replay the same formulas):
  *  - p31:  conv(substring(md5(w), 1, 15), 16, 10) % (2³¹−1) — the top 60
  *          digest bits mod the Mersenne prime (the 32-bit SimHash and
  *          shingle-id hash space);
  *  - lo32: conv(substring(md5(w), 1, 8), 16, 10) — digest bytes 0–3 as an
  *          unsigned big-endian int (low half of the 64-bit SimHash);
  *  - hi32: conv(substring(md5(w), 9, 8), 16, 10) — digest bytes 4–7
  *          (high half).
  * Null semantics mirror transform: a null element maps to... words from
  * split() are never null, and simhash32 nulls on null elements anyway, so
  * a null element here yields a NULL result (strictest behavior, asserted
  * in the spec).
  */
case class WordIdsExpr(child: Expression, mode: String) extends UnaryExpression {
  import WordIdsExpr._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = s"word_ids_md5_$mode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if Modes.contains(mode) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_ids_md5 expects array<string> and a mode in $Modes, got " +
        s"${t.catalogString}, mode=$mode")
  }

  /** Instance method invoked from generated code through a captured
    * reference — one virtual call per row, kernel inside the WSCG span.
    * Returns null on a null element. */
  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val md = md5.get()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (input.isNullAt(i)) return null
      md.reset()
      val d = md.digest(input.getUTF8String(i).toString.getBytes(StandardCharsets.UTF_8))
      out(i) = mode match {
        case "p31" =>
          val hi = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
            ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
            ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
          (hi >>> 4) % P
        case "lo32" =>
          ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        case "hi32" =>
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordIds", this, classOf[WordIdsExpr].getName)
    nullSafeCodeGen(ctx, ev, arr => s"""
       |${ev.value} = $ref.compute($arr);
       |if (${ev.value} == null) ${ev.isNull} = true;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordIdsExpr {
  val P = 2147483647L
  val Modes = Set("p31", "lo32", "hi32")
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
