package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused positional word-gram → binary-md5 kernel: one pass over the split
  * words producing, for every start position i in 0..n-width, the 16-byte
  * MD5 digest of the width-word gram joined with single spaces — i.e. the
  * value of
  * `transform(sequence(0, size(w)-width),
  *    i -> unhex(md5(concat_ws(' ', slice(w, i+1, width)))))`
  * (positions implicit in array order, ready for posexplode).
  *
  * Replaces that declarative spelling in dedup_exact_substring, where the
  * lambda ran on the interpreted higher-order-function path and each gram
  * paid a slice() array allocation, a concat_ws string build, a hex
  * encode, and (in the binary variant) a hex decode. Here the per-word
  * UTF-8 bytes are materialized once per document and each gram streams
  * its words straight into an incremental MessageDigest — no slice, no
  * concatenated string, no hex round-trip.
  *
  * Exactness contract (Md5GramsExprSpec pins equivalence to the
  * declarative form): words joined with single spaces, null entries
  * skipped (concat_ws semantics), digest = raw 16 bytes of MD5 over the
  * joined UTF-8 text. Inputs shorter than `width` yield an empty array
  * (callers filter size(w) >= width; the declarative form is undefined
  * there — sequence(0, negative) counts down).
  */
case class Md5GramsExpr(child: Expression, width: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "md5_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if width >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> and width >= 1, got " +
        s"${child.dataType.catalogString}, width=$width")
  }

  /** Instance method so codegen can invoke it through a captured reference
    * (ctx.addReferenceObj) — keeps the kernel inside the WholeStageCodegen
    * pipeline with one virtual call per row. */
  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    if (n < width) return new GenericArrayData(Array.empty[Any])
    // per-word UTF-8 bytes once per document (null words stay null and
    // are skipped per gram, mirroring concat_ws)
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i))
        bytes(i) = input.getUTF8String(i).getBytes
      i += 1
    }
    val md = Md5GramsExpr.md5.get()
    val out = new Array[Any](n - width + 1)
    val space = Md5GramsExpr.Space
    i = 0
    while (i <= n - width) {
      md.reset()
      var first = true
      var k = 0
      while (k < width) {
        val b = bytes(i + k)
        if (b != null) {
          if (!first) md.update(space)
          md.update(b)
          first = false
        }
        k += 1
      }
      out(i) = md.digest()
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5Grams", this, classOf[Md5GramsExpr].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.compute($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5GramsExpr {
  private val Space: Array[Byte] = " ".getBytes(StandardCharsets.UTF_8)
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
