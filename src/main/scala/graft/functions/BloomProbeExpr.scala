package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd Bloom-filter membership probe over a long key:
  * `bloom_might_contain(gid, <binary literal>)` → boolean.
  *
  * The filter bytes are a plan-build-time literal (serialized
  * `org.apache.spark.util.sketch.BloomFilter`, the public sketch Spark's
  * own runtime row-level filtering broadcasts); the deserialized filter is
  * attached to the generated code as a reference object, so the per-row
  * work is one `mightContainLong` — a handful of XXH64-derived bit tests,
  * inside whole-stage codegen, no boxing.
  *
  * This is the documented scale-swap for the decontamination broadcast
  * (TextOps.text_decontaminate "at extreme scale the broadcast becomes a
  * bloom filter"): the probe NEVER false-negatives, so prefilter + exact
  * join reproduces the exact operator's output bit-for-bit while shrinking
  * the train-side join input to contaminated-plus-~fpp rows. Plan-literal
  * shipping is right for filters up to ~10 MB (≈10⁷ keys at 1% fpp); a
  * larger benchmark set ships the same bytes as a broadcast variable or a
  * per-executor read of the stored index instead — the expression is
  * unchanged, only the byte transport differs.
  */
case class BloomProbeExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a BIGINT key, got ${other.catalogString}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
