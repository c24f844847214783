package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused linear quality-classifier score: array<string> → BIGINT,
  * score = Σ_w ((p31(md5(w)) % 1024) · 2654435761 mod 2001 − 1000) —
  * the text_quality_classifier model (hashed unigram features, integer
  * per-bucket weights) collapsed into ONE codegen'd per-row kernel.
  *
  * Why fused: the declarative spelling (explode word ids → per-doc sum)
  * pays a doc_id-keyed exchange just to re-assemble rows the map side
  * already had together. The per-doc score is pure per-row algebra, so
  * inference at 100 TB should be a NARROW pass — no shuffle at all — and
  * the same kernel then drops into streaming ingest unchanged (a narrow
  * map needs no state, no watermark interaction). The sum is an exact
  * integer (|w| ≤ 1000 per token ⇒ |score| ≪ 2⁵³ for any real doc), so
  * the keep bit is order-independent and replays bit-for-bit in the
  * DuckDB oracle's unnest+sum spelling.
  *
  * Hash-id derivation is byte-identical to WordIdsExpr's p31 mode (top 60
  * digest bits ≫ 4, mod 2³¹−1) — the oracle and the exploded classifier
  * share it. Null semantics mirror WordIdsExpr: a null element → NULL.
  */
case class QualityScoreExpr(child: Expression) extends UnaryExpression {
  import WordIdsExpr.P

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "quality_score_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quality_score_md5 expects array<string>, got ${t.catalogString}")
  }

  /** Instance method invoked from generated code through a captured
    * reference — one virtual call per row, kernel inside the WSCG span.
    * Returns null (boxed) on a null element. */
  def compute(input: ArrayData): java.lang.Long = {
    val n = input.numElements()
    val md = QualityScoreExpr.md5.get()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (input.isNullAt(i)) return null
      md.reset()
      val d = md.digest(input.getUTF8String(i).toString.getBytes(StandardCharsets.UTF_8))
      val hi = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      val gid = (hi >>> 4) % P
      acc += (gid % 1024L) * 2654435761L % 2001L - 1000L
      i += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any = {
    val r = compute(input.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qscore", this, classOf[QualityScoreExpr].getName)
    nullSafeCodeGen(ctx, ev, arr => s"""
       |java.lang.Long qsr = $ref.compute($arr);
       |if (qsr == null) { ${ev.isNull} = true; } else { ${ev.value} = qsr.longValue(); }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualityScoreExpr {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
