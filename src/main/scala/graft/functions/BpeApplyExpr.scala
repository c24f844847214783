package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused BPE tokenization: `bpe_apply(text, <array literal of pairs>)` →
  * the pad/gap-encoded token string after char-spelling and ALL merge
  * rounds, in one kernel pass per row.
  *
  * The chained-replace formulation (text_bpe_tokens) allocates one full
  * copy of the spelled string per merge — k+1 intermediate strings per
  * document, which made its 100× scale probe allocation/GC-bound (reps
  * swinging 9–20 s on identical work). This kernel builds the char-token
  * array once (spaces → the '|' word marker) and applies each merge as a
  * greedy left-to-right pass over the token array — the same semantics
  * the pad/gap encoding gives literal `replace` (OpsSpec pins that
  * contract; the fused query's spec pins row identity against the
  * chained path, so the DuckDB oracle transfers).
  *
  * The merge list is a plan-build-time literal (it is the 6-row trained
  * index); codegen attaches the expression as a reference object and the
  * per-row work is one compiled method call inside whole-stage codegen —
  * no expression-tree interpretation, no intermediate UTF8String↔String
  * churn beyond the single output build.
  */
case class BpeApplyExpr(child: Expression, pairs: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_apply"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if pairs.forall(_.count(_ == ' ') == 1) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      "bpe_apply merge pairs must each be two space-separated units")
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply expects a STRING document, got ${other.catalogString}")
  }

  @transient private lazy val merges: Array[(String, String)] =
    pairs.map { p =>
      val i = p.indexOf(' ')
      (p.substring(0, i), p.substring(i + 1))
    }.toArray

  def applyMerges(text: UTF8String): UTF8String = {
    val s = text.toString
    // char-spell: one token per char, spaces become the '|' word marker
    var n = s.length
    var toks = new Array[String](math.max(n, 1))
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      toks(i) = if (c == ' ') "|" else String.valueOf(c)
      i += 1
    }
    // each merge: greedy left-to-right pass — identical to literal
    // replace of " a  b " → " ab " on the pad/gap encoding
    var m = 0
    while (m < merges.length) {
      val (a, b) = merges(m)
      val out = new Array[String](n)
      var r = 0
      var w = 0
      while (r < n) {
        if (r + 1 < n && toks(r) == a && toks(r + 1) == b) {
          out(w) = a + b; r += 2
        } else {
          out(w) = toks(r); r += 1
        }
        w += 1
      }
      toks = out
      n = w
      m += 1
    }
    val sb = new java.lang.StringBuilder(s.length * 3 + 2)
    sb.append(' ')
    i = 0
    while (i < n) {
      if (i > 0) sb.append("  ")
      sb.append(toks(i))
      i += 1
    }
    sb.append(' ')
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(v: Any): Any =
    applyMerges(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeApplyExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.applyMerges($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
