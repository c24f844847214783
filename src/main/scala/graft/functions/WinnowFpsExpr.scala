package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing fingerprints: array<string> words → array<string> of
  * distinct md5-hex fingerprints (ascending), k=4 word grams, w=5
  * windows, ties → rightmost — the whole MOSS selection collapsed into
  * ONE codegen'd per-row kernel.
  *
  * Why fused: the declarative spelling (posexplode → lead() grams →
  * sliding-min window → distinct) pays a doc_id partition+sort shuffle
  * to compute something that is pure PER-ROW algebra — and a window
  * over a non-time column is flatly unsupported on a STREAMING frame,
  * so the declarative form cannot run at ingest at all. The kernel
  * makes batch fingerprinting a zero-shuffle narrow pass and gives
  * streaming ingest the identical fingerprint set (one code path, the
  * StreamingDedup bandedSignatures discipline).
  *
  * Selection semantics are byte-identical to the window spelling (and
  * the DuckDB oracle): per window the minimum hash wins, equal hashes →
  * the RIGHTMOST position (the window min compares g || pad(10⁹⁺-i),
  * which orders identically); docs with 4-7 tokens (fewer grams than
  * the window) take the min of all their grams; docs under 4 tokens
  * yield an EMPTY array (un-fingerprintable, matching the batch
  * size >= 4 gate composed with explode semantics). Output is the
  * distinct fingerprint SET sorted ascending — deterministic, so the
  * kernel is safe anywhere (join keys, streaming state, oracles).
  * A null element yields NULL (strictest, the WordIdsExpr convention).
  */
case class WinnowFpsExpr(child: Expression) extends UnaryExpression {
  import WinnowFpsExpr._

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects array<string>, got ${t.catalogString}")
  }

  /** Instance method invoked from generated code through a captured
    * reference — one virtual call per row, kernel inside the WSCG span. */
  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    if (n < K) return new GenericArrayData(Array.empty[Any])
    val words = new Array[String](n)
    var i = 0
    while (i < n) {
      if (input.isNullAt(i)) return null
      words(i) = input.getUTF8String(i).toString
      i += 1
    }
    val md = md5.get()
    val ng = n - (K - 1)
    val grams = new Array[String](ng)
    i = 0
    while (i < ng) {
      md.reset()
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < K) { sb.append(' ').append(words(i + j)); j += 1 }
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexDigits((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = HexDigits(d(b) & 0xf)
        b += 1
      }
      grams(i) = new String(hex)
      i += 1
    }
    val out = new java.util.TreeSet[String]()
    if (ng < W) {
      // boundary rule: one fingerprint, the min over all grams (ties →
      // rightmost is irrelevant to the selected HASH value)
      var best = grams(0)
      i = 1
      while (i < ng) { if (grams(i).compareTo(best) < 0) best = grams(i); i += 1 }
      out.add(best)
    } else {
      var start = 0
      while (start <= ng - W) {
        // min hash in grams[start, start+W); ties → rightmost position:
        // scanning left-to-right, replace on <= so a later equal hash
        // wins (selected VALUE is unchanged; the rule matters only for
        // which positions get selected, and the emitted set is the same
        // either way — kept for fidelity to the window spelling)
        var best = grams(start)
        var j = start + 1
        while (j < start + W) {
          if (grams(j).compareTo(best) <= 0) best = grams(j)
          j += 1
        }
        out.add(best)
        start += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowFps", this, classOf[WinnowFpsExpr].getName)
    nullSafeCodeGen(ctx, ev, arr => s"""
       |${ev.value} = $ref.compute($arr);
       |if (${ev.value} == null) ${ev.isNull} = true;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFpsExpr {
  /** Gram size and window width — the MOSS parameters shared with the
    * declarative oracle CTEs (TextOps.winnowFpSqlFor). */
  val K = 4
  val W = 5
  private val HexDigits = "0123456789abcdef".toCharArray
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
