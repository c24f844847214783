package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded min-K collect as a NATIVE Catalyst aggregate —
  * `array_sort(collect_list(v))` with the AGGREGATION STATE capped at k
  * elements (multiset: duplicates retained, result sorted ascending in
  * UTF8 binary order, Spark's own string order). Equals the full sorted
  * list whenever the group has ≤ k elements; always O(k) state per group.
  * With `distinct = true` (registered as `min_k_distinct`) the buffer is
  * instead a SET of the k smallest distinct values —
  * `slice(array_sort(collect_set(v)), 1, k)` with capped state — so
  * `size(min_k_distinct(v, cap))` is the exact distinct count saturated
  * at cap: the bounded distinct-count a Sigma `count(field)` correlation
  * pipe thresholds on ([[graft.streaming.TimeframeRules]]).
  *
  * Why this exists: the timeframe-rule alert schema pairs an exact
  * `count BIGINT` with an `origin_ids ARRAY<STRING>` provenance list
  * (reference sink schema, windows-process-access.sql:44-45). Collecting
  * EVERY uuid makes the per-(rule, window, key) streaming state cell grow
  * linearly with events on a hot key — the classic skewed-key
  * scale-killer. Count already carries cardinality; the provenance array
  * can be a deterministic sample (the k smallest — a pure function of the
  * input multiset, independent of row order, partitioning, and
  * partial-merge order, so map-side combine is safe and two engines
  * replay it bit-identically).
  *
  * Why native instead of a typed `Aggregator`: the udaf wrapper
  * deserializes every input value Catalyst→Scala; on the tf-battery bench
  * that cost ~10% eps at 25 rules (453k → 405k, A/B'd). This operates on
  * [[UTF8String]] directly — one deep `copy()` only when a value is
  * actually kept, an O(1) rejection (compare against the current max)
  * once a hot key saturates the cap.
  */
case class MinKCollectExpr(child: Expression, k: Int,
    distinct: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.ArrayList[UTF8String]]
  with UnaryLike[Expression] {
  require(k > 0, s"min_k_collect needs k > 0, got $k")

  override def prettyName: String =
    if (distinct) "min_k_distinct" else "min_k_collect"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.ArrayList[UTF8String] =
    new java.util.ArrayList[UTF8String](math.min(k, 16))

  /** Sorted-ascending bounded insert; copies only when the value is kept
    * (the incoming UTF8String may point into a reused row buffer — and
    * `copy()`, not `clone()`: clone is SHALLOW when the string exactly
    * fits its backing array, spec-pinned). Upper-bound insertion point
    * keeps duplicate arrival order stable. In `distinct` mode a value
    * already present is dropped (O(log k), no copy) — the buffer is then
    * a SET of the k smallest distinct values, so `size(min_k_distinct(v,
    * cap))` is the exact distinct count saturated at cap: the bounded
    * distinct-count a Sigma `count(field)` pipe thresholds on. */
  private def insert(b: java.util.ArrayList[UTF8String], v: UTF8String): Unit = {
    val n = b.size
    if (n >= k && v.compareTo(b.get(n - 1)) >= 0) return
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b.get(mid).compareTo(v) <= 0) lo = mid + 1 else hi = mid
    }
    if (distinct && lo > 0 && b.get(lo - 1).compareTo(v) == 0) return
    b.add(lo, v.copy())
    if (b.size > k) b.remove(b.size - 1)
  }

  override def update(b: java.util.ArrayList[UTF8String],
      input: InternalRow): java.util.ArrayList[UTF8String] = {
    val v = child.eval(input)
    if (v != null) insert(b, v.asInstanceOf[UTF8String])
    b
  }

  /** O(k) linear merge of two SORTED buffers (vs k binary inserts at
    * O(k log k) + shift cost). No re-copying: both sides' elements are
    * already owned — `b`'s were deep-copied on [[insert]], `other`'s come
    * from [[deserialize]] (the framework deserializes a fresh input buffer
    * per merge call), so references can move between lists safely. */
  override def merge(b: java.util.ArrayList[UTF8String],
      other: java.util.ArrayList[UTF8String]): java.util.ArrayList[UTF8String] = {
    if (other.isEmpty) return b
    if (b.isEmpty && other.size <= k) return other
    val out = new java.util.ArrayList[UTF8String](
      math.min(k, b.size + other.size))
    var i = 0; var j = 0
    while (out.size < k && (i < b.size || j < other.size)) {
      if (j >= other.size ||
          (i < b.size && b.get(i).compareTo(other.get(j)) <= 0)) {
        val v = b.get(i); i += 1
        // distinct: each side holds no internal duplicates (insert drops
        // them), so at most ONE equal partner can sit at other(j)
        if (distinct && j < other.size && v.compareTo(other.get(j)) == 0) j += 1
        out.add(v)
      } else { out.add(other.get(j)); j += 1 }
    }
    out
  }

  override def eval(b: java.util.ArrayList[UTF8String]): Any =
    new GenericArrayData(b.toArray(Array.empty[AnyRef]))

  override def serialize(b: java.util.ArrayList[UTF8String]): Array[Byte] = {
    var total = 4
    var i = 0
    while (i < b.size) { total += 4 + b.get(i).numBytes(); i += 1 }
    val buf = java.nio.ByteBuffer.allocate(total)
    buf.putInt(b.size)
    i = 0
    while (i < b.size) {
      val bytes = b.get(i).getBytes
      buf.putInt(bytes.length); buf.put(bytes)
      i += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[UTF8String] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val len = buf.getInt
      val arr = new Array[Byte](len)
      buf.get(arr)
      b.add(UTF8String.fromBytes(arr)) // already sorted: serialize preserved order
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKCollectExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKCollectExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinKCollectExpr =
    copy(child = newChild)
}
