package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Aggregation state / output: the at-most-k smallest values seen, kept
  * sorted ascending (a multiset — duplicates are retained, exactly like
  * `collect_list`). */
case class MinKBuf(items: Seq[String])

/** Bounded min-K collect — `array_sort(collect_list(v))` with the
  * AGGREGATION STATE capped at k elements (the [[KmvSketchAgg]] /
  * [[TopKAgg]] bounded-buffer discipline applied to provenance lists).
  *
  * Why this exists: the timeframe-rule alert schema pairs an exact
  * `count BIGINT` with an `origin_ids ARRAY<STRING>` provenance list
  * (reference sink schema, windows-process-access.sql:44-45). Collecting
  * EVERY matching uuid makes the per-(rule, window, key) state cell — and
  * the emitted alert row — grow linearly with events on that key: one hot
  * host in a 24 h window is the classic skewed-key scale-killer. Count
  * already carries cardinality exactly; the array is provenance and can be
  * a deterministic sample. This aggregate keeps the k SMALLEST values, so
  * the result is a pure function of the input SET — independent of row
  * order, partitioning, and partial-merge order — and equals the full
  * sorted list whenever the group has ≤ k elements (which is why the
  * tf_* DuckDB oracles still hash-match below the cap).
  *
  * A post-aggregation `slice(array_sort(collect_list(v)), 1, k)` would NOT
  * fix anything: it bounds the output while the aggregation buffer (the
  * streaming state cell) still grows without bound. The cap here is on
  * the buffer itself — `reduce` never lets it exceed k — so RocksDB state
  * per group is O(k) regardless of how hot the key is.
  */
class MinKCollectAgg(k: Int) extends Aggregator[String, MinKBuf, MinKBuf] {
  require(k > 0, s"min-K collect needs k > 0, got $k")

  /** Insert keeping the buffer sorted-ascending, duplicates retained,
    * ≤ k elements. Full-buffer rows ≥ the current max are O(1) skips —
    * the common case once a hot key saturates the cap. */
  private def insert(b: Seq[String], v: String): Seq[String] = {
    if (v == null) b
    else if (b.lengthCompare(k) >= 0 && v.compareTo(b.last) >= 0) b
    else {
      val i = b.indexWhere(_.compareTo(v) > 0)
      val at = if (i < 0) b.size else i
      val grown = (b.take(at) :+ v) ++ b.drop(at)
      if (grown.lengthCompare(k) > 0) grown.take(k) else grown
    }
  }

  override def zero: MinKBuf = MinKBuf(Nil)
  override def reduce(b: MinKBuf, v: String): MinKBuf = MinKBuf(insert(b.items, v))
  override def merge(a: MinKBuf, b: MinKBuf): MinKBuf =
    MinKBuf(b.items.foldLeft(a.items)(insert))
  override def finish(b: MinKBuf): MinKBuf = b
  override def bufferEncoder: Encoder[MinKBuf] = Encoders.product[MinKBuf]
  override def outputEncoder: Encoder[MinKBuf] = Encoders.product[MinKBuf]
}
