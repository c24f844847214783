package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV aggregation state / output: the at-most-k smallest DISTINCT hash
  * values seen, sorted ascending. */
case class KmvBuf(hs: Seq[Long])

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002,
  * "Counting distinct elements in a data stream"; Beyer et al. 2007,
  * "On synopses for distinct-value estimation under multiset operations")
  * as a mergeable Spark `Aggregator` — the replayable alternative to
  * `approx_count_distinct` that `agg_approx_sketch`'s DuckDB hash oracle
  * needs.
  *
  * Why not Spark's HLL++: its estimate is fine, but no second engine can
  * replay its xxhash64-based register state, so the query could only ever
  * get a rows-only check. KMV over md5-derived 52-bit hashes is different
  * in kind: the state ("k smallest distinct hashes") is a pure FUNCTION OF
  * THE SET — independent of row order, partitioning, and partial-merge
  * order — and the estimator `(k-1)·2^52 div h_(k)` is one integer
  * division both engines evaluate bit-identically. When a group has fewer
  * than k distinct hashes the sketch degrades to an EXACT distinct count
  * (the buffer just holds them all).
  *
  * Scale shape (100 TB): state is ≤ k longs per group per task — a real
  * bounded sketch with map-side partial combine, vs the unbounded
  * collect_set or the one-sorter-per-group window alternative. Estimator
  * error is ~1/sqrt(k-2) relative (k=64 → ~13%), asserted in OpsSpec.
  *
  * Determinism detail: `reduce`/`merge` both go through the same sorted-
  * distinct-insert, so duplicates collapse on FIRST contact — a value
  * seen in ten partitions occupies one slot, exactly like the DuckDB
  * replay's `SELECT DISTINCT` + window rank.
  */
class KmvSketchAgg(k: Int) extends Aggregator[Long, KmvBuf, KmvBuf] {

  /** Insert keeping the buffer sorted-ascending, distinct, and ≤ k. */
  private def insert(b: Seq[Long], h: Long): Seq[Long] = {
    if (b.nonEmpty && b.size >= k && h >= b.last) b // not among k smallest
    else {
      val i = b.indexWhere(_ >= h)
      if (i >= 0 && b(i) == h) b // already present
      else {
        val at = if (i < 0) b.size else i
        val grown = (b.take(at) :+ h) ++ b.drop(at)
        if (grown.size > k) grown.take(k) else grown
      }
    }
  }

  override def zero: KmvBuf = KmvBuf(Nil)
  override def reduce(b: KmvBuf, h: Long): KmvBuf = KmvBuf(insert(b.hs, h))
  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
    KmvBuf(b.hs.foldLeft(a.hs)(insert))
  override def finish(b: KmvBuf): KmvBuf = b
  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
}
