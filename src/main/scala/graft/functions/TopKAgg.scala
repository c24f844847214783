package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate flowing into the top-k aggregate. */
case class ScoredId(score: Double, id: Long)

/** Aggregation state: at most k items, kept sorted best-first. */
case class TopKBuf(items: Seq[ScoredId])

/** Aggregate output: the k best ids, best-first. */
case class TopKOut(ids: Seq[Long])

/** Distributed top-k with BOUNDED partial state — the textbook scale
  * topology for "top k per group": each map-side partial keeps at most k
  * (score, id) pairs, so the shuffle moves O(tasks × groups × k) rows
  * instead of the full scored set. A window (`row_number() OVER
  * (PARTITION BY group ORDER BY score)`) by contrast shuffles EVERY scored
  * row into one sort task per group — with 8 query ids that collapses a
  * 100 TB scan onto 8 sorters.
  *
  * Ordering is (score DESC, id ASC) — ties broken by id so results are
  * deterministic and DuckDB window oracles rank identically (scores are
  * pre-rounded by the caller).
  *
  * Not codegen'd (typed Aggregator), but it runs once per already-scored
  * row and its state is k entries; the scoring itself stays in codegen.
  */
/** Aggregate output for the scored variant: ids best-first plus their
  * scores in the same order. */
case class TopKScoredOut(ids: Seq[Long], scores: Seq[Double])

/** TopKAgg that also returns the winning scores — for consumers that need
  * the neighbor similarities (density/prototypicality), not just the
  * identities. Same bounded state and ordering as TopKAgg. */
class TopKScoredAgg(k: Int) extends Aggregator[ScoredId, TopKBuf, TopKScoredOut] {
  private val inner = new TopKAgg(k)
  override def zero: TopKBuf = inner.zero
  override def reduce(b: TopKBuf, in: ScoredId): TopKBuf = inner.reduce(b, in)
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = inner.merge(a, b)
  override def finish(b: TopKBuf): TopKScoredOut =
    TopKScoredOut(b.items.map(_.id), b.items.map(_.score))
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKScoredOut] =
    Encoders.product[TopKScoredOut]
}

class TopKAgg(k: Int) extends Aggregator[ScoredId, TopKBuf, TopKOut] {
  private def ord: Ordering[ScoredId] = Ordering.by(s => (-s.score, s.id))

  override def zero: TopKBuf = TopKBuf(Nil)

  override def reduce(b: TopKBuf, in: ScoredId): TopKBuf =
    if (b.items.lengthCompare(k) < 0) TopKBuf((in +: b.items).sorted(ord))
    else if (ord.lt(in, b.items.last)) TopKBuf((in +: b.items.init).sorted(ord))
    else b

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf((a.items ++ b.items).sorted(ord).take(k))

  override def finish(b: TopKBuf): TopKOut = TopKOut(b.items.map(_.id))

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKOut] = Encoders.product[TopKOut]
}
