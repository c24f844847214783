package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sequence-correlation rules: "event B on the same key within `gap` AFTER
  * event A" — the Sigma correlation class the reference's transpiler
  * explicitly rejects (`/root/reference/sigma-transf/main.py:194-195`
  * returns '' for any rule with `timeframe`; correlation rules are the
  * stateful superset of those). This is the custom-state tier of the
  * streaming surface: `KeyValueGroupedDataset.flatMapGroupsWithState`,
  * keyed by the correlation key, state = the latest qualifying A-event.
  *
  * THE SAME function runs batch and streaming (the repo-wide design rule —
  * identical logical semantics both modes):
  *  - streaming: state persists in the state store across micro-batches;
  *    an A in batch n correlates with a B in batch n+k. Rows inside one
  *    micro-batch are sorted by event time before applying state (Spark
  *    hands the group iterator unordered); ACROSS batches, ordering is by
  *    arrival — bounded-disorder sources should pre-sort per trigger
  *    (watermark semantics, SURVEY §2.9 T3).
  *  - batch: each key's full history arrives as one group; state starts
  *    empty, the in-group sort makes processing exactly time-ordered, so
  *    batch output == streaming output for in-order sources (the
  *    equivalence the DuckDB window oracle checks).
  *
  * Scale: one hash shuffle on the key; state per key is O(1) — ONLY the
  * latest A (ts, id), not a buffer of events; the in-group sort is
  * per-key-per-batch (micro-batch sized in streaming, bounded by key
  * cardinality × event rate, never global).
  */
object SequenceRules {

  /** One event entering the correlator. kind: 0 = A (antecedent),
    * 1 = B (consequent). ts_us = event-time micros. */
  final case class SeqEvent(key: String, eid: Long, ts_us: Long, kind: Int)

  /** Correlated match: the B event plus the latest A within the gap. */
  final case class SeqAlert(key: String, b_eid: Long, a_eid: Long, gap_us: Long)

  /** Latest qualifying A event seen for this key. */
  final case class SeqState(a_eid: Long, a_ts_us: Long)

  /** A→B within gapUs, per key. In-batch rows are processed in
    * (ts, kind) order: an A and a B at the same timestamp correlate
    * (A sorts first) — mirrored by the oracle's window ORDER BY. */
  def correlate(gapUs: Long)(
      key: String, rows: Iterator[SeqEvent], state: GroupState[SeqState])
      : Iterator[SeqAlert] = {
    var last = state.getOption
    val out = Vector.newBuilder[SeqAlert]
    rows.toVector.sortBy(e => (e.ts_us, e.kind)).foreach { e =>
      if (e.kind == 0) last = Some(SeqState(e.eid, e.ts_us))
      else last.foreach { a =>
        val gap = e.ts_us - a.a_ts_us
        if (gap >= 0 && gap <= gapUs) out += SeqAlert(key, e.eid, a.a_eid, gap)
      }
    }
    last match {
      case Some(s) => state.update(s)
      case None => ()
    }
    out.result().iterator
  }

  /** Batch AND streaming entry: correlated alerts from a SeqEvent stream. */
  def alerts(events: Dataset[SeqEvent], gapUs: Long): Dataset[SeqAlert] = {
    val s: SparkSession = events.sparkSession
    import s.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        correlate(gapUs))
  }
}
