package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.rules.RuleDef

/** Sigma `timeframe` (windowed-count) rules — the latent stateful operator
  * the reference deliberately skips (its transpiler rejects any rule with
  * `timeframe`, /root/reference/sigma-transf/main.py:194-195) while its
  * sink schema anticipates them (`event.count BIGINT`, `event.start/end`
  * timestamps, /root/reference/rules/sigma/windows-process-access.sql:45-48).
  *
  * Semantics: events matching the rule predicate, grouped into tumbling
  * event-time windows per key; a window that accumulates >= threshold
  * matches emits ONE alert whose event struct carries count=n,
  * origin_ids=[all matched uuids], start/end=window bounds (the
  * multi-event generalization of the reference's count=1/origin_ids=[uuid]
  * single-event alerts).
  *
  * The same builder serves batch (tests, oracle) and streaming: in
  * streaming, apply `withWatermark` on the source first and Spark runs this
  * as an incremental stateful aggregation with late-data eviction
  * (SURVEY §2.9 T2/T3 — rows later than the watermark are dropped; that is
  * the documented chosen semantics). One hash shuffle on (key, window);
  * partial aggregation is map-side; state size is bounded by watermark ×
  * key cardinality.
  */
object TimeframeRules {

  final case class TimeframeRule(
      base: RuleDef, windowLength: String, threshold: Long, keyCol: String)

  /** Windowed-count alerts over a sysmon frame (batch or pre-watermarked
    * streaming — identical logical plan, SURVEY §7 module 4). */
  def alerts(sysmon: DataFrame, rule: TimeframeRule,
      field: String => Column = f => col("event_data").getField(f)): DataFrame = {
    val matched = sysmon.filter(rule.base.where.toColumn(field))
    matched
      .groupBy(window(col("timestamp"), rule.windowLength), col(rule.keyCol))
      .agg(
        count(lit(1)).as("n"),
        array_sort(collect_list(col("uuid"))).as("origin_ids"),
        min(col("host")).as("host"))
      .filter(col("n") >= rule.threshold)
      .select(
        col(rule.keyCol).as("computer_name"),
        col("host"),
        struct(
          lit("signal").as("kind"),
          rule.base.module.map(lit(_)).getOrElse(lit(null).cast("string")).as("module"),
          col("origin_ids"),
          col("n").as("count"),
          col("window.start").as("start"),
          col("window.end").as("end"),
          col("window.end").as("time")).as("event"))
  }
}
