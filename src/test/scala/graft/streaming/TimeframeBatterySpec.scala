package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Detection
import graft.rules.ReferenceCorpus
import graft.schema.Schemas

/** The timeframe-rule battery (round 13): N windowed-count rules in ONE
  * stateful aggregation via rule_dispatch. Batch semantics are pinned
  * equal to the per-rule [[TimeframeRules.alerts]] path (and the
  * tf_battery_counts DuckDB oracle); streaming runs the battery as one
  * query with ONE state operator — the scale story vs N queries. */
class TimeframeBatterySpec extends SparkSpec {

  test("battery == union of per-rule timeframe alerts (batch, synth corpus)") {
    val src = Detection.nested(spark, "/root/testdata/sf0.001")
    val battery = Detection.tfBattery
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(to_json(struct(col("rule_name"), col("computer_name"),
        col("host"), col("event")))).collect().map(_.getString(0)).toSet
    val viaBattery = canon(TimeframeRules.alertsBattery(src, battery))
    val viaPerRule = battery.map { r =>
      canon(TimeframeRules.alerts(src, r)
        .withColumn("rule_name", lit(r.base.name)))
    }.reduce(_ union _)
    assert(viaBattery.nonEmpty && viaBattery == viaPerRule)
  }

  test("streaming battery: one query, ONE state operator, per-rid thresholds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, String, java.sql.Timestamp, String, String)]
    // full sysmon shape: rule_dispatch resolves every referenced
    // event_data field by ordinal, so the struct carries the whole schema
    val flat = mem.toDF()
      .toDF("computer_name", "host", "uuid", "timestamp", "CallTrace", "CommandLine")
    val src = flat.select(
      col("computer_name"),
      when(col("CallTrace").isNotNull, lit(10L)).otherwise(lit(1L)).as("event_id"),
      col("host"),
      struct(Schemas.eventDataFields.map {
        case "CallTrace" => col("CallTrace").as("CallTrace")
        case "CommandLine" => col("CommandLine").as("CommandLine")
        case "Image" => when(col("CommandLine").isNotNull,
          lit("""C:\Windows\System32\cmdkey.exe""")).as("Image")
        case f => lit(null).cast("string").as(f)
      }: _*).as("event_data"),
      col("uuid"), col("timestamp"))
    val battery = Seq(
      TimeframeRules.TimeframeRule(
        ReferenceCorpus.directSyscall, "10 minutes", 2L, "computer_name"),
      TimeframeRules.TimeframeRule(
        ReferenceCorpus.cmdkeyRecon, "10 minutes", 1L, "computer_name"))
    val alerts = TimeframeRules.alertsBattery(
      src.withWatermark("timestamp", "5 seconds"), battery)
    val q = alerts.writeStream.format("memory").queryName("tf_battery_t1")
      .outputMode("update").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
      // batch 1: one syscall event for pc1 (below threshold 2), one cmdkey
      // recon for pc2 (threshold 1 → alerts immediately)
      mem.addData(
        ("pc1", "h", "a1", ts(1), "UNKNOWN(1)", null),
        ("pc2", "h", "c1", ts(2), null, "cmdkey /list"))
      q.processAllAvailable()
      // batch 2: the second pc1 syscall in the same window — the battery's
      // state must carry the count across micro-batches
      mem.addData(("pc1", "h", "a2", ts(3), "UNKNOWN(2)", null))
      q.processAllAvailable()
      val out = spark.table("tf_battery_t1")
        .select(col("rule_name"), col("computer_name"), col("event.count"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(out == Set(
        (ReferenceCorpus.cmdkeyRecon.name, "pc2", 1L),
        (ReferenceCorpus.directSyscall.name, "pc1", 2L)), out.toString)
      // the scale claim: the whole battery runs in ONE stateful operator
      assert(q.lastProgress.stateOperators.length == 1,
        s"expected 1 state operator, got ${q.lastProgress.stateOperators.length}")
    } finally q.stop()
  }
}
