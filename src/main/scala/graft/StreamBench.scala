package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.compile.{And, Like}
import graft.engine.AlertPipeline
import graft.ops.Detection
import graft.rules.{ReferenceCorpus, RuleDef}

/** Detection-pipeline throughput benchmark: events/sec through the rule
  * fan-out on synthetic sysmon load (the reference publishes no numbers —
  * BASELINE.md — so this records ours). Measures both topologies: the
  * reference-shaped UNION ALL plan and the merged single-pass dispatch.
  * Batch micro-benchmark — the same logical plan Structured Streaming runs
  * per micro-batch, without trigger-scheduling noise.
  *
  * Run: sbt "runMain graft.StreamBench [nRows] [nRules]"
  *
  * nRules > 25 exercises the 1000-rule scale path (SURVEY §4 "plan size"):
  * the corpus is cloned with an extra per-variant conjunct — every variant's
  * predicate is fully evaluated per event, but only the base 25 fire, so
  * alert volume stays constant and the measurement isolates
  * predicate-evaluation scaling. The union topology is only measured up to
  * 50 rules: its plan has O(rules) operators and O(rules) source re-scans
  * in batch, which is exactly the shape that cannot scale — the merged
  * dispatch stays ONE projection + explode + broadcast-join at any rule
  * count.
  */
object StreamBench {

  /** base rules + never-firing literal variants, round-robin to n. */
  def cloneRules(base: Seq[RuleDef], n: Int): Seq[RuleDef] =
    Iterator.from(0).flatMap { i =>
      base.map { r =>
        if (i == 0) r
        else r.copy(name = s"${r.name} [v$i]",
          where = And(r.where, Like("CommandLine", s"%__variant_$i%")))
      }
    }.take(n).toSeq

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nRules = args.drop(1).headOption.map(_.toInt).getOrElse(25)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rules = cloneRules(ReferenceCorpus.active, nRules)
    val load = Detection.nestedFrom(Detection.synthFrom(
      spark.range(n).select(col("id").as("event_id"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 1000).as("ts"))))

    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val rows = f
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    val measureUnion = rules.size <= 50

    // warm up codegen for the measured plans
    AlertPipeline.alertsMerged(load.limit(1000), rules).count()
    if (measureUnion) AlertPipeline.alerts(load.limit(1000), rules).count()

    val (alertsMerged, tMerged) =
      time(AlertPipeline.alertsMerged(load, rules).count())
    val unionPart =
      if (measureUnion) {
        val (alertsUnion, tUnion) = time(AlertPipeline.alerts(load, rules).count())
        require(alertsMerged == alertsUnion, s"$alertsMerged != $alertsUnion")
        s""","union_sec":${"%.2f".format(tUnion)},"union_eps":${(n / tUnion).toLong}"""
      } else ""

    val planNodes = AlertPipeline.alertsMerged(load, rules)
      .queryExecution.optimizedPlan.collect { case p => p }.size

    println(s"""{"metric":"detect_throughput_eps","value":${(n / tMerged).toLong},""" +
      s""""unit":"events/sec","events":$n,"rules":${rules.size},""" +
      s""""alerts":$alertsMerged,"plan_nodes":$planNodes,""" +
      s""""merged_sec":${"%.2f".format(tMerged)}$unionPart}""")

    // ---- micro-batch latency: the one axis where the Flink reference
    // architecturally differs (per-record push vs micro-batch pull). Run
    // the SAME merged dispatch as a real streaming query — rate source →
    // rules → noop sink — and record each trigger's execution time via
    // StreamingQueryListener; p50/p95 of trigger→sink IS the added
    // detection latency an alert consumer sees over Flink's per-record
    // path. Unthrottled trigger: each batch drains what arrived during the
    // previous one, so the measured durations are the steady-state floor.
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val d = e.progress.durationMs.get("triggerExecution")
        if (e.progress.numInputRows > 0 && d != null) durations.add(d)
      }
    }
    spark.streams.addListener(listener)
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", sys.env.getOrElse("SPARK_GRAFT_STREAM_RPS", "50000"))
      .option("numPartitions", 8).load()
      .select(col("value").as("event_id"), col("timestamp").as("ts"))
    val q = AlertPipeline
      .alertsMerged(Detection.nestedFrom(Detection.synthFrom(stream)), rules)
      .writeStream.format("noop").outputMode("append").start()
    try {
      // 25 measured batches ≈ a stable percentile; cap wall time regardless
      // (large rule counts take much longer per trigger — the first pays
      // whole-stage codegen over the 1000-conjunct dispatch — so the cap
      // scales with the rule count and is env-overridable)
      val capSec = sys.env.getOrElse("SPARK_GRAFT_STREAM_SEC",
        if (rules.size > 50) "240" else "60").toLong
      val deadline = System.nanoTime() + capSec * 1000 * 1000 * 1000
      while (durations.size < 28 && System.nanoTime() < deadline) Thread.sleep(200)
    } finally { q.stop(); spark.streams.removeListener(listener) }
    val all = durations.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    // first triggers pay codegen/broadcast warm-up, not latency — but keep
    // at least half the sample when few batches completed
    val ds = all.drop(math.min(3, all.length / 2)).sorted
    def pct(p: Double): Long =
      if (ds.isEmpty) -1 else ds(math.min(ds.length - 1, math.ceil(p * ds.length).toInt - 1))
    println(s"""{"metric":"detect_latency_ms","rules":${rules.size},""" +
      s""""batches":${ds.length},"p50":${pct(0.5)},"p95":${pct(0.95)},""" +
      s""""max":${if (ds.isEmpty) -1 else ds.last}}""")
    spark.stop()
  }
}
