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
    spark.stop()
  }
}
