package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.AlertPipeline
import graft.ops.Detection

/** The 1000-rule fan-out probe (SURVEY §4 "plan size at 1000s of rules",
  * r10 verdict task #4): generate ~1000 synthetic Sigma YAML rules,
  * compile them through the REAL directory pipeline
  * (RuleCompiler.compileDir — the same path a deployment's rule repo
  * takes), and measure, at 25 / 250 / 1000 rules:
  *
  *   - YAML→Pred compile time for the whole directory
  *   - logical→physical PLAN-BUILD time for both fan-out topologies
  *     (union `alerts` vs merged-dispatch `alertsMerged`) — the driver-
  *     side cost every trigger re-pays in streaming restarts and every
  *     batch job pays once
  *   - optimized-plan node count for both (the union plan is O(rules),
  *     the merged plan O(1) — the structural claim, measured)
  *   - per-event THROUGHPUT of the merged dispatch over a fixed
  *     synthetic batch (the union topology is only run at 25 rules:
  *     its batch form re-scans the source per branch, the shape that
  *     cannot scale — StreamBench.measureUnion's rationale)
  *
  * The synthetic rules are never-firing `CommandLine|contains`
  * two-literal disjunctions with UNIQUE per-rule patterns (no
  * codegen-CSE collapse — the StreamBench cloneRules lesson), except
  * every 25th rule, which matches a literal from the synth pool so the
  * 25-rule union-vs-merged equality check compares real alert counts,
  * not 0 == 0.
  *
  * Usage: runMain graft.RuleFanoutProbe [nEvents]
  * Output: one JSON line; $GRAFT_FANOUT_JSON gets the same JSON if set.
  */
object RuleFanoutProbe {
  private[graft] val counts = Seq(25, 250, 1000)

  /** One synthetic Sigma YAML document. Every 25th rule carries a
    * pool literal ("cmdkey /list") so it actually fires on synth load.
    * Patterns are hyphen-separated — `_` is LIKE's single-char wildcard
    * and would make each literal subtly broader than written. */
  private[graft] def ruleYaml(i: Int): String = {
    val fire = if (i % 25 == 0) "\n      - 'cmdkey /list'" else ""
    s"""title: Synthetic fan-out probe rule $i
       |author: probe
       |level: medium
       |description: synthetic probe rule $i
       |tags:
       |  - attack.execution
       |  - attack.t1059
       |logsource:
       |  category: process_creation
       |detection:
       |  selection:
       |    CommandLine|contains:
       |      - '--fanout-probe-$i-a'
       |      - '--fanout-probe-$i-b'$fire
       |  condition: selection
       |""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.SessionDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- generate + compile the rule directory (the real C8 path) ----
    val dir = Files.createTempDirectory("graft-fanout-rules")
    (0 until counts.max).foreach { i =>
      Files.write(dir.resolve(f"synthetic_$i%04d.yml"),
        ruleYaml(i).getBytes(StandardCharsets.UTF_8))
    }
    val c0 = System.nanoTime()
    val rules = compile.RuleCompiler.compileDir(dir.toString)
    val compileSec = (System.nanoTime() - c0) / 1e9
    require(rules.size == counts.max, s"compiled ${rules.size} of ${counts.max}")

    val load = Detection.nestedFrom(Detection.synthFrom(
      spark.range(n).select(col("id").as("event_id"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 1000).as("ts"))))
      .localCheckpoint() // one materialization; every probe scans memory

    def planSec(df: => org.apache.spark.sql.DataFrame): (Double, Int) = {
      val t0 = System.nanoTime()
      val qe = df.queryExecution
      qe.executedPlan // force analysis → optimization → physical planning
      ((System.nanoTime() - t0) / 1e9,
        qe.optimizedPlan.collect { case p => p }.size)
    }
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val rows = f
      (rows, (System.nanoTime() - t0) / 1e9)
    }

    // semantic check at 25 rules: union == merged on real alert counts
    val r25 = rules.take(25)
    AlertPipeline.alertsMerged(load.limit(1000), r25).count() // codegen warm
    val (m25, _) = timed(AlertPipeline.alertsMerged(load, r25).count())
    val (u25, _) = timed(AlertPipeline.alerts(load, r25).count())
    require(m25 == u25 && m25 > 0,
      s"union/merged disagree or nothing fired: merged=$m25 union=$u25")

    val rows = counts.map { k =>
      val rs = rules.take(k)
      val (mergedPlanSec, mergedNodes) = planSec(AlertPipeline.alertsMerged(load, rs))
      val (unionPlanSec, unionNodes) = planSec(AlertPipeline.alerts(load, rs))
      AlertPipeline.alertsMerged(load.limit(1000), rs).count() // codegen warm
      val (alerts, sec) = timed(AlertPipeline.alertsMerged(load, rs).count())
      f"""{"rules":$k,"merged_plan_sec":$mergedPlanSec%.2f,""" +
        f""""union_plan_sec":$unionPlanSec%.2f,""" +
        f""""merged_plan_nodes":$mergedNodes,"union_plan_nodes":$unionNodes,""" +
        f""""merged_sec":$sec%.2f,"merged_eps":${(n / sec).toLong},"alerts":$alerts}"""
    }
    val json = s"""{"metric":"rule_fanout_probe","events":$n,""" +
      f""""compile_sec":$compileSec%.2f,"compiled":${rules.size},""" +
      s""""points":[${rows.mkString(",")}]}"""
    println(json)
    sys.env.get("GRAFT_FANOUT_JSON").foreach(p =>
      Files.write(Paths.get(p), json.getBytes(StandardCharsets.UTF_8)))
    spark.stop()
  }
}
