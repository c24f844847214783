package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.AlertPipeline
import graft.ops.Detection
import graft.rules.ReferenceCorpus

/** Detection-pipeline throughput benchmark: events/sec through the full
  * 25-rule fan-out on synthetic sysmon load (the reference publishes no
  * numbers — BASELINE.md — so this records ours). Measures both topologies:
  * the reference-shaped UNION ALL plan and the merged single-pass dispatch.
  * Batch micro-benchmark — the same logical plan Structured Streaming runs
  * per micro-batch, without trigger-scheduling noise.
  *
  * Run: sbt "runMain graft.StreamBench [nRows]"
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val load = Detection.nestedFrom(Detection.synthFrom(
      spark.range(n).select(col("id").as("event_id"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 1000).as("ts"))))

    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val rows = f
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    // warm up codegen for both plans
    AlertPipeline.alertsMerged(load.limit(1000), ReferenceCorpus.active).count()
    AlertPipeline.alerts(load.limit(1000), ReferenceCorpus.active).count()

    val (alertsMerged, tMerged) =
      time(AlertPipeline.alertsMerged(load, ReferenceCorpus.active).count())
    val (alertsUnion, tUnion) =
      time(AlertPipeline.alerts(load, ReferenceCorpus.active).count())
    require(alertsMerged == alertsUnion, s"$alertsMerged != $alertsUnion")

    println(s"""{"metric":"detect_throughput_eps","value":${(n / tMerged).toLong},""" +
      s""""unit":"events/sec","events":$n,"alerts":$alertsMerged,""" +
      s""""merged_sec":${"%.2f".format(tMerged)},"union_sec":${"%.2f".format(tUnion)},""" +
      s""""union_eps":${(n / tUnion).toLong}}""")
    spark.stop()
  }
}
