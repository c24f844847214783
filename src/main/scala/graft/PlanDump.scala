package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a comma-separated list of registry
  * queries (or `all`) into one file per query — the plan evidence the
  * optimization rounds commit under plans/r<N>/ so a reviewer can check
  * plan-shape claims (Exchange counts, join strategies, PushedFilters)
  * without running Spark.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [q1,q2,...|all] [sfDir]
  * Writes <outDir>/<query>_<suffix>.txt
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(sys.error(
      "usage: PlanDump <outDir> <suffix> [q1,q2,...|all] [sfDir]"))
    val suffix = args.lift(1).getOrElse("before")
    val names = args.lift(2).filterNot(_ == "all") match {
      case Some(csv) => csv.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    val dir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.SessionDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"plandump: unknown query $name — skipped")
        case Some(fn) =>
          val df = fn(spark, dir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
            txt.getBytes(StandardCharsets.UTF_8))
          println(s"plandump: wrote $outDir/${name}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
