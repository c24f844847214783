package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness — the isolation tool for telling a real
  * per-query regression from bench-session load (the round-5 sim_lsh_ann
  * regression hid inside session noise for most of a round because the only
  * measurement ran all 33 headline queries in one session).
  *
  * Usage: runMain graft.QueryTimer <query> [sfDir] [reps]
  * Prints one line per rep plus min/median after an untimed warm-up rep.
  *
  * GRAFT_FORCE=all switches the forcing action from count() to a noop-sink
  * write. count() matches the bench's historical semantics, but for a PURE
  * PROJECTION query the optimizer prunes every computed column and
  * eliminates the sort under the count — the timing then measures the scan
  * and any index fetch, not the operator (text_bpe_tokens was the first
  * probed query narrow enough to hit this). The noop write materializes
  * every output column without sink IO.
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: QueryTimer <query> [sfDir] [reps]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.SessionDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("GRAFT_JOBLOG")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts(js.jobId) = (System.nanoTime(),
            Option(js.properties).map(_.getProperty("spark.job.description", "")).getOrElse(""))
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          starts.remove(je.jobId).foreach { case (t0, desc) =>
            println(f"  job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  ${desc.take(80)}")
          }
      })
    }
    val fn = SparkEntry.queries(name)
    if (args.lift(2).contains("explain")) {
      fn(spark, dir).explain("formatted")
      spark.stop()
      return
    }
    // GRAFT_PHASES=1 (round 19, VERDICT r18 #1): per-rep DRIVER-side
    // breakdown. Splits each rep into plan-BUILD time (the query fn —
    // every intermediate Dataset's eager analysis, localCheckpoint
    // materialization included) vs the action, prints each executed
    // query's Catalyst phase durations (analysis/optimization/planning)
    // from its QueryPlanningTracker, and dumps the per-rule Catalyst
    // time aggregated over the rep (RuleExecutor metering, reset at rep
    // start) so the worst re-folded trees are attributable by NAME.
    val phases = sys.env.contains("GRAFT_PHASES")
    if (phases) {
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
          val ph = qe.tracker.phases.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=${v.durationMs}ms" }.mkString(" ")
          println(f"    exec[$funcName] ${durationNs / 1e9}%.3f s  $ph")
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
      })
    }
    val forceAll = sys.env.get("GRAFT_FORCE").contains("all")
    def force(): Long = {
      if (phases) org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
      val b0 = System.nanoTime()
      val df = fn(spark, dir)
      if (phases) println(f"    build: ${(System.nanoTime() - b0) / 1e9}%.3f s")
      val n =
        if (forceAll) { df.write.format("noop").mode("overwrite").save(); -1L }
        else df.count()
      if (phases) {
        // top Catalyst rules by time over this rep (build + action)
        val dump = org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
        val rows = dump.linesIterator
          .filter(l => l.contains("org.apache.spark") && l.trim.nonEmpty)
          .toSeq
        rows.take(12).foreach(l => println("    " + l.trim.take(140)))
      }
      n
    }
    // warm-up: JIT, parquet footers, memoized stats — but ALSO the build
    // of any session-memoized index the query resolves through, so its
    // duration is the first-invocation (build-inclusive) cost; printed
    // because for index-backed queries that build IS the number a
    // deployment's index job pays (the timed reps below are the probes)
    val w0 = System.nanoTime()
    force()
    println(f"warmup (build-inclusive): ${(System.nanoTime() - w0) / 1e9}%.3f s")
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val rows = force()
      val sec = (System.nanoTime() - t0) / 1e9
      val suffix = if (forceAll) "" else s" ($rows rows)"
      println(f"rep $i: $sec%.3f s$suffix")
      sec
    }.sorted
    println(f"$name min=${times.head}%.3f med=${times(reps / 2)}%.3f max=${times.last}%.3f")
    spark.stop()
  }
}
