package graft

/** Runs the fleet-wide plan audit as a test: EVERY registered query's
  * physical plan (plan build only, nothing executes) must be free of
  * cartesian products, non-broadcast nested-loop joins, data-bearing
  * single-partition exchanges, 10+-shuffle pileups, and big-table scans
  * consumed outside whole-stage codegen. PlanSpec pins the important
  * plans precisely; this catches a scale regression in any query nobody
  * thought to pin. */
class PlanAuditSpec extends SparkSpec {
  test("no registered query has a scale-hostile plan shape") {
    val flagged = PlanAudit.audit(spark, "/root/testdata/sf0.001")
    assert(flagged.isEmpty, flagged.map { case (n, f) => s"$n: $f" }.mkString("; "))
  }

  test("the interpreted-scan detector fires when codegen is disabled (negative control)") {
    // 0-flagged above is only meaningful if the detector CAN flag: turn
    // whole-stage codegen off and the same audit must report interpreted
    // big-table scans everywhere
    val before = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val flagged = PlanAudit.audit(spark, "/root/testdata/sf0.001")
      assert(flagged.exists(_._2.contains("interpreted big-table scan")),
        s"detector failed to fire with codegen off: $flagged")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", before)
  }
}
