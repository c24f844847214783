package graft

/** Runs the fleet-wide plan audit as a test: EVERY registered query's
  * physical plan (plan build only, nothing executes) must be free of
  * cartesian products, non-broadcast nested-loop joins, data-bearing
  * single-partition exchanges, and 10+-shuffle pileups. PlanSpec pins the
  * important plans precisely; this catches a scale regression in any
  * query nobody thought to pin. */
class PlanAuditSpec extends SparkSpec {
  test("no registered query has a scale-hostile plan shape") {
    val flagged = PlanAudit.audit(spark, "/root/testdata/sf0.001")
    assert(flagged.isEmpty, flagged.map { case (n, f) => s"$n: $f" }.mkString("; "))
  }
}
