package graft.engine

import org.apache.spark.sql.SparkSession

/** Library-recommended SparkSession configuration, applied by every
  * graft-owned entry point (benches, Verify, jobs, probes) and documented
  * as the deployment baseline for users who build their own sessions.
  *
  * `spark.sql.codegen.hugeMethodLimit=8000` — Spark's default (65535)
  * keeps whole-stage fusion for any generated method Janino can compile,
  * but HotSpot refuses to JIT methods above 8000 bytecode
  * (-XX:+DontCompileHugeMethods is the JVM default), so a fused stage
  * whose method lands in the 8-64 KB window runs INTERPRETED generated
  * code — silently, with no log line and no plan marker. Round 12
  * measured the 25-rule merged detection dispatch exactly there: 400k
  * event micro-batches took 2.1 s interpreted vs 0.54 s once Spark was
  * told to abandon fusion at the JIT ceiling (per-operator codegen
  * compiles expression-level methods that split and JIT fine). 8000
  * aligns Spark's fallback threshold with the JVM's compile ceiling, so
  * "fused" always implies "JIT-able". PlanAudit's dead-zone report lists
  * the stages that take the per-operator path under this setting.
  */
object SessionDefaults {
  /** Env-overridable (GRAFT_HUGE_METHOD_LIMIT) so a measurement A/B can
    * revert to Spark's default (65535) without a rebuild. */
  val HugeMethodLimit: String =
    sys.env.getOrElse("GRAFT_HUGE_METHOD_LIMIT", "8000")

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.codegen.hugeMethodLimit", HugeMethodLimit)
}
