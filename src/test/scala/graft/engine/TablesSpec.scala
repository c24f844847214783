package graft.engine

import graft.SparkSpec

/** Pins the table-cache semantics that fixed the round-2 SQL-entry
  * regressions: repeat lookups must not re-read parquet footers, and a
  * session that switches sf dirs must re-register its views (a stale
  * "seen" set here would silently serve the wrong dir's data). */
class TablesSpec extends SparkSpec {
  private val dirA = "/root/testdata/sf0.001"
  private val dirB = "/root/testdata/sf0.01"

  test("repeat table lookups return the cached DataFrame (no footer re-read)") {
    val first = Tables(spark, dirA, "orders")
    assert(Tables(spark, dirA, "orders") eq first)
  }

  test("registerAll is idempotent per dir but re-registers on dir switch") {
    Tables.registerAll(spark, dirA)
    val a = spark.sql("SELECT count(*) AS n FROM orders").head.getLong(0)
    Tables.registerAll(spark, dirB)
    val b = spark.sql("SELECT count(*) AS n FROM orders").head.getLong(0)
    assert(b > a, s"dir switch must re-point the views (a=$a, b=$b)")
    // ...and switching back must also re-register, not no-op
    Tables.registerAll(spark, dirA)
    val a2 = spark.sql("SELECT count(*) AS n FROM orders").head.getLong(0)
    assert(a2 == a, s"switch-back must restore dirA's views (a=$a, a2=$a2)")
  }

  test("stat and index-frame memos compute once and die with their session") {
    var statBuilds = 0
    val n1 = Tables.cachedStat(spark, dirA, "test_stat") { statBuilds += 1; 42L }
    val n2 = Tables.cachedStat(spark, dirA, "test_stat") { statBuilds += 1; 99L }
    assert(n1 == 42L && n2 == 42L && statBuilds == 1,
      "second lookup must serve the memo, not recompute")
    var frameBuilds = 0
    def build = { frameBuilds += 1; Tables(spark, dirA, "region").limit(2) }
    val f1 = Tables.cachedFrame(spark, dirA, "test_frame")(build)
    val f2 = Tables.cachedFrame(spark, dirA, "test_frame")(build)
    assert((f1 eq f2) && frameBuilds == 1, "index frame must build once")
    assert(f1.count() == 2, "memoized frame must be the checkpointed build")
    // dead-session purge clears both memo kinds (injected predicate — a
    // real stop would kill the suite's shared SparkContext)
    Tables.purge(dead = _ => true)
    val n3 = Tables.cachedStat(spark, dirA, "test_stat") { statBuilds += 1; 7L }
    assert(n3 == 7L && statBuilds == 2, "post-purge stat lookup recomputes")
    val f3 = Tables.cachedFrame(spark, dirA, "test_frame")(build)
    assert(!(f3 eq f1) && frameBuilds == 2, "post-purge frame lookup rebuilds")
  }

  test("cache evicts dead sessions' plans instead of retaining them for JVM life") {
    val before = Tables(spark, dirA, "nation")
    assert(Tables.cachedPlanCount > 0)
    // simulate every session dying (a real stop would kill the suite's
    // shared SparkContext, so the deadness predicate is injected)
    Tables.purge(dead = _ => true)
    assert(Tables.cachedPlanCount == 0, "purge must empty the cache")
    // next lookup reloads rather than serving the evicted plan
    val after = Tables(spark, dirA, "nation")
    assert(!(after eq before), "post-purge lookup must be a fresh load")
    // live sessions are untouched by the production predicate
    assert(Tables(spark, dirA, "nation") eq after)
  }
}
