package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (repo:TESTDATA.md).
  *
  * All tables are plain parquet reads except `events`, whose `ts` column is
  * parquet INT64 TIMESTAMP(NANOS) — Spark 4 refuses it unless
  * `spark.sql.legacy.parquet.nanosAsLong=true`, which surfaces it as a LONG
  * of nanoseconds. We convert to a proper µs TimestampType with integer
  * `div` (a double division would lose precision above 2^53 ns). DuckDB
  * reads the same column as a µs-truncated TIMESTAMP, so both engines see
  * identical µs values.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Per-(session, dir, table) DataFrame cache. `spark.read.parquet` lists
  // files and reads footers on the DRIVER at plan-build time; doing that for
  // 10 tables on every query invocation is pure driver-side overhead (the
  // r2 bench measured the SQL-entry queries 2-3x slower for exactly this
  // reason). Keyed by session identity so tests with fresh sessions don't
  // see stale plans. Entries for STOPPED sessions are purged on every
  // access (a cached plan holds its session and its snapshotted file
  // listing — retaining those for JVM life leaks the whole session state,
  // and a long-lived app cycling sessions would grow without bound).
  // Within a live session the cache means a dir's files are listed once:
  // callers must treat a (session, dir) pair as immutable — overwriting a
  // parquet dir mid-session would serve the stale listing.
  private val dfCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]
  // The dir whose views are CURRENTLY registered in each session. A plain
  // "seen" set would go stale if a session switches dirs and back (views are
  // replaced by name), so we key on the live registration instead.
  private val registeredDir =
    scala.collection.concurrent.TrieMap.empty[SparkSession, String]

  /** Drop every cache entry whose session satisfies `dead`. The predicate
    * is injectable because a spec can't stop a real session (the test JVM
    * shares one SparkContext); production callers use the default. */
  private[graft] def purge(
      dead: SparkSession => Boolean = _.sparkContext.isStopped): Unit = {
    dfCache.keysIterator.filter(k => dead(k._1)).foreach(dfCache.remove)
    registeredDir.keysIterator.filter(dead).foreach(registeredDir.remove)
  }

  /** Live cached-plan count (stopped sessions purged first) — for tests. */
  private[graft] def cachedPlanCount: Int = { purge(); dfCache.size }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    purge()
    dfCache.getOrElseUpdate((spark, dir, name), load(spark, dir, name))
  }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case other =>
      spark.read.parquet(s"$dir/$other.parquet")
  }

  /** Register a temp view per table so query bodies can use spark.sql.
    * Idempotent per (session, dir): repeat calls are a map lookup, not ten
    * parquet re-reads.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = synchronized {
    if (!registeredDir.get(spark).contains(dir)) {
      all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
      registeredDir(spark) = dir
    }
  }
}
