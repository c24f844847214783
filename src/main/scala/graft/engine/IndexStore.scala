package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable form of the session index memo: persist a built index frame
  * (IVF centroids, k-means inverted lists, LSH buckets, q8 quantized
  * vectors, dedup band signatures) as parquet and have later sessions
  * PROBE the stored table instead of rebuilding from the corpus.
  *
  * `Tables.cachedFrame` is the within-session memo; this is the
  * across-session lifecycle a real deployment runs: the index build is a
  * dedicated (once) job writing a table, queries only read it. Wired into
  * the query paths via `GRAFT_INDEX_DIR` (see Tables.cachedFrame) — when
  * set, a fresh session resolves every durable index through the store.
  * Parquet round-trips every index schema used here (arrays of
  * float/double/long, longs) bit-exactly — IndexStoreSpec pins that a
  * probe over the loaded frame returns the identical result set.
  */
object IndexStore {
  /** Per-path count of index builds this JVM has run through `loadOrBuild`
    * — DurableIndexSpec asserts a warm store serves probing sessions with
    * these counters flat (exactly one build per stored index, ever). */
  private[graft] val buildCounts =
    scala.collection.concurrent.TrieMap.empty[String, Int]

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True only for a COMPLETE stored index. The parquet commit protocol
    * writes `_SUCCESS` last, so a path without the marker is a crashed
    * partial write and must be rebuilt, not served. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val marker = new Path(path, "_SUCCESS")
    fsOf(spark, marker).exists(marker)
  }

  /** Atomic publish: write to a temp sibling, then rename into place, so a
    * concurrent reader never observes a half-written index directory and a
    * crash mid-save leaves no marker at the final path. */
  def save(index: DataFrame, path: String): Unit = {
    val dest = new Path(path)
    val tmp = new Path(path + ".inprogress")
    val fs = fsOf(index.sparkSession, dest)
    index.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dest)) fs.delete(dest, true)
    if (!fs.rename(tmp, dest))
      sys.error(s"IndexStore: could not publish $tmp -> $dest")
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Load the index at `path` if a complete one exists; otherwise run
    * `build`, persist it, and serve the stored copy (so first use and every
    * later use read the same bytes). */
  def loadOrBuild(spark: SparkSession, path: String)(build: => DataFrame): DataFrame = {
    if (!exists(spark, path)) {
      buildCounts.updateWith(path)(c => Some(c.getOrElse(0) + 1))
      save(build, path)
    }
    load(spark, path)
  }

  /** Index MAINTENANCE: append a batch's rows to an existing stored index
    * so the next batch dedups/probes against base + this batch. Callers own
    * the key-space discipline (e.g. dedup doc-id offsets per batch). The
    * parquet files land before the read that follows; appending concurrent
    * with a probe is the usual eventually-visible table-append semantics. */
  def append(rows: DataFrame, path: String): Unit =
    rows.write.mode("append").parquet(path)
}
