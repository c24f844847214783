package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable form of the session index memo: persist a built index frame
  * (IVF centroids, k-means inverted lists, LSH buckets, q8 quantized
  * vectors, dedup band signatures) as parquet and have later sessions
  * PROBE the stored table instead of rebuilding from the corpus.
  *
  * `Tables.cachedFrame` is the within-session memo; this is the
  * across-session lifecycle a real deployment runs: the index build is a
  * dedicated (once) job writing a table, queries only read it. Parquet
  * round-trips every index schema used here (arrays of float/double/long,
  * longs) bit-exactly — IndexStoreSpec pins that a probe over the loaded
  * frame returns the identical result set.
  */
object IndexStore {
  def save(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Load the index at `path` if it exists; otherwise run `build`, persist
    * it, and serve the stored copy (so first use and every later use read
    * the same bytes). */
  def loadOrBuild(spark: SparkSession, path: String)(build: => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) save(build, path)
    load(spark, path)
  }
}
