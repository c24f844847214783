package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The pipeline's TERMINAL stage: materialize a curated, shuffled,
  * packed training set as the artifact a trainer actually consumes —
  * one parquet dataset partitioned by `shard`, rows inside each shard
  * file in `pos` order, so a data loader streams shard K sequentially
  * with zero sorting or shuffling at training time. (Everything upstream
  * — gates, dedup, budget, deterministic shuffle, packing — is the
  * curate_pipeline_* queries; this is the write discipline that makes
  * their output durable WITHOUT losing the training order they
  * computed.)
  *
  * Scale shape: ONE hash repartition on `shard` co-locates each shard
  * into a single task, sortWithinPartitions rides that exchange with a
  * per-task sort (no global sort, no driver involvement), and
  * partitionBy lays each shard out as its own directory — at 100 TB the
  * write parallelism is the shard count, each file internally ordered.
  * A resumable trainer maps epoch position → (shard, pos) arithmetic.
  */
object ExportShards {
  /** Write a (.., shard, pos) frame as shard-partitioned parquet with
    * rows ordered by pos inside each shard's file. */
  def export(df: DataFrame, outDir: String): Unit =
    df.repartition(col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val outDir = args.lift(1).getOrElse(
      sys.error("usage: ExportShards <sfDir> <outDir> [pipelineQuery]"))
    val query = args.lift(2).getOrElse("curate_pipeline_v2")
    val spark = graft.engine.SessionDefaults(SparkSession.builder())
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    export(graft.SparkEntry.queries(query)(spark, sfDir), outDir)
    val n = spark.read.parquet(outDir).count()
    println(f"export-shards $query -> $outDir: $n rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
