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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case other =>
      spark.read.parquet(s"$dir/$other.parquet")
  }

  /** Register a temp view per table so query bodies can use spark.sql. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
