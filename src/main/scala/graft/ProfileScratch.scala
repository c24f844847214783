package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the library surface). */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[32]").appName("prof")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    ops.Relational.queries("agg_q1_pricing")(spark, dir).count() // warm
    val q3 = SparkEntry.queries("sql_q3_shipping")
    t("q3_cold") { q3(spark, dir).count() }
    t("q3_warm") { q3(spark, dir).count() }
    println("=== q3 plan ===")
    q3(spark, dir).explain("formatted")
    val fo = SparkEntry.queries("sig_fanout_counts")
    t("fanout_cold") { fo(spark, dir).count() }
    t("fanout_warm") { fo(spark, dir).count() }
    spark.stop()
  }
}
