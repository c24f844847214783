package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: the 100 TB answer to the biggest shuffle
  * in the workload. Writing fact tables bucketed (and sorted) by their join
  * key moves the exchange from query time to ingest time — every subsequent
  * join on that key is shuffle-free, which at 1000 executors is the
  * difference between an all-to-all network step and a local merge.
  *
  * The spec pins the property that matters: joining the two bucketed tables
  * produces a SortMergeJoin with ZERO Exchange nodes, and the result equals
  * the plain (shuffling) join.
  */
class BucketingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join runs with zero exchanges and matches plain join") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket-wh").toString
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice")

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_bucketed").saveAsTable("li_bucketed")
    ord.write.format("parquet").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_bucketed").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle path so the assertion is about bucketing, not size
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum("l_extendedprice").as("rev"), first("o_totalprice").as("total"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum("l_extendedprice").as("rev"), first("o_totalprice").as("total"))
      assert(j.count() == plain.count())
      assert(j.agg(round(sum("rev"), 2)).head.getDouble(0)
        == plain.agg(round(sum("rev"), 2)).head.getDouble(0))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("partitionBy write prunes partitions on read") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_returnflag", "l_quantity")
      .write.partitionBy("l_returnflag").mode("overwrite").parquet(out)
    val back = spark.read.parquet(out).filter(col("l_returnflag") === "R")
    val plan = back.queryExecution.executedPlan.toString
    // partition filter must prune at planning time, not scan-and-filter
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    val expect = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_returnflag") === "R").count()
    assert(back.count() == expect)
  }
}
