package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch source/sink format surface: CSV and JSON-lines roundtrips with
  * explicit schemas (schema-on-read, no inference pass — at 100 TB an
  * inference scan is a full extra read), plus malformed-record tolerance
  * mirroring the streaming path's json.ignore-parse-errors semantics. */
class FormatsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  test("CSV roundtrip with explicit schema preserves every row and value") {
    val out = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    nation.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.schema(nationSchema).option("header", "true").csv(out)
    assert(back.count() == nation.count())
    val a = back.orderBy("n_nationkey").collect().map(_.toSeq)
    val b = nation.orderBy("n_nationkey").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("JSON-lines roundtrip preserves rows; malformed lines drop not fail") {
    val out = java.nio.file.Files.createTempDirectory("graft-json").toString
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    nation.write.mode("overwrite").json(out)
    val back = spark.read.schema(nationSchema).json(out)
    assert(back.count() == nation.count())

    // corrupt-tolerant read: PERMISSIVE + corrupt-record column, same
    // policy as the streaming JSON source (drop unparseable, keep the rest)
    val mixed = java.nio.file.Files.createTempDirectory("graft-badjson").toString
    import spark.implicits._
    Seq("""{"n_nationkey": 1, "n_name": "A"}""", "{not json",
      """{"n_nationkey": 2, "n_name": "B"}""")
      .toDS().write.mode("overwrite").text(mixed)
    // cache() first: Spark refuses raw-file queries whose only referenced
    // column is the corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val parsed = spark.read
      .schema(nationSchema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(mixed)
      .cache()
    assert(parsed.filter(col("_corrupt").isNull).count() == 2)
    assert(parsed.filter(col("_corrupt").isNotNull).count() == 1)
    parsed.unpersist()
  }

  test("ORC roundtrip preserves rows and pushes filters into the scan") {
    val out = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    orders.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == orders.count())
    // columnar pushdown parity with parquet: the predicate must reach the
    // ORC scan (PushedFilters), not evaluate post-scan only
    val q = back.filter(col("o_totalprice") > 400000).select("o_orderkey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice"), plan)
    assert(q.count() ==
      orders.filter(col("o_totalprice") > 400000).count())
  }
}
