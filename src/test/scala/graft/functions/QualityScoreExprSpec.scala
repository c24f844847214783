package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualityScoreExprSpec extends SparkSpec {

  test("quality_score_md5 equals the exploded word-id formulation on real documents") {
    GraftFunctions.register(spark)
    val w = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    // the r8 declarative spelling: per-word p31 ids -> bucket -> weight -> sum
    val legacy = w
      .select(col("doc_id"), explode(expr("word_ids_md5(w, 'p31')")).as("gid"))
      .select(col("doc_id"),
        ((col("gid") % 1024L) * 2654435761L % 2001L - 1000L).as("wt"))
      .groupBy("doc_id").agg(sum("wt").as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = w.select(col("doc_id"), expr("quality_score_md5(w)").as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.keySet == legacy.keySet)
    legacy.foreach { case (id, s) => assert(fused(id) == s, s"doc $id") }
  }

  test("quality_score_md5: empty array scores 0; null element yields NULL; null array yields NULL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT quality_score_md5(CAST(array() AS ARRAY<STRING>)) AS empty,
                quality_score_md5(array('a', CAST(NULL AS STRING))) AS withnull,
                quality_score_md5(CAST(NULL AS ARRAY<STRING>)) AS nullarr""")
      .collect()(0)
    assert(r.getLong(0) == 0L)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }
}
