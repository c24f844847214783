package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WordIdsExprSpec extends SparkSpec {

  test("word_ids_md5 modes match the declarative md5 extracts on real documents") {
    GraftFunctions.register(spark)
    val P = WordIdsExpr.P
    val w = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val modes = Seq(
      "p31" -> s"CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT) % $P",
      "lo32" -> "CAST(conv(substring(md5(x), 1, 8), 16, 10) AS BIGINT)",
      "hi32" -> "CAST(conv(substring(md5(x), 9, 8), 16, 10) AS BIGINT)")
    modes.foreach { case (mode, hof) =>
      val legacy = w.select(col("doc_id"), expr(s"transform(w, x -> $hof)").as("ids"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val fused = w.select(col("doc_id"), expr(s"word_ids_md5(w, '$mode')").as("ids"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      legacy.foreach { case (id, ids) =>
        assert(fused(id) == ids, s"mode $mode doc $id")
      }
    }
  }

  test("word_ids_md5: duplicates and order preserved; null element yields NULL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT word_ids_md5(array('a', 'b', 'a'), 'p31') AS dup,
                word_ids_md5(array('a', CAST(NULL AS STRING)), 'p31') AS withnull""")
      .collect()(0)
    val dup = r.getSeq[Long](0)
    assert(dup.length == 3 && dup(0) == dup(2) && dup(0) != dup(1))
    assert(r.isNullAt(1))
  }
}
