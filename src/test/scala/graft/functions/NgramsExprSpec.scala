package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NgramsExprSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("ngrams_ws matches the declarative HOF chain on real documents") {
    GraftFunctions.register(spark)
    val w = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 8)
    for (width <- Seq(2, 5, 8)) {
      val legacy = w.select(col("doc_id"), expr(
        s"""array_distinct(transform(sequence(0, size(w) - $width),
              i -> concat_ws(' ', slice(w, i + 1, $width))))""").as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val fused = w.select(col("doc_id"), expr(s"ngrams_ws(w, $width)").as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(fused.keySet == legacy.keySet, s"width=$width keys")
      legacy.foreach { case (id, g) =>
        assert(fused(id) == g, s"width=$width doc $id")
      }
    }
  }

  test("ngrams_ws: null words are skipped like concat_ws; short input is empty") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT ngrams_ws(array('a', CAST(NULL AS STRING), 'b', 'a'), 3) AS g," +
        "       ngrams_ws(array('a', 'b'), 3) AS s").collect()(0)
    // windows: [a,NULL,b] -> "a b", [NULL,b,a] -> "b a"
    assert(r.getSeq[String](0) == Seq("a b", "b a"))
    assert(r.getSeq[String](1).isEmpty)
  }
}
