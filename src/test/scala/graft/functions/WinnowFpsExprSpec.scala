package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WinnowFpsExprSpec extends SparkSpec {

  /** The declarative window spelling the kernel replaced (and the DuckDB
    * oracles still use) — the ground truth the kernel must match. */
  private def windowFps(corpus: org.apache.spark.sql.DataFrame) = {
    val K = 4; val W = 5
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy("doc_id").orderBy("i")
    val winMin = wOrd.rowsBetween(Window.currentRow, W - 1)
    corpus
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= K)
      .select(col("doc_id"), (size(col("w")) - (K - 1)).as("ng"),
        posexplode(col("w")).as(Seq("i", "tok")))
      .withColumn("g", md5(concat_ws(" ", col("tok"),
        lead("tok", 1).over(wOrd), lead("tok", 2).over(wOrd),
        lead("tok", 3).over(wOrd))))
      .filter(col("i") < col("ng"))
      .withColumn("sel", min(concat(col("g"),
        lpad((lit(9999999999L) - col("i")).cast("string"), 10, "0"))).over(winMin))
      .filter(col("i") <= col("ng") - W || (col("ng") < W && col("i") === 0))
      .select(col("doc_id"), substring(col("sel"), 1, 32).as("fp"))
      .distinct()
  }

  test("winnow_fps equals the declarative window formulation on real documents") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val legacy = windowFps(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val fused = docs
      .select(col("doc_id"), expr("winnow_fps(split(text, ' '))").as("fps"))
      .filter(size(col("fps")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fused.keySet == legacy.keySet)
    legacy.foreach { case (id, fps) =>
      assert(fused(id).toSet == fps, s"doc $id fingerprint set")
      // kernel output is sorted ascending (deterministic array form)
      assert(fused(id) == fused(id).sorted, s"doc $id ordering")
    }
  }

  test("winnow_fps edge cases: sub-gram empty, short docs one fp, null element NULL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT winnow_fps(array('a', 'b', 'c')) AS sub,
                winnow_fps(array('a', 'b', 'c', 'd')) AS one_gram,
                winnow_fps(array('a', 'b', 'c', 'd', 'e', 'f', 'g')) AS four_grams,
                winnow_fps(array('a', 'b', 'c', 'd', 'e', 'f', 'g', 'h')) AS one_window,
                winnow_fps(array('a', CAST(NULL AS STRING), 'c', 'd', 'e')) AS withnull""")
      .collect()(0)
    assert(r.getSeq[String](0).isEmpty, "3 tokens: un-fingerprintable")
    assert(r.getSeq[String](1).length == 1, "1 gram: min of available grams")
    assert(r.getSeq[String](2).length == 1, "4 grams < window: one fp")
    assert(r.getSeq[String](3).length == 1, "exactly one full window")
    assert(r.isNullAt(4), "null element propagates NULL")
  }
}
