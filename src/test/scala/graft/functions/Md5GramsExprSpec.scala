package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Md5GramsExprSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("md5_grams matches the declarative positional md5 chain on real documents") {
    GraftFunctions.register(spark)
    val w = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    for (width <- Seq(3, 15)) {
      val base = w.filter(size(col("w")) >= width)
      val legacy = base.select(col("doc_id"), expr(
        s"""transform(sequence(0, size(w) - $width),
              i -> unhex(md5(concat_ws(' ', slice(w, i + 1, $width)))))""").as("gs"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Array[Byte]](1).map(_.toSeq)).toMap
      val fused = base.select(col("doc_id"), expr(s"md5_grams(w, $width)").as("gs"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Array[Byte]](1).map(_.toSeq)).toMap
      assert(fused.keySet == legacy.keySet, s"width=$width keys")
      assert(legacy.nonEmpty, s"width=$width fixture non-empty")
      legacy.foreach { case (id, gs) =>
        assert(fused(id) == gs, s"width=$width doc $id")
      }
    }
  }

  test("md5_grams edge cases: short input, null words, single gram") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b")),                  // shorter than width → empty
      (2L, Seq("a", "b", "c")),             // exactly one gram
      (3L, Seq("a", null, "c", "d"))        // null word skipped (concat_ws)
    ).toDF("id", "w")
    val out = df.select(col("id"), expr("md5_grams(w, 3)").as("gs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Array[Byte]](1)).toMap
    assert(out(1L).isEmpty)
    def md5(s: String): Seq[Byte] =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).toSeq
    assert(out(2L).map(_.toSeq) == Seq(md5("a b c")))
    // gram at position 0 of doc 3 = concat_ws(' ', 'a', null, 'c') = "a c"
    assert(out(3L).map(_.toSeq) == Seq(md5("a c"), md5("c d")))
  }
}
