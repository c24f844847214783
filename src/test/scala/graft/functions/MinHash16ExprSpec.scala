package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MinHash16ExprSpec extends SparkSpec {

  test("minhash16 matches the declarative 16x array_min(transform(...)) formulation") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val P = MinHash16Expr.P
    // deterministic pseudo-random shingle-id arrays across the id space
    val rows = (0 until 50).map { r =>
      (r.toLong, (0 to r % 7).map(j => (r * 104729L + j * 15485863L) % P))
    }
    val df = rows.toDF("id", "sids")
    val hof = (0 until 16).map { i =>
      val a = i * 12345L + 1103515245L
      val b = i * 987654L + 67867967L
      expr(s"array_min(transform(sids, s -> (($a * s + $b) % $P)))").as(s"mh$i")
    }
    val expected = df.select(col("id") +: hof: _*).collect()
      .map(r => r.getLong(0) -> (0 until 16).map(i => r.getLong(i + 1))).toMap
    val fused = df.select(col("id"), expr("minhash16(sids)").as("mh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (id, _) =>
      assert(fused(id) == expected(id), s"row $id")
    }
  }

  test("minhash16 null semantics: null input, empty array, null elements skipped") {
    GraftFunctions.register(spark)
    val df = spark.sql(
      """SELECT minhash16(CAST(NULL AS ARRAY<BIGINT>)) AS a,
                minhash16(CAST(array() AS ARRAY<BIGINT>)) AS b,
                minhash16(array(CAST(NULL AS BIGINT))) AS c,
                minhash16(array(CAST(NULL AS BIGINT), 7L)) AS d,
                minhash16(array(7L)) AS e""")
    val r = df.collect()(0)
    assert(r.isNullAt(0), "null array must yield NULL")
    assert(r.isNullAt(1), "empty array must yield NULL (array_min of empty)")
    assert(r.isNullAt(2), "all-null elements must yield NULL")
    // null elements are skipped, exactly like array_min
    assert(r.getSeq[Long](3) == r.getSeq[Long](4))
  }
}
