package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import scala.util.Random

/** IntersectCountExpr must agree with size(array_intersect(...)) on every
  * input — duplicates, empty arrays, disjoint and identical sets — since
  * the optimizer rule substitutes one for the other silently. */
class IntersectCountSpec extends SparkSpec {

  test("intersect_count matches set-intersection cardinality on seeded random arrays") {
    // expected values computed DRIVER-SIDE in Scala — comparing against
    // size(array_intersect) in the same plan would be vacuous, since the
    // optimizer rule rewrites that expression to intersect_count as well
    GraftFunctions.register(spark)
    val rnd = new Random(7)
    val rows = (0 until 300).map { i =>
      val a = Seq.fill(rnd.nextInt(12))(rnd.nextInt(8).toLong)
      val b = Seq.fill(rnd.nextInt(12))(rnd.nextInt(8).toLong)
      (i.toLong, a, b)
    }
    val expected = rows.map { case (id, a, b) => id -> a.toSet.intersect(b.toSet).size }.toMap
    import spark.implicits._
    val got = rows.toDF("id", "a", "b")
      .select(col("id"), expr("intersect_count(a, b)").as("fused"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected)
  }

  test("null array yields null; shared elements count once") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1L, 2L, 2L, 3L)), Some(Seq(2L, 2L, 3L, 9L))), // intersection {2,3}
      (None, Some(Seq(1L))),
      (Some(Seq.empty[Long]), Some(Seq(1L))))
      .toDF("a", "b")
      .select(expr("intersect_count(a, b)").as("c"))
    val out = df.collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(out.toSeq == Seq(2, null, 0))
  }
}
