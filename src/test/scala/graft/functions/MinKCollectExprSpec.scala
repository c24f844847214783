package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property tests for the bounded min-K collect: any split of the input
  * across partial states (update order, merge tree, serialize round-trip)
  * must yield exactly the k smallest values sorted ascending, duplicates
  * retained — the algebraic property that makes the capped provenance
  * list a pure function of the input multiset — and NO intermediate
  * buffer may ever exceed k elements (the buffer IS the streaming state
  * cell; its bound is the whole point). Seeded random cases stand in for
  * ScalaCheck (offline classpath). */
class MinKCollectExprSpec extends AnyFunSuite {
  private val k = 5
  private val agg = MinKCollectExpr(BoundReference(0, StringType, nullable = true), k)

  private def row(s: String): InternalRow =
    InternalRow(if (s == null) null else UTF8String.fromString(s))

  private def items(b: java.util.ArrayList[UTF8String]): Seq[String] = {
    import scala.jdk.CollectionConverters._
    b.asScala.map(_.toString).toSeq
  }

  private def reduceAll(xs: Seq[String]): java.util.ArrayList[UTF8String] =
    xs.foldLeft(agg.createAggregationBuffer())((b, s) => agg.update(b, row(s)))

  private def expected(xs: List[String]): Seq[String] = xs.sorted.take(k)

  private def cases(seed: Int): Seq[List[String]] = {
    val rnd = new Random(seed)
    (0 until 200).map { _ =>
      val n = rnd.nextInt(60)
      // small value domain forces duplicates, exercising multiset retention
      List.fill(n)(s"uuid-${rnd.nextInt(15)}")
    }
  }

  test("sequential update yields the k smallest, sorted, dups retained") {
    cases(1).foreach { xs =>
      assert(items(reduceAll(xs)) == expected(xs), xs)
    }
  }

  test("any split + merge + serialize round-trip == one pass") {
    cases(2).foreach { xs =>
      val rnd = new Random(xs.hashCode)
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1)
      val (a, b) = xs.splitAt(cut)
      // one side travels through serialize/deserialize, like a shuffle
      // exchange or a RocksDB state read would force
      val bSide = agg.deserialize(agg.serialize(reduceAll(b)))
      val merged = agg.merge(reduceAll(a), bSide)
      assert(items(merged) == expected(xs), xs)
      if (xs.lengthCompare(k) <= 0)
        assert(items(merged) == xs.sorted) // full list below the cap
    }
  }

  test("state cell is bounded by k at EVERY step on a hot key; eval shape") {
    val rnd = new Random(3)
    var b = agg.createAggregationBuffer()
    (0 until 100000).foreach { i =>
      b = agg.update(b, row(f"uuid-${rnd.nextInt(1000000)}%07d"))
      assert(b.size <= k, s"buffer grew past $k at row $i")
    }
    assert(agg.merge(b, b).size <= k)
    assert(agg.update(b, row(null)).size == b.size) // null input is a no-op
    val out = agg.eval(b).asInstanceOf[GenericArrayData]
    assert(out.numElements == k)
  }

  test("kept values are copies — mutating the source buffer cannot corrupt state") {
    val bytes = "uuid-aaa".getBytes("UTF-8")
    val v = UTF8String.fromBytes(bytes) // points INTO the caller's array
    val b = agg.update(agg.createAggregationBuffer(), InternalRow(v))
    java.util.Arrays.fill(bytes, 'z'.toByte) // the row buffer gets reused
    assert(items(b) == Seq("uuid-aaa"))
  }

  // ---- distinct mode (min_k_distinct, r16: Sigma count(field) pipes) ----

  private val dagg =
    MinKCollectExpr(BoundReference(0, StringType, nullable = true), k,
      distinct = true)
  private def dreduce(xs: Seq[String]): java.util.ArrayList[UTF8String] =
    xs.foldLeft(dagg.createAggregationBuffer())((b, s) => dagg.update(b, row(s)))
  private def dexpected(xs: List[String]): Seq[String] =
    xs.distinct.sorted.take(k)

  test("distinct mode: the k smallest DISTINCT values under any split/merge/serde") {
    cases(4).foreach { xs =>
      assert(items(dreduce(xs)) == dexpected(xs), xs)
      val rnd = new Random(xs.hashCode)
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1)
      val (a, b) = xs.splitAt(cut)
      val merged = dagg.merge(dreduce(a), dagg.deserialize(dagg.serialize(dreduce(b))))
      assert(items(merged) == dexpected(xs), xs)
      // size(min_k_distinct) == the distinct count saturated at k — the
      // thresholding property the Sigma count(field) compile relies on
      assert(merged.size == math.min(xs.distinct.size, k), xs)
    }
  }

  test("distinct mode: hot-key dup storm keeps O(k) state and one copy per distinct value") {
    var b = dagg.createAggregationBuffer()
    (0 until 50000).foreach { i =>
      b = dagg.update(b, row(s"uuid-${i % 3}"))
      assert(b.size <= 3)
    }
    assert(items(b) == Seq("uuid-0", "uuid-1", "uuid-2"))
    // merge of self cannot double-count
    assert(items(dagg.merge(b, dagg.deserialize(dagg.serialize(b)))) ==
      Seq("uuid-0", "uuid-1", "uuid-2"))
  }
}
