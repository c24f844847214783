package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property tests for the bounded min-K collect: any split of the input
  * across partial states (reduce order, merge tree) must yield exactly the
  * k smallest values sorted ascending, duplicates retained — the algebraic
  * property that makes the capped provenance list a pure function of the
  * input multiset — and NO intermediate buffer may ever exceed k elements
  * (the buffer IS the streaming state cell; its bound is the whole point).
  * Seeded random cases stand in for ScalaCheck (offline classpath). */
class MinKCollectAggSpec extends AnyFunSuite {
  private val k = 5
  private val agg = new MinKCollectAgg(k)

  private def expected(xs: List[String]): Seq[String] = xs.sorted.take(k)

  private def cases(seed: Int): Seq[List[String]] = {
    val rnd = new Random(seed)
    (0 until 200).map { _ =>
      val n = rnd.nextInt(60)
      // small value domain forces duplicates, exercising multiset retention
      List.fill(n)(s"uuid-${rnd.nextInt(15)}")
    }
  }

  test("sequential reduce yields the k smallest, sorted, dups retained") {
    cases(1).foreach { xs =>
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(buf).items == expected(xs), xs)
    }
  }

  test("any partition split + merge == one pass; equals full sort below cap") {
    cases(2).foreach { xs =>
      val rnd = new Random(xs.hashCode)
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1)
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged).items == expected(xs), xs)
      if (xs.lengthCompare(k) <= 0)
        assert(agg.finish(merged).items == xs.sorted)
    }
  }

  test("state cell is bounded by k at EVERY step on a hot key") {
    val rnd = new Random(3)
    var buf = agg.zero
    (0 until 100000).foreach { i =>
      buf = agg.reduce(buf, f"uuid-${rnd.nextInt(1000000)}%07d")
      assert(buf.items.lengthCompare(k) <= 0, s"buffer grew past $k at row $i")
    }
    // merging two full buffers stays bounded too
    val m = agg.merge(buf, buf)
    assert(m.items.lengthCompare(k) <= 0)
    assert(agg.reduce(buf, null).items == buf.items) // null input is a no-op
  }
}
