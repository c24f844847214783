package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property tests for the bounded-state top-k aggregator: any way of
  * splitting the input across partial states (reduce order, merge tree)
  * must produce exactly the top-k under (score DESC, id ASC) — this is the
  * algebraic property that makes map-side combine safe. Seeded random
  * cases (deterministic across runs) stand in for ScalaCheck, which isn't
  * on the offline classpath.
  */
class TopKAggSpec extends AnyFunSuite {
  private val k = 3
  private val agg = new TopKAgg(k)

  private def expected(xs: List[ScoredId]): Seq[Long] =
    xs.sortBy(s => (-s.score, s.id)).take(k).map(_.id)

  private def cases(seed: Int): Seq[List[ScoredId]] = {
    val rnd = new Random(seed)
    (0 until 200).map { _ =>
      val n = rnd.nextInt(40)
      // small id/score domains force ties, exercising the id tie-break
      List.fill(n)(ScoredId((rnd.nextInt(9) - 4) / 4.0, rnd.nextInt(12).toLong))
    }
  }

  test("sequential reduce yields the exact top-k") {
    cases(1).foreach { xs =>
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(buf).ids == expected(xs), xs)
    }
  }

  test("any partition split + merge yields the same top-k as one pass") {
    cases(2).foreach { xs =>
      val rnd = new Random(xs.hashCode)
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1)
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged).ids == expected(xs), (xs, cut))
    }
  }

  test("state never exceeds k entries") {
    cases(3).foreach { xs =>
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      assert(buf.items.lengthCompare(k) <= 0)
    }
  }

  // ---- native TypedImperativeAggregate (TopKIdsExpr, r18) parity ----
  // The registered topkN_ids / topk3_scored functions now run the native
  // buffer; the Aggregator above stays as the reference implementation.

  private def nativeTopK(xs: List[ScoredId], kk: Int,
      split: Int): (Seq[Long], Seq[Double]) = {
    val e = TopKIdsExpr(null, null, kk, withScores = true)
    val (a, b) = xs.splitAt(split)
    def fill(part: List[ScoredId]): TopKBuffer = {
      val buf = e.createAggregationBuffer()
      part.foreach(s => buf.insert(s.score, s.id))
      buf
    }
    // round-trip one side through serialize/deserialize like a real
    // partial-merge would
    val merged = e.merge(fill(a), e.deserialize(e.serialize(fill(b))))
    (merged.ids.take(merged.n).toSeq, merged.scores.take(merged.n).toSeq)
  }

  test("native buffer matches the Aggregator reference on every split") {
    for (kk <- Seq(3, 8); xs <- cases(4)) {
      val want = xs.sortBy(s => (-s.score, s.id)).take(kk)
      val rnd = new Random(xs.hashCode ^ kk)
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1)
      val (ids, scores) = nativeTopK(xs, kk, cut)
      assert(ids == want.map(_.id), (kk, xs, cut))
      assert(scores == want.map(_.score), (kk, xs, cut))
      assert(ids.size <= kk)
    }
  }
}
