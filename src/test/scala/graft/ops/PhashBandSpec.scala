package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Property test for the perceptual-hash band join's RECALL GUARANTEE,
  * scoped to its real precondition: with 4 disjoint 16-bit bands over a
  * 64-bit signature, any two signatures within Hamming distance 3 share
  * at least one band unchanged (pigeonhole: 3 flipped bits cannot touch
  * 4 bands), so — AS LONG AS no shared band is a stop band — the banded
  * equi-join plus the ham ≤ 3 gate reports every such pair. The stop-
  * band cap (MaxBandPop) is the one DELIBERATE recall exception: pairs
  * whose every intact shared band is boilerplate-hot are dropped by
  * design, and the "cap fires on a degenerate identical-signature
  * corpus" OpsSpec test pins that side. Here the 400 random 32-bit
  * halves give band populations ≈ 1, so the cap never engages and the
  * pigeonhole property is tested in isolation — through the production
  * phashPairs code, not a re-derivation. Negative control: 4 flips
  * spread across all four bands leave no band intact AND fail the gate
  * — the pair must be absent. Deterministic seed; one Spark job
  * evaluates all cases. */
class PhashBandSpec extends SparkSpec {

  test("every Hamming<=3 pair is recovered; all-band flips are not (200 seeded cases)") {
    val rnd = new Random(42)
    def randSig(): (Long, Long) =
      (rnd.nextLong() & 0xffffffffL, rnd.nextLong() & 0xffffffffL)
    def flip(sig: (Long, Long), bit: Int): (Long, Long) =
      if (bit < 32) (sig._1 ^ (1L << bit), sig._2)
      else (sig._1, sig._2 ^ (1L << (bit - 32)))

    // cases 0..149: 1-3 random flips → MUST be reported
    // cases 150..199: one flip in each of the four bands → MUST NOT be
    // (bands: lo[0..15], lo[16..31], hi[0..15], hi[16..31])
    val rows = (0 until 200).flatMap { i =>
      val base = randSig()
      val nFlips = if (i < 150) 1 + rnd.nextInt(3) else 4
      val bits =
        if (i < 150) {
          // distinct bit positions so ham == nFlips exactly
          Iterator.continually(rnd.nextInt(64)).distinct
            .take(nFlips).toSeq
        } else Seq(rnd.nextInt(16), 16 + rnd.nextInt(16),
          32 + rnd.nextInt(16), 48 + rnd.nextInt(16))
      val mutated = bits.foldLeft(base)(flip)
      Seq((i.toLong * 2, base._1, base._2),
        (i.toLong * 2 + 1, mutated._1, mutated._2))
    }
    import spark.implicits._
    val pairs = Multimodal.phashPairs(rows.toDF("doc_id", "lo", "hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 150).foreach { i =>
      assert(pairs.contains((i.toLong * 2, i.toLong * 2 + 1)),
        s"case $i: a Hamming<=3 pair escaped the band join — recall guarantee broken")
    }
    (150 until 200).foreach { i =>
      assert(!pairs.contains((i.toLong * 2, i.toLong * 2 + 1)),
        s"case $i: a 4-band flip (ham=4) was reported past the gate")
    }
  }
}
