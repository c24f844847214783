package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's sf-dir parsing: the emitted sf field must always be a
  * valid JSON number (an unquoted "0.1." from a suffixed dir is the exact
  * failure that made BENCH_r01 unparseable). */
class BenchSpec extends AnyFunSuite {
  test("sfOf extracts a valid JSON number from any sf dir spelling") {
    assert(Bench.sfOf("/root/testdata/sf0.1") == "0.1")
    assert(Bench.sfOf("/root/testdata/sf0.01") == "0.01")
    assert(Bench.sfOf("/root/testdata/sf1") == "1")
    assert(Bench.sfOf("/root/testdata/sf0.1.bak") == "0.1") // not "0.1."
    assert(Bench.sfOf("/data/sf10.5/x") == "10.5")
    assert(Bench.sfOf("/no/scale/here") == "0")
    // every result must parse as a JSON number
    Seq("sf0.1", "sf0.1.bak", "sf3", "none").foreach { d =>
      val v = Bench.sfOf(d)
      assert(v.matches("[0-9]+(\\.[0-9]+)?"), s"$d -> $v")
    }
  }
}
