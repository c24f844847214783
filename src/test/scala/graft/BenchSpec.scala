package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's driver-record hygiene. Two failure modes have each cost a
  * round's official bench record:
  *   - round 1: the sf field rendered as an invalid JSON number ("0.1.")
  *   - rounds 1 and 6: the stdout line outgrew the driver's output-tail
  *     buffer (~4 KB then ~2 KB) and was recorded as `"parsed": null`
  * So the compact line's SIZE is a spec'd invariant, not a comment. */
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

  // The real headline list padded to 40+ entries with names as long as the
  // longest real ones — adding queries must FAIL this test before it can
  // silently overflow the driver tail again.
  private def syntheticResults(n: Int): Seq[Bench.Timing] = {
    val names = Bench.headline ++
      (0 until (n - Bench.headline.size)).map(i => f"future_operator_name_$i%02d")
    names.take(n).map(nm => (nm, 123.45, 234.56, 345.67))
  }

  test("compact line stays under 1960 bytes beyond the CURRENT list with worst-case timings") {
    // track the real headline size (+5 headroom) so growing the list keeps
    // re-tightening this guard instead of silently outgrowing a fixed n;
    // the assert bound tracks lineCap + rendering slack and must stay
    // under the driver's ~2 KB end-kept tail capture
    val n = Bench.headline.size + 5
    val line = Bench.compactLine(syntheticResults(n), reps = 3, sf = "0.1")
    assert(line.getBytes("UTF-8").length < 1960,
      s"compact bench line is ${line.getBytes("UTF-8").length} bytes at $n queries " +
        "with worst-case timings — would overflow the driver tail")
    assert(!line.contains("\n"), "driver record must be ONE line")
  }

  test("an oversized map self-limits: slowest kept, omissions counted, total intact") {
    // force truncation with an absurd query count
    val rs = syntheticResults(Bench.headline.size) ++
      (0 until 60).map(i => (f"overflow_query_with_a_long_name_$i%02d", 0.01, 0.02, 0.03))
    val line = Bench.compactLine(rs, reps = 3, sf = "0.1")
    assert(line.getBytes("UTF-8").length <= Bench.lineCap)
    assert(line.contains("\"queries_omitted\":"), "omission count must be reported")
    // the cheap filler queries are dropped first; the real (slow) ones survive
    assert(line.contains("\"sig_fanout_merged\":"))
    assert(!line.contains("overflow_query_with_a_long_name_59"))
    // the headline total still sums EVERY query, omitted ones included
    val total = """"value":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    assert(math.abs(total - rs.map(_._2).sum) < 0.01)
  }

  test("the REAL headline list at realistic timings omits nothing") {
    // with the comparability fields riding the line, as the real run emits
    val rs = Bench.headline.map(nm => (nm, 9.99, 9.99, 9.99))
    val line = Bench.compactLine(rs, reps = 3, sf = "0.1",
      Bench.comparability(31.22, 30.85, 0.187, 0.374))
    assert(!line.contains("queries_omitted"),
      "the current real list must fit the cap without truncation")
  }

  test("comparability fields render compactly, parse as JSON, and survive the cap") {
    val extra = Bench.comparability(1.5, 2.25, 0.125, 0.25)
    assert(extra == ""","load":[1.50,2.25],"calib":0.125,"calib_mt":0.250""")
    // unavailable load average (-1 per the JDK contract) still renders as
    // a valid JSON number
    assert(Bench.comparability(-1.0, -1.0, 0.1, 0.2).contains("[-1.00,-1.00]"))
    val line = Bench.compactLine(syntheticResults(Bench.headline.size + 5),
      reps = 3, sf = "0.1", extra)
    assert(line.getBytes("UTF-8").length < 1960)
    assert(line.contains(""","load":[1.50,2.25],"calib":0.125,"calib_mt":0.250,"sf":0.1}"""))
    // the calibration loops run and report plausible times; the
    // all-cores wall can't beat one thread's
    val c = Bench.calibSecs()
    assert(c > 0.001 && c < 5.0, s"calibration loop time $c")
    val cmt = Bench.calibMtSecs()
    assert(cmt >= c * 0.5 && cmt < 60.0, s"mt calibration $cmt vs single $c")
  }

  test("compact line carries the contract fields and only ONE per-query map") {
    val line = Bench.compactLine(syntheticResults(35), reps = 3, sf = "0.01")
    assert(line.startsWith("""{"metric":"headline_total","value":"""))
    assert(line.contains(""","unit":"sec","reps":3,"queries":{"""))
    assert(line.endsWith(""","sf":0.01}"""))
    // exactly one map: qmed/qmax belong to the detail FILE, not stdout
    assert(!line.contains("\"qmed\"") && !line.contains("\"qmax\""))
    assert(line.count(_ == '{') == 2)
  }

  test("detail json carries min/med/max maps for every query") {
    val detail = Bench.detailJson(syntheticResults(35), reps = 3, sf = "0.1")
    Seq("\"queries\":", "\"qmed\":", "\"qmax\":", "\"value_med\":").foreach(k =>
      assert(detail.contains(k), s"detail missing $k"))
    assert(detail.contains("\"sig_fanout_merged\":123.45"))
    // med and max values present (same key, different maps)
    assert(detail.contains("\"sig_fanout_merged\":234.56"))
    assert(detail.contains("\"sig_fanout_merged\":345.67"))
  }
}
