package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

/** CLI argument parsing for the job entry point (pure, no session). */
class MainSpec extends AnyFunSuite {
  test("parses --rules and repeated --conf key=value pairs") {
    val a = Main.parseArgs(List(
      "--rules", "/tmp/rules",
      "--conf", "kafka_brokers=b:9092",
      "--conf", "kafka_source_topic=sysmon",
      "--conf", "watermark=5 seconds"))
    assert(a.rules == "/tmp/rules")
    assert(a.conf == Map(
      "kafka_brokers" -> "b:9092",
      "kafka_source_topic" -> "sysmon",
      "watermark" -> "5 seconds"))
  }

  test("defaults to the builtin corpus with no args") {
    assert(Main.parseArgs(Nil) == Main.Args("builtin", Map.empty))
  }

  test("value containing '=' splits on the FIRST '=' only") {
    val a = Main.parseArgs(List("--conf", "opts=a=b=c"))
    assert(a.conf == Map("opts" -> "a=b=c"))
  }

  test("rejects malformed --conf and unknown flags") {
    intercept[IllegalArgumentException](Main.parseArgs(List("--conf", "novalue")))
    intercept[IllegalArgumentException](Main.parseArgs(List("--bogus")))
  }
}
