package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.SparkSpec

/** Contract of the bloom_might_contain kernel: membership never
  * false-negatives (that property is what lets the decontamination bloom
  * variant share the exact operator's oracle), false positives stay near
  * the configured rate, and bad arguments fail at analysis with the
  * repo's literal-argument error discipline. */
class BloomProbeExprSpec extends SparkSpec {

  private def bloomBytes(n: Long, fpp: Double)(put: BloomFilter => Unit): Array[Byte] = {
    val bf = BloomFilter.create(n, fpp)
    put(bf)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("zero false negatives; false positives near the configured 1%") {
    GraftFunctions.register(spark)
    val bytes = bloomBytes(1000, 0.01) { bf =>
      (0L until 1000L).foreach(bf.putLong)
    }
    val probe = call_function("bloom_might_contain", col("id"), lit(bytes))
    val misses = spark.range(1000).filter(!probe).count()
    assert(misses == 0, s"$misses members probed false — bloom must never false-negative")
    val fps = spark.range(1000000, 1100000).filter(probe).count()
    // 1% target over 100k non-members; 3× slack for seed variance
    assert(fps <= 3000, s"$fps false positives in 100k probes at fpp=0.01")
  }

  test("probe agrees between codegen and interpreted evaluation") {
    GraftFunctions.register(spark)
    val bytes = bloomBytes(100, 0.01) { bf =>
      (0L until 100L).map(_ * 7L).foreach(bf.putLong)
    }
    val probe = call_function("bloom_might_contain", col("id"), lit(bytes))
    def run(): Seq[Long] =
      spark.range(700).filter(probe).collect().map(_.longValue).toSeq
    val gen = run()
    val confs = Seq("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    val interp =
      try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; run() }
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    assert(gen == interp)
    assert(gen.toSet.intersect((0L until 100L).map(_ * 7L).toSet).size == 100)
  }

  test("literal-argument error discipline: NULL, non-foldable, wrong key type") {
    GraftFunctions.register(spark)
    val df = spark.range(1).selectExpr("id", "CAST(id AS STRING) AS s",
      "CAST(concat('x', id) AS BINARY) AS nonfold")
    val nul = intercept[AnalysisException] {
      df.selectExpr("bloom_might_contain(id, CAST(NULL AS BINARY))").collect()
    }
    assert(nul.getCondition == "INVALID_PARAMETER_VALUE.NULL")
    val nf = intercept[AnalysisException] {
      df.selectExpr("bloom_might_contain(id, nonfold)").collect()
    }
    assert(nf.getCondition == "NON_FOLDABLE_ARGUMENT")
    val bytes = bloomBytes(10, 0.01)(_.putLong(1L))
    val typ = intercept[AnalysisException] {
      df.select(call_function("bloom_might_contain", col("s"), lit(bytes))).collect()
    }
    assert(typ.getMessage.contains("BIGINT"), typ.getMessage)
  }
}
