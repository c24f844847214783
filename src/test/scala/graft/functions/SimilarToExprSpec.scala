package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilarToExprSpec extends SparkSpec {

  test("similar_to: anchored whole-string match, unlike rlike") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("abc", "xabcx", "ab").toDF("s")
    val out = df.selectExpr("s", "similar_to(s, 'a[b]c') AS m").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out == Map("abc" -> true, "xabcx" -> false, "ab" -> false))
    // rlike by contrast substring-matches
    val r = df.selectExpr("s", "s rlike 'a[b]c' AS m").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(r("xabcx")) // the difference similar_to exists to fix
  }

  test("similar_to: corpus GUID pattern with literal braces + quantifiers") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val pat = """{[a-fA-F0-9]{8}-[a-fA-F0-9]{4}-[a-fA-F0-9]{4}-[a-fA-F0-9]{4}-[a-fA-F0-9]{12}}"""
    val df = Seq(
      "{abcdef12-3456-7890-abcd-ef1234567890}",
      "x {abcdef12-3456-7890-abcd-ef1234567890}", // not anchored-match
      "{zzz}").toDF("s")
    val out = df.selectExpr("s", s"similar_to(s, '$pat') AS m").collect()
    assert(out.map(_.getBoolean(1)).toSeq == Seq(true, false, false))
  }

  test("null semantics: null input or null pattern → null") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Some("a"), None).toDF("s")
    val out = df.selectExpr("similar_to(s, 'a')").collect()
    assert(out(0).getBoolean(0) && out(1).isNullAt(0))
    val np = df.selectExpr("similar_to(s, CAST(NULL AS STRING))").collect()
    assert(np.forall(_.isNullAt(0)))
  }

  test("stays inside whole-stage codegen with a foldable pattern") {
    GraftFunctions.register(spark)
    // parquet-backed so the plan can't constant-fold to a LocalTableScan
    val df = graft.engine.Tables(spark, "/root/testdata/sf0.001", "events")
      .filter(expr("similar_to(event_type, '(click|view)')"))
      .select("event_id")
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks operators inside a WholeStageCodegen stage; the filter
    // carrying SIMILAR TO must be starred, not a standalone fallback
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("SIMILAR TO")), plan)
    assert(df.count() > 0) // and the generated code actually runs
  }

  test("extensions class registers the function on a fresh session") {
    val ext = new GraftExtensions
    // simulate what spark.sql.extensions does
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(e) // must not throw; function injection is exercised via
    // the registry path in the other tests (same builder triple)
    assert(GraftFunctions.similarTo._1.funcName == "similar_to")
  }
}
