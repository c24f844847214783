package graft.engine

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.rules.ReferenceCorpus

/** Batch end-to-end tests of the rule pipeline: matching + near-miss
  * fixtures per representative rule, alert shaping, fan-out multiplicity,
  * and JSON parse tolerance (SURVEY §5 items 2 and 4). */
class AlertPipelineSpec extends SparkSpec {

  private def ev(fields: (String, Any)*): Map[String, Any] =
    Map("computer_name" -> "pc1", "host" -> "h1", "uuid" -> "u1",
      "event_id" -> 10L, "ts_us" -> 1700000000000000L) ++ fields.toMap

  test("LaZagne rule: match requires all CallTrace parts + GrantedAccess") {
    val matching = ev(
      "TargetImage" -> """C:\Windows\System32\lsass.exe""",
      "GrantedAccess" -> "0x1FFFFF",
      "CallTrace" -> ("""C:\\Windows\\SYSTEM32\\ntdll.dll+1|C:\\Windows\\System32\\KERNELBASE.dll+2""" +
        """|_ctypes.pyd+3|python27.dll+4"""))
    val nearMiss = matching + ("GrantedAccess" -> "0x1410")
    val df = AlertPipeline.sysmonFrame(spark, Seq(matching, nearMiss))
    val alerts = AlertPipeline.ruleAlerts(df, ReferenceCorpus.lazagne).collect()
    assert(alerts.length == 1)
    val event = alerts(0).getAs[Row]("event")
    assert(event.getAs[String]("kind") == "signal")
    assert(event.getAs[String]("module") == "process_access")
    assert(event.getAs[scala.collection.Seq[String]]("origin_ids").toSeq == Seq("u1"))
    assert(event.getAs[Long]("count") == 1L)
    val rule = alerts(0).getAs[Row]("rule")
    assert(rule.getAs[String]("name") == "Credential Dumping by LaZagne")
    assert(rule.getAs[Int]("severity") == 9)
    val threat = alerts(0).getAs[Row]("threat")
    assert(threat.getAs[scala.collection.Seq[String]]("tactic").toSeq == Seq("attack.credential_access"))
  }

  test("event_id gate: process_access rules ignore event_id=1 rows") {
    val e = ev("TargetImage" -> """C:\x\lsass.exe""",
      "SourceImage" -> """C:\Windows\system32\wsmprovhost.exe""")
    val df = AlertPipeline.sysmonFrame(spark, Seq(e, e + ("event_id" -> 1L)))
    assert(AlertPipeline.ruleAlerts(df, ReferenceCorpus.mimikatzWinrm).count() == 1)
  }

  test("fan-out multiplicity: one event matching k rules emits k alerts") {
    // UNKNOWN% CallTrace + lsass + excluded-source=false fires directSyscall;
    // with GrantedAccess in the credDump IN-list it also fires credDumpTools.
    val e = ev(
      "TargetImage" -> """C:\Windows\System32\lsass.exe""",
      "GrantedAccess" -> "0x1410",
      "SourceImage" -> """C:\evil\dump.exe""",
      "CallTrace" -> "UNKNOWN(1)|UNKNOWN(2)")
    val df = AlertPipeline.sysmonFrame(spark, Seq(e))
    val alerts = AlertPipeline.alerts(df, ReferenceCorpus.active)
    val names = alerts.select("rule.name").collect().map(_.getString(0)).sorted
    assert(names.contains("Direct Syscall of NtOpenProcess"))
    assert(names.contains("Credentials Dumping Tools Accessing LSASS Memory"))
    assert(names.length >= 2)
    assert(alerts.count() == names.length) // bag semantics, one alert per rule
  }

  test("balancedUnion ≡ left-fold unionAll at every branch count (r19)") {
    // the balanced pair tree exists for O(N log N) analyzer work (the
    // left-deep fold re-analyzed a growing prefix per unionAll); the
    // optimizer flattens both to one N-child Union, so rows AND bag
    // multiplicity must be identical — checked across odd/even/1-branch
    // shapes, including the power-of-two boundary
    import org.apache.spark.sql.functions.lit
    for (n <- Seq(1, 2, 3, 5, 8, 25)) {
      val branches = (0 until n).map(i => spark.range(3).toDF("v")
        .withColumn("branch", lit(i)))
      val bal = AlertPipeline.balancedUnion(branches)
      val fold = branches.reduce(_ unionAll _)
      assert(bal.schema == fold.schema, s"n=$n schema")
      val a = bal.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val b = fold.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(a == b, s"n=$n bag contents")
    }
  }

  test("C6 SQL-text render path produces identical alerts to the Column path") {
    val events = Seq(
      ev("TargetImage" -> """C:\Windows\System32\lsass.exe""",
        "GrantedAccess" -> "0x1FFFFF",
        "CallTrace" -> ("""C:\\Windows\\SYSTEM32\\ntdll.dll+1|C:\\Windows\\System32\\KERNELBASE.dll+2""" +
          """|_ctypes.pyd+3|python27.dll+4""")),
      ev("uuid" -> "u9", "TargetImage" -> """C:\x\other.exe"""))
    val df = AlertPipeline.sysmonFrame(spark, events)
    df.createOrReplaceTempView("sysmon_fixture")
    def canon(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.select(to_json(struct(col("computer_name"), col("host"), col("event"),
        col("threat"), col("rule")))).collect().map(_.getString(0)).sorted.toSeq
    for (rule <- Seq(ReferenceCorpus.lazagne, ReferenceCorpus.silenttrinityMsbuild,
        ReferenceCorpus.directSyscall)) {
      val viaSql = canon(spark.sql(
        graft.compile.RuleCompiler.renderSql(rule, "sysmon_fixture")))
      val viaColumn = canon(AlertPipeline.ruleAlerts(df, rule))
      assert(viaSql == viaColumn, s"${rule.name}:\n$viaSql\nvs\n$viaColumn")
    }
  }

  test("C6 extended: timeframe SQL render ≡ windowed Column path (plain, by-key, distinct) (r16)") {
    // the SQL-gateway deployment path for COMPILED correlation rules:
    // renderTimeframeSql's windowed GROUP BY SELECT must produce the
    // same alert rows as TimeframeRules.alerts for every pipe form
    import graft.ops.Detection
    val lsass = """C:\Windows\System32\lsass.exe"""
    def at(h: Long) = 1700000000000000L / 86400000000L * 86400000000L + h * 3600000000L
    val events = Seq(
      ev("uuid" -> "u1", "TargetImage" -> lsass, "SourceImage" -> "A", "ts_us" -> at(1)),
      ev("uuid" -> "u2", "TargetImage" -> lsass, "SourceImage" -> "A", "ts_us" -> at(2)),
      ev("uuid" -> "u3", "TargetImage" -> lsass, "SourceImage" -> "B", "ts_us" -> at(3)),
      ev("uuid" -> "u4", "computer_name" -> "pc2", "TargetImage" -> lsass,
        "SourceImage" -> "A", "ts_us" -> at(4)),
      ev("uuid" -> "u5", "computer_name" -> "pc3", "host" -> "h2",
        "TargetImage" -> lsass, "SourceImage" -> "C", "ts_us" -> at(30)), // next day
      ev("uuid" -> "u6", "TargetImage" -> """C:\x\notepad.exe""", "ts_us" -> at(5)))
    val df = AlertPipeline.sysmonFrame(spark, events)
    df.createOrReplaceTempView("tf_sql_fixture")
    graft.functions.GraftFunctions.register(spark)
    def canon(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.select(to_json(struct(col("computer_name"), col("host"), col("event"),
        col("threat"), col("rule")))).collect().map(_.getString(0)).sorted.toSeq
    val rules = Seq(
      Detection.compiledTfYaml,       // count() > 1, key computer_name
      Detection.compiledTfGroupByYaml, // count() by host > 1
      Detection.compiledTfDistinctYaml) // count(SourceImage) >= 2
      .map(y => graft.compile.RuleCompiler.compileTimeframe(y).get) :+
      // r17: the composite multi-field group-by key renders verbatim into
      // the GROUP BY (colExpr passes expressions through) — u1/u2 share
      // (host, SourceImage) within the day, so the rule fires
      Detection.compiledMultikeyRule
    for (rule <- rules) {
      val viaSql = canon(spark.sql(
        graft.compile.RuleCompiler.renderTimeframeSql(rule, "tf_sql_fixture")))
      val viaColumn = canon(graft.streaming.TimeframeRules.alerts(df, rule,
        f => col("event_data").getField(f)))
      assert(viaSql.nonEmpty, s"${rule.base.name}: fixture must fire")
      assert(viaSql == viaColumn, s"${rule.base.name}:\n$viaSql\nvs\n$viaColumn")
    }
  }

  test("merged dispatch emits exactly the same alerts as the union fan-out") {
    val events = Seq(
      ev( // fires directSyscall + credDumpTools
        "TargetImage" -> """C:\Windows\System32\lsass.exe""",
        "GrantedAccess" -> "0x1410",
        "SourceImage" -> """C:\evil\dump.exe""",
        "CallTrace" -> "UNKNOWN(1)|UNKNOWN(2)"),
      ev("uuid" -> "u2", // fires nothing
        "TargetImage" -> """C:\x\calc.exe""", "CallTrace" -> "C:\\x.dll+1"),
      ev("uuid" -> "u3", // fires mimikatzWinrm
        "TargetImage" -> """C:\Windows\System32\lsass.exe""",
        "SourceImage" -> """C:\Windows\system32\wsmprovhost.exe"""))
    val df = AlertPipeline.sysmonFrame(spark, events)
    def canon(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.select(to_json(struct(col("computer_name"), col("host"), col("event"),
        col("threat"), col("rule")))).collect().map(_.getString(0)).sorted.toSeq
    val union = canon(AlertPipeline.alerts(df, ReferenceCorpus.active))
    val merged = canon(AlertPipeline.alertsMerged(df, ReferenceCorpus.active))
    assert(union.nonEmpty && union == merged)
  }

  test("merged dispatch scales to a 500-rule fan-out (SURVEY §4 plan size)") {
    import graft.compile.dsl._
    // 500 synthetic rules: distinct TargetImage suffixes; rule i matches
    // events whose TargetImage ends with \proc<i>.exe
    val rules = (0 until 500).map { i =>
      ReferenceCorpus.lazagne.copy(
        name = s"synthetic-$i",
        where = eventId(10) and "TargetImage".like(s"""%\\proc$i.exe"""))
    }
    val events = Seq(
      ev("uuid" -> "m7", "TargetImage" -> """C:\Windows\proc7.exe"""),
      ev("uuid" -> "m8", "TargetImage" -> """C:\Windows\proc441.exe"""),
      ev("uuid" -> "m9", "TargetImage" -> """C:\Windows\nomatch.exe"""))
    val df = AlertPipeline.sysmonFrame(spark, events)
    val t0 = System.nanoTime()
    val out = AlertPipeline.alertsMerged(df, rules)
      .select(col("rule.name"), col("event.origin_ids")(0).as("uuid"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out == Set(("synthetic-7", "m7"), ("synthetic-441", "m8")))
    assert(secs < 60, s"500-rule dispatch took ${secs}s") // plan stays O(1)
  }

  test("legacy tree dispatch warns once when the session would hit the JIT dead zone") {
    val df = AlertPipeline.sysmonFrame(spark, Seq(ev()))
    val conf = spark.conf
    val prior = conf.get("spark.sql.codegen.hugeMethodLimit")
    try {
      // sessions built via SessionDefaults (like this one) are safe: no warn
      AlertPipeline.warnedDeadZone = false
      AlertPipeline.alertsMerged(df, ReferenceCorpus.active, dispatchExpr = false)
      assert(!AlertPipeline.warnedDeadZone)
      // a consumer session left at Spark's default fallback threshold warns
      conf.set("spark.sql.codegen.hugeMethodLimit", "65535")
      AlertPipeline.alertsMerged(df, ReferenceCorpus.active, dispatchExpr = false)
      assert(AlertPipeline.warnedDeadZone)
      // the default rule_dispatch path never warns — it is immune by shape
      AlertPipeline.warnedDeadZone = false
      AlertPipeline.alertsMerged(df, ReferenceCorpus.active)
      assert(!AlertPipeline.warnedDeadZone)
    } finally {
      conf.set("spark.sql.codegen.hugeMethodLimit", prior)
      AlertPipeline.warnedDeadZone = false
    }
  }

  test("parseJson drops malformed records, keeps timestamp metadata (S2/S3)") {
    import spark.implicits._
    val raw = Seq(
      ("""{"computer_name":"pc1","event_id":10,"host":"h","uuid":"u1",""" +
        """"event_data":{"TargetImage":"C:\\x\\lsass.exe"}}""", "2024-01-01T00:00:00Z"),
      ("""not json at all""", "2024-01-01T00:00:01Z"),
      ("""{"truncated": """, "2024-01-01T00:00:02Z"))
      .toDF("value", "timestamp")
      .withColumn("timestamp", col("timestamp").cast("timestamp"))
    val parsed = AlertPipeline.parseJson(raw)
    val rows = parsed.collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("uuid") == "u1")
    assert(rows(0).getAs[Row]("event_data")
      .getAs[String]("TargetImage") == """C:\x\lsass.exe""")
    assert(rows(0).getAs[java.sql.Timestamp]("timestamp") != null)
  }

  test("missing JSON fields read as NULL (reference null semantics)") {
    import spark.implicits._
    val raw = Seq(("""{"computer_name":"pc1","event_id":10,"uuid":"u2"}""", "2024-01-01T00:00:00Z"))
      .toDF("value", "timestamp")
      .withColumn("timestamp", col("timestamp").cast("timestamp"))
    val rows = AlertPipeline.parseJson(raw).collect()
    assert(rows.length == 1 && rows(0).getAs[String]("host") == null)
    assert(rows(0).getAs[Row]("event_data") == null ||
      rows(0).getAs[Row]("event_data").getAs[String]("CallTrace") == null)
  }

  test("Templating resolves ${vars} and rejects unknowns") {
    assert(Templating.resolve("t=${a}/${b}", Map("a" -> "x", "b" -> "y")) == "t=x/y")
    intercept[IllegalArgumentException] {
      Templating.resolve("${nope_missing_var}", Map.empty)
    }
  }
}
