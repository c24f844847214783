package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.compile._

import scala.util.Random

/** rule_dispatch correctness: the single-node battery dispatch must agree
  * with (a) a direct three-valued-logic interpreter on random predicate
  * trees (the PredPropertySpec discipline, lifted to the fired-id set),
  * (b) its own interpreted eval path (codegen ≡ interpreted — the
  * SimilarToExpr/ShingleIdsExpr contract), and (c) the per-rule
  * when/otherwise expression tree it replaces, over the full corpus. */
class RuleDispatchExprSpec extends SparkSpec {

  private val fields = Seq("A", "B", "C")
  private val values = Seq("x", "yy", """C:\p\q.exe""", "%odd", "a_b", "", "zz")
  private val patterns = Seq(
    "%", "x%", "%x", "%x%", "a_b", "%q.exe", """%\p\%""", "_", "%%y", """C:\p\q.exe""")
  private val regexes = Seq("x+", "[a-z]{2}", ".*q\\.exe", "z*")

  /** Reference interpreter — identical to PredPropertySpec's. */
  private def eval(p: Pred, row: Map[String, String], eventId: Option[Long]): Option[Boolean] = p match {
    case Eq(f, v) => row.get(f).filter(_ != null).map(_ == v)
    case In(f, vs) => row.get(f).filter(_ != null).map(vs.contains)
    case IsNull(f) => Some(row.get(f).forall(_ == null))
    case Like(f, pat) =>
      row.get(f).filter(_ != null).map(_.matches(Pred.likeToRegex(pat)))
    case SimilarTo(f, pat) =>
      row.get(f).filter(_ != null)
        .map(v => java.util.regex.Pattern.compile(s"^(?:${Pred.fixRegex(pat)})$$").matcher(v).find())
    case TopEq(_, v) => eventId.map(_ == v)
    case And(l, r) => (eval(l, row, eventId), eval(r, row, eventId)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (eval(l, row, eventId), eval(r, row, eventId)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(q) => eval(q, row, eventId).map(!_)
  }

  private def genPred(rnd: Random, depth: Int): Pred = {
    val leaf = depth <= 0 || rnd.nextInt(3) == 0
    if (leaf) rnd.nextInt(6) match {
      case 0 => Eq(fields(rnd.nextInt(3)), values(rnd.nextInt(values.size)))
      case 1 => In(fields(rnd.nextInt(3)),
        Seq.fill(1 + rnd.nextInt(3))(values(rnd.nextInt(values.size))).distinct)
      case 2 => IsNull(fields(rnd.nextInt(3)))
      case 3 => Like(fields(rnd.nextInt(3)), patterns(rnd.nextInt(patterns.size)))
      case 4 => SimilarTo(fields(rnd.nextInt(3)), regexes(rnd.nextInt(regexes.size)))
      case 5 => TopEq("event_id", 1L + rnd.nextInt(3))
    } else rnd.nextInt(3) match {
      case 0 => And(genPred(rnd, depth - 1), genPred(rnd, depth - 1))
      case 1 => Or(genPred(rnd, depth - 1), genPred(rnd, depth - 1))
      case 2 => Not(genPred(rnd, depth - 1))
    }
  }

  /** rows: (rid, event_id or null, field map or null-struct marker). */
  private def structFrame(rows: Seq[(Long, Option[Long], Option[Map[String, String]])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("rid", LongType),
      StructField("event_id", LongType),
      StructField("event_data", StructType(fields.map(StructField(_, StringType))))))
    val data = rows.map { case (rid, eid, m) =>
      Row(rid, eid.map(Long.box).orNull,
        m.map(mm => Row.fromSeq(fields.map(mm(_)))).orNull)
    }
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava), schema)
  }

  private def firedVia(df: DataFrame, preds: Seq[Pred]): Map[Long, Seq[Int]] =
    df.select(col("rid"),
      RuleDispatch.column(spark, preds, col("event_data"), col("event_id")).as("fired"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap

  private def mkRows(rnd: Random, n: Int): Seq[(Long, Option[Long], Option[Map[String, String]])] =
    Seq.tabulate(n) { i =>
      val m = if (rnd.nextInt(12) == 0) None // whole-struct NULL
      else Some(fields.map { f =>
        f -> (if (rnd.nextInt(4) == 0) null else values(rnd.nextInt(values.size)))
      }.toMap)
      val eid = if (rnd.nextInt(12) == 0) None else Some(1L + rnd.nextInt(3))
      (i.toLong, eid, m)
    }

  test("random batteries: codegen'd dispatch == three-valued interpreter (seed 42)") {
    val rnd = new Random(42)
    val preds = Seq.fill(150)(genPred(rnd, 3))
    val rows = mkRows(rnd, 60)
    val fired = firedVia(structFrame(rows), preds)
    for ((rid, eid, m) <- rows) {
      // a NULL struct reads every field as NULL, exactly like getField
      val rowMap = m.getOrElse(fields.map(_ -> (null: String)).toMap)
      val expect = preds.zipWithIndex.collect {
        case (p, i) if eval(p, rowMap, eid).contains(true) => i
      }
      assert(fired(rid) == expect,
        s"rid=$rid eid=$eid row=$m fired=${fired(rid)} expected=$expect")
    }
  }

  test("interpreted eval path == codegen path (factoryMode=NO_CODEGEN)") {
    val rnd = new Random(7)
    val preds = Seq.fill(80)(genPred(rnd, 3))
    val rows = mkRows(rnd, 40)
    val df = structFrame(rows)
    val viaCodegen = firedVia(df, preds)
    val conf = spark.conf
    val ws = conf.get("spark.sql.codegen.wholeStage")
    val fm = conf.get("spark.sql.codegen.factoryMode")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(firedVia(df, preds) == viaCodegen)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", ws)
      conf.set("spark.sql.codegen.factoryMode", fm)
    }
  }

  test("corpus battery over synth events: dispatch fired set == per-rule filters") {
    val rules = graft.rules.ReferenceCorpus.active
    val df = graft.ops.Detection.nestedFrom(graft.ops.Detection.synthFrom(
      spark.range(500).select(col("id").as("event_id"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 1000).as("ts"))))
      .withColumn("rid", col("eid"))
    val fired = firedVia(df, rules.map(_.where))
    rules.zipWithIndex.foreach { case (r, i) =>
      val direct = df.filter(r.where.toColumn(graft.engine.AlertPipeline.nestedField))
        .select("rid").collect().map(_.getLong(0)).toSet
      val viaDispatch = fired.collect { case (rid, ids) if ids.contains(i) => rid }.toSet
      assert(viaDispatch == direct, s"rule ${r.name}: $viaDispatch != $direct")
    }
  }

  test("alertsMerged: dispatch-expr path == expression-tree path at 1000 rules") {
    val rules = graft.StreamBench.cloneRules(graft.rules.ReferenceCorpus.active, 1000)
    val df = graft.ops.Detection.nestedFrom(graft.ops.Detection.synthFrom(
      spark.range(200).select(col("id").as("event_id"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 1000).as("ts"))))
    def canon(d: DataFrame): Seq[String] =
      d.select(to_json(struct(col("computer_name"), col("host"), col("event"),
        col("threat"), col("rule")))).collect().map(_.getString(0)).sorted.toSeq
    val viaExpr = canon(graft.engine.AlertPipeline.alertsMerged(df, rules,
      dispatchExpr = true))
    val viaTree = canon(graft.engine.AlertPipeline.alertsMerged(df, rules,
      dispatchExpr = false))
    assert(viaExpr.nonEmpty && viaExpr == viaTree)
  }

  test("plan is O(1) in rule count: node AND expression counts equal at 25 vs 1000 rules") {
    val df = graft.ops.Detection.nestedFrom(graft.ops.Detection.synthFrom(
      spark.range(50).select(col("id").as("event_id"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 1000).as("ts"))))
    def shape(n: Int): (Int, Int) = {
      val rules = graft.StreamBench.cloneRules(graft.rules.ReferenceCorpus.active, n)
      val plan = graft.engine.AlertPipeline.alertsMerged(df, rules)
        .queryExecution.optimizedPlan
      val nodes = plan.collect { case p => p }.size
      // every expression node Catalyst re-walks per micro-batch — the
      // quantity the O(rules) when/otherwise tree grew and rule_dispatch
      // must NOT (the battery hides in a constructor field)
      val exprs = plan.collect { case p =>
        p.expressions.map(e => e.collect { case x => x }.size).sum
      }.sum
      (nodes, exprs)
    }
    val (n25, e25) = shape(25)
    val (n1000, e1000) = shape(1000)
    assert(n25 == n1000, s"plan nodes grew with rules: $n25 -> $n1000")
    assert(e25 == e1000, s"plan expressions grew with rules: $e25 -> $e1000")
  }

  test("two batteries in ONE projection: distinct generated prefixes, codegen compiles") {
    // regression: per-instance function names — two dispatch expressions
    // in the same whole-stage class emitted colliding graftRule0/... and
    // Janino failed, silently falling back to interpreted execution
    val rnd = new Random(11)
    val a = Seq.fill(10)(genPred(rnd, 2))
    val b = Seq.fill(10)(genPred(rnd, 2))
    val rows = mkRows(rnd, 30)
    val df = structFrame(rows)
    val both = df.select(col("rid"),
      RuleDispatch.column(spark, a, col("event_data"), col("event_id")).as("fa"),
      RuleDispatch.column(spark, b, col("event_data"), col("event_id")).as("fb"))
    // jitDeadZone compiles every codegen stage — a duplicate-method
    // collision raises out of here instead of passing silently
    assert(graft.PlanAudit.jitDeadZone(both.queryExecution.executedPlan).isEmpty)
    val got = both.collect()
      .map(r => r.getLong(0) -> (r.getSeq[Int](1).toSeq, r.getSeq[Int](2).toSeq)).toMap
    for ((rid, eid, m) <- rows) {
      val rowMap = m.getOrElse(fields.map(_ -> (null: String)).toMap)
      def expect(ps: Seq[Pred]) = ps.zipWithIndex.collect {
        case (p, i) if eval(p, rowMap, eid).contains(true) => i
      }
      assert(got(rid) == ((expect(a), expect(b))), s"rid=$rid")
    }
  }

  test("intern keys are structural: delimiter-embedding ASTs get distinct keys") {
    // delimiter-free toString hashing rendered these identically
    assert(RuleDispatch.intern(Seq(Eq("A", "x,y"))) !=
      RuleDispatch.intern(Seq(Eq("A,x", "y"))))
    assert(RuleDispatch.intern(Seq(graft.compile.In("A", Seq("x", "y")))) !=
      RuleDispatch.intern(Seq(graft.compile.In("A", Seq("x,y")))))
    // same battery → same key (interning is content-addressed)
    assert(RuleDispatch.intern(Seq(Eq("A", "x"), Eq("B", "y"))) ==
      RuleDispatch.intern(Seq(Eq("A", "x"), Eq("B", "y"))))
  }

  test("intern map is a bounded LRU: evicts, re-interns, re-resolves") {
    val probe = Seq(Eq("A", "__lru_probe__"))
    RuleDispatch.intern(probe)
    // flood with MaxBatteries+ distinct batteries: the map must stay
    // bounded and the probe's entry must age out
    (0 until RuleDispatch.MaxBatteries + 8).foreach { i =>
      RuleDispatch.intern(Seq(Eq("A", s"__flood_$i")))
    }
    assert(RuleDispatch.internedCount <= RuleDispatch.MaxBatteries)
    // a fresh column() call re-interns the evicted battery and the whole
    // path — analysis-time resolution included — works again
    val df = structFrame(Seq((0L, Some(1L),
      Some(fields.map(f => f -> (if (f == "A") "__lru_probe__" else "x")).toMap))))
    val fired = df.select(RuleDispatch.column(spark, probe,
      col("event_data"), col("event_id")).as("f")).collect()(0).getSeq[Int](0)
    assert(fired == Seq(0))
  }

  test("unanalyzed batteries are pinned: LRU churn cannot strand their Columns (r15)") {
    // the r14 LRU made "build a Column, intern 1024 more, THEN analyze" a
    // nondeterministic unknown-key failure (advisor): entries are now
    // pinned from intern until first resolution, and eviction takes
    // unpinned entries first
    import org.apache.spark.sql.catalyst.expressions.Literal
    def resolve(k: String) =
      RuleDispatch.builder(Seq(Literal(k), Literal("d"), Literal(1L)))
    val key = RuleDispatch.intern(Seq(Eq("A", "__pin_probe__"))) // pinned
    // churn far past the bound with batteries that resolve immediately
    // (the library's own usage pattern) — each is unpinned on resolution
    (0 until RuleDispatch.MaxBatteries + 8).foreach { i =>
      resolve(RuleDispatch.intern(Seq(Eq("A", s"__pin_flood_$i"))))
    }
    assert(RuleDispatch.internedCount <= RuleDispatch.MaxBatteries)
    // the probe out-survived >MaxBatteries resolved interns and its (late)
    // first analysis still finds it
    assert(resolve(key).isInstanceOf[RuleDispatchExpr])
  }

  test("pins are refcounted: shared-key double-builds survive the first resolution (r16)") {
    // advisor r15: with a boolean pin, two pending Columns sharing one
    // interned key lost their protection when the FIRST resolved; a pin
    // per intern (+1) released per resolution (-1) keeps the second
    // Column covered until its own analysis
    import org.apache.spark.sql.catalyst.expressions.Literal
    def resolve(k: String) =
      RuleDispatch.builder(Seq(Literal(k), Literal("d"), Literal(1L)))
    val preds = Seq(Eq("A", "__refcount_probe__"))
    val key = RuleDispatch.intern(preds)
    assert(RuleDispatch.intern(preds) == key) // second pending Column, same key
    assert(RuleDispatch.pinCount(key) == 2)
    resolve(key) // first Column analyzes
    assert(RuleDispatch.pinCount(key) == 1, "second Column's pin must survive")
    // churn past the bound: the still-pinned key must not be evicted
    (0 until RuleDispatch.MaxBatteries + 8).foreach { i =>
      resolve(RuleDispatch.intern(Seq(Eq("A", s"__rc_flood_$i"))))
    }
    assert(resolve(key).isInstanceOf[RuleDispatchExpr]) // second analysis OK
    assert(RuleDispatch.pinCount(key) == 0) // fully released, evictable
  }

  test("analysis errors: unknown battery key, missing field, non-long event_id") {
    RuleDispatch.register(spark)
    val df = structFrame(Seq((0L, Some(1L), Some(fields.map(_ -> "x").toMap))))
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function(RuleDispatch.Name, lit("no-such-key"),
        col("event_data"), col("event_id"))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] { // field D not in struct
      df.select(RuleDispatch.column(spark, Seq(Eq("D", "x")),
        col("event_data"), col("event_id"))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] { // rid is not the struct
      df.select(RuleDispatch.column(spark, Seq(Eq("A", "x")),
        col("rid"), col("event_id"))).collect()
    }
  }
}
