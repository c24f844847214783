package graft.compile

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

import scala.util.Random

/** Property test (SURVEY §5 item 5): random Pred ASTs evaluated through
  * Catalyst (`toColumn`) must agree with a direct three-valued-logic
  * interpreter of the Pred semantics on random rows — including NULL
  * propagation, backslash-heavy values, and %_ wildcard edge cases.
  * Deterministic seed; all predicates evaluate in ONE select pass. */
class PredPropertySpec extends SparkSpec {

  private val fields = Seq("A", "B", "C")
  private val values = Seq("x", "yy", """C:\p\q.exe""", "%odd", "a_b", "", "zz")
  private val patterns = Seq(
    "%", "x%", "%x", "%x%", "a_b", "%q.exe", """%\p\%""", "_", "%%y", """C:\p\q.exe""")
  private val regexes = Seq("x+", "[a-z]{2}", ".*q\\.exe", "z*")

  /** Reference interpreter: SQL three-valued logic, None = unknown/null. */
  private def eval(p: Pred, row: Map[String, String], eventId: Long): Option[Boolean] = p match {
    case Eq(f, v) => row.get(f).filter(_ != null).map(_ == v)
    case In(f, vs) => row.get(f).filter(_ != null).map(vs.contains)
    case IsNull(f) => Some(row.get(f).forall(_ == null))
    case Like(f, pat) =>
      row.get(f).filter(_ != null).map(_.matches(Pred.likeToRegex(pat)))
    case SimilarTo(f, pat) =>
      row.get(f).filter(_ != null)
        .map(v => java.util.regex.Pattern.compile(s"^(?:${Pred.fixRegex(pat)})$$").matcher(v).find())
    case TopEq(_, v) => Some(eventId == v)
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

  test("random Preds: Catalyst evaluation == direct interpreter (seed 42)") {
    val rnd = new Random(42)
    val preds = Seq.fill(150)(genPred(rnd, 3))
    val rows = Seq.tabulate(60) { i =>
      val m = fields.map { f =>
        f -> (if (rnd.nextInt(4) == 0) null else values(rnd.nextInt(values.size)))
      }.toMap
      (i.toLong, 1L + rnd.nextInt(3), m)
    }
    val schema = StructType(
      StructField("rid", LongType) +: StructField("event_id", LongType) +:
        fields.map(StructField(_, StringType)))
    val data = rows.map { case (rid, eid, m) =>
      Row.fromSeq(rid +: eid +: fields.map(m(_)))
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava), schema)

    // one pass: every predicate as a boolean column
    val cols = preds.zipWithIndex.map { case (p, i) => p.toColumn(col).as(s"p$i") }
    val out = df.select(col("rid") +: cols: _*).collect()
      .map(r => r.getLong(0) -> r).toMap

    for (((rid, eid, m), _) <- rows.zipWithIndex; (p, i) <- preds.zipWithIndex) {
      val spark3v: Option[Boolean] =
        if (out(rid).isNullAt(i + 1)) None else Some(out(rid).getBoolean(i + 1))
      val interp = eval(p, m, eid)
      assert(spark3v == interp,
        s"row=$m eid=$eid pred=${p.toDuckDb(f => f)} spark=$spark3v interp=$interp")
    }
  }
}
