package graft.compile

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven port tests for the Sigma transpiler (SURVEY §2.11 C1-C7,
  * reference /root/reference/sigma-transf/main.py). The checked-in rule SQL
  * is the golden corpus; these fixtures replicate its observable behavior. */
class RuleCompilerSpec extends AnyFunSuite {
  import RuleCompiler._

  test("C4 attackTech partitions tags; subtechnique re-appends parent") {
    val (tac, tech, sub) = attackTech(Seq(
      "attack.credential_access", "attack.t1003", "attack.t1003.001", "ignored"))
    assert(tac == Seq("attack.credential_access"))
    assert(tech == Seq("attack.t1003", "t1003")) // parent re-appended bare
    assert(sub == Seq("attack.t1003.001"))
  }

  test("C5 severity mapping") {
    assert(severity("critical") == 9 && severity("high") == 7
      && severity("medium") == 5 && severity("low") == 3 && severity("?") == 0)
  }

  test("C1 modifiers: contains strips *, endswith/startswith, re, contains|all") {
    assert(transModifier("F", "contains", "*v*") == Like("F", "%v%"))
    assert(transModifier("F", "endswith", "v") == Like("F", "%v"))
    assert(transModifier("F", "startswith", "v*") == Like("F", "v%"))
    assert(transModifier("F", "re", "a{2}") == SimilarTo("F", "a{2}"))
    assert(transModifier("F", "base64offset|contains", "v") == Like("F", "%v%"))
    val l = new java.util.ArrayList[String](); l.add("a"); l.add("b")
    assert(transModifier("F", "contains|all", l) ==
      And(Like("F", "%a%"), Like("F", "%b%")))
    assert(transModifier("F", "contains", l) ==
      Or(Like("F", "%a%"), Like("F", "%b%")))
  }

  private def yamlRule(detection: String, extra: String = ""): String =
    s"""title: Test Rule
       |author: tester
       |level: high
       |description: d
       |logsource:
       |  category: process_access
       |tags:
       |  - attack.execution
       |  - attack.t1055.001
       |$extra
       |detection:
       |$detection
       |""".stripMargin

  test("C2/C7 full compile: selection kinds, event_id prefix, metadata") {
    val r = compile(yamlRule(
      """  selection:
        |    TargetImage|endswith: '\lsass.exe'
        |    GrantedAccess: '0x1FFFFF'
        |  filter:
        |    SourceImage:
        |      - 'a.exe'
        |      - 'b.exe'
        |  condition: selection and not filter""".stripMargin)).get
    assert(r.name == "Test Rule" && r.severity == 7)
    assert(r.tactic == Seq("attack.execution"))
    assert(r.technique == Seq("t1055") && r.subtechnique == Seq("attack.t1055.001"))
    assert(r.where == And(TopEq("event_id", 10),
      And(And(Like("TargetImage", """%\lsass.exe"""), Eq("GrantedAccess", "0x1FFFFF")),
        Not(In("SourceImage", Seq("a.exe", "b.exe"))))))
  }

  test("C3 condition grammar: 1 of prefix*, 1 of them, parens, precedence") {
    val sels = Map("SEL1" -> Eq("A", "1").asInstanceOf[Pred],
      "SEL2" -> Eq("B", "2"), "OTHER" -> Eq("C", "3"))
    assert(conditionPred("1 of sel*", sels) == Or(Eq("A", "1"), Eq("B", "2")) ||
      conditionPred("1 of sel*", sels) == Or(Eq("B", "2"), Eq("A", "1")))
    val all = conditionPred("1 of them", sels)
    assert(Seq("A", "B", "C").forall(f => all.toDuckDb(x => x).contains(f)))
    // NOT binds tighter than AND, AND tighter than OR
    assert(conditionPred("sel1 or sel2 and not other", sels) ==
      Or(Eq("A", "1"), And(Eq("B", "2"), Not(Eq("C", "3")))))
    assert(conditionPred("(sel1 or sel2) and other", sels) ==
      And(Or(Eq("A", "1"), Eq("B", "2")), Eq("C", "3")))
  }

  test("C3 extension: all of prefix* / all of them AND the selections") {
    val sels = Map("SEL1" -> Eq("A", "1").asInstanceOf[Pred],
      "SEL2" -> Eq("B", "2"), "OTHER" -> Eq("C", "3"))
    assert(conditionPred("all of sel*", sels) == And(Eq("A", "1"), Eq("B", "2")) ||
      conditionPred("all of sel*", sels) == And(Eq("B", "2"), Eq("A", "1")))
    val all = conditionPred("all of them", sels)
    assert(Seq("A", "B", "C").forall(f => all.toDuckDb(x => x).contains(f)))
    assert(all.toDuckDb(x => x).contains("AND"))
    // composes with the rest of the grammar
    assert(conditionPred("all of sel* and not other", sels).toDuckDb(x => x).contains("NOT"))
  }

  test("C7 rejects timeframe rules exactly like the reference") {
    val y = yamlRule(
      """  selection:
        |    F: v
        |  timeframe: 5m
        |  condition: selection""".stripMargin)
    assert(compile(y).isEmpty)
  }

  test("null value maps to IS NULL; numeric scalars stringify") {
    val r = compile(yamlRule(
      """  selection:
        |    A: null
        |    DestinationPort: 80
        |  condition: selection""".stripMargin)).get
    assert(r.where == And(TopEq("event_id", 10),
      And(IsNull("A"), Eq("DestinationPort", "80"))))
  }
}
