package graft.compile

import org.scalatest.funsuite.AnyFunSuite
import graft.rules.ReferenceCorpus

/** C8 (directory batch compile) + the SURVEY §7 "second slice": Sigma YAML
  * compiled by RuleCompiler must be semantically equivalent to the
  * hand-transcribed corpus rules — proven by rendering both predicates to
  * the same DuckDB SQL. */
class CompileDirSpec extends AnyFunSuite {
  private val dir = getClass.getResource("/sigma").getPath

  test("compileDir loads YAML rules, skips timeframe rules like main.py") {
    val rules = RuleCompiler.compileDir(dir)
    assert(rules.map(_.name).sorted == Seq(
      "Cmdkey Cached Credentials Recon", "Credential Dumping by LaZagne"))
  }

  test("compiled LaZagne predicate matches the transcribed corpus rule") {
    val compiled = RuleCompiler.compileDir(dir)
      .find(_.name == "Credential Dumping by LaZagne").get
    val render: Pred => String = _.toDuckDb(f => f)
    // AND order inside a selection follows YAML key order; compare the
    // rendered SQL of both paths on each atomic predicate instead
    val c = render(compiled.where)
    val t = render(ReferenceCorpus.lazagne.where)
    // same event_id gate
    assert(c.contains("event_id = 10") && t.contains("event_id = 10"))
    // every atomic pattern of the transcription appears in the compiled SQL
    // note: `_` in '_ctypes' is the LIKE single-char wildcard → regex `.`
    Seq("""ntdll\.dll\+""", """KERNELBASE\.dll\+""", "ctypes\\.pyd\\+",
      "python27\\.dll\\+", "GrantedAccess = '0x1FFFFF'").foreach { frag =>
      assert(c.contains(frag), s"missing $frag in:\n$c")
      assert(t.contains(frag), s"missing $frag in:\n$t")
    }
    assert(compiled.severity == 9 && ReferenceCorpus.lazagne.severity == 9)
    assert(compiled.tactic == Seq("attack.credential_access"))
    assert(compiled.subtechnique == Seq("attack.t1003.001"))
  }

  test("compiled cmdkey rule matches corpus predicate semantics") {
    val compiled = RuleCompiler.compileDir(dir)
      .find(_.name == "Cmdkey Cached Credentials Recon").get
    val c = compiled.where.toDuckDb(f => f)
    val t = ReferenceCorpus.cmdkeyRecon.where.toDuckDb(f => f)
    assert(c.contains("event_id = 1") && t.contains("event_id = 1"))
    Seq("cmdkey\\.exe", " /list").foreach { frag =>
      assert(c.contains(frag), s"missing $frag in:\n$c")
      assert(t.contains(frag), s"missing $frag in:\n$t")
    }
  }
}
