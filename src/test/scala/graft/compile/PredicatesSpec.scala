package graft.compile

import org.scalatest.funsuite.AnyFunSuite
import Pred._

class PredicatesSpec extends AnyFunSuite {

  test("parseLike: wildcards and literals, no escape character") {
    assert(parseLike("abc") == List(Lit("abc")))
    assert(parseLike("%abc") == List(AnyN, Lit("abc")))
    assert(parseLike("abc%") == List(Lit("abc"), AnyN))
    assert(parseLike("%abc%") == List(AnyN, Lit("abc"), AnyN))
    assert(parseLike("a_c") == List(Lit("a"), Any_, Lit("c")))
    assert(parseLike("%%x") == List(AnyN, Lit("x"))) // %% collapses
    // backslash is an ordinary literal (Flink-corpus semantics, SURVEY P9)
    assert(parseLike("""%\lsass.exe""") == List(AnyN, Lit("""\lsass.exe""")))
    assert(parseLike("""%C:\\W%""") == List(AnyN, Lit("""C:\\W"""), AnyN))
  }

  test("likeToRegex anchors and escapes regex metachars") {
    assert(likeToRegex("""%\lsass.exe""") == """^.*\\lsass\.exe$""")
    assert(likeToRegex("a_c%") == "^a.c.*$")
    assert("""C:\x\lsass.exe""".matches(likeToRegex("""%\lsass.exe""")))
    assert(!"""C:\x\lsass.exe2""".matches(likeToRegex("""%\lsass.exe""")))
    // glob * inside a LIKE pattern stays literal (pypykatz quirk)
    assert("""x python3*.dll+1 y""".matches(likeToRegex("""%python3*.dll+%""")))
    assert(!"""x python36.dll+1 y""".matches(likeToRegex("""%python3*.dll+%""")))
  }

  test("fixRegex escapes literal braces but keeps quantifiers") {
    assert(fixRegex("""a{4,6}b""") == """a{4,6}b""")
    assert(fixRegex("""{abc}""") == """\{abc}""")
    assert("""{12345678-1234-1234-1234-123456789012}"""
      .matches("^(?:" + fixRegex("""{[a-fA-F0-9]{8}-[a-fA-F0-9]{4}-[a-fA-F0-9]{4}-[a-fA-F0-9]{4}-[a-fA-F0-9]{12}}""") + ")$"))
  }

  test("toDuckDb renders equivalent SQL") {
    val p = Eq("A", "x'y") and (In("B", Seq("1", "2")) or Not(IsNull("C")))
    assert(p.toDuckDb(f => f) ==
      "(A = 'x''y' AND (B IN ('1', '2') OR (NOT C IS NULL)))")
    assert(Like("F", "%v%").toDuckDb(f => f) == "regexp_matches(F, '^.*v.*$')")
  }
}
