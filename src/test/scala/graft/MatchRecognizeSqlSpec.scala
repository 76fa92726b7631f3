package graft

import graft.MatchRecognizeSql._
import org.scalatest.funsuite.AnyFunSuite

class MatchRecognizeSqlSpec extends AnyFunSuite {

  private val base = """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts
      MEASURES A.event_id AS a_id, FIRST(B.value) AS first_b,
               LAST(B.event_id) AS last_b
      ONE ROW PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (A B+ C{2} D{1,3})
      WITHIN INTERVAL '2' HOUR
      DEFINE A AS A.event_type = 'signup',
             B AS B.value < PREV(B.value),
             C AS C.value > A.value,
             D AS D.value >= FIRST(B.value)
    )"""

  test("quantifiers parse to (min, max)") {
    val spec = parse(base)
    assert(spec.patternVars == Seq(
      Quantified("A", 1, 1), Quantified("B", 1, Int.MaxValue),
      Quantified("C", 2, 2), Quantified("D", 1, 3)))
  }

  test("DEFINE forms parse to tag-eq, PREV, cross-var, and FIRST refs") {
    val d = parse(base).defines
    assert(d("A") == Define("event_type", "=", LitStr("signup")))
    assert(d("B") == Define("value", "<", PrevRef("value")))
    assert(d("C") == Define("value", ">", VarRef("A", "value", first = false)))
    assert(d("D") == Define("value", ">=", VarRef("B", "value", first = true)))
  }

  test("measures parse bare (≡ LAST), FIRST, and LAST") {
    val m = parse(base).measures
    assert(m == Seq(
      Measure("last", "A", "event_id", "a_id"),
      Measure("first", "B", "value", "first_b"),
      Measure("last", "B", "event_id", "last_b")))
  }

  test("WITHIN and skip mode parse") {
    val spec = parse(base)
    assert(spec.withinMs == 2 * 3600000L && spec.skipPastLast)
    assert(!parse(base.replace("SKIP PAST LAST ROW", "SKIP TO NEXT ROW"))
      .skipPastLast)
  }

  test("optional quantifier and SKIP TO FIRST/LAST parse") {
    val spec = parse(base.replace("PATTERN (A B+ C{2} D{1,3})",
      "PATTERN (A B? C{2} D{1,3})"))
    assert(spec.patternVars(1) == Quantified("B", 1, 1, optional = true))
    assert(spec.skipTo.isEmpty)
    val st = parse(base.replace("SKIP PAST LAST ROW", "SKIP TO LAST B"))
    assert(!st.skipPastLast && st.skipTo.contains(("B", false)))
    val sf = parse(base.replace("SKIP PAST LAST ROW", "SKIP TO FIRST C"))
    assert(sf.skipTo.contains(("C", true)))
  }

  test("bad pattern tokens and DEFINE predicates are rejected") {
    intercept[IllegalArgumentException] {
      parse(base.replace("PATTERN (A B+ C{2} D{1,3})", "PATTERN (A B*)"))
    }
    intercept[IllegalArgumentException] {
      parse(base.replace("D AS D.value >= FIRST(B.value)",
        "D AS D.value BETWEEN 1 AND 2"))
    }
  }
}
