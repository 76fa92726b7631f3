package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process.{Process, ProcessLogger}

/** Oracle canonicalization lint: every `SparkEntry.oracleSql` entry is
  * DESCRIBEd in DuckDB (via `tools/lint_oracle_types.py`) and the spec
  * fails if any output column has a type the driver's hash canonicalizes
  * differently from Spark even when values match — HUGEINT (DuckDB's
  * SUM(BIGINT)) and the aggregate-widened DECIMAL(38,*). This trap cost
  * a round three separate times (q1-family r1, q93/q94 r3, q104 r4);
  * the lint turns the next instance into a local test failure instead
  * of a lost correctness round.
  *
  * The DuckDB side lives in the driver's python environment; when that
  * is unavailable (plain `sbt test` on a bare machine) the spec cancels
  * rather than fails — the lint is a gate wherever the oracle itself
  * can run, and a no-op where it can't.
  */
class OracleLintSpec extends AnyFunSuite {

  private def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  test("oracle output schemas are hash-canonical: no HUGEINT, no widened DECIMAL(38,*)") {
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${jsonEscape(k)}": "${jsonEscape(v)}"""" }
      .mkString("{", ",\n", "}")
    val f = java.nio.file.Files.createTempFile("oracle_sql_lint", ".json")
    try {
      java.nio.file.Files.write(f, json.getBytes("UTF-8"))
      val out = new StringBuilder
      val logger = ProcessLogger(l => { out.append(l).append('\n'); () })
      val code =
        try Process(Seq("python3", "tools/lint_oracle_types.py",
          SparkTestSession.sf, f.toString)).!(logger)
        catch { case _: java.io.IOException => cancel("python3 unavailable") }
      // exit 2 = lint violation (fail); exit 3 = the lint DECLARED its
      // environment unavailable (missing duckdb / unbindable fixtures /
      // empty input — cancel). Anything else non-zero (1 = python
      // traceback) is a crash IN the lint itself and must FAIL, or a
      // future lint regression rots unnoticed behind the cancel path.
      if (code == 3) cancel(s"lint declared infra unavailable:\n$out")
      assert(code == 0, s"oracle type lint failed (exit $code):\n$out")
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("lint exits 3 (declared skip, not pass) on an empty oracle map") {
    val f = java.nio.file.Files.createTempFile("oracle_sql_empty", ".json")
    try {
      java.nio.file.Files.write(f, "{}".getBytes("UTF-8"))
      val out = new StringBuilder
      val logger = ProcessLogger(l => { out.append(l).append('\n'); () })
      val code =
        try Process(Seq("python3", "tools/lint_oracle_types.py",
          SparkTestSession.sf, f.toString)).!(logger)
        catch { case _: java.io.IOException => cancel("python3 unavailable") }
      // if duckdb/fixtures are absent the lint exits 3 for that reason
      // instead — still the asserted contract: never exit 0 on nothing
      assert(code == 3, s"empty oracle map must be a declared skip, got $code:\n$out")
    } finally java.nio.file.Files.deleteIfExists(f)
  }
}
