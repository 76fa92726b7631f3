package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin Flink-SQL dialect layer (SURVEY.md §7 step 8): rewrites the
  * Flink 1.11 group-window function syntax — `TUMBLE/HOP/SESSION(ts,
  * INTERVAL …)` in GROUP BY plus their `_START/_END` projections
  * (flink-sql-parser group-window fns, FlinkSqlOperatorTable) — into
  * Spark SQL `window()/session_window()` calls, then delegates to
  * `spark.sql`. Combined with the Flink-named function shims
  * ([[graft.functions.FlinkFunctions.registerAll]]) this lets a Flink
  * query text run unchanged.
  *
  * Deliberately textual: the supported surface is the group-window
  * grammar (the one piece of Flink 1.11 SQL that Spark's parser
  * rejects); everything else IS Spark SQL and passes through untouched.
  */
object FlinkSql {

  private val Interval = """INTERVAL\s+'([^']+)'\s+(\w+)"""

  /** `INTERVAL '5' MINUTE` → `'5 minute'` (window() duration string). */
  private def dur(amount: String, unit: String): String =
    s"'$amount ${unit.toLowerCase}'"

  /** Rewrites the Flink group-window surface into Spark SQL. */
  def rewrite(sql: String): String = {
    var s = sql
    // projections first (longer names before the bare window fns)
    s = s"""(?i)TUMBLE_START\\s*\\(\\s*([\\w.]+)\\s*,\\s*$Interval\\s*\\)""".r
      .replaceAllIn(s, m => s"window.start")
    s = s"""(?i)TUMBLE_END\\s*\\(\\s*([\\w.]+)\\s*,\\s*$Interval\\s*\\)""".r
      .replaceAllIn(s, m => s"window.end")
    s = s"""(?i)HOP_START\\s*\\(\\s*([\\w.]+)\\s*,\\s*$Interval\\s*,\\s*$Interval\\s*\\)""".r
      .replaceAllIn(s, m => s"window.start")
    s = s"""(?i)HOP_END\\s*\\(\\s*([\\w.]+)\\s*,\\s*$Interval\\s*,\\s*$Interval\\s*\\)""".r
      .replaceAllIn(s, m => s"window.end")
    s = s"""(?i)SESSION_START\\s*\\(\\s*([\\w.]+)\\s*,\\s*$Interval\\s*\\)""".r
      .replaceAllIn(s, m => s"session_window.start")
    s = s"""(?i)SESSION_END\\s*\\(\\s*([\\w.]+)\\s*,\\s*$Interval\\s*\\)""".r
      .replaceAllIn(s, m => s"session_window.end")
    // group-window calls: TUMBLE(ts, i) → window(ts, 'i')
    s = s"""(?i)TUMBLE\\s*\\(\\s*([\\w.]+)\\s*,\\s*$Interval\\s*\\)""".r
      .replaceAllIn(s, m => s"window(${m.group(1)}, ${dur(m.group(2), m.group(3))})")
    // HOP(ts, slide, size) → window(ts, 'size', 'slide') (arg order flips)
    s = s"""(?i)HOP\\s*\\(\\s*([\\w.]+)\\s*,\\s*$Interval\\s*,\\s*$Interval\\s*\\)""".r
      .replaceAllIn(s, m => s"window(${m.group(1)}, ${dur(m.group(4), m.group(5))}, ${dur(m.group(2), m.group(3))})")
    s = s"""(?i)SESSION\\s*\\(\\s*([\\w.]+)\\s*,\\s*$Interval\\s*\\)""".r
      .replaceAllIn(s, m => s"session_window(${m.group(1)}, ${dur(m.group(2), m.group(3))})")
    s
  }

  /** Rewrites and executes. Tables must already be registered as views
    * (e.g. [[Tables.registerAll]]).
    */
  def sql(spark: SparkSession, flinkSql: String): DataFrame =
    spark.sql(rewrite(flinkSql))
}
