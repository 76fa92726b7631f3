package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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

  // ---- FOR SYSTEM_TIME AS OF (temporal table join, §2.4) -------------

  private val TemporalRe =
    ("""(?is)FROM\s+(\w+)(?:\s+AS)?\s+(\w+)\s+(LEFT\s+)?JOIN\s+(\w+)\s+""" +
      """FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(\w+)\.(\w+)(?:\s+AS)?\s+(\w+)\s+""" +
      """ON\s+(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)""").r

  /** Translates the Flink `FOR SYSTEM_TIME AS OF a.rowtime` event-time
    * temporal-join SQL onto [[graft.operators.TemporalJoin.asOf]].
    *
    * Supported surface: `FROM L [AS] a [LEFT] JOIN R FOR SYSTEM_TIME AS
    * OF a.ts [AS] b ON a.k = b.k` with single-key equality. The right
    * table's version-time column is schema metadata in the reference
    * (its rowtime attribute, declared via `WATERMARK FOR` DDL) — pass
    * it in `rightRowtime` (defaults to the left ts column's name).
    * If the versioned table can hold several versions at ONE (key,
    * version-time), pass `tieBreak` (a right column totally ordering
    * them, e.g. an id) — the default tie-break is the version time
    * itself, which cannot distinguish such rows.
    * Plain `JOIN` keeps only matched rows; `LEFT JOIN` keeps unmatched
    * left rows with null version payload. Right payload columns surface
    * as `b.col` in the SELECT text (internally prefixed to dodge name
    * collisions with the probe side).
    */
  def temporalSql(spark: SparkSession, flinkSql: String,
      rightRowtime: Option[String] = None,
      tieBreak: Option[String] = None): DataFrame = {
    val m = TemporalRe.findFirstMatchIn(flinkSql).getOrElse(
      throw new IllegalArgumentException(
        s"no FOR SYSTEM_TIME AS OF join clause: $flinkSql"))
    val Seq(lTbl, lAlias, rTbl, asOfAlias, tsCol, rAlias,
      onLa, lKey, onRa, rKey) =
      Seq(1, 2, 4, 5, 6, 7, 8, 9, 10, 11).map(m.group)
    val leftJoin = m.group(3) != null
    require(asOfAlias == lAlias && onLa == lAlias && onRa == rAlias,
      "FOR SYSTEM_TIME: aliases in AS OF / ON must match FROM aliases")

    val left = spark.table(lTbl)
    val rightRaw = spark.table(rTbl)
    val rTs = rightRowtime.getOrElse(tsCol)
    require(rightRaw.columns.contains(rTs),
      s"right table $rTbl has no version-time column $rTs")
    // prefix payload columns so probe-side names never collide
    val payload = rightRaw.columns.filterNot(_ == rKey).toSeq
    val right = rightRaw.select(
      col(rKey).as(lKey) +: payload.map(c => col(c).as(s"__r_$c")): _*)

    val joined = graft.operators.TemporalJoin.asOf(
      left, right, key = lKey, leftTs = tsCol, rightTs = s"__r_$rTs",
      rightCols = payload.map("__r_" + _),
      rightVersionTieBreak = "__r_" + tieBreak.getOrElse(rTs))
    val inner =
      if (leftJoin) joined
      else joined.filter(col(s"__r_$rTs").isNotNull)
    // payload columns surface under their own names unless they collide
    // with a probe-side column (then they stay __r_-prefixed)
    val leftCols = left.columns.toSet
    val (clean, kept) = payload.partition(c => !leftCols.contains(c))
    clean.foldLeft(inner)((df, c) => df.withColumnRenamed(s"__r_$c", c))
      .createOrReplaceTempView("__temporal_join")

    // colliding payload cols (`kept`) must be referenced as __r_<col>
    val rewritten = flinkSql
      .replaceAll(TemporalRe.regex, "FROM __temporal_join")
      .replaceAll(s"(?i)\\b$lAlias\\.", "")
      .replaceAll(s"(?i)\\b$rAlias\\.", "")
    spark.sql(rewritten)
  }
}
