package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Flink Table-API fluent syntax shim — SURVEY.md §3.2
  * (flink-table-api-java Table/Expressions `$("v").sum()`, api.{Tumble,
  * Slide, Session}): Spark's `Column` DSL *is* the Table API, so this
  * is a thin naming layer for source-level familiarity, not a new IR —
  * every call resolves straight to a `org.apache.spark.sql.functions`
  * Column and plans through Catalyst like any DataFrame op.
  *
  * {{{
  * import graft.TableApi._
  * events.groupBy(Tumble.over("1 hour").on($("ts")), $("user_id"))
  *   .agg($("value").sum.as("revenue"))
  * }}}
  */
object TableApi {

  /** Flink `$("name")` field reference. */
  def $(name: String): Column = col(name)

  /** Flink expression-method names on fields. */
  implicit class FlinkExpressionOps(private val c: Column) extends AnyVal {
    def sum: Column = org.apache.spark.sql.functions.sum(c)
    def sum0: Column = coalesce(org.apache.spark.sql.functions.sum(c), lit(0))
    def avg: Column = org.apache.spark.sql.functions.avg(c)
    def min: Column = org.apache.spark.sql.functions.min(c)
    def max: Column = org.apache.spark.sql.functions.max(c)
    def count: Column = org.apache.spark.sql.functions.count(c)
    def stddevPop: Column = stddev_pop(c)
    def stddevSamp: Column = stddev_samp(c)
    def varPop: Column = var_pop(c)
    def varSamp: Column = var_samp(c)
    def collect: Column = collect_list(c)
    def listagg(sep: String): Column = array_join(sort_array(collect_list(c)), sep)
    def distinctCount: Column = count_distinct(c)
    def abs: Column = org.apache.spark.sql.functions.abs(c)
    def floor: Column = org.apache.spark.sql.functions.floor(c)
    def ceil: Column = org.apache.spark.sql.functions.ceil(c)
    def upperCase: Column = upper(c)
    def lowerCase: Column = lower(c)
    def charLength: Column = char_length(c)
    def trim(): Column = org.apache.spark.sql.functions.trim(c)
    def isNullExpr: Column = c.isNull
    def ifNull(other: Column): Column = coalesce(c, other)
  }

  /** Group-window builders (flink-table-api `Tumble.over(lit(1).hour)
    * .on($("rowtime")).as("w")` shape) resolving to Spark
    * `window()`/`session_window()` columns.
    */
  object Tumble {
    def over(size: String): TumbleOver = TumbleOver(size)
  }
  final case class TumbleOver(size: String) {
    def on(time: Column): Column = window(time, size)
  }

  object Slide {
    def over(size: String): SlideOver = SlideOver(size)
  }
  final case class SlideOver(size: String) {
    def every(slide: String): SlideEvery = SlideEvery(size, slide)
  }
  final case class SlideEvery(size: String, slide: String) {
    def on(time: Column): Column = window(time, size, slide)
  }

  object Session {
    def withGap(gap: String): SessionGap = SessionGap(gap)
  }
  final case class SessionGap(gap: String) {
    def on(time: Column): Column = session_window(time, gap)
  }
}
