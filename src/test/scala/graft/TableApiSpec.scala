package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TableApiSpec extends AnyFunSuite {
  import SparkTestSession._
  import TableApi._

  test("fluent expressions plan identically to the Column DSL") {
    val li = Tables.load(spark, sf, "lineitem")
    val fluent = li.groupBy($("l_returnflag"))
      .agg($("l_quantity").sum.as("s"), $("l_extendedprice").avg.as("a"),
        $("l_orderkey").distinctCount.as("d"))
      .orderBy($("l_returnflag"))
      .collect().toSeq
    val plain = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"), avg(col("l_extendedprice")).as("a"),
        count_distinct(col("l_orderkey")).as("d"))
      .orderBy(col("l_returnflag"))
      .collect().toSeq
    assert(fluent == plain)
  }

  test("Tumble/Slide/Session builders resolve to window functions") {
    val ev = Tables.load(spark, sf, "events")
    val t = ev.groupBy(Tumble.over("1 hour").on($("ts"))).count()
    val s = ev.groupBy(Slide.over("1 hour").every("30 minutes").on($("ts"))).count()
    val g = ev.groupBy(Session.withGap("10 minutes").on($("ts"))).count()
    assert(t.columns.contains("window") && t.count() > 0)
    assert(s.columns.contains("window") && s.count() > t.count())
    assert(g.columns.contains("session_window") && g.count() > 0)
  }
}
