package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FlinkDdlSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val dataDir: String = {
    // µs-normalized copy of events (the raw fixture is TIMESTAMP(NANOS))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ddl").toString
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events_us")
    s"$tmp/events_us"
  }

  private def ddl = s"""
    CREATE TABLE ddl_events (
      event_id BIGINT,
      ts TIMESTAMP(3),
      user_id BIGINT,
      event_type STRING,
      value DOUBLE,
      WATERMARK FOR ts AS ts - INTERVAL '1' HOUR
    ) WITH (
      'connector' = 'filesystem',
      'path' = '$dataDir',
      'format' = 'parquet'
    )"""

  test("parse extracts schema, watermark, and options") {
    val td = FlinkDdl.parse(ddl)
    assert(td.name == "ddl_events")
    assert(td.schema.fieldNames.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value"))
    assert(td.watermark.contains(("ts", "1 hour")))
    assert(td.options("format") == "parquet")
  }

  test("registered batch view answers SQL") {
    FlinkDdl.register(spark, ddl)
    val n = spark.sql("SELECT count(*) AS n FROM ddl_events").head().getLong(0)
    assert(n == Tables.load(spark, "/root/testdata/sf0.001", "events").count())
  }

  test("streaming read applies the DDL watermark: windows close by it") {
    val agg = FlinkDdl.readStream(spark, ddl)
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("w"), col("n"))
    val got = graft.streaming.StreamRunner.runToTable(agg, "append")
      .orderBy("w").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // batch twin with the same analytic cutoff
    val cutRow = spark.sql(
      "SELECT unix_timestamp(max(ts) - INTERVAL 1 HOUR) FROM ddl_events")
      .head().getLong(0)
    val want = spark.sql(
      s"""SELECT CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT) * 86400
         |         AS w, count(*) AS n
         |FROM ddl_events GROUP BY 1 HAVING w + 86400 <= $cutRow
         |ORDER BY w""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }
}
