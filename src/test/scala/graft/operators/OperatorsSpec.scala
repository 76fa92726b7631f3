package graft.operators

import graft.{FlinkSql, SparkTestSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("asOf join matches latest at-or-before version, null when none") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 100.0, 7L), (1L, 15L, 200.0, 8L))
      .toDF("k", "vts", "v", "vid")
    val out = TemporalJoin.asOf(left, right, "k", "ts", "vts",
        Seq("v", "vid"), "vid")
      .orderBy("ts").collect()
    // ts=10 matches the equal-ts version (inclusive); ts=20 the later one
    assert(out.map(r => (r.getString(2), Option(r.get(3)))).toSeq ==
      Seq((("l3"), None), (("l1"), Some(100.0)), (("l2"), Some(200.0))))
  }

  test("asOf equal-ts versions resolve to the highest tie-break") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, "a", 1L), (1L, 10L, "b", 2L)).toDF("k", "vts", "v", "vid")
    val out = TemporalJoin.asOf(left, right, "k", "ts", "vts", Seq("v"), "vid")
    assert(out.collect().head.getString(2) == "b")
  }

  test("lookup join enriches with LRU cache smaller than key space") {
    val dim = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "name")
    val (store, schema) = LookupJoin.storeFrom(dim)
    val facts = spark.range(100).select((col("id") % 4 + 1).as("k"))
    val out = LookupJoin.enrich(facts, "k", store, schema, cacheSize = 2)
    val agg = out.groupBy("name").count().orderBy("name").collect()
    // k=4 misses the store → null name
    assert(agg.map(r => (Option(r.getString(0)), r.getLong(1))).toMap ==
      Map(Some("one") -> 25L, Some("two") -> 25L, Some("three") -> 25L,
        None -> 25L))
  }

  test("FlinkSql rewrites TUMBLE/HOP/SESSION group windows") {
    assert(FlinkSql.rewrite(
      "GROUP BY TUMBLE(ts, INTERVAL '1' DAY), k")
      == "GROUP BY window(ts, '1 day'), k")
    assert(FlinkSql.rewrite(
      "SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE)")
      == "SELECT window.start")
    // HOP(ts, slide, size) flips to window(ts, size, slide)
    assert(FlinkSql.rewrite(
      "GROUP BY HOP(ts, INTERVAL '5' MINUTE, INTERVAL '1' HOUR)")
      == "GROUP BY window(ts, '1 hour', '5 minute')")
    assert(FlinkSql.rewrite(
      "GROUP BY SESSION(ts, INTERVAL '30' MINUTE)")
      == "GROUP BY session_window(ts, '30 minute')")
  }

  test("debezium decode expands update into -U/+U") {
    val payload = new StructType().add("id", "long").add("v", "string")
    val df = Seq(
      """{"before":null,"after":{"id":1,"v":"a"},"op":"c","ts_ms":1}""",
      """{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"b"},"op":"u","ts_ms":2}""",
      """{"before":{"id":1,"v":"b"},"after":null,"op":"d","ts_ms":3}""")
      .toDF("j")
    val out = CdcFormats.fromDebezium(df, col("j"), payload)
      .select("row_kind", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq(("+I", 1L, "a"), ("-U", 1L, "a"), ("+U", 1L, "b"),
      ("-D", 1L, "b")))
  }

  test("canal decode overlays old fields onto -U rows") {
    val payload = new StructType().add("id", "long").add("v", "string")
    val df = Seq(
      """{"data":[{"id":1,"v":"new"}],"old":[{"v":"old"}],"type":"UPDATE"}""")
      .toDF("j")
    val out = CdcFormats.fromCanal(df, col("j"), payload)
      .select("row_kind", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    // -U takes v from old but keeps unchanged id from data
    assert(out == Seq(("-U", 1L, "old"), ("+U", 1L, "new")))
  }

  test("multimodal frame sampling covers all bytes") {
    val docs = Seq((1L, "x" * 250), (2L, "")).toDF("doc_id", "text")
    val assets = Multimodal.attachPayload(docs, "text")
    val frames = Multimodal.sampleFrames(assets, "doc_id", 100)
      .orderBy("asset_id", "frame_no").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(frames == Seq((1L, 0, 100L), (1L, 1, 100L), (1L, 2, 50L),
      (2L, 0, 0L)))
  }
}
