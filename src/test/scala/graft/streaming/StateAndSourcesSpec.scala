package graft.streaming

import graft.SparkTestSession
import graft.sources.DataGen
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.scalatest.funsuite.AnyFunSuite

/** Per-key running count whose ValueState expires after `ttlMs` of
  * processing time — the StateTtlConfig.newBuilder(…).cleanupXxx
  * analog. Top-level so the closure serializes without the suite.
  */
class TtlCounter(ttlMs: Long)
    extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {
  @transient private var cnt: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong,
      TTLConfig(java.time.Duration.ofMillis(ttlMs)))
  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    var c = Option(cnt.get()).getOrElse(0L)
    rows.foreach(_ => c += 1)
    cnt.update(c)
    Iterator.single((key, c))
  }
  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long)] =
    Iterator.empty
}

/** State TTL (reference: StateTtlConfig, SURVEY.md §2.10) and the
  * DataGen source (§2.1).
  */
class StateAndSourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ValueState with TTL expires between micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StreamRunner.requireRocksDb(spark)
    val in = MemoryStream[Long]
    val out = in.toDS().map(k => (k, 1L)).groupByKey(_._1)
      .transformWithState(new TtlCounter(ttlMs = 5000L),
        TimeMode.ProcessingTime(), OutputMode.Append())
    val q = out.toDF().toDF("key", "cnt")
      .writeStream.format("memory").queryName("ttl_spec")
      .outputMode("append").start()
    // NOTE: processAllAvailable never settles for processing-time TWS
    // queries (the operator keeps scheduling work), so poll the sink.
    def waitRows(n: Long): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("ttl_spec").count() < n &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(spark.table("ttl_spec").count() >= n, s"timed out waiting $n")
    }
    try {
      in.addData(1L)
      waitRows(1)
      in.addData(1L) // within TTL → count continues
      waitRows(2)
      Thread.sleep(7000) // let the state expire
      in.addData(1L) // expired → count restarts
      waitRows(3)
      val counts = spark.table("ttl_spec").collect()
        .map(_.getLong(1)).toSeq.sorted
      assert(counts.take(2) == Seq(1L, 1L) && counts.max == 2L,
        s"expected restart after TTL, got $counts")
    } finally q.stop()
  }

  test("DataGen bounded sequence is deterministic and distributed") {
    val df = DataGen.sequence(spark, 1000, numPartitions = 8,
      "user_id" -> DataGen.randLong("id", 50),
      "amount" -> DataGen.randDouble("id", 100.0))
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 8)
    val a = df.agg(org.apache.spark.sql.functions.sum("user_id")).head().getLong(0)
    val b = DataGen.sequence(spark, 1000, 8,
      "user_id" -> DataGen.randLong("id", 50))
      .agg(org.apache.spark.sql.functions.sum("user_id")).head().getLong(0)
    assert(a == b) // reproducible across runs
    assert(df.filter("user_id < 0 OR user_id >= 50").count() == 0)
  }

  test("DataGen rate stream produces rows with generated fields") {
    val df = DataGen.rateStream(spark, rowsPerBatch = 10,
      "user_id" -> DataGen.randLong("id", 50))
    val q = df.writeStream.format("memory").queryName("rate_spec")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("rate_spec").isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(!spark.table("rate_spec").isEmpty)
      assert(spark.table("rate_spec")
        .filter("user_id < 0 OR user_id >= 50").count() == 0)
    } finally q.stop()
  }
}
