package graft.streaming

import graft.SparkTestSession
import graft.streaming.TemporalSort.SortEvent
import graft.streaming.RetractableAgg.{RaEvent, RaRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Batching must not change results: the watermark-replay operators
  * promise the same output whether events arrive in one micro-batch,
  * split across several, or shuffled within a batch (out-of-orderness
  * the watermark still covers). Multi-batch is where replay bugs hide —
  * state hand-off between fires, pending-row re-buffering, timer
  * re-arming — and the single-batch Verify path cannot catch them.
  */
class ReplayConsistencySpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(sec: Int) = java.sql.Timestamp.valueOf(
    f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")

  private def runSort(batches: Seq[Seq[SortEvent]]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StreamRunner.requireRocksDb(spark)
    val in = MemoryStream[SortEvent]
    val name = s"rc_sort_${System.nanoTime()}"
    val q = TemporalSort(
        in.toDS().withWatermark("ts", "30 seconds").as[SortEvent]).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData(SortEvent(999L, ts(3599).getTime, 0L, ts(3599)))
      q.processAllAvailable()
      spark.table(name).filter($"key" =!= 999L)
        .select($"key", $"id", $"seq").as[(Long, Long, Long)]
        .collect().toSeq.sorted
    } finally q.stop()
  }

  private def runAgg(batches: Seq[Seq[RaEvent]]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StreamRunner.requireRocksDb(spark)
    val in = MemoryStream[RaEvent]
    val name = s"rc_agg_${System.nanoTime()}"
    val stream = in.toDS()
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis($"tsMs"))
      .withWatermark("ts", "30 seconds")
      .drop("ts").as[RaEvent]
    val q = RetractableAgg(stream).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData(RaEvent(999L, "+I", ts(3599).getTime, 0L, 0.0))
      q.processAllAvailable()
      // final state per key is the sequence-max row
      spark.table(name).filter($"key" =!= 999L).as[RaRow].collect().toSeq
        .groupBy(_.key).map { case (k, rows) =>
          val last = rows.maxBy(_.seq)
          (k, last.cnt, last.sumCents)
        }.toSeq.sorted
    } finally q.stop()
  }

  private val sortEvents = (1 to 20).map { i =>
    SortEvent(i % 3, ts(i * 10).getTime, i.toLong, ts(i * 10))
  }

  test("temporal sort: one batch == three batches == shuffled batches") {
    val one = runSort(Seq(sortEvents))
    val three = runSort(sortEvents.grouped(7).toSeq)
    // shuffle within each batch: still within the 30s watermark delay
    val shuffled = runSort(sortEvents.grouped(7).map(_.reverse).toSeq)
    assert(one.nonEmpty && one == three && one == shuffled)
  }

  private val aggEvents = (1 to 20).flatMap { i =>
    val base = RaEvent(i % 3, "+I", ts(i * 10).getTime, i.toLong, i * 1.0)
    if (i % 4 == 0)
      Seq(base, RaEvent(i % 3, "-U", ts(i * 10 + 5).getTime, i.toLong, i * 1.0),
        RaEvent(i % 3, "+U", ts(i * 10 + 5).getTime, i.toLong, i + 100.0))
    else Seq(base)
  }

  test("retractable agg: one batch == three batches == shuffled batches") {
    val one = runAgg(Seq(aggEvents))
    val three = runAgg(aggEvents.grouped(9).toSeq)
    val shuffled = runAgg(aggEvents.grouped(9).map(_.reverse).toSeq)
    assert(one.nonEmpty && one == three && one == shuffled)
  }
}
