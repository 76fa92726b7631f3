package graft.streaming

import graft.SparkTestSession
import graft.streaming.TemporalSort.SortEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once across restarts (reference: checkpointed keyed state +
  * two-phase sinks): a transformWithState operator is stopped mid-input
  * and restarted from its checkpoint; recovered state must continue —
  * not restart — and the file sink's commit log must not duplicate.
  */
class RecoverySpec extends AnyFunSuite {
  import SparkTestSession._

  private def ev(key: Long, sec: Int, id: Long): SortEvent = {
    val ts = java.sql.Timestamp.valueOf(
      f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")
    SortEvent(key, ts.getTime, id, ts)
  }

  test("TemporalSort sequence state survives a checkpoint restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StreamRunner.requireRocksDb(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_recovery")
    val (ckpt, sink) = (s"$dir/ckpt", s"$dir/sink")

    val in = MemoryStream[SortEvent]
    def start() = TemporalSort(
        in.toDS().withWatermark("ts", "0 seconds").as[SortEvent]).toDF()
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", sink)
      .outputMode("append").start()

    // phase 1: two rows for key 1, then a watermark-advancing row
    val q1 = start()
    try {
      in.addData(ev(1, 0, 10), ev(1, 10, 11))
      q1.processAllAvailable()
      in.addData(ev(9, 100, 90))
      q1.processAllAvailable()
    } finally q1.stop()

    // phase 2: restart from the checkpoint, two more rows for key 1
    val q2 = start()
    try {
      in.addData(ev(1, 200, 12), ev(1, 210, 13))
      q2.processAllAvailable()
      in.addData(ev(9, 300, 91))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(sink)
      .filter($"key" === 1L).orderBy($"seq")
      .select($"id", $"seq").as[(Long, Long)].collect().toSeq
    // seq continues 1,2,3,4 across the restart — recovered ValueState,
    // no duplicated or re-emitted rows from the pre-restart batches
    assert(rows == Seq((10L, 1L), (11L, 2L), (12L, 3L), (13L, 4L)))
  }
}
