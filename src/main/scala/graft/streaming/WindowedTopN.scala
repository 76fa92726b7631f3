package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Input row for [[WindowedTopNProcessor]]: event keyed into a
  * (group, windowStartSec) tumbling window. `winEndMs` drives the
  * event-time timer; `ts` is retained so the upstream watermark column
  * stays in the projected Dataset.
  */
case class TopNEvent(
    grp: String, winStartSec: Long, winEndMs: Long,
    id: Long, value: Double, ts: java.sql.Timestamp)

/** Emitted on window close: final rank row. */
case class TopNRow(
    grp: String, winStartSec: Long, rnk: Int, id: Long, value: Double)

/** Streaming per-key windowed Top-N on `transformWithState`, the Spark
  * analog of the reference's streaming rank operator
  * (flink-table-runtime-blink RT/rank/AppendOnlyTopNFunction — SURVEY.md
  * §2.6): each (group, window) key holds a bounded sorted buffer in a
  * ValueState (append-only inputs, so insert-or-evict suffices — never
  * the full window), and an event-time timer at window end emits the
  * FINAL top-n exactly once when the watermark passes, mirroring
  * Flink's emit-on-watermark window semantics.
  *
  * State per key is O(n) (the top-n buffer plus one timer) — at 100 TB
  * scale state size is bounded by |keys| * n, not by input volume, and
  * keys are hash-partitioned across executors by groupByKey.
  */
class WindowedTopNProcessor(n: Int)
    extends StatefulProcessor[(String, Long), TopNEvent, TopNRow] {

  @transient private var top: ValueState[Array[(Double, Long)]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    top = getHandle.getValueState[Array[(Double, Long)]](
      "top", Encoders.kryo[Array[(Double, Long)]],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  /** value desc, id asc — deterministic under ties. */
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def handleInputRows(
      key: (String, Long), rows: Iterator[TopNEvent],
      timerValues: TimerValues): Iterator[TopNRow] = {
    var buf = Option(top.get()).getOrElse(Array.empty[(Double, Long)])
    var winEnd = -1L
    rows.foreach { e =>
      winEnd = e.winEndMs
      buf = (buf :+ (e.value, e.id)).sortWith(lt).take(n)
    }
    top.update(buf)
    // idempotent: re-registering the same expiry is a no-op overwrite
    if (winEnd >= 0) getHandle.registerTimer(winEnd)
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: (String, Long), timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[TopNRow] = {
    val buf = Option(top.get()).getOrElse(Array.empty[(Double, Long)])
    top.clear()
    buf.iterator.zipWithIndex.map { case ((v, id), i) =>
      TopNRow(key._1, key._2, i + 1, id, v)
    }
  }
}

object WindowedTopN {

  /** Applies the processor over a keyed event-time stream. `events` must
    * already carry a watermark on the column that produced `winEndMs`.
    */
  def apply(events: Dataset[TopNEvent], n: Int): Dataset[TopNRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.grp, e.winStartSec))
      .transformWithState(
        new WindowedTopNProcessor(n), TimeMode.EventTime(), OutputMode.Append())
  }
}
