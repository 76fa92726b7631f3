package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Late-data policy with a side output (reference:
  * `WindowedStream#{allowedLateness,sideOutputLateData}` +
  * `DS/runtime/operators/windowing/WindowOperator#processElement`,
  * SURVEY.md §2.10 — Spark drops watermark-late rows silently, with no
  * side channel): every row is tagged `ontime` / `late` (behind the
  * watermark but within allowedLateness — the reference would re-fire
  * its window) / `dropped` (beyond allowedLateness — the reference
  * routes it to the side-output tag), and NO row is lost.
  *
  * The watermark is tracked per key in ValueState as
  * `max(event time seen) - delay` — the reference's per-partition
  * bounded-out-of-orderness generator before the merge. Rows are tagged
  * in arrival order, so the operator deliberately takes the stream
  * UN-watermarked (a `withWatermark` upstream would make Spark filter
  * the late rows before this operator could see them); downstream
  * consumers split on `cls` and apply their own watermark.
  */
object LateSplit {

  case class LsEvent(key: Long, tsMs: Long, id: Long)
  case class LsOut(key: Long, id: Long, tsMs: Long, cls: String)

  class LateSplitProcessor(delayMs: Long, allowedMs: Long)
      extends StatefulProcessor[Long, LsEvent, LsOut] {

    @transient private var maxTs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      maxTs = getHandle.getValueState[Long]("maxTs",
        Encoders.scalaLong, org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[LsEvent],
        timerValues: TimerValues): Iterator[LsOut] = {
      // exists() guard: get() on an absent primitive-Long state returns
      // null, which unboxes to 0 — Option(get()) can never be None
      var seen = if (maxTs.exists()) Some(maxTs.get()) else None
      val out = rows.map { e =>
        val cls = seen match {
          case Some(m) if e.tsMs < m - delayMs - allowedMs => "dropped"
          case Some(m) if e.tsMs < m - delayMs => "late"
          case _ => "ontime"
        }
        seen = Some(seen.fold(e.tsMs)(math.max(_, e.tsMs)))
        LsOut(key, e.id, e.tsMs, cls)
      }.toArray
      maxTs.update(seen.get)
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[LsOut] =
      Iterator.empty
  }

  def apply(events: Dataset[LsEvent], delayMs: Long, allowedMs: Long)
      : Dataset[LsOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new LateSplitProcessor(delayMs, allowedMs),
        TimeMode.None(), OutputMode.Append())
  }
}
