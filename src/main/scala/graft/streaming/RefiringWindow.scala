package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** Tumbling window aggregation with Flink's allowed-lateness RE-FIRE
  * (reference: `WindowedStream#allowedLateness` +
  * `DS/runtime/operators/windowing/WindowOperator#processElement`,
  * SURVEY.md §2.10 — Spark windows drop late rows silently and never
  * re-emit): the window fires `+I` when the watermark passes its end,
  * every late row within `allowedMs` updates state and re-fires the
  * window as a `+U` changelog row (the reference's retracting
  * re-emission, materialized per record), and rows beyond allowed
  * lateness surface tagged `L` — the side-output, no row ever silently
  * lost. Downstream, the usual changelog consumers apply: keep-last per
  * (key, window) via [[UpsertSink]] semantics gives the final table.
  *
  * State: one (count, cents, fired) triple per OPEN window per key in
  * MapState; windows GC exactly at end+allowed. Timers: one per window
  * end + one per GC point; each fire sweeps the (small) per-key map.
  */
object RefiringWindow {

  case class RwEvent(key: Long, tsMs: Long, id: Long, value: Double)

  /** rowKind: "+I" first fire, "+U" late re-fire, "L" beyond-lateness
    * side output (cnt/sum then carry the single dropped row).
    */
  case class RwOut(key: Long, winStart: Long, rowKind: String,
      cnt: Long, sum: Double)

  case class WinAcc(cnt: Long, cents: Long, fired: Boolean)

  class RefiringWindowProcessor(winMs: Long, allowedMs: Long)
      extends StatefulProcessor[Long, RwEvent, RwOut] {

    @transient private var windows: MapState[Long, WinAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      windows = getHandle.getMapState[Long, WinAcc]("win",
        Encoders.scalaLong, Encoders.product[WinAcc],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[RwEvent],
        timerValues: TimerValues): Iterator[RwOut] = {
      val wm = timerValues.getCurrentWatermarkInMs
      val out = Seq.newBuilder[RwOut]
      rows.foreach { e =>
        val winStart = math.floorDiv(e.tsMs, winMs) * winMs
        val winEnd = winStart + winMs
        val cents = math.round(e.value * 100.0)
        if (wm >= winEnd + allowedMs) {
          // beyond allowed lateness: side output, row preserved
          out += RwOut(key, winStart, "L", 1L, cents / 100.0)
        } else {
          val prev = Option(windows.getValue(winStart))
            .getOrElse(WinAcc(0L, 0L, fired = false))
          val acc = WinAcc(prev.cnt + 1, prev.cents + cents, prev.fired)
          windows.updateValue(winStart, acc)
          if (prev.cnt == 0) {
            getHandle.registerTimer(winEnd) // first row arms the fire…
            getHandle.registerTimer(winEnd + allowedMs) // …and the GC
          }
          if (acc.fired) // late row into an already-fired window → re-fire
            out += RwOut(key, winStart, "+U", acc.cnt, acc.cents / 100.0)
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[RwOut] = {
      val wm = timerValues.getCurrentWatermarkInMs
      val out = Seq.newBuilder[RwOut]
      // sweep the per-key window map: fire closed windows, GC expired ones
      val entries = windows.iterator().toArray
      entries.foreach { case (ws, acc) =>
        if (!acc.fired && wm >= ws + winMs) {
          out += RwOut(key, ws, "+I", acc.cnt, acc.cents / 100.0)
          windows.updateValue(ws, acc.copy(fired = true))
        }
        if (wm >= ws + winMs + allowedMs) windows.removeKey(ws)
      }
      out.result().iterator
    }
  }

  def apply(events: Dataset[RwEvent], winMs: Long, allowedMs: Long)
      : Dataset[RwOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new RefiringWindowProcessor(winMs, allowedMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
