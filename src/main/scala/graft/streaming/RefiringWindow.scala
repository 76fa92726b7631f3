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
  * MapState; windows GC exactly at end+allowed.
  *
  * Timer discipline — ONE armed timer per key at the min pending
  * boundary (unfired window → its end, fired window → its GC point),
  * re-armed at the new min after every sweep. The earlier design armed
  * two timers per (key, window); on the file-replay shape (watermark
  * jumps a month in one batch) that meant ~80k fires each iterating
  * the key's whole window map — measured 5s of timer processing at
  * sf0.1. With the re-arm discipline one watermark jump costs one
  * sweep per key. Invariant: whenever the map is non-empty an armed
  * timer ≤ min(boundary) exists (inputs arm their batch's min, every
  * fire re-arms); stale extra timers just cause a cheap empty sweep.
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
      // coalesce the batch per window first: state traffic scales with
      // touched windows, not rows (rows arrive grouped per key per batch)
      val touched = scala.collection.mutable.LinkedHashMap
        .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
      rows.foreach { e =>
        val winStart = math.floorDiv(e.tsMs, winMs) * winMs
        val cents = math.round(e.value * 100.0)
        if (wm >= winStart + winMs + allowedMs) {
          // beyond allowed lateness: side output, row preserved
          out += RwOut(key, winStart, "L", 1L, cents / 100.0)
        } else {
          touched.getOrElseUpdate(winStart,
            scala.collection.mutable.ArrayBuffer.empty) += cents
        }
      }
      var minBoundary = Long.MaxValue
      touched.foreach { case (winStart, centsList) =>
        val prev = Option(windows.getValue(winStart))
          .getOrElse(WinAcc(0L, 0L, fired = false))
        var acc = prev
        if (prev.fired) {
          // late rows into an already-fired window re-fire PER RECORD
          // (the reference's retracting re-emission), state written once
          centsList.foreach { c =>
            acc = WinAcc(acc.cnt + 1, acc.cents + c, fired = true)
            out += RwOut(key, winStart, "+U", acc.cnt, acc.cents / 100.0)
          }
        } else {
          acc = WinAcc(prev.cnt + centsList.size,
            prev.cents + centsList.sum, fired = false)
        }
        windows.updateValue(winStart, acc)
        val boundary =
          if (acc.fired) winStart + winMs + allowedMs else winStart + winMs
        if (boundary < minBoundary) minBoundary = boundary
      }
      if (minBoundary != Long.MaxValue) getHandle.registerTimer(minBoundary)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[RwOut] = {
      val wm = timerValues.getCurrentWatermarkInMs
      val out = Seq.newBuilder[RwOut]
      // one sweep of the per-key window map: fire closed windows, GC
      // expired ones, then re-arm at the min surviving boundary
      var minBoundary = Long.MaxValue
      val entries = windows.iterator().toArray
      entries.foreach { case (ws, acc) =>
        var cur = acc
        if (!cur.fired && wm >= ws + winMs) {
          out += RwOut(key, ws, "+I", cur.cnt, cur.cents / 100.0)
          cur = cur.copy(fired = true)
          windows.updateValue(ws, cur)
        }
        if (wm >= ws + winMs + allowedMs) windows.removeKey(ws)
        else {
          val boundary =
            if (cur.fired) ws + winMs + allowedMs else ws + winMs
          if (boundary < minBoundary) minBoundary = boundary
        }
      }
      if (minBoundary != Long.MaxValue) getHandle.registerTimer(minBoundary)
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
