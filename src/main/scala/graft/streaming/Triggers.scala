package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{MapState, ValueState}

/** Flink custom-trigger analogs beyond the built-in event-time trigger
  * (reference: `DS/api/windowing/triggers/DeltaTrigger.java` and
  * `…/ContinuousEventTimeTrigger.java`, SURVEY.md §2.10 window row):
  * both run as watermark-replay processors, so fires are deterministic
  * in event-time order regardless of micro-batch arrival.
  *
  * [[DeltaTrigger]] — GlobalWindow + DeltaTrigger(threshold, new-old):
  * the first element seeds the comparison value; every element whose
  * value exceeds the seed by more than `threshold` FIRES the window
  * (emitting the running aggregate at that row) and becomes the new
  * seed. State per key: one (seed, cnt, sumCents) triple.
  *
  * [[ContinuousEventTimeTrigger]] — tumbling event-time windows firing
  * EARLY at every `intervalMs` boundary the watermark passes (partial
  * results for long windows), with the boundary chain starting at the
  * first element and the final fire landing on the window end
  * (`intervalMs` must divide `winMs` so the chain covers it). Fires
  * interleave with replayed rows in event-time order: the fire at
  * boundary `b` aggregates exactly the rows with ts <= b. State per
  * key: one (cnt, sumCents, nextBoundary) per open window; ONE armed
  * timer at the min pending boundary (the RefiringWindow discipline).
  */
object Triggers {

  case class TrEvent(key: Long, tsMs: Long, id: Long, value: Double)

  /** Delta-trigger fire: the firing row's id, rows-in-window so far,
    * and the running sum in cents.
    */
  case class DtFire(key: Long, id: Long, n: Long, sumCents: Long)

  case class DtState(seeded: Boolean, seed: Double, n: Long,
      sumCents: Long)

  /** `purge` = Flink's `PurgingTrigger(DeltaTrigger(…))`: a fire also
    * purges the window contents, so each emission aggregates only the
    * rows since the previous fire. The trigger's own comparison state
    * (the seed) persists across purges, as in the reference — purging
    * clears window contents, not trigger state.
    */
  class DeltaTriggerProcessor(threshold: Double, purge: Boolean = false)
      extends WatermarkReplayProcessor[TrEvent, DtFire] {

    @transient private var st: ValueState[DtState] = _

    override protected def initState(): Unit =
      st = getHandle.getValueState[DtState]("delta",
        Encoders.product[DtState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override protected def tsOf(e: TrEvent): Long = e.tsMs
    override protected def inputEncoder: Encoder[TrEvent] =
      Encoders.product[TrEvent]

    override protected def replay(key: Long, ready: Seq[TrEvent],
        wm: Long): Iterator[DtFire] = {
      var s = Option(st.get()).getOrElse(DtState(seeded = false, 0.0, 0L, 0L))
      val out = Seq.newBuilder[DtFire]
      ready.sortBy(e => (e.tsMs, e.id)).foreach { e =>
        s = s.copy(n = s.n + 1,
          sumCents = s.sumCents + math.round(e.value * 100.0))
        if (!s.seeded) s = s.copy(seeded = true, seed = e.value)
        else if (e.value - s.seed > threshold) {
          out += DtFire(key, e.id, s.n, s.sumCents)
          s = if (purge) DtState(seeded = true, e.value, 0L, 0L)
              else s.copy(seed = e.value)
        }
      }
      st.update(s)
      out.result().iterator
    }
  }

  def deltaTrigger(events: Dataset[TrEvent], threshold: Double,
      purge: Boolean = false): Dataset[DtFire] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new DeltaTriggerProcessor(threshold, purge),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** Continuous fire: the window, the boundary that fired, and the
    * aggregate over the window's rows with ts <= boundary.
    */
  case class CtFire(key: Long, winStart: Long, fireMs: Long, n: Long,
      sumCents: Long)

  case class CtAcc(n: Long, sumCents: Long, nextB: Long)

  class ContinuousTriggerProcessor(winMs: Long, intervalMs: Long)
      extends WatermarkReplayProcessor[TrEvent, CtFire] {
    require(winMs % intervalMs == 0,
      "intervalMs must divide winMs so the chain covers the window end")

    @transient private var windows: MapState[Long, CtAcc] = _

    override protected def initState(): Unit =
      windows = getHandle.getMapState[Long, CtAcc]("cwin",
        Encoders.scalaLong, Encoders.product[CtAcc],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override protected def tsOf(e: TrEvent): Long = e.tsMs
    override protected def inputEncoder: Encoder[TrEvent] =
      Encoders.product[TrEvent]
    override protected def replayOnEmptyTimer: Boolean = true

    override protected def replay(key: Long, ready: Seq[TrEvent],
        wm: Long): Iterator[CtFire] = {
      val out = Seq.newBuilder[CtFire]
      // local view of the touched windows; written back once
      val acc = scala.collection.mutable.LinkedHashMap.empty[Long, CtAcc]
      def accOf(ws: Long): CtAcc = acc.getOrElseUpdate(ws,
        Option(windows.getValue(ws)).getOrElse(CtAcc(0L, 0L, -1L)))
      def fireUpTo(ws: Long, limit: Long): Unit = {
        var a = accOf(ws)
        val winEnd = ws + winMs
        while (a.nextB >= 0 && a.nextB <= math.min(limit, winEnd)) {
          out += CtFire(key, ws, a.nextB, a.n, a.sumCents)
          a = a.copy(nextB =
            if (a.nextB == winEnd) -1L else a.nextB + intervalMs)
        }
        acc(ws) = a
      }
      ready.sortBy(e => (e.tsMs, e.id)).foreach { e =>
        val ws = math.floorDiv(e.tsMs, winMs) * winMs
        // boundaries the watermark passed BEFORE this row fire first,
        // so the fire at b aggregates exactly rows with ts <= b
        fireUpTo(ws, math.min(e.tsMs - 1, wm))
        var a = accOf(ws)
        if (a.n == 0L && a.nextB < 0)
          a = a.copy(nextB =
            math.floorDiv(e.tsMs, intervalMs) * intervalMs + intervalMs)
        acc(ws) = a.copy(n = a.n + 1,
          sumCents = a.sumCents + math.round(e.value * 100.0))
      }
      // sweep every open window up to the watermark (boundary timers
      // land here via replayOnEmptyTimer when no rows accompany them)
      windows.iterator().foreach { case (ws, a) =>
        if (!acc.contains(ws)) acc(ws) = a
      }
      acc.keys.toSeq.foreach(ws => fireUpTo(ws, wm))
      var minB = Long.MaxValue
      acc.foreach { case (ws, a) =>
        if (a.nextB < 0 && wm >= ws + winMs) windows.removeKey(ws)
        else {
          windows.updateValue(ws, a)
          if (a.nextB >= 0 && a.nextB < minB) minB = a.nextB
        }
      }
      if (minB != Long.MaxValue) getHandle.registerTimer(minB)
      out.result().iterator
    }
  }

  def continuousTrigger(events: Dataset[TrEvent], winMs: Long,
      intervalMs: Long): Dataset[CtFire] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new ContinuousTriggerProcessor(winMs, intervalMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }
}
