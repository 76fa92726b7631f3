package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, ValueState}

/** Per-key tumbling event-time windows with EVICTORS (reference:
  * `DS/api/windowing/evictors/{CountEvictor,TimeEvictor}.java` applied
  * by `EvictingWindowOperator`, SURVEY.md §2.10 DataStream windowed agg
  * row — the "arbitrary evictors" part that Spark's native windows
  * cannot express): when a window fires, the evictor first drops
  * elements, then the aggregate runs over the survivors.
  *
  *  - [[Evictor.CountEvictor]](k): keep only the LAST k elements in
  *    (ts, id) order — Flink's CountEvictor with doEvictAfter=false.
  *  - [[Evictor.TimeEvictor]](keepMs): keep elements younger than
  *    `windowMax - keepMs`, where windowMax is the max timestamp among
  *    the window's elements — Flink's TimeEvictor semantics.
  *
  * A window fires once, when the watermark passes its end; window
  * contents buffer in per-window state until then (the evicting window
  * operator genuinely needs element retention — that is its cost in
  * Flink too). Timers at each window end drive the fire even after the
  * event buffer drains (replayOnEmptyTimer). State per key: live
  * windows × their elements; fired windows are removed. Money
  * aggregates as exact long cents.
  */
object EvictingWindow {

  sealed trait Evictor extends Serializable
  object Evictor {
    final case class CountEvictor(keepLast: Int) extends Evictor
    final case class TimeEvictor(keepMs: Long) extends Evictor
    /** Flink `DeltaEvictor(threshold, deltaFunction)` with the absolute
      * value delta: evicts every element whose |value − lastElement
      * .value| >= threshold, where lastElement is the window's last
      * element in (ts, id) order (which trivially survives itself).
      */
    final case class DeltaEvictor(threshold: Double) extends Evictor
  }

  case class EwEvent(key: Long, tsMs: Long, id: Long, value: Double)

  /** One row per fired window: survivors after eviction. */
  case class EwOut(key: Long, winStart: Long, cnt: Long, sum: Double)

  class EvictingWindowProcessor(winMs: Long, evictor: Evictor)
      extends WatermarkReplayProcessor[EwEvent, EwOut] {

    @transient private var windows: ValueState[Map[Long, List[EwEvent]]] = _

    override protected def initState(): Unit =
      windows = getHandle.getValueState[Map[Long, List[EwEvent]]]("wins",
        Encoders.kryo[Map[Long, List[EwEvent]]],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override protected def tsOf(e: EwEvent): Long = e.tsMs
    override protected def inputEncoder: org.apache.spark.sql.Encoder[EwEvent] =
      Encoders.product[EwEvent]
    override protected def replayOnEmptyTimer: Boolean = true

    private def survivors(elems: List[EwEvent]): Seq[EwEvent] = {
      val sorted = elems.sortBy(e => (e.tsMs, e.id))
      evictor match {
        case Evictor.CountEvictor(k) => sorted.takeRight(k)
        case Evictor.TimeEvictor(keepMs) =>
          val cutoff = sorted.last.tsMs - keepMs
          sorted.filter(_.tsMs > cutoff)
        case Evictor.DeltaEvictor(t) =>
          val last = sorted.last.value
          sorted.filter(e => math.abs(e.value - last) < t)
      }
    }

    override protected def replay(key: Long, ready: Seq[EwEvent],
        wm: Long): Iterator[EwOut] = {

      var wins = Option(windows.get()).getOrElse(Map.empty[Long, List[EwEvent]])
      ready.foreach { e =>
        val ws = math.floorDiv(e.tsMs, winMs) * winMs
        wins += ws -> (e :: wins.getOrElse(ws, Nil))
      }
      val (fired, open) = wins.partition { case (ws, _) => ws + winMs <= wm }
      val out = fired.toSeq.sortBy(_._1).map { case (ws, elems) =>
        val kept = survivors(elems)
        val cents = kept.map(e => math.round(e.value * 100.0)).sum
        EwOut(key, ws, kept.size.toLong, cents / 100.0)
      }
      windows.update(open)
      // arm a timer at each open window's end so it fires as soon as
      // the watermark passes, with or without further input
      open.keysIterator.foreach(ws => getHandle.registerTimer(ws + winMs))
      out.iterator
    }
  }

  def apply(events: Dataset[EwEvent], winMs: Long,
      evictor: Evictor): Dataset[EwOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new EvictingWindowProcessor(winMs, evictor),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
