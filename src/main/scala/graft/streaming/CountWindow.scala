package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Per-key COUNT windows (reference: `DataStream#countWindow` →
  * `DS/api/windowing/assigners/GlobalWindows` + `CountTrigger` +
  * count evictor, SURVEY.md §2.10 — no Spark-native equivalent): every
  * N rows of a key form one window; a window fires exactly when its Nth
  * row arrives, partial trailing windows never fire — Flink's tumbling
  * count-window semantics.
  *
  * Determinism over an out-of-order stream: same watermark-ordered
  * replay as [[StreamingOver]] — rows buffer in ListState with an
  * event-time timer each; when the watermark passes they replay in
  * (ts, id) order through a per-key (windowSeq, count, sumCents)
  * accumulator. State is O(out-of-orderness) buffered rows plus one
  * accumulator per key. Money accumulates in exact long cents.
  */
object CountWindow {

  case class CwEvent(key: Long, tsMs: Long, id: Long, value: Double)

  /** One row per FULL window: its 0-based sequence per key and the
    * exact sum (emitted as double dollars, bit-reproducible).
    */
  case class CwOut(key: Long, winSeq: Long, winSum: Double)

  case class CwAcc(seq: Long, cnt: Long, sumCents: Long)

  class CountWindowProcessor(n: Int)
      extends StatefulProcessor[Long, CwEvent, CwOut] {

    @transient private var buffer: ListState[CwEvent] = _
    @transient private var acc: ValueState[CwAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buffer = getHandle.getListState[CwEvent]("buf",
        Encoders.product[CwEvent],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      acc = getHandle.getValueState[CwAcc]("acc",
        Encoders.product[CwAcc],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[CwEvent],
        timerValues: TimerValues): Iterator[CwOut] = {
      // ONE timer per batch at the min incoming event time (not one
      // per row): each fire drains every watermark-passed row, so
      // per-row timers would re-read the whole buffer once per distinct
      // timestamp - quadratic. The fire handler re-arms at the min
      // PENDING ts, so no buffered row is ever stranded.
      var minTs = Long.MaxValue
      rows.foreach { e =>
        buffer.appendValue(e)
        if (e.tsMs < minTs) minTs = e.tsMs
      }
      if (minTs != Long.MaxValue) getHandle.registerTimer(minTs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[CwOut] = {
      val wm = timerValues.getCurrentWatermarkInMs
      val all = buffer.get().toArray
      val (ready, pending) = all.partition(_.tsMs <= wm)
      if (ready.isEmpty) return Iterator.empty
      buffer.clear()
      if (pending.nonEmpty) {
        buffer.appendList(pending)
        getHandle.registerTimer(pending.map(_.tsMs).min)
      }

      var st = Option(acc.get()).getOrElse(CwAcc(0L, 0L, 0L))
      val out = Seq.newBuilder[CwOut]
      ready.sortBy(e => (e.tsMs, e.id)).foreach { e =>
        val cents = math.round(e.value * 100.0)
        st = st.copy(cnt = st.cnt + 1, sumCents = st.sumCents + cents)
        if (st.cnt == n) {
          out += CwOut(key, st.seq, st.sumCents / 100.0)
          st = CwAcc(st.seq + 1, 0L, 0L)
        }
      }
      acc.update(st)
      out.result().iterator
    }
  }

  def apply(events: Dataset[CwEvent], n: Int): Dataset[CwOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(
        new CountWindowProcessor(n), TimeMode.EventTime(), OutputMode.Append())
  }
}
