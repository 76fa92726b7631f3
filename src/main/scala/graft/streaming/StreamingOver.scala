package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming event-time OVER aggregation (reference:
  * StreamExecOverAggregate + RT/over/RowTimeRowsBoundedPrecedingFunction,
  * SURVEY.md §2.5 — no Spark-native equivalent): per-key running
  * aggregates in event-time order, `ROWS BETWEEN n PRECEDING AND
  * CURRENT ROW` (n = Int.MaxValue ⇒ unbounded preceding).
  *
  * Same watermark-ordered replay as [[Cep]]: rows buffer in ListState
  * with an event-time timer per row; when the watermark passes, rows
  * replay in (ts, id) order through the frame state, and each input row
  * emits exactly one output row carrying its frame aggregates — Flink's
  * per-record OVER emission. Buffered state is bounded by the
  * out-of-orderness window; frame state is O(n) rows (bounded) or one
  * (sum, count) pair (unbounded). Money values aggregate as exact long
  * cents so the emitted double is bit-reproducible.
  */
object StreamingOver {

  case class OverEvent(key: Long, tsMs: Long, id: Long, value: Double,
      ts: java.sql.Timestamp)

  /** One output per input row: sum/count over the trailing frame. */
  case class OverRow(key: Long, id: Long, tsMs: Long,
      frameSum: Double, frameCnt: Long)

  /** Frame state: trailing row cents (bounded mode) or the running
    * (sumCents, cnt) aggregate (unbounded mode).
    */
  case class FrameState(trailing: Array[Long], sumCents: Long, cnt: Long)

  class OverProcessor(precedingRows: Int)
      extends StatefulProcessor[Long, OverEvent, OverRow] {

    @transient private var buffer: ListState[OverEvent] = _
    @transient private var frame: ValueState[FrameState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buffer = getHandle.getListState[OverEvent]("buf",
        Encoders.product[OverEvent],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      frame = getHandle.getValueState[FrameState]("frame",
        Encoders.kryo[FrameState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[OverEvent],
        timerValues: TimerValues): Iterator[OverRow] = {
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
        expiredTimerInfo: ExpiredTimerInfo): Iterator[OverRow] = {
      val wm = timerValues.getCurrentWatermarkInMs
      val all = buffer.get().toArray
      val (ready, pending) = all.partition(_.tsMs <= wm)
      if (ready.isEmpty) return Iterator.empty
      buffer.clear()
      if (pending.nonEmpty) {
        buffer.appendList(pending)
        getHandle.registerTimer(pending.map(_.tsMs).min)
      }

      var st = Option(frame.get())
        .getOrElse(FrameState(Array.emptyLongArray, 0L, 0L))
      val out = ready.sortBy(e => (e.tsMs, e.id)).map { e =>
        val cents = math.round(e.value * 100.0)
        st =
          if (precedingRows == Int.MaxValue)
            st.copy(sumCents = st.sumCents + cents, cnt = st.cnt + 1)
          else {
            val t = (st.trailing :+ cents).takeRight(precedingRows + 1)
            FrameState(t, t.sum, t.length.toLong)
          }
        OverRow(key, e.id, e.tsMs, st.sumCents / 100.0, st.cnt)
      }
      frame.update(st)
      out.iterator
    }
  }

  def apply(events: Dataset[OverEvent], precedingRows: Int): Dataset[OverRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(
        new OverProcessor(precedingRows), TimeMode.EventTime(), OutputMode.Append())
  }
}
