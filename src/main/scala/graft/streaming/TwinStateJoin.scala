package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** Unbounded keyed stream-stream INNER join with twin state (reference:
  * `RT/join/stream/StreamingJoinOperator` + `JoinRecordStateViews`,
  * SURVEY.md §2.4 / §7.5): each side's rows are stored per key forever
  * (no watermark bound — Spark's native stream-stream join requires
  * one), and every arriving row emits a pair against ALL stored rows of
  * the other side — Flink's regular-join semantics for append-only
  * inputs. The retracting/update-input variant is the documented
  * non-goal; table-state equivalence goes through [[UpsertSink]].
  *
  * Determinism over out-of-order input: the same watermark-ordered
  * replay as the other processors here — both sides buffer with
  * event-time timers and replay interleaved in (ts, side, id) order, so
  * the emitted pair SET equals the batch cross-product of the two sides
  * within each key (emission order is irrelevant to the result table).
  * State is O(rows per key per side) — exactly the reference's state
  * shape, which is why the reference also recommends bounding regular
  * joins with state TTL in production; wire TTLConfig here for that.
  */
object TwinStateJoin {

  /** side: 0 = left, 1 = right. */
  case class TsjEvent(key: Long, side: Int, tsMs: Long, id: Long,
      value: Double)
  case class TsjPair(key: Long, leftId: Long, rightId: Long,
      leftValue: Double, rightValue: Double)

  class TwinStateJoinProcessor
      extends StatefulProcessor[Long, TsjEvent, TsjPair] {

    @transient private var buffer: ListState[TsjEvent] = _
    @transient private var leftRows: ListState[TsjEvent] = _
    @transient private var rightRows: ListState[TsjEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val none = org.apache.spark.sql.streaming.TTLConfig.NONE
      buffer = getHandle.getListState[TsjEvent]("buf",
        Encoders.product[TsjEvent], none)
      leftRows = getHandle.getListState[TsjEvent]("left",
        Encoders.product[TsjEvent], none)
      rightRows = getHandle.getListState[TsjEvent]("right",
        Encoders.product[TsjEvent], none)
    }

    override def handleInputRows(key: Long, rows: Iterator[TsjEvent],
        timerValues: TimerValues): Iterator[TsjPair] = {
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
        expiredTimerInfo: ExpiredTimerInfo): Iterator[TsjPair] = {
      val wm = timerValues.getCurrentWatermarkInMs
      val all = buffer.get().toArray
      val (ready, pending) = all.partition(_.tsMs <= wm)
      if (ready.isEmpty) return Iterator.empty
      buffer.clear()
      if (pending.nonEmpty) {
        buffer.appendList(pending)
        getHandle.registerTimer(pending.map(_.tsMs).min)
      }

      val left = scala.collection.mutable.ArrayBuffer(leftRows.get().toSeq: _*)
      val right = scala.collection.mutable.ArrayBuffer(rightRows.get().toSeq: _*)
      val out = Seq.newBuilder[TsjPair]
      ready.sortBy(e => (e.tsMs, e.side, e.id)).foreach { e =>
        if (e.side == 0) {
          right.foreach(r =>
            out += TsjPair(e.key, e.id, r.id, e.value, r.value))
          left += e
          leftRows.appendValue(e)
        } else {
          left.foreach(l =>
            out += TsjPair(e.key, l.id, e.id, l.value, e.value))
          right += e
          rightRows.appendValue(e)
        }
      }
      out.result().iterator
    }
  }

  def apply(events: Dataset[TsjEvent]): Dataset[TsjPair] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new TwinStateJoinProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
