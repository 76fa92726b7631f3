package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode}

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
      extends WatermarkReplayProcessor[TsjEvent, TsjPair] {

    @transient private var leftRows: ListState[TsjEvent] = _
    @transient private var rightRows: ListState[TsjEvent] = _

    override protected def initState(): Unit = {
      val none = org.apache.spark.sql.streaming.TTLConfig.NONE
      leftRows = getHandle.getListState[TsjEvent]("left",
        Encoders.product[TsjEvent], none)
      rightRows = getHandle.getListState[TsjEvent]("right",
        Encoders.product[TsjEvent], none)
    }

    override protected def tsOf(e: TsjEvent): Long = e.tsMs
    override protected def inputEncoder: org.apache.spark.sql.Encoder[TsjEvent] =
      Encoders.product[TsjEvent]

    override protected def replay(key: Long, ready: Seq[TsjEvent],
        wm: Long): Iterator[TsjPair] = {

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
