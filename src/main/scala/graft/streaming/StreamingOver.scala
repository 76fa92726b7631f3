package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, ValueState}

/** Streaming event-time OVER aggregation (reference:
  * StreamExecOverAggregate + RT/over/RowTimeRowsBoundedPrecedingFunction,
  * SURVEY.md §2.5 — no Spark-native equivalent): per-key running
  * aggregates in event-time order, `ROWS BETWEEN n PRECEDING AND
  * CURRENT ROW` (n = Int.MaxValue ⇒ unbounded preceding).
  *
  * Watermark-ordered replay ([[WatermarkReplayProcessor]]): when the
  * watermark passes buffered rows, they
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
      extends WatermarkReplayProcessor[OverEvent, OverRow] {

    @transient private var frame: ValueState[FrameState] = _

    override protected def tsOf(e: OverEvent): Long = e.tsMs
    override protected def inputEncoder: Encoder[OverEvent] =
      Encoders.product[OverEvent]

    override protected def initState(): Unit =
      frame = getHandle.getValueState[FrameState]("frame",
        Encoders.kryo[FrameState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override protected def replay(key: Long, ready: Seq[OverEvent],
        wm: Long): Iterator[OverRow] = {
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
