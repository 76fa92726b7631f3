package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, ValueState}

/** Streaming event-time OVER with a TIME-RANGE frame (reference:
  * `RT/over/RowTimeRangeBoundedPrecedingFunction`, SURVEY.md §2.5):
  * per-key `RANGE BETWEEN <interval> PRECEDING AND CURRENT ROW` — each
  * row's frame is every row of the key within the trailing time range,
  * INCLUDING its event-time peers.
  *
  * Same watermark-ordered replay as [[StreamingOver]]; the difference
  * is frame semantics: rows replay in (ts, id) order grouped by ts, so
  * all peer rows (equal ts) share one frame containing the whole peer
  * group — SQL RANGE-frame peer semantics, which a row-at-a-time
  * trailing buffer would get wrong. Frame state is the trailing
  * (tsMs, cents) pairs inside the range — O(rows in range) per key,
  * evicted as the frame slides; money in exact long cents.
  */
object StreamingOverRange {

  import StreamingOver.{OverEvent, OverRow}

  case class RangeState(tsMs: Array[Long], cents: Array[Long])

  class OverRangeProcessor(rangeMs: Long)
      extends WatermarkReplayProcessor[OverEvent, OverRow] {

    @transient private var frame: ValueState[RangeState] = _

    override protected def initState(): Unit =
      frame = getHandle.getValueState[RangeState]("frame",
        Encoders.kryo[RangeState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override protected def tsOf(e: OverEvent): Long = e.tsMs
    override protected def inputEncoder: org.apache.spark.sql.Encoder[OverEvent] =
      Encoders.product[OverEvent]

    override protected def replay(key: Long, ready: Seq[OverEvent],
        wm: Long): Iterator[OverRow] = {

      var st = Option(frame.get())
        .getOrElse(RangeState(Array.emptyLongArray, Array.emptyLongArray))
      val out = Seq.newBuilder[OverRow]
      // peer groups: all rows at one tsMs share one frame
      ready.sortBy(e => (e.tsMs, e.id)).groupBy(_.tsMs).toSeq.sortBy(_._1)
        .foreach { case (ts, peers) =>
          val keepFrom = ts - rangeMs
          val kept = st.tsMs.indices.filter(st.tsMs(_) >= keepFrom)
          val ts2 = kept.map(st.tsMs).toArray ++ peers.map(_.tsMs)
          val c2 = kept.map(st.cents).toArray ++
            peers.map(e => math.round(e.value * 100.0))
          st = RangeState(ts2, c2)
          val sum = c2.sum
          val cnt = c2.length.toLong
          peers.sortBy(_.id).foreach { e =>
            out += OverRow(e.key, e.id, e.tsMs, sum / 100.0, cnt)
          }
        }
      frame.update(st)
      out.result().iterator
    }
  }

  def apply(events: Dataset[OverEvent], rangeMs: Long): Dataset[OverRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(
        new OverRangeProcessor(rangeMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
