package graft.streaming

import scala.collection.immutable.TreeMap

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, ValueState}

/** Streaming group aggregation over RETRACTION inputs (reference:
  * `RT/aggregate/GroupAggFunction.java` +
  * `aggfunctions/{Max,Min}WithRetractAggFunction.java`, SURVEY.md §2.5
  * "retractable agg twins"): consumes a changelog stream in the
  * engine's `row_kind` convention — accumulate on `+I`/`+U`, retract on
  * `-U`/`-D` — and maintains per-key COUNT / SUM / MIN / MAX where min
  * and max survive retraction of the current extreme via a sorted
  * value-multiset, exactly the reference's retractable-twin state shape
  * (MaxWithRetract keeps a sorted map of value → multiplicity).
  *
  * Values aggregate as exact long cents (like StreamingOver) so results
  * are bit-reproducible. Each processed record emits the updated
  * aggregate row stamped with a per-key sequence number — Flink's
  * per-record update emission; downstream either keeps the changelog or
  * snapshots the latest row per key (max_by(seq), the UpsertSink
  * pattern). A retraction for a value not in the multiset is dropped,
  * matching the reference's tolerate-and-log behavior on late
  * retractions.
  *
  * Determinism over out-of-order input: watermark replay in
  * (ts, id, retract-before-accumulate) order, so an update's `-U`
  * applies before its paired `+U` at the same timestamp. State per
  * key: O(live records) multiset entries — deletes shrink it.
  */
object RetractableAgg {

  /** rowKind: +I | -U | +U | -D; `id` is the record identity used only
    * for deterministic replay ordering.
    */
  case class RaEvent(key: Long, rowKind: String, tsMs: Long, id: Long,
      value: Double)

  /** Updated aggregate after one changelog record; min/max None when no
    * live rows remain.
    */
  case class RaRow(key: Long, seq: Long, cnt: Long, sumCents: Long,
      minCents: Option[Long], maxCents: Option[Long])

  /** Public: the state encoder requires it. */
  case class AggState(seq: Long, cnt: Long, sumCents: Long,
      multiset: TreeMap[Long, Long])

  /** When `emitEveryUpdate` (the default) each processed changelog
    * record emits an updated row — Flink's per-record update stream.
    * When false, only the post-sweep state emits (one row per key per
    * timer fire): the upsert-snapshot shape, O(keys) per micro-batch
    * instead of O(changes) total, which is what a sink should carry at
    * 100 TB when the consumer only wants final values.
    */
  class RetractableAggProcessor(emitEveryUpdate: Boolean = true)
      extends WatermarkReplayProcessor[RaEvent, RaRow] {

    @transient private var agg: ValueState[AggState] = _

    override protected def initState(): Unit =
      agg = getHandle.getValueState[AggState]("agg",
        Encoders.kryo[AggState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override protected def tsOf(e: RaEvent): Long = e.tsMs
    override protected def inputEncoder: org.apache.spark.sql.Encoder[RaEvent] =
      Encoders.product[RaEvent]

    private def kindRank(k: String): Int = k match {
      case "-U" | "-D" => 0 // a record's retraction precedes its re-accumulate
      case "+I" | "+U" => 1
      case other => throw new IllegalArgumentException(s"bad row_kind $other")
    }

    override protected def replay(key: Long, ready: Seq[RaEvent],
        wm: Long): Iterator[RaRow] = {

      var st = Option(agg.get())
        .getOrElse(AggState(0L, 0L, 0L, TreeMap.empty[Long, Long]))
      val out = List.newBuilder[RaRow]

      ready.sortBy(e => (e.tsMs, e.id, kindRank(e.rowKind))).foreach { e =>
        val cents = math.round(e.value * 100.0)
        val accumulate = kindRank(e.rowKind) == 1
        st =
          if (accumulate)
            st.copy(cnt = st.cnt + 1, sumCents = st.sumCents + cents,
              multiset = st.multiset.updated(cents,
                st.multiset.getOrElse(cents, 0L) + 1))
          else st.multiset.get(cents) match {
            case Some(n) =>
              st.copy(cnt = st.cnt - 1, sumCents = st.sumCents - cents,
                multiset = if (n == 1L) st.multiset - cents
                           else st.multiset.updated(cents, n - 1))
            case None => st // late/unmatched retraction: tolerate
          }
        val emitSeq = st.seq + 1
        st = st.copy(seq = emitSeq)
        if (emitEveryUpdate)
          out += RaRow(key, emitSeq, st.cnt, st.sumCents,
            st.multiset.headOption.map(_._1), st.multiset.lastOption.map(_._1))
      }
      if (!emitEveryUpdate && ready.nonEmpty)
        out += RaRow(key, st.seq, st.cnt, st.sumCents,
          st.multiset.headOption.map(_._1), st.multiset.lastOption.map(_._1))
      agg.update(st)
      out.result().iterator
    }
  }

  def apply(events: Dataset[RaEvent]): Dataset[RaRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new RetractableAggProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Snapshot-emission variant: per-key state rows once per timer fire
    * rather than once per change. Downstream still picks the last fire
    * per key (`max_by(seq)`), but over O(keys × fires) rows — the full
    * changelog never leaves the operator. */
  def snapshots(events: Dataset[RaEvent]): Dataset[RaRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new RetractableAggProcessor(emitEveryUpdate = false),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
