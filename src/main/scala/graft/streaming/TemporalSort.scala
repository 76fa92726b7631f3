package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, ValueState}

/** Streaming temporal sort + sort-limit (reference:
  * StreamExecTemporalSort / RowTimeSortOperator and StreamExecSortLimit,
  * SURVEY.md §2.7 — the stream sort gap declared in r2): rows of a
  * keyed event-time stream are emitted in (rowtime, id) order once the
  * watermark passes them, each stamped with its per-key emission
  * sequence number, optionally stopping after the first `limit` rows
  * per key.
  *
  * The sequence column is what makes ordered EMISSION oracle-checkable
  * through an append sink (a sink's row order is not part of the
  * comparison contract): `seq` must equal the row's rowtime rank per
  * key, so any out-of-order emission — within a batch or across
  * batches — breaks the hash match. Cross-batch monotonicity is the
  * watermark's guarantee (a later batch replays only rows the watermark
  * had not yet passed), exactly the reference's
  * RowTimeSortOperator contract.
  *
  * State: the replay buffer (bounded by out-of-orderness) plus one
  * counter per key; with a limit, emission stops but the counter keeps
  * the "already done" decision durable. Keys are hash-partitioned by
  * groupByKey — the same per-key parallelism the reference's keyed sort
  * has at cluster scale.
  */
object TemporalSort {

  /** `ts` duplicates tsMs as the watermarked timestamp column (same
    * convention as the other replay operators).
    */
  case class SortEvent(key: Long, tsMs: Long, id: Long,
      ts: java.sql.Timestamp)

  /** One output per input row (until the limit): `seq` is the per-key
    * emission position, 1-based.
    */
  case class SortedRow(key: Long, id: Long, tsMs: Long, seq: Long)

  class TemporalSortProcessor(limit: Long)
      extends WatermarkReplayProcessor[SortEvent, SortedRow] {

    @transient private var emitted: ValueState[Long] = _

    override protected def tsOf(e: SortEvent): Long = e.tsMs
    override protected def inputEncoder: Encoder[SortEvent] =
      Encoders.product[SortEvent]

    override protected def initState(): Unit =
      emitted = getHandle.getValueState[Long]("emitted",
        Encoders.scalaLong, org.apache.spark.sql.streaming.TTLConfig.NONE)

    override protected def replay(key: Long, ready: Seq[SortEvent],
        wm: Long): Iterator[SortedRow] = {
      var n = Option(emitted.get()).getOrElse(0L)
      val out = ready.sortBy(e => (e.tsMs, e.id)).iterator
        .takeWhile(_ => n < limit)
        .map { e => n += 1; SortedRow(key, e.id, e.tsMs, n) }
        .toList
      emitted.update(n)
      out.iterator
    }
  }

  /** Temporal sort: every row, in rowtime order. */
  def apply(events: Dataset[SortEvent]): Dataset[SortedRow] =
    sortLimit(events, Long.MaxValue)

  /** Temporal sort-limit: the first `limit` rows per key in rowtime
    * order (StreamExecSortLimit over a rowtime ORDER BY).
    */
  def sortLimit(events: Dataset[SortEvent], limit: Long): Dataset[SortedRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new TemporalSortProcessor(limit),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
