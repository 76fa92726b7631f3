package graft.streaming

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** Shared machinery of the event-time replay processors (Cep,
  * StreamingOver, StreamingOverRange, CountWindow, TwinStateJoin):
  * rows buffer in ListState until the watermark passes them, then
  * [[replay]] processes them in one sweep per fire.
  *
  * Timer discipline — ONE timer per batch at the min incoming event
  * time, re-armed at the min PENDING time after each fire. Per-row
  * timers would make each fire re-read the whole buffer once per
  * distinct timestamp (quadratic in buffered rows); the re-arm keeps
  * the invariant that whenever pending rows exist, an armed timer
  * ≤ min(pending) exists, so no row ever strands. A stale fire (ready
  * empty) can only follow a same-batch fire that already re-armed.
  *
  * Buffered state is O(out-of-orderness window) per key; everything
  * else (frames, partials, window maps) belongs to the subclass.
  */
trait WatermarkReplayProcessor[I, O] extends StatefulProcessor[Long, I, O] {

  /** Event time (ms) of an input row — the replay/timer clock. */
  protected def tsOf(e: I): Long

  /** Encoder for buffered input rows. */
  protected def inputEncoder: Encoder[I]

  /** Subclass state initialization (getHandle is live). */
  protected def initState(): Unit

  /** Processes the watermark-passed rows, UNSORTED — each subclass owns
    * its replay order (ts,id) / (ts,side,id) / peer grouping.
    */
  protected def replay(key: Long, ready: Seq[I], wm: Long): Iterator[O]

  /** When true, a timer fire with no ready rows still calls [[replay]]
    * (with an empty batch) so the subclass can run watermark-driven
    * sweeps — e.g. CEP's window-close flush, which arms its own timer
    * at the partial's within-window end, after the event buffer may
    * already have drained.
    */
  protected def replayOnEmptyTimer: Boolean = false

  /** Punctuated-watermark analog (reference: flink-core
    * `eventtime/WatermarkGenerator.java#onEvent` — a punctuated
    * generator emits the watermark from the event itself instead of on
    * the periodic clock). Returning `Some(w)` marks the row as a
    * punctuation asserting "no later row of this KEY carries ts <= w":
    * all buffered rows with ts <= w replay IMMEDIATELY in the same
    * micro-batch, without waiting for the global watermark to pass
    * them. The marker row itself stays ordinary data (buffered and
    * replayed like any other — Flink's generators also see the event
    * before emitting the watermark after it).
    *
    * Same contract Flink's punctuated generators carry: if the
    * assertion is false — a later micro-batch delivers a row at or
    * below an already-fired punctuation — that row is LATE. It is not
    * dropped here; it buffers and replays once the GLOBAL watermark
    * passes it, i.e. in a separate later sweep, out of order with the
    * rows the punctuation already released. Within one micro-batch the
    * release is safe regardless, because it runs after the whole
    * batch's rows are buffered.
    */
  protected def punctuationOf(e: I): Option[Long] = None

  @transient private var buffer: ListState[I] = _

  final override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buffer = getHandle.getListState[I]("buf", inputEncoder,
      org.apache.spark.sql.streaming.TTLConfig.NONE)
    initState()
  }

  final override def handleInputRows(key: Long, rows: Iterator[I],
      timerValues: TimerValues): Iterator[O] = {
    // per-row appendValue is deliberate: it maps to a RocksDB merge op,
    // and A/B at sf1 (1M events) measured batching the rows into one
    // appendList per key per batch ~2x SLOWER (q103 8.8→15.2 s, q87
    // 33→58 s) — don't "optimize" this into appendList
    var minTs = Long.MaxValue
    var punct = Long.MinValue
    rows.foreach { e =>
      buffer.appendValue(e)
      val t = tsOf(e)
      if (t < minTs) minTs = t
      punctuationOf(e).foreach { w => if (w > punct) punct = w }
    }
    if (punct == Long.MinValue) {
      if (minTs != Long.MaxValue) getHandle.registerTimer(minTs)
      Iterator.empty
    } else {
      // punctuated release: drain the covered prefix NOW (the
      // punctuation is the watermark for these rows); pending rows
      // keep the one-timer invariant exactly like a timer fire
      val all = buffer.get().toList
      val (ready, pending) = all.partition(tsOf(_) <= punct)
      buffer.clear()
      if (pending.nonEmpty) {
        pending.foreach(buffer.appendValue)
        getHandle.registerTimer(pending.map(tsOf).min)
      }
      if (ready.isEmpty && !replayOnEmptyTimer) Iterator.empty
      else replay(key, ready, punct)
    }
  }

  final override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[O] = {
    val wm = timerValues.getCurrentWatermarkInMs
    val all = buffer.get().toList
    val (ready, pending) = all.partition(tsOf(_) <= wm)
    if (ready.isEmpty && !replayOnEmptyTimer) return Iterator.empty
    buffer.clear()
    if (pending.nonEmpty) {
      pending.foreach(buffer.appendValue)
      getHandle.registerTimer(pending.map(tsOf).min)
    }
    replay(key, ready, wm)
  }
}
