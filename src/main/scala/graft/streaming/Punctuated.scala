package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** Punctuated watermark generation (reference: flink-core
  * `eventtime/WatermarkGenerator.java#onEvent` and the punctuated
  * assigner pattern, SURVEY.md §2.10): certain MARKER events carry the
  * watermark in-band — seeing one proves the stream is complete up to
  * its timestamp, so buffered work releases immediately instead of
  * waiting for the periodic/global watermark clock.
  *
  * The generic knob lives in
  * [[WatermarkReplayProcessor.punctuationOf]] (any replay operator can
  * opt in); this file is the concrete operator the oracle checks: a
  * temporal sort whose per-key emission is driven by marker events.
  * With a deliberately huge watermark delay, rows past the global
  * watermark emit ONLY because a marker released them — which is
  * exactly what the oracle twin asserts.
  *
  * Scale posture: identical to [[TemporalSort]] — the punctuated
  * release adds no shuffle and no state; it only drains the existing
  * per-key buffer earlier, which strictly REDUCES peak state at any
  * scale (the whole point of punctuated watermarks in the reference:
  * bounded latency and state when the stream embeds completeness
  * markers).
  */
object Punctuated {

  import TemporalSort.{SortEvent, SortedRow}

  /** Temporal sort whose `isMarker` rows punctuate: a marker's own
    * timestamp becomes the key's watermark, releasing every buffered
    * row at or below it (the marker included — markers are ordinary
    * data rows that ALSO carry the watermark, as in the reference).
    */
  class PunctuatedSortProcessor(limit: Long, isMarker: SortEvent => Boolean)
      extends TemporalSort.TemporalSortProcessor(limit) {
    override protected def punctuationOf(e: SortEvent): Option[Long] =
      if (isMarker(e)) Some(e.tsMs) else None
  }

  /** Punctuated temporal sort: every row in rowtime order, released by
    * markers and/or the global watermark, whichever covers it first.
    */
  def sort(events: Dataset[SortEvent],
      isMarker: SortEvent => Boolean): Dataset[SortedRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(
        new PunctuatedSortProcessor(Long.MaxValue, isMarker),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
