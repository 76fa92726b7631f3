package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, ValueState}

/** CEP subset (SURVEY.md §2.10 CEP row, §7 step 10): sequence patterns
  * over a keyed event-time stream, compiled to a `transformWithState`
  * NFA — the Spark analog of flink-cep's Pattern DSL + CepOperator.
  *
  * Supported surface (the reference's core; greedy quantifiers and the
  * richer AFTER MATCH modes are out of scope):
  *  - `Step(name, where)` with relaxed contiguity (followedBy,
  *    skip-till-next-match) or strict (`next`) contiguity,
  *  - `within(duration)` from first to last matched event,
  *  - after-match: NO_SKIP (emit every combination) or
  *    SKIP_PAST_LAST (greedy: a full match clears open partials).
  *
  * Mechanics mirror CepOperator: events buffer in ListState until the
  * watermark passes them (an event-time timer at each event's ts), are
  * then replayed in (ts, id) order through the partial-match set, and
  * completed matches emit downstream. State is bounded by the
  * out-of-orderness window (buffer) plus `within` (partials) per key —
  * the property that makes this safe at 1000-executor scale; keys are
  * hash-partitioned by groupByKey.
  */
object Cep {

  /** One pattern position. `strict`: the event must be the key's
    * immediately-next event (Flink `next()` vs `followedBy()`).
    */
  case class Step(name: String, where: CepEvent => Boolean,
      strict: Boolean = false)

  case class Pattern(steps: Seq[Step], withinMs: Long,
      skipPastLast: Boolean)

  /** `ts` duplicates tsMs as the watermarked timestamp column so the
    * upstream watermark survives the typed projection.
    */
  case class CepEvent(key: Long, tsMs: Long, tag: String, id: Long,
      ts: java.sql.Timestamp)

  /** Full match: per-step matched event ids (in step order) + bounds. */
  case class CepMatch(key: Long, ids: Array[Long],
      startTsMs: Long, endTsMs: Long)

  /** Open partial match (public: the state encoder requires it). */
  case class Partial(stepIdx: Int, firstTs: Long, ids: Array[Long])

  class CepProcessor(pattern: Pattern)
      extends WatermarkReplayProcessor[CepEvent, CepMatch] {

    @transient private var partials: ValueState[Array[Partial]] = _

    override protected def initState(): Unit =
      partials = getHandle.getValueState[Array[Partial]]("partials",
        Encoders.kryo[Array[Partial]],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override protected def tsOf(e: CepEvent): Long = e.tsMs
    override protected def inputEncoder: org.apache.spark.sql.Encoder[CepEvent] =
      Encoders.product[CepEvent]

    override protected def replay(key: Long, ready: Seq[CepEvent],
        wm: Long): Iterator[CepMatch] = {

      var open = Option(partials.get()).getOrElse(Array.empty[Partial]).toList
      val out = List.newBuilder[CepMatch]
      ready.sortBy(e => (e.tsMs, e.id)).foreach { e =>
        // expire partials whose within-window closed before this event
        open = open.filter(p => e.tsMs - p.firstTs <= pattern.withinMs)
        var next: List[Partial] = Nil
        var matched = false
        open.foreach { p =>
          val step = pattern.steps(p.stepIdx)
          if (matched && pattern.skipPastLast) {
            // greedy mode: the first full match on this event wins;
            // remaining partials are discarded with the reset below
          } else if (step.where(e)) {
            val adv = Partial(p.stepIdx + 1, p.firstTs, p.ids :+ e.id)
            if (adv.stepIdx == pattern.steps.length) {
              out += CepMatch(key, adv.ids, adv.firstTs, e.tsMs)
              matched = true
            } else next ::= adv
            // relaxed contiguity branches: the original partial may
            // still match a later event (NO_SKIP all-combinations)
            if (!step.strict && !pattern.skipPastLast) next ::= p
          } else if (!step.strict) next ::= p
          // strict step not matched by the immediate next event → dies
        }
        if (pattern.steps.head.where(e) && pattern.steps.length > 1)
          next ::= Partial(1, e.tsMs, Array(e.id))
        else if (pattern.steps.head.where(e) && pattern.steps.length == 1) {
          out += CepMatch(key, Array(e.id), e.tsMs, e.tsMs)
          matched = true
        }
        open = if (matched && pattern.skipPastLast) Nil else next.reverse
      }
      partials.update(open.toArray)
      out.result().iterator
    }
  }

  /** Applies the pattern over a keyed event-time stream; `events` must
    * carry a watermark on the column `tsMs` was derived from.
    */
  def apply(events: Dataset[CepEvent], pattern: Pattern): Dataset[CepMatch] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(
        new CepProcessor(pattern), TimeMode.EventTime(), OutputMode.Append())
  }
}
