package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, ValueState}

/** Keyed stream-stream INNER join over CHANGELOG inputs with per-record
  * retraction (reference: `RT/join/stream/StreamingJoinOperator` with
  * update inputs + flink-core `RowKind`, SURVEY.md §2.4 / §7.3.1 — the
  * per-record retraction gap declared in r2, now closed using the
  * row_kind convention RefiringWindow established).
  *
  * Each input row is a changelog entry for a record identity `id` on
  * one side: `I` insert, `U` update (new value), `D` delete. Sides are
  * symmetric. Applying an entry emits the reference's changelog pairs
  * against the other side's CURRENT state:
  *
  *  - `I`  → `+I` pair per other-side record,
  *  - `U`  → `-U` with the record's previous value, then `+U` with the
  *    new one, per other-side record (UPDATE_BEFORE / UPDATE_AFTER),
  *  - `D`  → `-D` with the record's last value per other-side record.
  *
  * Determinism over out-of-order input: watermark-ordered replay in
  * (ts, side, id) order — the pair stream equals the one a perfectly
  * in-order arrival would produce, which is what the analytic oracle
  * computes with inequality joins. State per key: one id → value map
  * per side (the reference's JoinRecordStateView with update input
  * requires exactly this keyed-by-record shape; O(live records), and
  * deletes shrink it). Keys are hash-partitioned by groupByKey.
  */
object RetractingJoin {

  /** side: 0 = left, 1 = right; kind: 'I' | 'U' | 'D' (value ignored
    * for D).
    */
  case class RjEvent(key: Long, side: Int, kind: String, tsMs: Long,
      id: Long, value: Double)

  /** One changelog pair: rowKind ∈ +I, -U, +U, -D. */
  case class RjChange(key: Long, rowKind: String, leftId: Long,
      rightId: Long, leftValue: Double, rightValue: Double)

  class RetractingJoinProcessor
      extends WatermarkReplayProcessor[RjEvent, RjChange] {

    @transient private var leftState: ValueState[Map[Long, Double]] = _
    @transient private var rightState: ValueState[Map[Long, Double]] = _

    override protected def initState(): Unit = {
      val none = org.apache.spark.sql.streaming.TTLConfig.NONE
      leftState = getHandle.getValueState[Map[Long, Double]]("left",
        Encoders.kryo[Map[Long, Double]], none)
      rightState = getHandle.getValueState[Map[Long, Double]]("right",
        Encoders.kryo[Map[Long, Double]], none)
    }

    override protected def tsOf(e: RjEvent): Long = e.tsMs
    override protected def inputEncoder: org.apache.spark.sql.Encoder[RjEvent] =
      Encoders.product[RjEvent]

    override protected def replay(key: Long, ready: Seq[RjEvent],
        wm: Long): Iterator[RjChange] = {

      var left = Option(leftState.get()).getOrElse(Map.empty[Long, Double])
      var right = Option(rightState.get()).getOrElse(Map.empty[Long, Double])
      val out = Seq.newBuilder[RjChange]

      def pair(kind: String, e: RjEvent, v: Double,
          otherId: Long, otherV: Double): RjChange =
        if (e.side == 0) RjChange(key, kind, e.id, otherId, v, otherV)
        else RjChange(key, kind, otherId, e.id, otherV, v)

      ready.sortBy(e => (e.tsMs, e.side, e.id)).foreach { e =>
        val other = if (e.side == 0) right else left
        e.kind match {
          case "I" =>
            other.foreach { case (oid, ov) => out += pair("+I", e, e.value, oid, ov) }
            if (e.side == 0) left += e.id -> e.value
            else right += e.id -> e.value
          case "U" =>
            val own = if (e.side == 0) left else right
            own.get(e.id).foreach { old =>
              other.foreach { case (oid, ov) => out += pair("-U", e, old, oid, ov) }
            }
            other.foreach { case (oid, ov) => out += pair("+U", e, e.value, oid, ov) }
            if (e.side == 0) left += e.id -> e.value
            else right += e.id -> e.value
          case "D" =>
            val own = if (e.side == 0) left else right
            own.get(e.id).foreach { old =>
              other.foreach { case (oid, ov) => out += pair("-D", e, old, oid, ov) }
            }
            if (e.side == 0) left -= e.id else right -= e.id
          case k => throw new IllegalArgumentException(s"bad kind $k")
        }
      }
      leftState.update(left)
      rightState.update(right)
      out.result().iterator
    }
  }

  def apply(events: Dataset[RjEvent]): Dataset[RjChange] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new RetractingJoinProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
