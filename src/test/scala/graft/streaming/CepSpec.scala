package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import graft.streaming.Cep.{CepEvent, Pattern, Step}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class CepSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ev(key: Long, sec: Int, tag: String, id: Long): CepEvent = {
    val ts = Timestamp.valueOf(f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")
    CepEvent(key, ts.getTime, tag, id, ts)
  }

  /** Runs the pattern over the events plus a late watermark-advancing
    * flush event on an unused key.
    */
  private def run(pattern: Pattern, events: Seq[CepEvent]): Seq[Seq[Long]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StreamRunner.requireRocksDb(spark)
    val in = MemoryStream[CepEvent]
    val stream = in.toDS().withWatermark("ts", "0 seconds")
    val name = s"cep_spec_${System.nanoTime()}"
    val q = Cep(stream, pattern).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData(ev(999L, 3599, "flush", 0L))
      q.processAllAvailable()
      spark.table(name).orderBy("startTsMs").collect()
        .map(_.getAs[scala.collection.Seq[Long]]("ids").toSeq).toSeq
    } finally q.stop()
  }

  private def steps(strictSecond: Boolean = false) = Seq(
    Step("a", _.tag == "A"),
    Step("b", _.tag == "B", strict = strictSecond))

  test("NO_SKIP emits every combination") {
    val out = run(Pattern(steps(), withinMs = 600000, skipPastLast = false),
      Seq(ev(1, 0, "A", 1), ev(1, 10, "A", 2), ev(1, 20, "B", 3),
        ev(1, 30, "B", 4)))
    assert(out.toSet == Set(Seq(1L, 3L), Seq(2L, 3L), Seq(1L, 4L), Seq(2L, 4L)))
  }

  test("SKIP_PAST_LAST clears partials after a match") {
    val out = run(Pattern(steps(), withinMs = 600000, skipPastLast = true),
      Seq(ev(1, 0, "A", 1), ev(1, 10, "A", 2), ev(1, 20, "B", 3),
        ev(1, 30, "B", 4)))
    // first B completes with the oldest open A; everything else resets
    assert(out == Seq(Seq(1L, 3L)))
  }

  test("strict next() dies on an intervening event") {
    val p = Pattern(steps(strictSecond = true), 600000, skipPastLast = false)
    assert(run(p, Seq(ev(1, 0, "A", 1), ev(1, 10, "C", 2), ev(1, 20, "B", 3)))
      .isEmpty)
    assert(run(p, Seq(ev(1, 0, "A", 1), ev(1, 10, "B", 2)))
      == Seq(Seq(1L, 2L)))
  }

  test("within bound expires old partials") {
    val p = Pattern(steps(), withinMs = 5000, skipPastLast = false)
    assert(run(p, Seq(ev(1, 0, "A", 1), ev(1, 60, "B", 2))).isEmpty)
  }

  test("out-of-order events replay in event-time order") {
    // B arrives first in arrival order but after A in event time
    val p = Pattern(steps(), withinMs = 600000, skipPastLast = false)
    assert(run(p, Seq(ev(1, 20, "B", 2), ev(1, 0, "A", 1)))
      == Seq(Seq(1L, 2L)))
  }

  test("keys are independent") {
    val p = Pattern(steps(), withinMs = 600000, skipPastLast = false)
    assert(run(p, Seq(ev(1, 0, "A", 1), ev(2, 10, "B", 2))).isEmpty)
  }

  test("oneOrMore greedily consumes every loop occurrence") {
    // A B+ C (relaxed): all Bs between A and the first C are absorbed
    val p = Pattern(Seq(
      Step("a", _.tag == "A"),
      Step("b", _.tag == "B").oneOrMore,
      Step("c", _.tag == "C")), withinMs = 600000, skipPastLast = true)
    val out = run(p, Seq(ev(1, 0, "A", 1), ev(1, 10, "B", 2),
      ev(1, 15, "X", 9), ev(1, 20, "B", 3), ev(1, 30, "C", 4)))
    assert(out == Seq(Seq(1L, 2L, 3L, 4L)))
  }

  test("oneOrMore requires at least one occurrence") {
    val p = Pattern(Seq(
      Step("a", _.tag == "A"),
      Step("b", _.tag == "B").oneOrMore,
      Step("c", _.tag == "C")), withinMs = 600000, skipPastLast = true)
    assert(run(p, Seq(ev(1, 0, "A", 1), ev(1, 10, "C", 2))).isEmpty)
  }

  test("times(n) completes exactly at the nth occurrence") {
    val p = Pattern(Seq(
      Step("a", _.tag == "A"),
      Step("b", _.tag == "B").times(2)), withinMs = 600000,
      skipPastLast = true)
    val out = run(p, Seq(ev(1, 0, "A", 1), ev(1, 10, "B", 2),
      ev(1, 20, "B", 3), ev(1, 30, "B", 4)))
    // completes at the 2nd B; the 3rd B starts nothing (no open A)
    assert(out == Seq(Seq(1L, 2L, 3L)))
  }

  test("strict trailing loop emits its maximal match on break") {
    // A B+ with strict (consecutive) B-loop: the breaking row ends the
    // match and is free to start a new one
    val p = Pattern(Seq(
      Step("a", _.tag == "A"),
      Step("b", _.tag == "B", strict = true).oneOrMore),
      withinMs = 600000, skipPastLast = true)
    val out = run(p, Seq(ev(1, 0, "A", 1), ev(1, 10, "B", 2),
      ev(1, 20, "B", 3), ev(1, 30, "A", 4), ev(1, 40, "B", 5)))
    // first match breaks at the second A; that A starts the next one,
    // which flushes at the watermark sweep (window closed)
    assert(out == Seq(Seq(1L, 2L, 3L), Seq(4L, 5L)))
  }

  test("relaxed trailing loop flushes maximal match when window closes") {
    val p = Pattern(Seq(
      Step("a", _.tag == "A"),
      Step("b", _.tag == "B").oneOrMore),
      withinMs = 60000, skipPastLast = true)
    val out = run(p, Seq(ev(1, 0, "A", 1), ev(1, 10, "B", 2),
      ev(1, 20, "B", 3)))
    // the flush event advances the watermark an hour past the window
    assert(out == Seq(Seq(1L, 2L, 3L)))
  }

  test("flush clearing compares row position, not timestamp alone") {
    // partial2 starts at the SAME millisecond as partial1's last matched
    // row but a later id — it is past the skip point and must survive
    // partial1's window-close flush
    // within = 15s: partial1 (A@0 B@10) expires when B@20 arrives and
    // flush-emits ending at row (10s, id 2); partial2 started at
    // (10s, id 3) must survive the clear and match B@20
    val p = Pattern(Seq(
      Step("a", _.tag == "A"),
      Step("b", _.tag == "B").oneOrMore),
      withinMs = 15000, skipPastLast = true)
    val out = run(p, Seq(ev(1, 0, "A", 1), ev(1, 10, "B", 2),
      ev(1, 10, "A", 3), ev(1, 20, "B", 4)))
    assert(out == Seq(Seq(1L, 2L), Seq(3L, 4L)))
  }

  test("notFollowedBy kills the partial; the positive edge wins a tie") {
    val p = Pattern(Seq(
      Step("a", _.tag == "A"),
      Step("b", _.tag == "B", notBefore = _.tag == "X")),
      withinMs = 600000, skipPastLast = false)
    // X between A and B kills the partial
    assert(run(p, Seq(ev(1, 0, "A", 1), ev(1, 10, "X", 2), ev(1, 20, "B", 3)))
      .isEmpty)
    // without the ban event, matches flow
    assert(run(p, Seq(ev(1, 0, "A", 1), ev(1, 10, "B", 2)))
      == Seq(Seq(1L, 2L)))
    // an event matching BOTH the ban and the step advances (edge priority)
    val both = Pattern(Seq(
      Step("a", _.tag == "A"),
      Step("b", e => e.tag == "B" || e.tag == "X",
        notBefore = _.tag == "X")),
      withinMs = 600000, skipPastLast = false)
    assert(run(both, Seq(ev(1, 0, "A", 1), ev(1, 10, "X", 2)))
      == Seq(Seq(1L, 2L)))
  }

  test("ctxWhere sees previously matched rows") {
    // B must carry a larger num than the A it follows
    def evn(key: Long, sec: Int, tag: String, id: Long, num: Double) = {
      val base = ev(key, sec, tag, id); base.copy(num = num)
    }
    val p = Pattern(Seq(
      Step("a", _.tag == "A"),
      Step("b", _.tag == "B",
        ctxWhere = (e, m) => m.last("a").exists(a => e.num > a.num))),
      withinMs = 600000, skipPastLast = false)
    val out = run(p, Seq(evn(1, 0, "A", 1, 10.0), evn(1, 10, "B", 2, 5.0),
      evn(1, 20, "B", 3, 15.0)))
    assert(out == Seq(Seq(1L, 3L)))
  }
}
