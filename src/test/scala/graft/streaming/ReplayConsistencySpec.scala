package graft.streaming

import graft.SparkTestSession
import graft.streaming.TemporalSort.SortEvent
import graft.streaming.RetractableAgg.{RaEvent, RaRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Batching must not change results: the watermark-replay operators
  * promise the same output whether events arrive in one micro-batch,
  * split across several, or shuffled within a batch (out-of-orderness
  * the watermark still covers). Multi-batch is where replay bugs hide —
  * state hand-off between fires, pending-row re-buffering, timer
  * re-arming — and the single-batch Verify path cannot catch them.
  */
class ReplayConsistencySpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(sec: Int) = java.sql.Timestamp.valueOf(
    f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")

  private def runSort(batches: Seq[Seq[SortEvent]]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StreamRunner.requireRocksDb(spark)
    val in = MemoryStream[SortEvent]
    val name = s"rc_sort_${System.nanoTime()}"
    val q = TemporalSort(
        in.toDS().withWatermark("ts", "30 seconds").as[SortEvent]).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData(SortEvent(999L, ts(3599).getTime, 0L, ts(3599)))
      q.processAllAvailable()
      spark.table(name).filter($"key" =!= 999L)
        .select($"key", $"id", $"seq").as[(Long, Long, Long)]
        .collect().toSeq.sorted
    } finally q.stop()
  }

  private def runAgg(batches: Seq[Seq[RaEvent]]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StreamRunner.requireRocksDb(spark)
    val in = MemoryStream[RaEvent]
    val name = s"rc_agg_${System.nanoTime()}"
    val stream = in.toDS()
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis($"tsMs"))
      .withWatermark("ts", "30 seconds")
      .drop("ts").as[RaEvent]
    val q = RetractableAgg(stream).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData(RaEvent(999L, "+I", ts(3599).getTime, 0L, 0.0))
      q.processAllAvailable()
      // final state per key is the sequence-max row
      spark.table(name).filter($"key" =!= 999L).as[RaRow].collect().toSeq
        .groupBy(_.key).map { case (k, rows) =>
          val last = rows.maxBy(_.seq)
          (k, last.cnt, last.sumCents)
        }.toSeq.sorted
    } finally q.stop()
  }

  private val sortEvents = (1 to 20).map { i =>
    SortEvent(i % 3, ts(i * 10).getTime, i.toLong, ts(i * 10))
  }

  test("temporal sort: one batch == three batches == shuffled batches") {
    val one = runSort(Seq(sortEvents))
    val three = runSort(sortEvents.grouped(7).toSeq)
    // shuffle within each batch: still within the 30s watermark delay
    val shuffled = runSort(sortEvents.grouped(7).map(_.reverse).toSeq)
    assert(one.nonEmpty && one == three && one == shuffled)
  }

  private val aggEvents = (1 to 20).flatMap { i =>
    val base = RaEvent(i % 3, "+I", ts(i * 10).getTime, i.toLong, i * 1.0)
    if (i % 4 == 0)
      Seq(base, RaEvent(i % 3, "-U", ts(i * 10 + 5).getTime, i.toLong, i * 1.0),
        RaEvent(i % 3, "+U", ts(i * 10 + 5).getTime, i.toLong, i + 100.0))
    else Seq(base)
  }

  test("retractable agg: one batch == three batches == shuffled batches") {
    val one = runAgg(Seq(aggEvents))
    val three = runAgg(aggEvents.grouped(9).toSeq)
    val shuffled = runAgg(aggEvents.grouped(9).map(_.reverse).toSeq)
    assert(one.nonEmpty && one == three && one == shuffled)
  }

  private def runEvict(batches: Seq[Seq[EvictingWindow.EwEvent]])
      : Seq[(Long, Long, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StreamRunner.requireRocksDb(spark)
    val in = MemoryStream[EvictingWindow.EwEvent]
    val name = s"rc_ew_${System.nanoTime()}"
    val stream = in.toDS()
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis($"tsMs"))
      .withWatermark("ts", "30 seconds")
      .drop("ts").as[EvictingWindow.EwEvent]
    val q = EvictingWindow(stream, 60000L,
        EvictingWindow.Evictor.CountEvictor(3)).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData(EvictingWindow.EwEvent(999L, ts(3599).getTime, 0L, 0.0))
      q.processAllAvailable()
      spark.table(name).filter($"key" =!= 999L)
        .select($"key", $"winStart", $"cnt", $"sum")
        .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    } finally q.stop()
  }

  private val ewEvents = (1 to 24).map { i =>
    EvictingWindow.EwEvent(i % 2, ts(i * 10).getTime, i.toLong, i * 1.0)
  }

  test("evicting window: one batch == three batches == shuffled batches") {
    val one = runEvict(Seq(ewEvents))
    val three = runEvict(ewEvents.grouped(8).toSeq)
    val shuffled = runEvict(ewEvents.grouped(8).map(_.reverse).toSeq)
    assert(one.nonEmpty && one == three && one == shuffled)
  }

  private def runCep(batches: Seq[Seq[Cep.CepEvent]]): Seq[Seq[Long]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StreamRunner.requireRocksDb(spark)
    val in = MemoryStream[Cep.CepEvent]
    val name = s"rc_cep_${System.nanoTime()}"
    val pat = Cep.Pattern(Seq(
      Cep.Step("a", _.tag == "A"),
      Cep.Step("b", _.tag == "B").oneOrMore,
      Cep.Step("c", _.tag == "C")), withinMs = 600000, skipPastLast = true)
    val q = Cep(in.toDS().withWatermark("ts", "30 seconds").as[Cep.CepEvent],
        pat).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData(Cep.CepEvent(999L, ts(3599).getTime, "flush", 0L, ts(3599)))
      q.processAllAvailable()
      spark.table(name).filter($"key" =!= 999L).orderBy($"startTsMs")
        .collect().map(_.getAs[scala.collection.Seq[Long]]("ids").toSeq)
        .toSeq
    } finally q.stop()
  }

  private val cepEvents = (1 to 24).map { i =>
    val tag = i % 6 match {
      case 1 => "A"; case 2 | 3 | 4 => "B"; case 5 => "C"; case _ => "X"
    }
    Cep.CepEvent(i % 2, ts(i * 10).getTime, tag, i.toLong, ts(i * 10))
  }

  test("cep quantifiers: one batch == three batches == shuffled batches") {
    val one = runCep(Seq(cepEvents))
    val three = runCep(cepEvents.grouped(8).toSeq)
    val shuffled = runCep(cepEvents.grouped(8).map(_.reverse).toSeq)
    assert(one.nonEmpty && one == three && one == shuffled)
  }

  // SKIP TO LAST pruning is applied inside one replay sweep (the
  // prune position is sweep-transient); splitting the stream so a
  // match emits in an earlier batch than the partials it must prune
  // exercises the persisted-state hand-off
  private def runCepSkipTo(batches: Seq[Seq[Cep.CepEvent]]): Seq[Seq[Long]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StreamRunner.requireRocksDb(spark)
    val in = MemoryStream[Cep.CepEvent]
    val name = s"rc_cepst_${System.nanoTime()}"
    val pat = Cep.Pattern(Seq(
      Cep.Step("s", _ => true, strict = true),
      Cep.Step("down", _ => true, strict = true, minTimes = 1,
        maxTimes = Int.MaxValue,
        ctxWhere = (e, m) => m.prev.exists(e.num < _.num)),
      Cep.Step("up", _ => true, strict = true, minTimes = 1,
        maxTimes = Int.MaxValue,
        ctxWhere = (e, m) => m.prev.exists(e.num > _.num))),
      withinMs = 600000, skipPastLast = false, skipToVar = "down",
      skipToFirst = false)
    val q = Cep(in.toDS().withWatermark("ts", "30 seconds").as[Cep.CepEvent],
        pat).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData(Cep.CepEvent(999L, ts(3599).getTime, "flush", 0L, ts(3599)))
      q.processAllAvailable()
      spark.table(name).filter($"key" =!= 999L).orderBy($"startTsMs")
        .collect().map(_.getAs[scala.collection.Seq[Long]]("ids").toSeq)
        .toSeq
    } finally q.stop()
  }

  private val zigzagEvents = (1 to 24).map { i =>
    Cep.CepEvent(i % 2, ts(i * 10).getTime, "V", i.toLong, ts(i * 10),
      num = ((i * 7) % 13).toDouble)
  }

  test("cep skip-to-last: one batch == three batches == shuffled batches") {
    val one = runCepSkipTo(Seq(zigzagEvents))
    val three = runCepSkipTo(zigzagEvents.grouped(8).toSeq)
    val shuffled = runCepSkipTo(zigzagEvents.grouped(8).map(_.reverse).toSeq)
    assert(one.nonEmpty && one == three && one == shuffled)
  }

  // the gapped flag is persisted Partial state: splitting the stream so
  // the gap-creating row lands in a DIFFERENT micro-batch than the
  // strict-entry attempt exercises the flag's round-trip through the
  // state store (a sweep-transient flag would wrongly re-admit the
  // strict transition after the batch boundary)
  private def runCepOptional(batches: Seq[Seq[Cep.CepEvent]]): Seq[Seq[Long]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StreamRunner.requireRocksDb(spark)
    val in = MemoryStream[Cep.CepEvent]
    val name = s"rc_cep_opt_${System.nanoTime()}"
    val pat = Cep.Pattern(Seq(
      Cep.Step("a", _.tag == "A", strict = true),
      Cep.Step("b", _.tag == "B").optional,
      Cep.Step("c", _.tag == "C", strict = true)),
      withinMs = 600000, skipPastLast = false)
    val q = Cep(in.toDS().withWatermark("ts", "30 seconds").as[Cep.CepEvent],
        pat).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData(Cep.CepEvent(999L, ts(3599).getTime, "flush", 0L, ts(3599)))
      q.processAllAvailable()
      spark.table(name).filter($"key" =!= 999L).orderBy($"startTsMs")
        .collect().map(_.getAs[scala.collection.Seq[Long]]("ids").toSeq)
        .toSeq
    } finally q.stop()
  }

  // gap-flag-sensitive shapes, one scenario per key so the relaxed
  // A→B edge cannot link events across scenarios
  private val optionalEvents = Seq(
    (1L, "A", 1), (1L, "C", 2), (1L, "C", 3), // (A,C@2); C@3 must NOT match
    (2L, "A", 4), (2L, "X", 5), (2L, "C", 6), // none: C gapped, B never seen
    (3L, "A", 7), (3L, "B", 8), (3L, "C", 9), // (A,B,C)
    (4L, "A", 10), (4L, "C", 11)              // (A,C@11)
  ).map { case (k, tag, i) =>
    Cep.CepEvent(k, ts(i * 10).getTime, tag, i.toLong, ts(i * 10))
  }

  test("cep optional + gap flag: one batch == per-event batches == split at gap") {
    val one = runCepOptional(Seq(optionalEvents))
    val each = runCepOptional(optionalEvents.map(Seq(_)))
    // split exactly between the gap-creating row (C@2) and the retry (C@3)
    val split = runCepOptional(Seq(optionalEvents.take(2), optionalEvents.drop(2)))
    assert(one == Seq(Seq(1L, 2L), Seq(7L, 8L, 9L), Seq(10L, 11L)), s"got $one")
    assert(each == one && split == one)
  }
}
