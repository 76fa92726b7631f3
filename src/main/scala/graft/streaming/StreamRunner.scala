package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Drives Structured Streaming pipelines over the driver-provided
  * bounded parquet fixtures, end-to-end: source → transforms → memory
  * sink, `processAllAvailable()`, return the sink table.
  *
  * This is how the streaming operator surface (reference:
  * flink-streaming-java DataStream + Blink StreamExec* nodes, SURVEY.md
  * §2.10) is made oracle-checkable: the streaming query runs for real —
  * micro-batches, watermarks, state store, no-data batches that advance
  * the watermark and flush windows/timers — and the final sink contents
  * are compared against a batch DuckDB twin that applies the same
  * watermark cutoff analytically.
  *
  * At 100 TB the same pipelines point at `readStream` directories /
  * Kafka and a durable sink; nothing here collects to the driver — the
  * memory sink only holds query RESULTS (window aggregates, top-ns),
  * never raw input.
  */
object StreamRunner {

  private val nameCounter = new AtomicInteger

  /** Any fixture table as a real file-source stream (the file stream
    * source only accepts directories: stream the fixture dir and select
    * the single file via pathGlobFilter).
    */
  def tableStream(spark: SparkSession, dir: String, table: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/$table.parquet"
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", s"$table.parquet").parquet(dir)
  }

  /** The `events` fixture as a stream with the same ns→µs event-time
    * normalization as the batch loader ([[graft.Tables.load]]).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.requireUtcSession(spark)
    val raw = tableStream(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // timestamp[ns] fixture read under nanosAsLong
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // r9 fixture shape: naive timestamp[us]. Watermarks reject NTZ;
        // sessions run UTC so the cast relabels the identical instant.
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Runs `stream` into a fresh memory sink until all available input is
    * processed (including trailing no-data micro-batches that advance
    * the watermark), then returns the accumulated sink contents.
    *
    * The result is eagerly materialized (localCheckpoint) and the
    * memory-sink temp view dropped before returning: a long-lived
    * session running many streaming queries (Verify, Bench) would
    * otherwise accumulate every sink table in driver memory for its
    * whole lifetime. Results are small (aggregates / top-ns), never raw
    * input, so the checkpoint is cheap.
    */
  def runToTable(stream: DataFrame, outputMode: String): DataFrame =
    runToTableImpl(stream, outputMode, maxDataBatches = None)

  /** [[runToTable]] + a loud pin on single-batch delivery: fails if the
    * file source split the fixture across more than one data-carrying
    * micro-batch. For queries whose ORACLE is only equivalent to the
    * engine under one-batch arrival (q121: rows below an
    * earlier-than-final punctuation would strand under the long
    * watermark delay if a marker fired in an earlier batch while the
    * batch oracle still counts them), a future fixture/source change
    * must surface HERE as an assertion, not as an oracle mismatch.
    */
  def runToTableSingleBatch(stream: DataFrame, outputMode: String): DataFrame =
    runToTableImpl(stream, outputMode, maxDataBatches = Some(1))

  private def runToTableImpl(stream: DataFrame, outputMode: String,
      maxDataBatches: Option[Int]): DataFrame = {
    val spark = stream.sparkSession
    val name = s"graft_stream_${nameCounter.incrementAndGet()}"
    val query = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    try query.processAllAvailable()
    finally query.stop()
    maxDataBatches.foreach { max =>
      val progress = query.recentProgress
      // recentProgress is a RING BUFFER capped by
      // spark.sql.streaming.numRecentProgressUpdates (default 100): a
      // run emitting more updates than the cap silently drops the
      // EARLIEST entries, and a count over the survivors could pass the
      // pin vacuously. Refuse to adjudicate a saturated buffer instead
      // of trusting it.
      val cap = spark.conf
        .get("spark.sql.streaming.numRecentProgressUpdates", "100").toInt
      require(progress.length < cap,
        s"recentProgress holds ${progress.length} entries with ring-buffer " +
          s"cap $cap — early progress may have been dropped, so the " +
          "single-batch pin cannot be trusted; raise " +
          "spark.sql.streaming.numRecentProgressUpdates for this query")
      val dataBatches = progress.count(_.numInputRows > 0)
      require(dataBatches <= max,
        s"source delivered data in $dataBatches micro-batches; this " +
          s"query's oracle is only engine-equivalent up to $max (fixture " +
          "or source-trigger configuration changed?)")
    }
    val out = stream.sparkSession.table(name).localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }

  /** Enables the RocksDB state store provider required by
    * `transformWithState` (SURVEY.md §2.10 state row — the analog of the
    * reference's RocksDB keyed-state backend).
    */
  def requireRocksDb(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** Heap-backed state store for native streaming operators with
    * modest per-key state (windowed aggs, bounded joins, dedup) — the
    * same backend split the reference ships: heap/Fs backend by
    * default, RocksDB where state outgrows memory. Native instances
    * cost real startup time per (operator × partition); paying it for
    * a few counters per window is waste at any scale. Each streaming
    * query sets its provider explicitly because the session conf
    * persists across queries in a long-lived session.
    */
  def useHeapState(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")

  /** Watermark-idleness analog (reference: `flink-core/…/eventtime/
    * WatermarksWithIdleness.java`, SURVEY.md §2.10 idleness row). Two
    * distinct stall shapes exist, and only one needs a knob here:
    *
    *  - An idle KEY cannot strand its buffered rows in the replay
    *    operators: buffering is keyed but the flush clock is the
    *    GLOBAL watermark, which other keys' traffic keeps advancing
    *    (proved by IdlenessSpec). Flink needs idleness marks for this
    *    because its watermark is the MIN over per-partition watermarks.
    *  - An idle SOURCE/branch in a multi-watermark query (union of
    *    independently watermarked streams) holds the combined
    *    watermark back under Spark's default `min` policy — exactly
    *    the stall WatermarksWithIdleness addresses. This knob opts the
    *    session into the `max` policy: the active branch drives the
    *    clock and the idle one no longer wedges the pipeline, at the
    *    same risk Flink's idleness marks carry (rows a late-waking
    *    branch sends below the advanced watermark count as late).
    */
  def allowIdleSources(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "max")
}
