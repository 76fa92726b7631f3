package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming DAY-2 ingest into the written dedup-index family: each
  * micro-batch of newly-arrived documents appends ONE GENERATION of
  * fingerprints to a written exact-dedup index
  * ([[graft.operators.Dedup.exactAppendIndex]]) — the q160 append
  * contract mapped onto Structured Streaming's unit of progress, so
  * the standing curation pipeline's ingest loop is an actual streaming
  * sink, not a scheduled batch job. `foreachBatch` is the idiomatic
  * shape (the [[UpsertSink]]/[[FanOut]] precedent): the batch frame is
  * a normal DataFrame, so the append is the SAME code the batch path
  * runs, and the probe serving afterwards is unchanged.
  *
  * Delivery contract: within a batch the append is one parquet write
  * (file-granularity atomic); across sink retries the caller owns
  * exactly-once — a replayed batch lands bit-identical duplicate
  * fingerprint rows, which is EXACTLY the damage
  * [[graft.operators.Dedup.exactAuditIndex]] localizes. With a
  * transactional table format on the classpath the same body would
  * gain sink-side exactly-once via (batchId, epoch) dedup.
  */
object IndexIngest {

  /** Starts the ingest and returns the query — callers drive the
    * micro-batches (specs force multi-batch delivery this way).
    */
  def start(docsStream: DataFrame, path: String,
      idCol: String, textCol: String): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Dedup.exactAppendIndex(batch, path, idCol, textCol)
      }
      .outputMode("append")
      .start()

  /** Runs the ingest over all currently-available input, then stops —
    * the bounded-backfill form the q171 gate drives.
    */
  def ingestExactFingerprints(docsStream: DataFrame, path: String,
      idCol: String, textCol: String): Unit = {
    val q = start(docsStream, path, idCol, textCol)
    try q.processAllAvailable()
    finally q.stop()
  }
}
