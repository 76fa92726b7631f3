package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog → table materialization (SURVEY.md §7 step 7, the Spark
  * stand-in for the reference's upsert/retract sinks): a `foreachBatch`
  * sink appends changelog rows (`row_kind` ∈ +I/-U/+U/-D, as produced
  * by [[graft.operators.CdcFormats]] or update-mode aggregations) to a
  * partitioned parquet LOG, stamped with (batch_id, seq); a compaction
  * view reconstructs the current table state as keep-last-per-key.
  *
  * This is the transaction-log pattern (append-only log + snapshot
  * read) rather than in-place MERGE — the scalable shape when no
  * transactional table format is on the classpath; with Delta/Iceberg
  * the same foreachBatch body becomes a MERGE INTO. Per-batch appends
  * are atomic at file granularity and the snapshot is deterministic:
  * the latest state-changing row (+I/+U/-D) per key wins, ordered by
  * (orderCol, batch); `-U` retraction markers are informational and
  * skipped during compaction.
  */
object UpsertSink {

  /** Runs the changelog stream to completion, appending each micro-batch
    * to the log at `path`.
    */
  def materialize(changelog: DataFrame, path: String): Unit = {
    val q = changelog.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // __seq disambiguates same-key rows that tie on the order column
        // WITHIN a batch (e.g. +U then -D at one timestamp): partition-
        // local arrival order, so the keep-last winner is deterministic
        batch.withColumn("__batch", lit(batchId))
          .withColumn("__seq", monotonically_increasing_id())
          .write.mode("append").parquet(path)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Current table state from the log: latest +I/+U per key, unless a
    * later -D tombstone removed it.
    */
  def snapshot(
      spark: SparkSession, path: String,
      keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).desc, col("__batch").desc, col("__seq").desc)
    spark.read.parquet(path)
      .filter(col("row_kind") =!= "-U")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("row_kind") =!= "-D")
      .drop("__rn", "__batch", "__seq")
  }
}
