package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Multi-sink streaming fan-out (reference: TableEnvironment
  * StatementSet, new in 1.11, + the planner's multi-sink DAG
  * common-subgraph reuse — RelNodeBlock / SubplanReuser, SURVEY.md
  * §4 optimizer table): one pipeline feeds several sinks with the
  * shared prefix computed ONCE per micro-batch.
  *
  * Spark's foreachBatch is the idiomatic mapping: the batch DataFrame
  * is persisted, every sink writes from the cached result, and the
  * cache drops before the next batch. Without the persist each sink
  * would re-evaluate the whole prefix — the exact waste StatementSet's
  * subplan reuse removes; FanOutSpec proves single evaluation with an
  * accumulator on the shared prefix.
  */
object FanOut {

  /** Starts `stream` writing to every sink in `outputs`; the batch is
    * cached across them. Caller owns the returned query's lifecycle.
    */
  def start(stream: DataFrame, checkpointDir: String,
      outputs: Seq[(DataFrame, Long) => Unit]): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try outputs.foreach(f => f(batch, batchId))
        finally { batch.unpersist(); () }
      }
      .start()
}
