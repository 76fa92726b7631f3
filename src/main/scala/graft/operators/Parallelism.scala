package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scale-adaptive parallelism repair for CPU-heavy per-document passes
  * (shingling, window fingerprints, per-char hashing, payload framing).
  *
  * The problem (optimization guide §2.5 "input skew" / §1.2 "the
  * distributed algorithm"): these passes amplify each input row by
  * 100–10,000× (explode per shingle/window/frame) and hash every
  * produced row, so their cost is proportional to OUTPUT rows — but
  * Spark sizes the scan stage by INPUT bytes. A small-file corpus (or a
  * filtered delta of one) arrives as a handful of scan partitions and
  * the whole corpus' hashing runs on one or two cores while the rest of
  * the cluster idles. At production scale the scan is already wide and
  * this is a no-op.
  *
  * The fix: hash-repartition the NARROW pre-explode rows (ids + text,
  * the cheapest the data ever is) up to the session's default
  * parallelism — deterministic key (never round-robin on computed rows:
  * retried tasks must reproduce the same assignment, SPARK-38388), and
  * only when the input is under-partitioned, so a well-partitioned
  * production scan never pays the extra exchange.
  */
object Parallelism {

  /** `df` hash-repartitioned on `byCol` up to `defaultParallelism`
    * partitions iff it currently has fewer; unchanged otherwise (and
    * unchanged for streaming frames, whose partitioning is the
    * micro-batch planner's). Purely physical — row content, and hence
    * every downstream result, is identical.
    */
  def fanOut(df: DataFrame, byCol: String): DataFrame = {
    if (df.isStreaming) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      val current =
        try df.rdd.getNumPartitions
        catch { case _: org.apache.spark.sql.AnalysisException => target }
      // size guard: an under-partitioned input is only worth an
      // exchange when its partitions carry real work (a streaming
      // member's few-hundred-row staged micro-batch fanned out to 32
      // partitions pays the exchange and 32 tiny tasks for nothing).
      // The callers amplify 10-1000x (explode per char/shingle/frame),
      // so the floor is low: 128 KB of COMPRESSED projected input per
      // partition ≈ ~0.5M chars ≈ seconds of single-core hashing — the
      // boundary where an exchange starts paying for itself (Catalyst
      // scales scan estimates by the projected-column ratio, so this is
      // deliberately below the raw file floor). Catalyst's sizeInBytes
      // is exact-ish for scans/checkpoints and huge for object
      // barriers — unknown counts as big, preserving the fan-out.
      val bytesPerPartition =
        try df.queryExecution.optimizedPlan.stats.sizeInBytes /
          math.max(current, 1)
        catch { case scala.util.control.NonFatal(_) => BigInt(Long.MaxValue) }
      if (current >= target || bytesPerPartition < (128L << 10)) df
      else df.repartition(target, col(byCol))
    }
  }

  /** `df` under an explicit broadcast hint iff its row count is at most
    * `spark.graft.probe.broadcastMaxKeys` (default 2e6 ≈ tens of MB
    * hashed); unchanged otherwise. For the incremental-probe semi
    * prunes (guide §3.1): the delta key set is MATERIALIZED
    * (localCheckpoint) but checkpointed frames carry no reliable size
    * estimate, so the static planner can pick a sort-merge semi join
    * that map-writes the corpus-sized probe side to shuffle disk
    * before AQE converts it. Counting the checkpointed frame is one
    * cheap job; an explicit hint below the bound keeps the probe
    * shuffle-free BY CONSTRUCTION, and above the bound (a delta so
    * large broadcasting would strain executors — the 100 TB posture)
    * the planner keeps its choice.
    */
  def boundedBroadcast(df: DataFrame): DataFrame = {
    val maxKeys = df.sparkSession.conf
      .get("spark.graft.probe.broadcastMaxKeys", "2000000").toLong
    if (df.count() <= maxKeys) org.apache.spark.sql.functions.broadcast(df)
    else df
  }
}
