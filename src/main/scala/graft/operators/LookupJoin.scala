package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Lookup (dimension) join: per-row point lookups against an external
  * key-value store with a per-partition LRU cache — the Spark analog of
  * the reference's `JOIN LATERAL ... FOR SYSTEM_TIME AS OF proctime` on a
  * LookupTableSource (flink-table-planner-blink CommonLookupJoin +
  * RT/join/lookup/LookupJoinRunner, SURVEY.md §2.4).
  *
  * The store is pluggable ([[LookupJoin.Store]]); production impls wrap
  * JDBC/HBase-style point reads. [[LookupJoin.broadcastStore]] serves a
  * driver-broadcast map — the deterministic stub used by tests and the
  * oracle-checked query. Semantics are LEFT OUTER and at-least-once
  * (each partition looks up independently; the cache bounds QPS to the
  * store, the classic reason this operator exists at 1000-executor
  * scale — a shuffle join would need the whole dim snapshotted, a
  * broadcast join needs it to fit in memory; lookups + LRU handle the
  * long tail).
  */
object LookupJoin {

  /** Synchronous point-lookup: Some(values) or None on miss. */
  trait Store extends Serializable {
    def lookup(key: Any): Option[Seq[Any]]
  }

  /** Multi-get lookup: one round-trip answers a whole key batch — the
    * Spark-idiomatic analog of the reference's ASYNC lookup I/O
    * (AsyncLookupJoinRunner): where Flink hides per-key latency behind
    * concurrent in-flight callbacks, a batch-at-a-time engine hides it
    * by amortizing the round-trip over `batchSize` keys per partition.
    * Same throughput lever, no callback machinery.
    */
  trait BatchedStore extends Serializable {
    def lookupAll(keys: Seq[Any]): Map[Any, Seq[Any]]
  }

  /** Store stub over a broadcast map (key → payload values). */
  def broadcastStore(bc: Broadcast[Map[Any, Seq[Any]]]): Store =
    new Store { def lookup(key: Any): Option[Seq[Any]] = bc.value.get(key) }

  /** Batched-store stub over the same broadcast map. */
  def broadcastBatchedStore(bc: Broadcast[Map[Any, Seq[Any]]]): BatchedStore =
    new BatchedStore {
      def lookupAll(keys: Seq[Any]): Map[Any, Seq[Any]] =
        keys.iterator.flatMap(k => bc.value.get(k).map(k -> _)).toMap
    }

  /** Left-outer lookup enrichment of `df` by `keyCol`, appending
    * `outCols` (typed by `outSchema`) from the store, with a
    * per-partition LRU cache of `cacheSize` entries.
    */
  def enrich(
      df: DataFrame, keyCol: String, store: Store,
      outSchema: StructType, cacheSize: Int = 10000): DataFrame = {
    val schema = StructType(df.schema.fields ++ outSchema.fields)
    val keyIdx = df.schema.fieldIndex(keyCol)
    val nOut = outSchema.size
    df.mapPartitions { it =>
      val cache = new java.util.LinkedHashMap[Any, Option[Seq[Any]]](
          16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Any, Option[Seq[Any]]]): Boolean =
          size() > cacheSize
      }
      it.map { row =>
        val k = row.get(keyIdx)
        var hit = cache.get(k)
        if (hit == null) { hit = store.lookup(k); cache.put(k, hit) }
        val extra = hit.map(_.toArray).getOrElse(Array.fill[Any](nOut)(null))
        Row.fromSeq(row.toSeq ++ extra)
      }
    }(Encoders.row(schema))
  }

  /** Left-outer lookup enrichment via a [[BatchedStore]]: rows are
    * consumed in `batchSize` groups per partition, distinct keys of the
    * group go out as ONE multi-get, results join back in row order.
    * Dedups keys within the batch (the LRU's job in the point-lookup
    * path) and keeps memory bounded by the batch, not the partition.
    */
  def enrichBatched(
      df: DataFrame, keyCol: String, store: BatchedStore,
      outSchema: StructType, batchSize: Int = 1000): DataFrame = {
    val schema = StructType(df.schema.fields ++ outSchema.fields)
    val keyIdx = df.schema.fieldIndex(keyCol)
    val nOut = outSchema.size
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val hits = store.lookupAll(batch.map(_.get(keyIdx)).distinct)
        batch.iterator.map { row =>
          val extra = hits.get(row.get(keyIdx)).map(_.toArray)
            .getOrElse(Array.fill[Any](nOut)(null))
          Row.fromSeq(row.toSeq ++ extra)
        }
      }
    }(Encoders.row(schema))
  }

  /** Builds a broadcast-map store from a SMALL DataFrame: first column
    * is the key, the rest are the payload. This is the test/oracle stub
    * behind the pluggable [[Store]] — the one deliberate driver collect
    * in the library — so it hard-fails beyond `maxRows` rather than
    * silently materializing a real dimension table on the driver
    * (production stores wrap JDBC/HBase point reads instead).
    */
  def storeFrom(dim: DataFrame, maxRows: Int = 1000000): (Store, StructType) = {
    val (bc, schema) = collectDim(dim, maxRows)
    (broadcastStore(bc), schema)
  }

  /** Batched twin of [[storeFrom]]. */
  def batchedStoreFrom(
      dim: DataFrame, maxRows: Int = 1000000): (BatchedStore, StructType) = {
    val (bc, schema) = collectDim(dim, maxRows)
    (broadcastBatchedStore(bc), schema)
  }

  private[operators] def collectDim(dim: DataFrame, maxRows: Int)
      : (Broadcast[Map[Any, Seq[Any]]], StructType) = {
    val schema = StructType(dim.schema.fields.drop(1))
    val rows = dim.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"storeFrom is a broadcast-map STUB for dims <= $maxRows rows; " +
        "wire a real Store (JDBC/HBase point lookups) for larger tables")
    val m: Map[Any, Seq[Any]] = rows
      .map(r => r.get(0) -> r.toSeq.drop(1)).toMap
    (dim.sparkSession.sparkContext.broadcast(m), schema)
  }
}
