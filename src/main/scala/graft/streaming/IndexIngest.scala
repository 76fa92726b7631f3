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

  /** Vector-side twin of [[start]]: each micro-batch of newly-arrived
    * embeddings is assigned against the FROZEN centroid family
    * ([[graft.operators.Similarity.ivfAssign]] — a bounded K-row
    * centroid collect per batch, the literal-plan contract) and
    * appended as ONE GENERATION of the written IVF index
    * ([[graft.operators.Similarity.ivfAppendIndex]]) — the q137 append
    * contract mapped onto Structured Streaming's unit of progress.
    * Batch boundaries cannot move results: per-vector assignment is
    * independent of every other vector, so any micro-batch split of
    * the delta composes to the same index as the fresh union build
    * (q174 gates served top-k against the q134/q137 fresh-build
    * oracle). Same delivery contract as [[start]]: file-granularity
    * atomic within a batch, caller owns exactly-once across sink
    * retries (a replayed batch lands duplicate member rows — the
    * damage the `groupBy(id).count > 1` audit localizes and a fresh
    * [[graft.operators.Similarity.ivfWriteIndex]] compaction repairs).
    */
  def startIvf(vecStream: DataFrame, path: String, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): StreamingQuery =
    vecStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Similarity.ivfAppendIndex(
          graft.operators.Similarity.ivfAssign(batch, centroids, idCol, vecCol),
          path)
      }
      .outputMode("append")
      .start()

  /** Runs the vector ingest over all currently-available input, then
    * stops — the bounded-backfill form the q174 gate drives.
    */
  def ingestIvfVectors(vecStream: DataFrame, path: String,
      centroids: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val q = startIvf(vecStream, path, centroids, idCol, vecCol)
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Lexical twin of [[start]]/[[startIvf]] — the THIRD index modality
    * on the streaming ingest loop: each micro-batch of newly-arrived
    * documents appends ONE GENERATION to a written BM25 index
    * ([[graft.operators.Retrieval.bm25AppendIndex]] — delta postings,
    * df contributions, and a stats row; zero base reads). Batch
    * boundaries cannot move served rankings: tf and dl are per-document
    * facts computed wholly within their batch, and df / the corpus
    * scalars are ADDITIVE per-generation contributions summed at serve
    * time (the r12 layout invariant), so any micro-batch split of the
    * delta sums to the fresh whole-corpus statistics — q177 gates the
    * served top-10 against the same q146/q154/q155 fresh-corpus
    * oracle. Delivery contract as [[start]]: batch-atomic writes,
    * caller owns exactly-once across retries (a replayed batch is the
    * doubled-generation damage [[graft.operators.Retrieval
    * .bm25AuditIndex]] localizes and `bm25CompactIndex` repairs).
    * Same new-ids contract as the batch append: a stream that re-sends
    * an already-indexed document doubles its postings — feed this sink
    * NEW documents only.
    */
  def startBm25(docsStream: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Retrieval.bm25AppendIndex(batch, path, idCol, textCol)
      }
      .outputMode("append")
      .start()

  /** Runs the lexical ingest over all currently-available input, then
    * stops — the bounded-backfill form the q177 gate drives.
    */
  def ingestBm25Docs(docsStream: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val q = startBm25(docsStream, path, idCol, textCol)
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Semantic-cluster twin of [[startIvf]], completing the streaming
    * ingest loop over ALL FOUR written index families (exact
    * fingerprint, IVF, BM25, semantic cluster): each micro-batch of
    * newly-arrived embeddings is assigned against the FROZEN centroid
    * family ([[graft.operators.Clustering.assignL2]] — bounded K-row
    * centroid collect per batch, the literal-plan contract) and
    * appended as one generation of the written semantic index
    * ([[graft.operators.Clustering.semanticAppendIndex]]). Generation
    * numbers advance per batch (`startGen + batchId` — foreachBatch
    * batch ids are contiguous from 0 within a run), satisfying the
    * gen > 0 append contract. Batch boundaries cannot move
    * [[graft.operators.Clustering.semDedupIndexed]] verdicts: per-
    * vector assignment is independent, generations partition the
    * delta, and the probe reads their union — q180 gates the standing
    * probe against the same fresh-union oracle as q173. Delivery
    * contract as the other three: batch-atomic, caller owns
    * exactly-once across retries (a replayed batch is exactly the
    * damage [[graft.operators.Clustering.semanticAuditIndex]]
    * localizes and `semanticCompactIndex` repairs).
    */
  def startSemantic(vecStream: DataFrame, path: String,
      centroids: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", startGen: Int = 1): StreamingQuery = {
    require(startGen > 0, s"append generations start at 1, got $startGen")
    vecStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Clustering.semanticAppendIndex(
          graft.operators.Clustering.assignL2(batch, centroids, idCol, vecCol),
          path, gen = startGen + batchId.toInt, idCol)
      }
      .outputMode("append")
      .start()
  }

  /** Runs the semantic ingest over all currently-available input, then
    * stops — the bounded-backfill form the q180 gate drives.
    */
  def ingestSemanticVectors(vecStream: DataFrame, path: String,
      centroids: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val q = startSemantic(vecStream, path, centroids, idCol, vecCol)
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Winnowing twin of [[start]] — the pair-index families' streaming
    * member alongside the exact-fingerprint one: each micro-batch of
    * newly-arrived documents appends ONE GENERATION of winnowing
    * postings ([[graft.operators.Dedup.winnowAppendIndex]] — fingerprints
    * computed wholly within the batch, shard = h mod 256). Batch
    * boundaries cannot move pair results: a posting row depends only on
    * its own document, generations partition the delta, and the probe
    * ([[graft.operators.Dedup.winnowPairsIndexed]]) reads their union —
    * q191 gates the standing probe against the same fresh-restricted
    * oracle as q190. Delivery contract as the other sinks:
    * batch-atomic parquet append, caller owns exactly-once across
    * retries (a replayed batch doubles pair multiplicities — exactly
    * what [[graft.operators.Dedup.winnowAuditIndex]] localizes).
    */
  def startWinnow(docsStream: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text",
      blockCol: String = "source"): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Dedup.winnowAppendIndex(batch, path, idCol,
          textCol, blockCol)
      }
      .outputMode("append")
      .start()

  /** Runs the winnowing ingest over all currently-available input,
    * then stops — the bounded-backfill form the q191 gate drives.
    */
  def ingestWinnowDocs(docsStream: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text",
      blockCol: String = "source"): Unit = {
    val q = startWinnow(docsStream, path, idCol, textCol, blockCol)
    try q.processAllAvailable()
    finally q.stop()
  }

  /** The DERIVED-ARTIFACT member of the ingest loop: where the four
    * index sinks above maintain retrieval/dedup state, this one
    * maintains the mixture manifest ([[graft.operators.Curation
    * .mixtureAppendIndex]]) — each micro-batch of newly-arrived
    * documents is tokenized ONCE and its (source, key, n_toks) payload
    * appended as one generation; the standing admission manifest is
    * then served from stored counts alone
    * ([[graft.operators.Curation.mixtureServeIndex]]), re-deriving
    * rates as the corpus grows without ever re-reading text. Batch
    * boundaries cannot move a rate or a draw: source masses are exact
    * long sums (additive over any generation split) and draws are
    * frozen per-key hashes — q185 gates the streamed ingest's serve
    * against the fresh whole-corpus q179 derivation. Same delivery
    * contract as the other sinks: batch-atomic parquet append, caller
    * owns exactly-once across retries (a replayed batch doubles its
    * documents' mass and duplicates keys — the `groupBy(key).count >
    * 1` audit localizes it).
    */
  def startMixture(docsStream: DataFrame, path: String,
      stratumCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text"): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Curation.mixtureAppendIndex(batch, path,
          stratumCol, idCol, textCol)
      }
      .outputMode("append")
      .start()

  /** Runs the mixture-manifest ingest over all currently-available
    * input, then stops — the bounded-backfill form the q185 gate
    * drives.
    */
  def ingestMixtureDocs(docsStream: DataFrame, path: String,
      stratumCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    val q = startMixture(docsStream, path, stratumCol, idCol, textCol)
    try q.processAllAvailable()
    finally q.stop()
  }
}
