package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication operator family for large-scale training-data
  * pipelines: exact (hash), MinHash+LSH, SimHash, and blocked n-gram
  * Jaccard. All operators are pure DataFrame transformations — no
  * driver-side collection — and are designed for the 1000-executor case:
  *
  *  - shingling/explode is a narrow map; the only shuffles are the
  *    per-document signature aggregation (keyed by doc id) and the LSH
  *    band-bucket self-join (keyed by band hash);
  *  - candidate verification joins compact signature arrays (bounded by
  *    document length), never the raw text;
  *  - band-bucket skew (a viral duplicate cluster) is the classic risk:
  *    buckets are capped via `maxBucketSize` before pairing, which bounds
  *    the quadratic blowup per bucket (pairs within an over-cap bucket
  *    are still found by the other bands with high probability).
  *
  * Reference semantics: Flink 1.11 itself ships only keyed
  * `DataStream#keyBy`+dedup and `ROW_NUMBER()=1` dedup
  * (flink-table-runtime-blink RT/deduplicate — SURVEY.md §2.6); the
  * MinHash/SimHash family is the north-star training-pipeline superset
  * (BASELINE.json), with public-paper semantics (Broder '97 MinHash,
  * Charikar '02 SimHash).
  */
object Dedup {

  import TextOps._

  /** THE bucket-local incremental pair-emission idiom, shared by the
    * minhash-LSH, inverted-index-jaccard, and hyperplane-LSH candidate
    * generators (it previously existed as three hand-synced copies;
    * the r6 self-pair guard had to be patched in triplicate — this is
    * the single source now).
    *
    * From `df` keyed by `keys`: (1) a spillable WINDOW count caps each
    * group at `maxGroupSize` — a viral group (boilerplate shingle,
    * degenerate LSH bucket) is counted and dropped without ever
    * materializing in memory; (2) survivors collect into ONE bounded
    * sorted list per group (≤ maxGroupSize items — window and groupBy
    * share the key partitioning, so one exchange total); (3) pairs are
    * emitted INCREMENTALLY — posexplode each sorted left endpoint
    * against its tail slice — so the largest single-row buffer is the
    * O(cap) item list, never the O(cap²) pair array. The strict
    * `aName < bName` filter is the self-pair guard: tail-slice pairing
    * is positional, so duplicate items in a group would otherwise emit
    * (x, x).
    *
    * `capCol` names the count column (kept distinct per caller — plan
    * pins match on it); `carry` lists key columns to keep on the
    * output rows; `dedupPairs` collapses multi-group collisions (LSH
    * bands) and must stay false when pair multiplicity IS the signal
    * (inverted-index intersection counts).
    */
  private[operators] def emitSortedPairs(
      df: DataFrame, keys: Seq[String], item: Column,
      capCol: String, maxGroupSize: Int,
      aName: String, bName: String,
      carry: Seq[String] = Nil, dedupPairs: Boolean): DataFrame = {
    val keyCols = keys.map(col)
    val paired = df
      .withColumn(capCol, count(lit(1)).over(Window.partitionBy(keyCols: _*)))
      .filter(col(capCol) > 1 && col(capCol) <= maxGroupSize)
      .groupBy(keyCols: _*)
      .agg(sort_array(collect_list(item)).as("ds"))
      .select(carry.map(col) :+ posexplode(col("ds")).as(Seq("i", aName))
        :+ col("ds"): _*)
      .select(carry.map(col) :+ col(aName)
        :+ explode(expr("slice(ds, i + 2, size(ds))")).as(bName): _*)
      .filter(col(aName) < col(bName))
    if (dedupPairs) paired.distinct() else paired
  }

  // ------------------------------------------------------------------
  // Exact dedup
  // ------------------------------------------------------------------

  /** One row per distinct normalized-text fingerprint: the kept (minimum)
    * id, the cluster size, and the fingerprint. Standard exact-dedup via
    * hash-groupBy; scales as one shuffle on the fingerprint.
    */
  def exactClusters(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), md5(normalize(col(textCol))).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("kept_id"), count(lit(1)).as("cluster_size"))

  /** Exact dedup's WRITTEN index: `fingerprints/` (doc_id,
    * fingerprint) PARTITIONED BY the fingerprint's own first 2 hex
    * chars (md5 output is uniform — the fingerprint IS its shard key,
    * no second hash needed). The trivial end of the incremental-dedup
    * family ([[minhashWriteIndex]] is the near-dup end): a standing
    * pipeline checks each new snapshot for exact duplicates against
    * everything ever indexed by probing ~|snapshot shards|/256 of the
    * layout.
    */
  def exactWriteIndex(df: DataFrame, path: String,
      idCol: String, textCol: String): Unit =
    writeFpGeneration(df, path, idCol, textCol, "overwrite")

  /** Appends a NEW-DOCUMENT snapshot's fingerprints — delta-sized,
    * zero base reads; the usual new-ids / exactly-once append
    * contract (a replayed append inflates cluster_size counts).
    */
  def exactAppendIndex(df: DataFrame, path: String,
      idCol: String, textCol: String): Unit =
    writeFpGeneration(df, path, idCol, textCol, "append")

  private def writeFpGeneration(df: DataFrame, path: String,
      idCol: String, textCol: String, mode: String): Unit =
    // fan out before the per-doc normalize+md5 (guide §2.5): a small-
    // file corpus otherwise hashes serially in the scan stage
    Parallelism.fanOut(
        df.select(col(idCol).cast("long").as("doc_id"),
          col(textCol).cast("string").as("__t")), "doc_id")
      .select(col("doc_id"), md5(normalize(col("__t"))).as("fingerprint"))
      .withColumn("shard", substring(col("fingerprint"), 1, 2))
      .repartition(col("shard"))
      .write.mode(mode).partitionBy("shard").parquet(s"$path/fingerprints")

  /** Replay audit of an [[exactWriteIndex]] layout — one grouped scan
    * of `fingerprints/` emitting ids present more than once:
    * `n_payloads` = 1 means a replayed append (bit-identical copies);
    * > 1 means the id was re-appended with DIFFERENT text (payload
    * divergence — a rebuild signal). The same damage taxonomy as
    * `bm25AuditIndex`/`ivfPqAuditIndex`; repair here is trivial
    * (rewrite `dropDuplicates()`), so no compact twin ships.
    */
  def exactAuditIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(s"$path/fingerprints")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_copies"),
        count_distinct(col("fingerprint")).as("n_payloads"))
      .filter(col("n_copies") > 1)

  /** Incremental [[exactClusters]] of a new snapshot against an
    * [[exactWriteIndex]] layout that already contains it: every
    * cluster with AT LEAST ONE snapshot member, with the stats the
    * fresh whole-corpus run would report (kept = global min id,
    * cluster_size = full membership — the probe reads ENTIRE shard
    * buckets, so base members count). One delta-sized fingerprint
    * pass, a partition-pruned scan (literal shards from a collect
    * bounded by the 256-shard alphabet), a broadcast
    * snapshot-fingerprint semi-join BEFORE the aggregation (prunes
    * the shard residue ahead of the shuffle), one keyed agg. q160
    * gates equality with the fresh run restricted to
    * snapshot-touched fingerprints.
    */
  def exactClustersIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, deltaDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val deltaFp = deltaDocs
      .select(md5(normalize(col(textCol))).as("fingerprint")).distinct()
    val shards = deltaFp
      .select(substring(col("fingerprint"), 1, 2).as("shard"))
      .distinct().collect().map(_.getString(0))
    spark.read.parquet(s"$path/fingerprints")
      .filter(col("shard").isin(shards.toSeq: _*))
      .join(broadcast(deltaFp), Seq("fingerprint"), "leftsemi")
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("kept_id"), count(lit(1)).as("cluster_size"))
  }

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  /** Per-document sorted distinct shingle-hash sets, with an optional
    * blocking column: (blk, doc_id, hs, n).
    *
    * Computed in a typed `mapPartitions` (single pass: normalize →
    * tokenize → shingle → md5-hash → sorted distinct) rather than as a
    * Column expression tree. The declarative form is an optimizer trap
    * at scale: filters that Catalyst INFERS above it (isnotnull/size from
    * a downstream Generate or join) are predicate-pushed through the
    * projection, substituting the whole shingle expression — in its
    * worst-case inlined form, re-evaluating normalize+split per array
    * element — into per-row interpreted Filters (measured 170x slower at
    * sf0.1). The object barrier is opaque to those rewrites, and the
    * fused JVM loop is itself ~10x cheaper than the interpreted
    * higher-order functions. Still a narrow map — no shuffle, and rows
    * carry only the compact hash set (never raw text) downstream.
    */
  private def shingleSets(
      df: DataFrame, idCol: String, textCol: String, shingleN: Int,
      blockCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // fan out before the per-shingle hashing (guide §2.5): cost is
    // shingles × md5, the scan stage is sized by input bytes
    val src = Parallelism.fanOut(df.select(
      blockCol.map(c => col(c).cast("string")).getOrElse(lit("")).as("blk"),
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("string").as("text")), "doc_id")
    src.as[(String, Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (blk, id, text) =>
          (blk, id, shingleHashSet(md, text, shingleN))
        }
      }
      .toDF("blk", "doc_id", "hs")
      .withColumn("n", size(col("hs")))
  }

  /** Per-document MinHash signature columns mh0..mh{n-1} over distinct
    * word-`shingleN`-gram shingles. Entirely per-row inside one typed
    * `mapPartitions` (min over the hashed shingle set under each hash
    * function) — zero shuffles; docs with no shingles (fewer than
    * shingleN tokens) are dropped, matching the grouped-aggregation
    * formulation.
    */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleN: Int): DataFrame = {
    val params = hashParams(numHashes).toArray
    val spark = df.sparkSession
    import spark.implicits._
    // NO fan-out here (unlike the other fingerprint passes): PlanSpec
    // pins a zero-shuffle scan→signature contract for q31, and the
    // sf0.1 A/B measured noise-level difference; at production scale
    // the scan is wide and a fan-out would be a no-op anyway
    df.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val hs = shingleHashSet(md, text, shingleN)
          if (hs.isEmpty) Iterator.empty
          else {
            val mh = Array.fill(params.length)(Long.MaxValue)
            var j = 0
            while (j < hs.length) {
              val hm = hs(j) % HashP
              var i = 0
              while (i < params.length) {
                val v = (params(i)._1 * hm + params(i)._2) % HashP
                if (v < mh(i)) mh(i) = v
                i += 1
              }
              j += 1
            }
            Iterator.single((id, mh))
          }
        }
      }
      .toDF("doc_id", "mh")
      .select(col("doc_id") +:
        (0 until numHashes).map(i => col("mh")(i).as(s"mh$i")): _*)
  }

  /** MinHash-LSH near-duplicate pairs, exact-verified.
    *
    * Banding: `bands` bands of `numHashes/bands` rows; documents sharing
    * any full band signature become candidates; candidates are verified
    * with exact Jaccard over the distinct shingle-hash sets and kept when
    * `jaccard >= threshold`. Output: (doc_a, doc_b, jaccard), doc_a < doc_b.
    */
  /** One row per (doc, band) from a [[minhashSignatures]] frame:
    * explode an array of band keys rather than unioning `bands` copies
    * of the plan, which would recompute the signature projection once
    * per band. Shared by the in-session dedup and the written-index
    * build/probe — index serving equality NEEDS the identical key
    * encoding.
    */
  private def bandKeys(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    sig.select(col("doc_id"),
      explode(array((0 until bands).map { bnd =>
        concat_ws("_",
          lit(bnd) +: (0 until rows).map(r => col(s"mh${bnd * rows + r}")): _*)
      }: _*)).as("bk"))
  }

  /** Exact-Jaccard verification tail shared by [[minhashDedup]] and
    * [[minhashDedupIndexed]]: melt each candidate pair to (pair,
    * endpoint) rows, join the (doc_id, hs, n) sets ONCE, fold back per
    * pair — two per-endpoint joins would run the set source twice.
    * first(ignoreNulls) is deterministic: each pair has exactly one
    * a-row and one b-row.
    */
  private def verifyJaccard(
      cands: DataFrame, sets: DataFrame, threshold: Double): DataFrame =
    cands
      .select(col("doc_a"), col("doc_b"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .join(sets, "doc_id")
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(
        first(when(col("doc_id") === col("doc_a"), col("hs")), ignoreNulls = true).as("hs_a"),
        first(when(col("doc_id") === col("doc_b"), col("hs")), ignoreNulls = true).as("hs_b"),
        first(when(col("doc_id") === col("doc_a"), col("n")), ignoreNulls = true).as("na"),
        first(when(col("doc_id") === col("doc_b"), col("n")), ignoreNulls = true).as("nb"))
      .withColumn("i", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  def minhashDedup(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.8, maxBucketSize: Int = 1000): DataFrame = {
    val sig = minhashSignatures(df, idCol, textCol, numHashes, shingleN)
    val banded = bandKeys(sig, numHashes, bands)

    // bucket-local pair explosion from ONE keyed pass via the shared
    // [[emitSortedPairs]] idiom — the old capped-window + SELF-JOIN
    // formulation re-ran the signature mapPartitions per join side (no
    // ReusedExchange across the object barrier) and shuffled the
    // banded rows twice; band collisions dedup (a near-dup pair can
    // collide in several bands)
    val cands = emitSortedPairs(banded, keys = Seq("bk"),
      item = col("doc_id"), capCol = "bucket_n",
      maxGroupSize = maxBucketSize, aName = "doc_a", bName = "doc_b",
      dedupPairs = true)

    // exact-Jaccard verify with ONE shingle-set pass (see verifyJaccard)
    verifyJaccard(cands,
      shingleSets(df, idCol, textCol, shingleN).select("doc_id", "hs", "n"),
      threshold)
  }

  // ------------------------------------------------------------------
  // Written signature index: incremental dedup's day-2 layout
  // ------------------------------------------------------------------

  /** Materializes the minhash-LSH dedup state as a WRITTEN index — the
    * dedup family's day-2 layout (the `ivfWriteIndex` shape applied to
    * signatures), so a standing curation pipeline can dedup each new
    * crawl snapshot against (base ∪ delta) WITHOUT recomputing the
    * whole corpus. Two pieces:
    *
    *  - `bands/` (doc_id, bk), PARTITIONED BY a 256-way md5 shard of
    *    the band key: candidate generation's prune key — a snapshot's
    *    band keys touch ~|their shards|/256 of the layout;
    *  - `sigs/` (doc_id, hs, n): the exact-verify payload (distinct
    *    shingle-hash sets), doc-keyed — candidates fetch endpoints by
    *    id.
    *
    * Both derive from the same two per-row passes the in-session dedup
    * runs (signatures + shingle sets); (numHashes, bands, shingleN)
    * are LAYOUT parameters — probing with different values finds
    * nothing, so callers fix them per index like the packer's shard
    * width.
    */
  def minhashWriteIndex(df: DataFrame, path: String,
      idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, shingleN: Int = 3): Unit =
    writeSigGeneration(df, path, idCol, textCol, numHashes, bands,
      shingleN, "overwrite")

  /** Appends a NEW-DOCUMENT snapshot to a [[minhashWriteIndex]] layout:
    * delta-sized signature + set passes, zero base reads. Same
    * contract as every index append here (new ids,
    * caller-owns-exactly-once); damage shows up as duplicate (doc_id,
    * bk) band rows or duplicate sig rows, and — unlike the
    * serving-index appends — is IDEMPOTENT for dedup correctness
    * modulo cap accounting: duplicate band rows inflate bucket_n
    * toward the cap, so a replayed append can DROP pairs a clean
    * layout finds. Treat replay as damage, not noise.
    */
  def minhashAppendIndex(df: DataFrame, path: String,
      idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, shingleN: Int = 3): Unit =
    writeSigGeneration(df, path, idCol, textCol, numHashes, bands,
      shingleN, "append")

  private def writeSigGeneration(df: DataFrame, path: String,
      idCol: String, textCol: String, numHashes: Int, bands: Int,
      shingleN: Int, mode: String): Unit = {
    val sig = minhashSignatures(df, idCol, textCol, numHashes, shingleN)
    bandKeys(sig, numHashes, bands)
      .withColumn("shard", substring(md5(col("bk")), 1, 2))
      .repartition(col("shard"))
      .write.mode(mode).partitionBy("shard").parquet(s"$path/bands")
    shingleSets(df, idCol, textCol, shingleN).select("doc_id", "hs", "n")
      .write.mode(mode).parquet(s"$path/sigs")
  }

  /** Replay audit of a [[minhashWriteIndex]] layout: duplicate
    * (doc_id, bk) band rows — the damage the [[minhashAppendIndex]]
    * contract warns about (replay inflates bucket_n toward the cap,
    * silently DROPPING pairs a clean layout finds). One narrow
    * grouped scan of `bands/`; `sigs/` replay shows up as the same
    * ids here, so one audit covers the layout.
    */
  def minhashAuditIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(s"$path/bands")
      .groupBy(col("doc_id"), col("bk"))
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** Incremental near-dup dedup of a NEW snapshot against a
    * [[minhashWriteIndex]] layout that already contains it (write base,
    * [[minhashAppendIndex]] the snapshot, then call this): every pair
    * (doc_a, doc_b, jaccard) with AT LEAST ONE endpoint in the
    * snapshot — exactly the fresh whole-corpus [[minhashDedup]] output
    * restricted to snapshot-endpoint pairs (q159 gates that equality),
    * because the probe reads ENTIRE buckets for every shard a snapshot
    * band key lands in: same bucket membership, same cap accounting,
    * same verify arithmetic as the fresh run. Base-base pairs were the
    * PREVIOUS runs' output and are skipped — the point of the index.
    *
    * Plan shape: one delta-sized signature pass (band keys only — the
    * verify sets come from `sigs/`, not a re-tokenize), a
    * partition-pruned `bands/` scan (literal shards from a collect
    * bounded by the 256-shard alphabet), the shared capped pair
    * emission, a broadcast snapshot-id filter (two broadcast hash
    * joins — an OR-semi-join would plan a nested loop), and the
    * doc-keyed verify join against `sigs/`. At deployment scale the
    * sigs fetch co-locates by bucketing the layout on doc_id; the
    * snapshot-id broadcast assumes a snapshot's ID LIST is
    * broadcast-class — drop the hint if a snapshot outgrows it.
    */
  def minhashDedupIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, deltaDocs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.8, maxBucketSize: Int = 1000): DataFrame = {
    val deltaSig = minhashSignatures(deltaDocs, idCol, textCol,
      numHashes, shingleN)
    // delta band-key set, materialized once: feeds the bounded shard
    // collect AND the (bk) semi prune (r21 — the q219 pruned-regime
    // argument on the minhash member: every bucket holding a snapshot
    // doc has a band key the snapshot itself posts; kept buckets
    // retain FULL membership so the bucket cap fires exactly as fresh)
    val qbk = bandKeys(deltaSig, numHashes, bands)
      .select(col("bk")).distinct().localCheckpoint()
    val shards = qbk
      .select(substring(md5(col("bk")), 1, 2).as("shard"))
      .distinct().collect().map(_.getString(0))
    val probe = spark.read.parquet(s"$path/bands")
      .filter(col("shard").isin(shards.toSeq: _*))
      .join(Parallelism.boundedBroadcast(qbk), Seq("bk"), "leftsemi")
      .select(col("doc_id"), col("bk"))
    // EARLY endpoint filter — same as [[winnowPairsIndexed]]: a
    // (base, base) bucket pair is discarded by the endpoint filter no
    // matter what, so filter at emission instead of after the distinct
    val deltaIds = deltaDocs.select(col(idCol).cast("long").as("doc_id"))
      .distinct().localCheckpoint()
    val flagged = probe
      .join(broadcast(deltaIds.withColumn("__delta", lit(true))),
        Seq("doc_id"), "left")
      .withColumn("__delta", coalesce(col("__delta"), lit(false)))
    val cands = emitSortedPairs(flagged, keys = Seq("bk"),
      item = struct(col("doc_id"), col("__delta")), capCol = "bucket_n",
      maxGroupSize = maxBucketSize, aName = "a", bName = "b",
      dedupPairs = true)
      .filter(col("a.__delta") || col("b.__delta"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val fa = deltaIds.select(col("doc_id").as("doc_a"))
      .withColumn("fa", lit(1))
    val fb = deltaIds.select(col("doc_id").as("doc_b"))
      .withColumn("fb", lit(1))
    val dcands = cands
      .join(broadcast(fa), Seq("doc_a"), "left")
      .join(broadcast(fb), Seq("doc_b"), "left")
      .filter(col("fa").isNotNull || col("fb").isNotNull)
      .select(col("doc_a"), col("doc_b"))
    // prune the verify-set fetch to PROBED-BUCKET MEMBERS before the
    // join: sigs/ rows carry the full shingle-hash arrays (the widest
    // rows this family owns), and an unpruned join lets the planner
    // shuffle the whole layout (guide §2.3 "shuffle keys, not
    // payloads"). Every candidate pair's endpoints are members of some
    // kept bucket, so the member-id set is an exact superset of the
    // verify endpoints; only the compact id list is materialized — the
    // candidate pipeline itself stays lazy, so the served plan keeps
    // its pruned bands scan.
    val memberIds = probe.select(col("doc_id")).distinct().localCheckpoint()
    val sigs = spark.read.parquet(s"$path/sigs")
      .join(Parallelism.boundedBroadcast(memberIds), Seq("doc_id"), "leftsemi")
    verifyJaccard(dcands, sigs, threshold)
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 32-bit SimHash fingerprint per document over distinct tokens
    * (Charikar '02): bit j of the fingerprint is the sign of
    * sum(±1 over tokens, + when bit j of the token hash is set).
    *
    * Computed per document inside one `mapPartitions` pass (like the
    * minhash signatures): the explode + 32-conditional-sums formulation
    * shuffled every (doc, distinct-token) row — ~8x slower at sf0.1 —
    * while the fingerprint is a purely per-document reduction, so zero
    * shuffle is the right plan at any scale. Bit-identical to the SQL
    * twin: same normalize/tokenize regexes, same md5-prefix hash.
    * Documents with NULL text drop out (the SQL twin's unnest(NULL)
    * does the same).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Parallelism.fanOut(
        df.select(col(idCol).cast("long").as("__id"),
          col(textCol).cast("string").as("__t")), "__id")
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val toks = TextOps.normalizeStr(text).split(" ", -1)
            val seen = new java.util.HashSet[String]()
            val sums = new Array[Int](32)
            var i = 0
            while (i < toks.length) {
              if (seen.add(toks(i))) {
                val h = TextOps.hash32Str(md, toks(i))
                var j = 0
                while (j < 32) {
                  if (((h >> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
                  j += 1
                }
              }
              i += 1
            }
            var fp = 0L
            var j = 0
            while (j < 32) { if (sums(j) > 0) fp |= 1L << j; j += 1 }
            Iterator.single((id, fp))
          }
        }
      }
      .toDF("doc_id", "simhash")
  }

  /** 60-bit SimHash per document — [[simhash]] widened to the
    * fingerprint width near-dup SEARCH needs (Manku/Jain/Sarma WWW'07,
    * Google's web-crawl dedup: hamming-ball search over SimHash via
    * banded tables): with 32 bits, hamming-≤3 banding forces 8-bit
    * bands whose 256 bucket values collapse a large corpus into
    * quadratic buckets; 60 bits gives four 15-bit bands — 32,768
    * values each — so bucket occupancy dilutes with corpus size the
    * way Manku's 64-bit design intends, while staying positive in a
    * signed BIGINT on both engines ([[TextOps.hash60]]). Same
    * zero-shuffle mapPartitions shape as [[simhash]].
    */
  def simhash60(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Parallelism.fanOut(
        df.select(col(idCol).cast("long").as("__id"),
          col(textCol).cast("string").as("__t")), "__id")
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else Iterator.single((id, simhash60Str(md, text)))
        }
      }
      .toDF("doc_id", "simhash")
  }

  /** Four 15-bit SimHash bands. With `maxHamming <= 3`, a pair within
    * the ball differs in at most 3 bit positions, which can damage at
    * most 3 of the 4 bands — so at least one band matches exactly and
    * banded search is EXACT, not approximate (the pigeonhole argument
    * Manku's tables are built on).
    */
  private val SimhashBands = 4
  private val SimhashBandBits = 15
  private val SimhashBandMask = (1 << SimhashBandBits) - 1

  /** [[simhash60]] carrying a blocking column: (doc_id, blk, simhash);
    * NULL-block docs drop (the q33/q153 blocked-dedup convention).
    */
  private def simhash60Blocked(df: DataFrame, idCol: String,
      textCol: String, blockCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Parallelism.fanOut(
        df.filter(col(blockCol).isNotNull)
          .select(col(idCol).cast("long").as("__id"),
            col(blockCol).cast("string").as("__blk"),
            col(textCol).cast("string").as("__t")), "__id")
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, blk, text) =>
          if (text == null) Iterator.empty
          else Iterator.single((id, blk, simhash60Str(md, text)))
        }
      }
      .toDF("doc_id", "blk", "simhash")
  }

  /** The per-document 60-bit fingerprint loop shared by [[simhash60]]
    * and [[simhash60Blocked]].
    */
  private def simhash60Str(
      md: java.security.MessageDigest, text: String): Long = {
    val toks = TextOps.normalizeStr(text).split(" ", -1)
    val seen = new java.util.HashSet[String]()
    val sums = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val h = TextOps.hash60Str(md, toks(i))
        var j = 0
        while (j < 60) {
          if (((h >> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) { if (sums(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }

  /** One row per (doc, band): input columns + (bidx, bval). */
  private def simhashBandRows(fps: DataFrame): DataFrame =
    fps.withColumn("bidx",
        explode(lit((0 until SimhashBands).toArray)))
      .withColumn("bval",
        expr(s"shiftright(simhash, bidx * $SimhashBandBits) & $SimhashBandMask"))

  /** The written-index partition key: 4 bands × the band value's top 6
    * bits = ≤256 directories — the repo-standard shard fan-out (BM25's
    * md5 shards). The first cut used the top 8 bits (1,024 dirs) and
    * the two write rounds' small-file overhead dominated the q168
    * lifecycle (measured ~12 s → ~7 s at sf0.1 after the cut); probe
    * pruning keeps the same shape, one level coarser.
    */
  private def simhashShard(bidx: Column, bval: Column): Column =
    (bidx * lit(64) + shiftright(bval, SimhashBandBits - 6)).cast("int")

  /** SimHash near-dup pairs within a blocking key: all (doc_a < doc_b)
    * in the same block within hamming distance `maxHamming` of each
    * other's 60-bit fingerprints — boilerplate-level near-dups
    * ([[minhashDedup]] catches content-overlap at lower similarity;
    * SimHash's ball is tighter and its per-doc state is ONE long,
    * which is why crawl-scale systems run it first). Blocked like
    * [[ngramJaccardPairs]]/[[ngramContainmentPairs]] (source/language
    * blocking is the standard candidate bound; NULL-block docs drop).
    * `maxHamming` must stay ≤ 3: that is the 4-band exactness bound —
    * above it banding would miss pairs.
    *
    * 100 TB posture: fingerprints are a zero-shuffle narrow pass
    * materialized once; candidates come from the per-block 4-band
    * bucket self-join (keyed on |blocks|·2²·2¹⁵ buckets), never
    * all-pairs; buckets over `maxBucketSize` drop BEFORE pairing (the
    * repo-wide skew cap — a dropped bucket's pairs can still surface
    * via their other 3 bands; the cap errs toward missing near-dups,
    * never false pairs, and the oracle replays it exactly);
    * verification is `bit_count(xor)` on the pair row — no text, no
    * signatures.
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, maxHamming: Int = 3,
      maxBucketSize: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming $maxHamming breaks the 4-band exactness bound (<= 3)")
    val fps = simhash60Blocked(df, idCol, textCol, blockCol).localCheckpoint()
    val capped = cappedBuckets(simhashBandRows(fps), maxBucketSize)
    val x = capped.select(col("blk"), col("bidx"), col("bval"),
      col("doc_id").as("doc_a"), col("simhash").as("fa"))
    val y = capped.select(col("blk"), col("bidx"), col("bval"),
      col("doc_id").as("doc_b"), col("simhash").as("fb"))
    pairTail(
      x.join(y, Seq("blk", "bidx", "bval"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("blk"), col("doc_a"), col("doc_b"), col("fa"), col("fb")),
      maxHamming)
  }

  private def cappedBuckets(bands: DataFrame, maxBucketSize: Int): DataFrame =
    bands
      .withColumn("bn", count(lit(1)).over(
        Window.partitionBy(col("blk"), col("bidx"), col("bval"))))
      .filter(col("bn") <= maxBucketSize)
      .drop("bn")

  /** Shared verify tail: distinct the multi-band candidates, compute
    * the hamming distance, threshold — both the in-session and indexed
    * paths end here, so their arithmetic cannot drift.
    */
  private def pairTail(cands: DataFrame, maxHamming: Int): DataFrame =
    cands.distinct()
      .withColumn("hamming",
        expr("bit_count(fa ^ fb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("blk"), col("doc_a"), col("doc_b"), col("hamming"))

  /** Materializes the SimHash band index as a WRITTEN, shard-pruned
    * layout — the fourth and last member of the incremental-dedup
    * family (exact q160, MinHash q159, containment q161): `bands/` =
    * (doc_id, blk, simhash, bidx, bval) PARTITIONED BY `pshard` =
    * (band, top-8-bits-of-value) — ≤1,024 directories. Both columns
    * are per-document facts, so the layout is append-stable; the
    * fingerprint rides inline, so the PROBE never touches text (the
    * verify is `bit_count` on stored longs — unlike MinHash, SimHash
    * needs no signature re-read).
    */
  def simhashWriteIndex(df: DataFrame, path: String,
      idCol: String, textCol: String, blockCol: String): Unit = {
    IndexPaths.clearPointer(df.sparkSession, path)
    writeSimhashGeneration(df, path, idCol, textCol, blockCol, "overwrite")
  }

  /** Appends a NEW-DOCUMENT snapshot's band rows — delta-sized, zero
    * base reads; the usual new-ids / exactly-once append contract (a
    * replayed append duplicates band rows, which the probe's distinct
    * masks for PAIRS but inflates bucket counts toward the cap).
    */
  def simhashAppendIndex(df: DataFrame, path: String,
      idCol: String, textCol: String, blockCol: String): Unit =
    writeSimhashGeneration(df, IndexPaths.resolve(df.sparkSession, path),
      idCol, textCol, blockCol, "append")

  private def writeSimhashGeneration(df: DataFrame, path: String,
      idCol: String, textCol: String, blockCol: String, mode: String): Unit =
    simhashBandRows(simhash60Blocked(df, idCol, textCol, blockCol))
      .withColumn("pshard", simhashShard(col("bidx"), col("bval")))
      .repartition(col("pshard"))
      .write.mode(mode).partitionBy("pshard").parquet(s"$path/bands")

  /** Incremental SimHash near-dup: every pair within the hamming ball
    * that has at least one endpoint in `deltaDocs`, served from a
    * [[simhashWriteIndex]] layout AFTER the snapshot was appended
    * (append-then-probe, the q159/q160/q161 shape — snapshot bands in
    * the index make snapshot×snapshot pairs fall out of the same
    * probe). The snapshot's ≤1,024 band shards prune the scan via
    * PartitionFilters; snapshot band rows broadcast into the probed
    * residue; bucket caps apply to the bucket's FULL post-append
    * membership (visible in the probed partitions), so capping equals
    * the fresh run's. Gated ≡ the fresh whole-corpus pairs restricted
    * to snapshot endpoints.
    */
  def simhashNearDupIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, deltaDocs: DataFrame, idCol: String, textCol: String,
      blockCol: String, maxHamming: Int = 3,
      maxBucketSize: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming $maxHamming breaks the 4-band exactness bound (<= 3)")
    val qb = simhashBandRows(
      simhash60Blocked(deltaDocs, idCol, textCol, blockCol)
        .localCheckpoint())
    val shards = qb
      .select(simhashShard(col("bidx"), col("bval")).as("pshard"))
      .distinct().collect().map(_.getInt(0))
    val probed = spark.read.parquet(s"${IndexPaths.resolve(spark, path)}/bands")
      .filter(col("pshard").isin(shards.toSeq: _*))
      .join(broadcast(
          qb.select(col("blk"), col("bidx"), col("bval")).distinct()),
        Seq("blk", "bidx", "bval"))
    val capped = cappedBuckets(probed.drop("pshard"), maxBucketSize)
    val cands = capped.join(
        broadcast(qb.select(col("blk"), col("bidx"), col("bval"),
          col("doc_id").as("q_id"), col("simhash").as("q_fp"))),
        Seq("blk", "bidx", "bval"))
      .filter(col("doc_id") =!= col("q_id"))
      .select(col("blk"),
        least(col("doc_id"), col("q_id")).as("doc_a"),
        greatest(col("doc_id"), col("q_id")).as("doc_b"),
        when(col("doc_id") < col("q_id"), col("simhash"))
          .otherwise(col("q_fp")).as("fa"),
        when(col("doc_id") < col("q_id"), col("q_fp"))
          .otherwise(col("simhash")).as("fb"))
    pairTail(cands, maxHamming)
  }

  /** Replay audit of a [[simhashWriteIndex]] band layout — the family
    * taxonomy on band rows: (doc_id, bidx) coordinates present more
    * than once; `n_payloads` = 1 means a replayed append (bit-identical
    * band rows — harmless to PAIRS, whose candidate tail distincts,
    * but it inflates raw bucket counts toward `maxBucketSize`, so a
    * doubled viral bucket can spuriously cross the cap and DROP true
    * pairs), > 1 means the same document was re-appended with
    * DIFFERENT content (payload divergence — a rebuild signal). One
    * narrow grouped scan of the compact band rows; never touches text.
    */
  def simhashAuditIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(s"${IndexPaths.resolve(spark, path)}/bands")
      .groupBy(col("doc_id"), col("bidx"))
      .agg(count(lit(1)).as("n_copies"),
        count_distinct(col("simhash")).as("n_payloads"))
      .filter(col("n_copies") > 1)

  /** Compacting repair of [[simhashAuditIndex]]-localized replay
    * damage — the band-index member of the repair family: replayed
    * appends land bit-identical (doc_id, blk, bidx, bval, simhash)
    * rows, removed exactly by a whole-row dedup rewrite; if
    * coordinates still collide after (payload divergence), compaction
    * REFUSES — silently picking a fingerprint would move
    * [[simhashNearDupIndexed]] pair/cap verdicts. Touches only the
    * ~40-byte band rows — no document text is ever re-read. Stage-
    * then-swap to a NEW path, the family's idiom.
    */
  def simhashCompactIndex(spark: org.apache.spark.sql.SparkSession,
      srcPath0: String, dstPath: String): Unit = {
    val srcPath = IndexPaths.resolve(spark, srcPath0)
    val rows = spark.read.parquet(s"$srcPath/bands")
      .select(col("doc_id"), col("blk"), col("bidx"), col("bval"),
        col("simhash"), col("pshard"))
      .dropDuplicates()
      .localCheckpoint()
    val divergent = rows.groupBy(col("doc_id"), col("bidx"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).collect()
    require(divergent.isEmpty, {
      val d = divergent.head
      s"simhashCompactIndex: doc ${d.get(0)} band ${d.get(1)} has " +
        "payload-divergent copies (same coordinate, different " +
        "fingerprint) — not append-replay damage; re-append the " +
        "document's true band rows and rebuild instead"
    })
    rows.repartition(col("pshard"))
      .write.mode("overwrite").partitionBy("pshard")
      .parquet(s"$dstPath/bands")
  }

  /** ONLINE repair: [[simhashCompactIndex]] into the next generation
    * under the same root + the atomic [[IndexPaths.compactSwap]]
    * pointer cutover. Returns the new generation dir.
    */
  def simhashCompactSwap(spark: org.apache.spark.sql.SparkSession,
      root: String): String =
    IndexPaths.compactSwap(spark, root)(simhashCompactIndex(spark, _, _))

  // ------------------------------------------------------------------
  // Blocked n-gram Jaccard (no LSH; exact within blocks)
  // ------------------------------------------------------------------

  /** All-pairs n-gram Jaccard within a blocking key (e.g. source or
    * language): exact near-dup detection when a cheap blocking column
    * bounds the candidate space. Requires `threshold > 0`.
    *
    * Implemented as an inverted-index join rather than a quadratic
    * all-pairs array_intersect: shingle hashes are exploded and documents
    * are paired per (block, shingle-hash), so the intersection size is a
    * co-occurrence COUNT aggregation. Work and shuffle volume scale with
    * the number of actually-shared shingles (≈ true near-dups), not with
    * |block|^2, and join parallelism is keyed on the full (block, hash)
    * space instead of the handful of block values.
    *
    * Bias note: "exact" holds only while no posting exceeds
    * `maxPostingSize`. A capped (dropped) shingle still counts in both
    * documents' sizes `na`/`nb` but can no longer contribute to the
    * intersection count, so once the cap fires the jaccard of surviving
    * pairs is UNDERestimated — the operator errs toward missing near-dups,
    * never toward false pairs. Raise `maxPostingSize` if recall near the
    * threshold matters more than bounding a corpus-wide boilerplate
    * shingle (the cap is a spillable window count — a skew guard, not a
    * memory ceiling).
    */
  /** Shared inverted-index core of [[ngramJaccardPairs]] /
    * [[ngramContainmentPairs]]: per block, every document pair sharing
    * at least one shingle, with set sizes and the intersection count —
    * (blk, doc_a, doc_b, na, nb, i).
    */
  private def ngramIntersections(
      df: DataFrame, idCol: String, textCol: String, blockCol: String,
      shingleN: Int, maxPostingSize: Int): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, shingleN, Some(blockCol))
    val hd = sets.select(col("blk"), col("doc_id"), col("n"),
        explode(col("hs")).as("h"))
      // NULL block = no block: never paired (the SQL-join semantics the
      // self-join formulation had; groupBy would pair NULLs together)
      .filter(col("blk").isNotNull)
    // ONE keyed pass per (blk, shingle) posting list, then bucket-local
    // pair explosion via the shared [[emitSortedPairs]] idiom — a
    // self-join of hd would re-run the whole shingle/hash pass per side
    // (Spark plans no ReusedExchange across the object barrier;
    // measured 2x at sf1) and shuffle the postings twice. Items are
    // (doc_id, n) structs; the helper's whole-struct `<` guard is
    // equivalent to the doc_id comparison (n is a function of doc_id).
    // dedupPairs stays FALSE: the pair multiplicity across postings IS
    // the intersection count the groupBy below aggregates.
    emitSortedPairs(hd, keys = Seq("blk", "h"),
      item = struct(col("doc_id"), col("n")), capCol = "posting_n",
      maxGroupSize = maxPostingSize, aName = "a", bName = "b",
      carry = Seq("blk"), dedupPairs = false)
      .groupBy(col("blk"), col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"), col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("i"))
  }

  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, blockCol: String,
      shingleN: Int = 3, threshold: Double = 0.5,
      maxPostingSize: Int = 10000): DataFrame = {
    require(threshold > 0,
      "inverted-index jaccard only surfaces pairs sharing >=1 shingle")
    ngramIntersections(df, idCol, textCol, blockCol, shingleN, maxPostingSize)
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("blk"), col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** CONTAINMENT pairs (Broder's asymmetric resemblance): per block,
    * pairs where either document's shingle set is mostly inside the
    * other's — `cont_ab = |A∩B|/|A|` (how much of A is contained in B)
    * and `cont_ba = |A∩B|/|B|`, kept when the larger direction clears
    * `threshold`. This is the semantic Jaccard structurally MISSES: a
    * quote, a boilerplate wrapper, or a near-superset page contains a
    * smaller document almost entirely while the union stays large, so
    * jaccard ≈ |A|/|B| stays low however perfect the containment. The
    * training-data job is catching partial copies — a doc embedding an
    * eval item, a page wrapping a licensed text — that survive both
    * MinHash and whole-set Jaccard gates.
    *
    * Same 100 TB shape as [[ngramJaccardPairs]] (shared core): one
    * keyed posting pass, capped lists, bucket-local pair emission —
    * the direction arithmetic is free once `i/na/nb` exist.
    */
  def ngramContainmentPairs(
      df: DataFrame, idCol: String, textCol: String, blockCol: String,
      shingleN: Int = 3, threshold: Double = 0.5,
      maxPostingSize: Int = 10000): DataFrame = {
    require(threshold > 0,
      "inverted-index containment only surfaces pairs sharing >=1 shingle")
    ngramIntersections(df, idCol, textCol, blockCol, shingleN, maxPostingSize)
      .withColumn("cont_ab", round(col("i").cast("double") / col("na"), 6))
      .withColumn("cont_ba", round(col("i").cast("double") / col("nb"), 6))
      .filter(greatest(col("cont_ab"), col("cont_ba")) >= threshold)
      .select(col("blk"), col("doc_a"), col("doc_b"),
        col("cont_ab"), col("cont_ba"))
  }

  // ------------------------------------------------------------------
  // Written n-gram postings index: the inverted-index family's day-2
  // ------------------------------------------------------------------

  /** Materializes the blocked n-gram inverted index as a WRITTEN
    * layout — the third leg of the incremental-dedup family (exact =
    * [[exactWriteIndex]], MinHash = [[minhashWriteIndex]]): one
    * posting row per (blk, doc, shingle-hash), PARTITIONED BY
    * `shard = h mod 256` (the shingle hash is already uniform — it is
    * its own shard key), with the document's distinct-shingle count
    * `n` denormalized inline (a per-document fact, append-stable —
    * the same tf/dl argument as the BM25 layout). NULL-block rows are
    * excluded at write time, mirroring the in-session path's
    * never-paired semantics.
    */
  def ngramWriteIndex(df: DataFrame, path: String,
      idCol: String, textCol: String, blockCol: String,
      shingleN: Int = 3): Unit =
    writeNgramGeneration(df, path, idCol, textCol, blockCol, shingleN,
      "overwrite")

  /** Appends a NEW-DOCUMENT snapshot's postings — delta-sized, zero
    * base reads; the standard new-ids / exactly-once append contract
    * (a replayed append would double pair multiplicities, i.e.
    * intersection counts).
    */
  def ngramAppendIndex(df: DataFrame, path: String,
      idCol: String, textCol: String, blockCol: String,
      shingleN: Int = 3): Unit =
    writeNgramGeneration(df, path, idCol, textCol, blockCol, shingleN,
      "append")

  private def writeNgramGeneration(df: DataFrame, path: String,
      idCol: String, textCol: String, blockCol: String, shingleN: Int,
      mode: String): Unit =
    shingleSets(df, idCol, textCol, shingleN, Some(blockCol))
      .filter(col("blk").isNotNull)
      .select(col("blk"), col("doc_id"), col("n"),
        explode(col("hs")).as("h"))
      .withColumn("shard", pmod(col("h"), lit(256)).cast("int"))
      .repartition(col("shard"))
      .write.mode(mode).partitionBy("shard").parquet(s"$path/postings")

  /** Replay audit of an [[ngramWriteIndex]] layout: duplicate
    * (blk, doc_id, h) posting rows — a replayed append would DOUBLE
    * pair multiplicities (intersection counts), turning every
    * affected containment/jaccard value wrong rather than merely
    * dropped. One narrow grouped scan of `postings/`.
    */
  def ngramAuditIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(s"$path/postings")
      .groupBy(col("blk"), col("doc_id"), col("h"))
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** Shared incremental core: intersections of every pair with at
    * least one snapshot endpoint, from a [[ngramWriteIndex]] layout
    * that already contains the snapshot — (blk, doc_a, doc_b, na, nb,
    * i), exactly [[ngramIntersections]] restricted. Completeness
    * argument: every SHARED shingle of a snapshot-endpoint pair is by
    * definition one of the snapshot document's shingles, so the
    * probed shards (the snapshot's shingle-hash shards, a collect
    * bounded by the 256-value alphabet) cover every intersecting
    * posting, and each probed shard holds its ENTIRE posting lists —
    * same cap accounting, same multiplicity counts as the fresh run.
    */
  private def ngramIntersectionsIndexed(
      spark: org.apache.spark.sql.SparkSession, path: String,
      deltaDocs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, maxPostingSize: Int): DataFrame = {
    // delta shingle-hash set, materialized once: feeds the bounded
    // shard collect AND the (h) semi prune below
    val qhs = shingleSets(deltaDocs, idCol, textCol, shingleN)
      .select(explode(col("hs")).as("h"))
      .distinct().localCheckpoint()
    val shards = qhs
      .select(pmod(col("h"), lit(256)).cast("int").as("shard"))
      .distinct().collect().map(_.getInt(0))
    val probe = spark.read.parquet(s"$path/postings")
      .filter(col("shard").isin(shards.toSeq: _*))
      // the PRUNED-REGIME semi (r21 — the q219 argument on the ngram
      // member, h-only because the caller carries no block column:
      // every shared shingle of a snapshot-endpoint pair is one the
      // snapshot document itself posts; a coincidental same-h group in
      // ANOTHER block survives the prune but contains no delta doc, so
      // the endpoint filter below drops its pairs — kept groups retain
      // FULL membership, so cap accounting matches the fresh run)
      .join(Parallelism.boundedBroadcast(qhs), Seq("h"), "leftsemi")
    // EARLY endpoint filter — same as [[winnowPairsIndexed]]: don't
    // emit or aggregate (base, base) pairs the final filter discards
    val deltaIds = deltaDocs.select(col(idCol).cast("long").as("doc_id"))
      .distinct().localCheckpoint()
    val flagged = probe
      .join(broadcast(deltaIds.withColumn("__delta", lit(true))),
        Seq("doc_id"), "left")
      .withColumn("__delta", coalesce(col("__delta"), lit(false)))
    val pairs = emitSortedPairs(flagged, keys = Seq("blk", "h"),
      item = struct(col("doc_id"), col("n"), col("__delta")),
      capCol = "posting_n",
      maxGroupSize = maxPostingSize, aName = "a", bName = "b",
      carry = Seq("blk"), dedupPairs = false)
      .filter(col("a.__delta") || col("b.__delta"))
      .groupBy(col("blk"), col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"), col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("i"))
    val fa = deltaIds.select(col("doc_id").as("doc_a"))
      .withColumn("fa", lit(1))
    val fb = deltaIds.select(col("doc_id").as("doc_b"))
      .withColumn("fb", lit(1))
    pairs
      .join(broadcast(fa), Seq("doc_a"), "left")
      .join(broadcast(fb), Seq("doc_b"), "left")
      .filter(col("fa").isNotNull || col("fb").isNotNull)
      .select(col("blk"), col("doc_a"), col("doc_b"),
        col("na"), col("nb"), col("i"))
  }

  /** Incremental [[ngramContainmentPairs]] of a new snapshot against
    * (base ∪ snapshot) — q161 gates equality with the fresh
    * whole-corpus run restricted to snapshot-endpoint pairs. Same
    * direction arithmetic off the shared indexed core.
    */
  def ngramContainmentPairsIndexed(
      spark: org.apache.spark.sql.SparkSession, path: String,
      deltaDocs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5,
      maxPostingSize: Int = 10000): DataFrame = {
    require(threshold > 0,
      "inverted-index containment only surfaces pairs sharing >=1 shingle")
    ngramIntersectionsIndexed(spark, path, deltaDocs, idCol, textCol,
        shingleN, maxPostingSize)
      .withColumn("cont_ab", round(col("i").cast("double") / col("na"), 6))
      .withColumn("cont_ba", round(col("i").cast("double") / col("nb"), 6))
      .filter(greatest(col("cont_ab"), col("cont_ba")) >= threshold)
      .select(col("blk"), col("doc_a"), col("doc_b"),
        col("cont_ab"), col("cont_ba"))
  }

  /** Incremental [[ngramJaccardPairs]] off the same indexed core. */
  def ngramJaccardPairsIndexed(
      spark: org.apache.spark.sql.SparkSession, path: String,
      deltaDocs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5,
      maxPostingSize: Int = 10000): DataFrame = {
    require(threshold > 0,
      "inverted-index jaccard only surfaces pairs sharing >=1 shingle")
    ngramIntersectionsIndexed(spark, path, deltaDocs, idCol, textCol,
        shingleN, maxPostingSize)
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("blk"), col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // ------------------------------------------------------------------
  // Connected components over duplicate pairs
  // ------------------------------------------------------------------

  /** Components of the duplicate-pair graph (SURVEY.md §7 step 9:
    * "MinHashLSH + connected components via iterative joins"): each
    * vertex gets the MIN vertex id of its component — the canonical
    * "keep one doc per near-dup cluster" step after [[minhashDedup]].
    *
    * Pregel-style min-label propagation as a driver-side loop of
    * join + min-aggregate rounds (the documented batch-iteration shape,
    * SURVEY §2.10): every round each vertex takes the min of its own
    * and its neighbors' labels; converges in O(component diameter)
    * rounds. Near-dup components are small and dense, so diameters stay
    * tiny at any scale; every round is one keyed shuffle, and
    * `localCheckpoint` truncates the growing lineage. Fails loudly if
    * `maxIter` rounds don't converge rather than returning wrong labels.
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("v")).distinct()
      .withColumn("component", col("v"))
      .localCheckpoint()
    // labels only ever DECREASE, so sum(component) strictly decreases
    // until the fixpoint — one cheap aggregate per round detects
    // convergence without a second join over both label sets
    def labelSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("component")).head().getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaNeighbor = edges
        .join(labels, edges("dst") === labels("v"))
        .select(edges("src").as("v"), col("component"))
      val next = labels.select(col("v"), col("component")).union(viaNeighbor)
        .groupBy("v").agg(min("component").as("component"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    require(converged, s"connectedComponents: no fixpoint in $maxIter rounds")
    labels.select(col("v"), col("component"))
  }

  // ------------------------------------------------------------------
  // Block-level exact dedup with document reassembly
  // ------------------------------------------------------------------

  /** Sub-document exact dedup: split each document into fixed
    * `blockTokens`-token blocks, keep each distinct block's globally
    * FIRST occurrence (lexicographic (doc_id, block_idx)), and
    * reassemble every document from its surviving blocks — the
    * paragraph/span-level dedup pass of training-data pipelines
    * (public semantics: Lee et al. '21, "Deduplicating Training Data
    * Makes Language Models Better" — their exact-substring dedup at a
    * fixed-block granularity; on corpora with natural structure the
    * splitter would be `\n\n`, here deterministic token offsets since
    * the fixture corpus is single-line).
    *
    * Emits (doc_id, n_blocks, n_kept, text_deduped), one row per input
    * document; `text_deduped` is '' when every block was seen earlier.
    *
    * Scale shape: two shuffles total — (1) blocks keyed by md5
    * fingerprint for the keep-first window, (2) survivors keyed by
    * doc_id for reassembly. Blocks are disjoint spans, so each shuffle
    * moves ~corpus bytes once, never a cross product. A viral
    * boilerplate block concentrates its occurrences in one fingerprint
    * group; the window's per-group work is a spillable O(n log n) sort
    * (not O(n^2)), so skew degrades locally instead of failing. The
    * reference itself has no sub-document dedup (SURVEY.md §2.6 stops
    * at row-level ROW_NUMBER dedup); this is training-pipeline
    * superset territory like the minhash family above.
    */
  def blockDedup(df: DataFrame, idCol: String, textCol: String,
      blockTokens: Int): DataFrame = {
    require(blockTokens > 0, "blockTokens must be positive")
    // global keep-first over the 128-bit fingerprint: only the compact
    // (doc_id, block_idx) pair decides the winner, deterministically
    val w = Window.partitionBy(md5(col("block")))
      .orderBy(col("doc_id"), col("block_idx"))
    blockRollup(docBlocks(df, idCol, textCol, blockTokens)
      .withColumn("__keep", row_number().over(w) === 1))
  }

  /** The fixed-size token blocks of every document: (doc_id,
    * block_idx, block) — [[blockDedup]]'s explode, shared with the
    * written-index path.
    */
  private def docBlocks(df: DataFrame, idCol: String, textCol: String,
      blockTokens: Int): DataFrame =
    // NO fan-out here: PlanSpec pins q123 at ≤3 keyed shuffles and the
    // sf0.1 A/B measured noise-level difference; at production scale
    // the scan is wide and a fan-out would be a no-op anyway
    df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .withColumn("__start",
        explode(sequence(lit(1), greatest(size(col("__toks")), lit(1)),
          lit(blockTokens))))
      .withColumn("block_idx",
        expr(s"CAST((__start - 1) div $blockTokens AS BIGINT)"))
      .withColumn("block",
        concat_ws(" ", slice(col("__toks"), col("__start"), lit(blockTokens))))
      .select(col("doc_id"), col("block_idx"), col("block"))

  /** Per-document rollup of a (doc_id, block_idx, block, __keep)
    * frame: counts + the reassembled surviving text — shared by
    * [[blockDedup]] and [[blockDedupIndexed]] so the output contract
    * cannot drift.
    */
  private def blockRollup(flagged: DataFrame): DataFrame =
    flagged
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("__keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        // collect_list drops the nulls from non-kept rows; sort_array on
        // array<struct> orders by the leading block_idx field, restoring
        // document order regardless of partitioning
        array_join(
          transform(
            sort_array(collect_list(
              when(col("__keep"), struct(col("block_idx"), col("block"))))),
            s => s.getField("block")),
          " ").as("text_deduped"))

  /** Materializes the block-fingerprint index as a WRITTEN,
    * shard-pruned layout — the SUB-DOCUMENT member of the
    * incremental-dedup family (whole-document: exact q160, MinHash
    * q159, containment q161, SimHash q168): `blocks/` = (doc_id,
    * block_idx, fingerprint) PARTITIONED BY the fingerprint's first
    * 2 hex chars. The block TEXT stays OUT of the index — keep-first
    * only needs the winner's coordinates, so the layout is
    * md5-per-block sized whatever the corpus, and both columns are
    * per-document facts (append-stable).
    */
  def blockWriteIndex(df: DataFrame, path: String, idCol: String,
      textCol: String, blockTokens: Int): Unit =
    writeBlockGeneration(df, path, idCol, textCol, blockTokens, "overwrite")

  /** Appends a NEW-DOCUMENT snapshot's block fingerprints —
    * delta-sized, zero base reads; the usual new-ids / exactly-once
    * append contract.
    */
  def blockAppendIndex(df: DataFrame, path: String, idCol: String,
      textCol: String, blockTokens: Int): Unit =
    writeBlockGeneration(df, path, idCol, textCol, blockTokens, "append")

  private def writeBlockGeneration(df: DataFrame, path: String,
      idCol: String, textCol: String, blockTokens: Int,
      mode: String): Unit =
    docBlocks(df, idCol, textCol, blockTokens)
      .select(col("doc_id"), col("block_idx"),
        md5(col("block")).as("fingerprint"))
      .withColumn("shard", substring(col("fingerprint"), 1, 2))
      .repartition(col("shard"))
      .write.mode(mode).partitionBy("shard").parquet(s"$path/blocks")

  /** Incremental block-level exact dedup: [[blockDedup]]'s outputs
    * for a new snapshot, computed against a [[blockWriteIndex]]
    * layout AFTER the snapshot was appended — "has this paragraph
    * appeared anywhere in the corpus history" as a standing day-2
    * operation (the Lee et al. exact-substring shape a crawl
    * pipeline actually runs per snapshot: new boilerplate dedups
    * against every previous generation without re-reading any text).
    * A snapshot block survives iff its (doc_id, block_idx) is the
    * GLOBAL minimum for its fingerprint across base ∪ snapshot —
    * exactly the fresh q123 rule restricted to snapshot documents.
    *
    * 100 TB posture: the probe prunes to the snapshot's fingerprint
    * shards (≤256 by construction), semi-joins the broadcast
    * snapshot fingerprints, and aggregates winners per fingerprint
    * (min over the compact coordinate pair) — the index's text-free
    * rows are all that is read; reassembly uses the snapshot's own
    * blocks already in hand.
    */
  def blockDedupIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, deltaDocs: DataFrame, idCol: String,
      textCol: String, blockTokens: Int): DataFrame = {
    val blocks = docBlocks(deltaDocs, idCol, textCol, blockTokens)
      .withColumn("fingerprint", md5(col("block")))
      .localCheckpoint()
    val shards = blocks
      .select(substring(col("fingerprint"), 1, 2).as("shard"))
      .distinct().collect().map(_.getString(0))
    val mins = spark.read.parquet(s"$path/blocks")
      .filter(col("shard").isin(shards.toSeq: _*))
      .join(broadcast(blocks.select(col("fingerprint")).distinct()),
        Seq("fingerprint"), "leftsemi")
      .groupBy(col("fingerprint"))
      .agg(min(struct(col("doc_id"), col("block_idx"))).as("m"))
    blockRollup(blocks.join(mins, Seq("fingerprint"))
      .withColumn("__keep",
        col("doc_id") === col("m.doc_id") &&
          col("block_idx") === col("m.block_idx")))
  }

  /** Near-dup cluster collapse, the step AFTER [[connectedComponents]]:
    * label every document with its cluster (its component, or itself if
    * it never appeared in a duplicate pair) and keep exactly one
    * representative per cluster — the highest-`qualityCol` member, ties
    * to the smallest id. Emits (doc_id, cluster, kept) for every input
    * document, so callers can either filter `kept` or audit the drop
    * set.
    *
    * Scale shape: the component labels cover only documents that
    * appeared in a pair (the duplicate minority), joined back to the
    * corpus on its id — an equi-join AQE can broadcast when the dup
    * fraction is small. The representative choice is one window over
    * `cluster`; near-dup clusters are small, so no group outgrows a
    * partition.
    */
  def clusterRepresentatives(docs: DataFrame, pairs: DataFrame,
      idCol: String, qualityCol: String): DataFrame = {
    val comps = connectedComponents(pairs, "doc_a", "doc_b")
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("__q").desc, col("doc_id"))
    docs.select(col(idCol).as("doc_id"), col(qualityCol).as("__q"))
      .join(comps, col("doc_id") === col("v"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .withColumn("kept", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster"), col("kept"))
  }

  // ------------------------------------------------------------------
  // Winnowing pair family: PAIRS from the q108 fingerprints, plus the
  // written postings index — the 7th incremental-dedup member
  // ------------------------------------------------------------------

  /** Per-document winnowing fingerprint sets (blk, doc_id, hs, n) via
    * the native `winnow_fp` expression over the normalized,
    * space-stripped text — one codegen'd projection, no shuffle. The
    * set is sorted-distinct by the expression's contract, so `n` is
    * the distinct-fingerprint count and posting multiplicities below
    * equal set-intersection sizes.
    */
  private def winnowSets(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, k: Int, w: Int): DataFrame =
    // fan out before the per-char winnow_fp pass (guide §2.5): the scan
    // stage is sized by input bytes, the hashing by chars × k
    Parallelism.fanOut(
        df.select(col(blockCol).cast("string").as("blk"),
          col(idCol).cast("long").as("doc_id"),
          col(textCol).cast("string").as("__t")), "doc_id")
      .select(col("blk"), col("doc_id"),
        regexp_replace(TextOps.normalize(col("__t")), " ", "").as("norm"))
      .withColumn("hs", expr(s"winnow_fp(norm, $k, $w)"))
      .select(col("blk"), col("doc_id"), col("hs"),
        size(col("hs")).cast("long").as("n"))

  /** Winnowing near-dup PAIRS (the pair layer q108's per-doc
    * fingerprints lacked): per block, documents sharing at least
    * `minShared` winnowing fingerprints — by the winnowing guarantee,
    * each shared fingerprint witnesses a shared substring of length
    * ≥ w + k − 1, so this is the LOCAL-overlap gate (plagiarism-style
    * partial copies) that global Jaccard and MinHash structurally
    * miss. `minShared` ≥ 2 by default: one shared fingerprint can be a
    * polynomial-hash collision; two independent witnesses make the
    * pair real. Output (blk, doc_a, doc_b, na, nb, i) — all exact
    * integers.
    *
    * Same 100 TB shape as [[ngramJaccardPairs]]: one keyed posting
    * pass, capped lists (a boilerplate fingerprint shared by a viral
    * block would otherwise go quadratic — the LSH-cap trade), bucket-
    * local pair emission via [[emitSortedPairs]], source-blocked per
    * the q33/q153/q167 precedent.
    */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, k: Int = 7, w: Int = 4, minShared: Long = 2L,
      maxPostingSize: Int = 10000): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val hd = winnowSets(df, idCol, textCol, blockCol, k, w)
      .filter(col("blk").isNotNull)
      .select(col("blk"), col("doc_id"), col("n"),
        explode(col("hs")).as("h"))
    emitSortedPairs(hd, keys = Seq("blk", "h"),
      item = struct(col("doc_id"), col("n")), capCol = "posting_n",
      maxGroupSize = maxPostingSize, aName = "a", bName = "b",
      carry = Seq("blk"), dedupPairs = false)
      .groupBy(col("blk"), col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"), col("a.n").as("na"),
        col("b.n").as("nb"))
      .agg(count(lit(1)).as("i"))
      .filter(col("i") >= minShared)
      .select(col("blk"), col("doc_a"), col("doc_b"),
        col("na"), col("nb"), col("i"))
  }

  /** Materializes the winnowing postings as a WRITTEN layout — one row
    * per (blk, doc, fingerprint), PARTITIONED BY `shard = h mod 256`
    * (the fingerprint hash is uniform — its own shard key), the
    * distinct-fingerprint count `n` denormalized inline (a per-document
    * fact, append-stable). NULL-block rows excluded at write time —
    * the in-session never-paired semantics.
    */
  def winnowWriteIndex(df: DataFrame, path: String, idCol: String,
      textCol: String, blockCol: String, k: Int = 7, w: Int = 4): Unit =
    writeWinnowGeneration(df, path, idCol, textCol, blockCol, k, w,
      "overwrite")

  /** Appends a NEW-DOCUMENT snapshot's postings — delta-sized, zero
    * base reads; the standard new-ids / exactly-once append contract
    * (a replayed append doubles pair multiplicities = intersection
    * counts; [[winnowAuditIndex]] localizes that damage).
    */
  def winnowAppendIndex(df: DataFrame, path: String, idCol: String,
      textCol: String, blockCol: String, k: Int = 7, w: Int = 4): Unit =
    writeWinnowGeneration(df, path, idCol, textCol, blockCol, k, w,
      "append")

  private def writeWinnowGeneration(df: DataFrame, path: String,
      idCol: String, textCol: String, blockCol: String, k: Int, w: Int,
      mode: String): Unit =
    winnowSets(df, idCol, textCol, blockCol, k, w)
      .filter(col("blk").isNotNull)
      .select(col("blk"), col("doc_id"), col("n"),
        explode(col("hs")).as("h"))
      .withColumn("shard", pmod(col("h"), lit(256)).cast("int"))
      .repartition(col("shard"))
      // h-clustered files (guide §6): the partitioned writer sorts by
      // the partition column anyway, so (shard, h) costs ~nothing and
      // makes h delta-encoding-friendly — smaller files, cheaper probes
      .sortWithinPartitions(col("shard"), col("h"))
      .write.mode(mode).partitionBy("shard").parquet(s"$path/postings")

  /** Replay audit of a [[winnowWriteIndex]] layout: duplicate
    * (blk, doc_id, h) posting rows. One narrow grouped scan.
    */
  def winnowAuditIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(s"$path/postings")
      .groupBy(col("blk"), col("doc_id"), col("h"))
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** Incremental [[winnowPairs]] of a new snapshot against
    * (base ∪ snapshot), from a written layout that already holds the
    * snapshot's postings. Completeness: every SHARED fingerprint of a
    * snapshot-endpoint pair is one of the snapshot document's
    * fingerprints, so the probed shards (the snapshot's fingerprint
    * shards — a collect bounded by the 256-value shard alphabet) cover
    * every intersecting posting, and each probed shard holds its
    * ENTIRE posting lists — same cap accounting, same multiplicities
    * as the fresh run. q190 gates equality with the fresh q189 replay
    * restricted to snapshot-endpoint pairs.
    */
  def winnowPairsIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, deltaDocs: DataFrame, idCol: String, textCol: String,
      blockCol: String, k: Int = 7, w: Int = 4, minShared: Long = 2L,
      maxPostingSize: Int = 10000): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    // one delta-sized fingerprint pass, materialized: it feeds the
    // driver's shard collect AND the (blk, h) semi prune below
    val qfps = winnowSets(deltaDocs, idCol, textCol, blockCol, k, w)
      .select(col("blk"), explode(col("hs")).as("h"))
      .distinct().localCheckpoint()
    val shards = qfps
      .select(pmod(col("h"), lit(256)).cast("int").as("shard"))
      .distinct().collect().map(_.getInt(0))
    val probe = spark.read.parquet(s"$path/postings")
      .filter(col("shard").isin(shards.toSeq: _*))
      // the PRUNED-REGIME join: keep only posting groups whose (blk, h)
      // is one of the delta's own fingerprints. EXACT by the same
      // argument as the shard pruning one level up — every shared
      // fingerprint of a delta-endpoint pair is a fingerprint the delta
      // document itself posts — and kept groups retain their FULL
      // membership, so the posting cap fires exactly as in the fresh
      // run. Cost: pair emission drops from the touched shards' entire
      // content (corpus/256 per shard — the q190 quarter-corpus
      // worst case) to the matched posting lists only. For a BOUNDED
      // delta the semi side broadcasts EXPLICITLY (guide §3.1: size
      // estimates for checkpointed frames are unreliable, and waiting
      // for AQE to convert still map-writes the corpus-sized probe
      // side to shuffle disk first) so the probe stays shuffle-free by
      // construction; above the bound it degrades to the planner's
      // choice — the 100 TB posture where the delta itself is huge.
      .join(Parallelism.boundedBroadcast(qfps), Seq("blk", "h"), "leftsemi")
    // EARLY endpoint filter (r21, guide §2.3 "aggregate before you
    // shuffle" inverted: don't shuffle what the endpoint filter will
    // discard): matched posting lists still contain base docs, and a
    // base-base pair — both endpoints outside the delta — is discarded
    // by the final endpoint filter no matter its multiplicity, yet the
    // old plan emitted and AGGREGATED it (measured at sf1: 104.9M raw
    // pairs into the groupBy, 124.8k rows out — 52 s in the pair agg
    // alone). Riding a broadcast __delta flag on each posting row and
    // filtering (a.__delta OR b.__delta) AT EMISSION — the same stage,
    // before the pair exchange — keeps exactly the pairs the final
    // filter keeps, with identical multiplicity: per (blk, h) group
    // membership, order (doc_id is unique per group, so the extra
    // struct field never reorders), and the cap count are all
    // unchanged; only already-doomed (base, base) rows skip the wire.
    val deltaIds = deltaDocs.select(col(idCol).cast("long").as("doc_id"))
      .distinct().localCheckpoint()
    val flagged = probe
      .join(broadcast(deltaIds.withColumn("__delta", lit(true))),
        Seq("doc_id"), "left")
      .withColumn("__delta", coalesce(col("__delta"), lit(false)))
    val pairs = emitSortedPairs(flagged, keys = Seq("blk", "h"),
      item = struct(col("doc_id"), col("n"), col("__delta")),
      capCol = "posting_n",
      maxGroupSize = maxPostingSize, aName = "a", bName = "b",
      carry = Seq("blk"), dedupPairs = false)
      .filter(col("a.__delta") || col("b.__delta"))
      .groupBy(col("blk"), col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"), col("a.n").as("na"),
        col("b.n").as("nb"))
      .agg(count(lit(1)).as("i"))
      .filter(col("i") >= minShared)
    val fa = deltaIds.select(col("doc_id").as("doc_a"))
      .withColumn("fa", lit(1))
    val fb = deltaIds.select(col("doc_id").as("doc_b"))
      .withColumn("fb", lit(1))
    pairs
      .join(broadcast(fa), Seq("doc_a"), "left")
      .join(broadcast(fb), Seq("doc_b"), "left")
      .filter(col("fa").isNotNull || col("fb").isNotNull)
      .select(col("blk"), col("doc_a"), col("doc_b"),
        col("na"), col("nb"), col("i"))
  }
}
