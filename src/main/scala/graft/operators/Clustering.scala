package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column, and the
  * SemDeDup-style semantic dedup that composes on top of it.
  *
  * The reference's ML story lives outside the 1.11 core (FLIP-39 moved
  * flink-ml out of tree), but clustering is the missing trainer behind
  * the IVF index this repo already ships ([[Similarity.ivfAssign]]
  * consumes centroids from *somewhere*) and behind semantic dedup of a
  * training corpus (SemDeDup: cluster embeddings, drop near-identical
  * members within each cluster). Both are expressed as plain Spark
  * plans — no MLlib, no RDDs.
  *
  * Cross-engine determinism (the hard part): a centroid mean is a sum
  * of doubles, and float sums are order-dependent, so a naive
  * `avg(component)` differs run-to-run AND engine-to-engine; casting
  * the mean to DECIMAL doesn't help because Spark rounds double→decimal
  * HALF_UP while DuckDB rounds half-to-EVEN (measured on 2^-19, which
  * sits exactly on a decimal tie). Instead each component is quantized
  * FIRST — `floor(x·10⁶)` has no ties and the multiply is IEEE-identical
  * everywhere — and the quantized longs sum exactly in any order; the
  * new centroid component is `floor(sum/count)/10⁶`, bit-identical on
  * both engines. Assignment distances are then doubles computed from
  * bit-identical centroids with the left-to-right codegen
  * [[graft.functions.DotProduct]], so argmin (tie-broken on centroid
  * id) matches exactly.
  *
  * 100 TB posture: one corpus pass per Lloyd iteration, which is the
  * algorithm's lower bound. Per pass: the K-row centroid frame is
  * collected and embedded as plan literals (bounded by
  * [[Similarity.MaxLiteralCentroids]] — the same "broadcast-class
  * dimension" contract, made loud), the argmin is a PURE NARROW
  * projection on the scan (zero shuffle — the earlier window-over-id
  * form exchanged K×corpus rows per iteration; PlanSpec pins the
  * exchange's absence), and the centroid update partial-aggregates
  * (cid, pos) before its shuffle — the only corpus-wide exchange, and
  * it carries K·dim rows per partition, not the corpus. The tiny
  * centroid frame is localCheckpoint'ed each round so the next round's
  * collect and the caller's centroid join both reuse the materialized
  * K rows instead of replaying the corpus pass. At >2^53 scaled
  * component-sums the fixed-point mean would lose exactness (harmless
  * semantically; the oracle contract only binds at test scale).
  */
object Clustering {

  /** Fixed-point scale for centroid quantization: 6 decimal digits,
    * matching the repo-wide `round(_, 6)` output convention.
    */
  private val Scale = 1000000.0

  private def asD(c: Column): Column = c.cast("array<double>")

  /** Nearest-centroid assignment under squared L2 distance
    * (`|x|² - 2x·c + |c|²`), tie-broken on centroid id. ZERO-shuffle:
    * the centroid frame (small by contract, guarded by
    * [[Similarity.MaxLiteralCentroids]]) is collected and embedded as
    * literal arguments of the native `vec_nearest` expression
    * ([[Similarity.nearestCentroids]]), whose per-row primitive loop
    * accumulates each term ascending-index — the identical IEEE
    * sequence and Double.compare/cid tie-break of the former
    * `row_number over (order by d2, cid)` window and the r7
    * `array_min(transform(…))` fold, so assignments and d2 values are
    * bit-identical (the HOF fold evaluated its lambda interpreted per
    * (row × centroid) and went super-linear once K scaled with the
    * corpus). The former window formulation forced an
    * `Exchange hashpartitioning(vec_id)` of K×corpus rows once per
    * Lloyd iteration; this form is a pure narrow projection — the
    * corpus genuinely never shuffles here.
    * Output: (idCol, v: array&lt;double&gt;, cid, d2).
    *
    * CONTRACT (differs from the pre-r7 broadcast-join form in two loud
    * ways): the output `cid` column is always LONG — the centroid id is
    * cast to long for the literal fold, so an int/string cid column
    * does not propagate its type; and the centroid set must be
    * NON-EMPTY — an empty frame throws (the old cross-join form
    * returned an empty result, silently dropping the whole corpus).
    */
  def assignL2(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = Similarity.collectCentroids(centroids, "cid", "centroid")
    require(cents.nonEmpty, "assignL2: empty centroid set")
    corpus
      .select(col(idCol), asD(col(vecCol)).as("v"))
      .withColumn("__best",
        Similarity.nearestCentroids(col("v"), cents, 1, "l2"))
      .select(col(idCol), col("v"),
        element_at(col("__best"), 1).getField("cid").as("cid"),
        element_at(col("__best"), 1).getField("score").as("d2"))
  }

  /** Fixed-point centroid update from an [[assignL2]] output: per
    * (cid, pos) the quantized components sum exactly as longs (any
    * order), then `floor(sum/count)/10⁶` rebuilds the component and the
    * pos-sorted collect rebuilds the array. Clusters that lost all
    * members simply drop out (both engines agree, since assignments
    * are bit-identical).
    */
  def quantizedCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("pos", "comp")))
      .withColumn("f", floor(col("comp") * lit(Scale)))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("f")).as("s"), count(lit(1)).as("n"))
      .withColumn("cf", floor(col("s") / col("n")))
      .groupBy(col("cid"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("cf")))),
        x => x.getField("cf") / lit(Scale)).as("centroid"))

  /** `iters` Lloyd rounds from `init` (cid, centroid); returns the
    * final centroids. Each round's K-row centroid frame is eagerly
    * localCheckpoint'ed so the lineage (and hence plan depth) stays
    * constant across iterations. NOTE: every iteration pays ONE driver
    * sync — [[assignL2]] collects the K-row centroid frame to embed it
    * as plan literals — so total driver round-trips scale as the
    * iteration count (K rows each, bounded by
    * [[Similarity.MaxLiteralCentroids]]): negligible per round, but a
    * 100-iteration trainer should budget 100 collect+job cycles, not
    * one.
    */
  def lloydCentroids(corpus: DataFrame, init: DataFrame, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    var cent = init.select(col("cid"), asD(col("centroid")).as("centroid"))
    for (_ <- 1 to iters)
      cent = quantizedCentroids(assignL2(corpus, cent, idCol, vecCol))
        .localCheckpoint(true)
    cent
  }

  /** k-means end-to-end: `iters` Lloyd rounds then the final
    * assignment. Output: (idCol, v, cid, d2).
    */
  def kmeansAssign(corpus: DataFrame, init: DataFrame, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assignL2(corpus, lloydCentroids(corpus, init, iters, idCol, vecCol),
      idCol, vecCol)

  /** SemDeDup (Abbas et al. 2023, public): cluster the corpus, then
    * within each cluster drop every vector that has a near-identical
    * (cosine ≥ `threshold`) neighbor with a smaller id — the
    * keep-lowest-id rule makes the prune deterministic without a
    * second distance pass. The within-cluster pair scan reuses
    * [[Similarity.cosineNearDupPairs]] (capped, block-local), so the
    * quadratic is bounded per cluster exactly as in the LSH paths.
    * Output: one row per vector — (cid, idCol, kept).
    *
    * CAP SEMANTICS (loud, not silent): a cluster larger than
    * `maxClusterSize` contributes NO pairs — every one of its members
    * comes back `kept = true`, un-deduped. That is the deliberate
    * recall-for-boundedness trade of all the capped candidate
    * generators here, but for SemDeDup the over-cap clusters are
    * exactly the most duplicate-prone ones, so size `maxClusterSize`
    * to your K/corpus ratio (E[cluster] = N/K; the cap should be a
    * skew guard, several× that, not below it). The q129 oracle mirrors
    * the cap, so an over-cap cluster at a bigger fixture shows up as
    * matching kept=true rows on both engines, never silent divergence.
    */
  def semDedup(corpus: DataFrame, init: DataFrame, iters: Int,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding", maxClusterSize: Int = 10000): DataFrame = {
    val assigned = kmeansAssign(corpus, init, iters, idCol, vecCol)
    val removed = Similarity.cosineNearDupPairs(assigned,
        blockCol = "cid", threshold = threshold, idCol = idCol,
        vecCol = "v", maxBlockSize = maxClusterSize)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("rm", lit(true))
    assigned.join(removed, Seq(idCol), "left")
      .select(col("cid"), col(idCol), col("rm").isNull.as("kept"))
  }
}
