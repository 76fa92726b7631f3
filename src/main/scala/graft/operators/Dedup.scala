package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  /** Per-document MinHash signature columns mh0..mh{n-1} over distinct
    * word-`shingleN`-gram shingles. One explode + one keyed aggregation;
    * the signature is n parallel `min` aggregates (map-side partial agg
    * applies, so the shuffle carries only n longs per doc per partition).
    */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleN: Int): DataFrame = {
    val params = hashParams(numHashes)
    val sh = df
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(shingles(col(textCol), shingleN))).as("s"))
      .withColumn("h", hash32(col("s")))
    sh.groupBy(col("doc_id"))
      .agg(
        min(universalHash(col("h"), params.head._1, params.head._2)).as("mh0"),
        params.zipWithIndex.tail.map { case ((a, b), i) =>
          min(universalHash(col("h"), a, b)).as(s"mh$i")
        }: _*)
  }

  /** Distinct per-document shingle-hash sets (for exact verification). */
  private def shingleSets(
      df: DataFrame, idCol: String, textCol: String, shingleN: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        array_sort(array_distinct(transform(shingles(col(textCol), shingleN),
          s => hash32(s)))).as("hs"))
      .withColumn("n", size(col("hs")))

  /** MinHash-LSH near-duplicate pairs, exact-verified.
    *
    * Banding: `bands` bands of `numHashes/bands` rows; documents sharing
    * any full band signature become candidates; candidates are verified
    * with exact Jaccard over the distinct shingle-hash sets and kept when
    * `jaccard >= threshold`. Output: (doc_a, doc_b, jaccard), doc_a < doc_b.
    */
  def minhashDedup(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.8, maxBucketSize: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = minhashSignatures(df, idCol, textCol, numHashes, shingleN)

    // band key per band: the concatenated band slice of the signature
    val banded = (0 until bands).map { bnd =>
      val key = concat_ws("_",
        lit(bnd) +: (0 until rows).map(r => col(s"mh${bnd * rows + r}")): _*)
      sig.select(col("doc_id"), key.as("bk"))
    }.reduce(_ union _)

    // cap pathological buckets before pairing (bounds quadratic blowup)
    val capped = banded
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bk"))))
      .filter(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")

    val cands = capped.as("x")
      .join(capped.as("y"), col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    val sets = shingleSets(df, idCol, textCol, shingleN)
    cands
      .join(sets.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"), col("n").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"), col("n").as("nb")), "doc_b")
      .withColumn("i", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 32-bit SimHash fingerprint per document over distinct tokens
    * (Charikar '02): bit j of the fingerprint is the sign of
    * sum(±1 over tokens, + when bit j of the token hash is set).
    * One explode + one keyed aggregation of 32 sums.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
        explode(array_distinct(tokens(col(textCol)))).as("t"))
      .withColumn("h", hash32(col("t")))
    val bitSums = (0 until 32).map { j =>
      sum(when(shiftright(col("h"), j) % 2 === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val fp = (0 until 32).map { j =>
      when(col(s"s$j") > 0, lit(1L) * (1L << j)).otherwise(0L)
    }.reduce(_ + _)
    tok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  // ------------------------------------------------------------------
  // Blocked n-gram Jaccard (no LSH; exact within blocks)
  // ------------------------------------------------------------------

  /** All-pairs n-gram Jaccard within a blocking key (e.g. source or
    * language): exact near-dup detection when a cheap blocking column
    * bounds the candidate space. The pairwise join is keyed on the block,
    * so each block's pairs are computed data-local after one shuffle.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, blockCol: String,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sets = df.select(col(blockCol).as("blk"), col(idCol).as("doc_id"),
        array_sort(array_distinct(transform(shingles(col(textCol), shingleN),
          s => hash32(s)))).as("hs"))
      .withColumn("n", size(col("hs")))
    sets.as("x").join(sets.as("y"),
        col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.blk").as("blk"),
        col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        size(array_intersect(col("x.hs"), col("y.hs"))).as("i"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("blk"), col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
