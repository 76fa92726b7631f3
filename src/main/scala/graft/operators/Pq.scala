package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — public): the index shape
  * [[Similarity.MaxLiteralCentroids]]'s scaladoc promises for the
  * regime its literal-centroid bound refuses. A flat IVF wants
  * K ≈ √N coarse centroids — at 100 TB that is K ≫ 64k, past the
  * 32 MB literal-payload wall. PQ changes what scales with the corpus:
  * the vector's dimensions are split into `m` subspaces, each subspace
  * gets its OWN tiny codebook (`ksub` codes, trained by the existing
  * deterministic per-subspace Lloyd arithmetic), and a corpus vector is
  * stored as `m` small codes instead of `dim` floats. The codebook
  * payload is `ksub × dim` doubles — INDEPENDENT of corpus size
  * (m=16, ksub=256, dim=1024 ≈ 2 MB where flat IVF at K=√N would need
  * gigabytes of centroid literals) — while representational capacity is
  * `ksub^m` distinct reconstructions, the product-space trick that
  * makes K ≫ 64k index shapes expressible at all.
  *
  * Serving is ADC (asymmetric distance computation): each query
  * precomputes an m×ksub lookup table of subspace dot products ONCE,
  * then scoring a corpus vector is `m` table adds (the native
  * [[graft.functions.PqAdc]] expression — fully codegen'd; the
  * interpreted-HOF equivalent is the exact shape that went super-linear
  * in the r8 q133 argmin) instead of `dim` multiplies against floats
  * that would have to be resident. 100 TB posture: the corpus side
  * carries `m` bytes-per-code instead of `4·dim` bytes — a 32× memory
  * cut at m=16/dim=128 — and never shuffles for scoring (codes are a
  * narrow projection on the scan; the query side broadcasts with its
  * LUTs; the only exchange is the per-query top-k window on
  * (query_id, code-score) rows, identical to [[Similarity.bruteForceTopK]]'s
  * accepted shape). Composes with IVF: encode per-bucket residuals for
  * IVF-PQ; here PQ serves flat, gated by recall against exact top-k
  * (q136, the q96 pattern).
  *
  * Determinism: training reuses the fixed-point centroid-update
  * arithmetic of [[Clustering]] (quantize components to 1e-6 BEFORE
  * summing — long sums are order-independent where double sums are
  * not), assignment ties break on code id via the same
  * Double.compare/cid ordering as `vec_nearest`, and the final code
  * remap is order-preserving, so two trainings of the same corpus are
  * bit-identical.
  */
object Pq {

  private def asD(c: Column): Column = c.cast("array<double>")

  /** Fixed-point scale for centroid quantization — same 1e6 as
    * [[Clustering]] (6 decimal digits, the repo-wide round(_, 6)
    * convention).
    */
  private val Scale = 1000000.0

  /** Driver-side codebook: per subspace (ascending), the (code,
    * centroid, selfDot) triples in ascending-code order. Guarded by the
    * same bounds as [[Similarity.collectCentroids]] — the codebook is a
    * broadcast-class dimension BY CONSTRUCTION (ksub × dim doubles,
    * corpus-independent), so hitting these bounds means a caller bug,
    * not a scale wall.
    */
  private type Codebook = IndexedSeq[IndexedSeq[(Long, Seq[Double], Double)]]

  private def collectCodebook(codebook: DataFrame): Codebook = {
    val rows = codebook
      .select(col("sub").cast("int"), col("code").cast("long"),
        asD(col("centroid")))
      .collect()
    require(rows.length <= Similarity.MaxLiteralCentroids,
      s"PQ codebook has ${rows.length} rows; the literal bound is " +
        s"${Similarity.MaxLiteralCentroids} — a codebook is ksub × m " +
        "rows by construction, so this is a caller bug, not corpus scale")
    val payload = rows.iterator
      .map(r => if (r.isNullAt(2)) 0L else r.getSeq[Double](2).length.toLong)
      .sum
    require(payload <= Similarity.MaxLiteralCentroidDoubles,
      s"PQ codebook embeds $payload doubles as plan literals; the bound " +
        s"is ${Similarity.MaxLiteralCentroidDoubles} (~32 MB)")
    val bySub = rows.groupBy(_.getInt(0))
    (0 until bySub.size).map { j =>
      val g = bySub.getOrElse(j, throw new IllegalArgumentException(
        s"PQ codebook is missing subspace $j — subs must be contiguous 0..m-1"))
      g.map { r =>
        val v = r.getSeq[Double](2)
        var s = 0.0
        var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        (r.getLong(1), v, s)
      }.sortBy(_._1).toIndexedSeq
    }
  }

  private def subWidth(cb: Codebook): Int = cb.head.head._2.length

  /** `codes` column: per subspace j, the nearest (squared-L2,
    * tie-break on code id) codebook centroid of `slice(v, j·w+1, w)` —
    * m native `vec_nearest` calls over literal families, one narrow
    * projection, zero shuffle.
    */
  private def codesCol(v: Column, cb: Codebook): Column = {
    val w = subWidth(cb)
    array(cb.indices.map { j =>
      element_at(
        Similarity.nearestCentroids(slice(v, j * w + 1, w), cb(j), 1, "l2"),
        1).getField("cid")
    }: _*)
  }

  /** Per-subspace fixed-point Lloyd update from (v, codes) rows —
    * the [[Clustering.quantizedCentroids]] arithmetic keyed by
    * (sub, code, pos): quantized component-longs sum exactly in any
    * order, `floor(sum/count)/10⁶` rebuilds the component. The only
    * corpus-wide exchange of a training round, and it partial-aggregates
    * to ≤ m·ksub·w rows per partition before shuffling.
    */
  private def updateCodebook(assigned: DataFrame, w: Int): DataFrame =
    assigned
      .select(col("v"), posexplode(col("codes")).as(Seq("sub", "code")))
      .select(col("sub"), col("code"),
        posexplode(slice(col("v"), col("sub") * lit(w) + 1, lit(w)))
          .as(Seq("pos", "comp")))
      .withColumn("f", floor(col("comp") * lit(Scale)))
      .groupBy(col("sub"), col("code"), col("pos"))
      .agg(sum(col("f")).as("s"), count(lit(1)).as("n"))
      .withColumn("cf", floor(col("s") / col("n")))
      .groupBy(col("sub"), col("code"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("cf")))),
        x => x.getField("cf") / lit(Scale)).as("centroid"))

  /** Trains a PQ codebook: `m` subspaces × ≤`ksub` codes, `iters`
    * deterministic Lloyd rounds per subspace (all subspaces train in
    * the SAME corpus passes — one assignment projection + one update
    * shuffle per round, not per subspace). Init is the `ksub`
    * smallest-id vectors' subvectors (the [[Clustering]] q128
    * convention, made order-stable). Output: (sub: int,
    * code: bigint, centroid: array<double>) with codes REMAPPED to
    * contiguous 0..k_j−1 per subspace in an order-preserving way
    * (clusters can die during Lloyd; ADC lut indexing needs dense
    * codes), so [[pqEncode]] emits codes that index LUTs directly.
    *
    * Driver sync per round: one m·ksub-row codebook collect (the
    * [[Clustering.lloydCentroids]] contract — bounded, but a
    * 100-iteration trainer budgets 100 collect+job cycles).
    */
  def pqTrain(corpus: DataFrame, m: Int, ksub: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && ksub >= 1 && iters >= 0,
      s"pqTrain: need m >= 1, ksub >= 1, iters >= 0; got ($m, $ksub, $iters)")
    val dimRow = corpus.select(size(col(vecCol))).limit(1).collect()
    require(dimRow.nonEmpty, "pqTrain: empty corpus")
    val dim = dimRow.head.getInt(0)
    require(dim % m == 0,
      s"pqTrain: dim $dim must be divisible by m $m (equal-width subspaces)")
    val w = dim / m
    val seed = corpus.orderBy(col(idCol)).limit(ksub)
      .select(col(idCol).as("sid"), asD(col(vecCol)).as("v"))
      .withColumn("code",
        row_number().over(Window.orderBy(col("sid"))).cast("long") - 1)
    var cb = seed.select(col("code"),
        posexplode(col("v")).as(Seq("pos", "comp")))
      .withColumn("sub", floor(col("pos") / w).cast("int"))
      .groupBy(col("sub"), col("code"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("comp")))),
        x => x.getField("comp")).as("centroid"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val fams = collectCodebook(cb)
      val assigned = corpus
        .select(asD(col(vecCol)).as("v"))
        .withColumn("codes", codesCol(col("v"), fams))
      cb = updateCodebook(assigned, w).localCheckpoint(true)
    }
    // order-preserving dense remap (codes may have gaps after Lloyd)
    cb.withColumn("code",
        row_number().over(Window.partitionBy(col("sub"))
          .orderBy(col("code"))).cast("long") - 1)
      .localCheckpoint(true)
  }

  /** Encodes a corpus against a trained codebook: (idCol, codes) with
    * `codes(j)` the nearest code of subspace j — a pure narrow
    * projection (m native vec_nearest calls over literal families),
    * zero shuffle, the assignment half of the PQ memory trade: the
    * output carries m longs per vector instead of dim floats.
    */
  def pqEncode(corpus: DataFrame, codebook: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = collectCodebook(codebook)
    corpus.select(col(idCol), codesCol(asD(col(vecCol)), cb).as("codes"))
  }

  /** ADC top-k over an encoded corpus: approximate cosine =
    * `(Σ_j dotLut_q[j][codes_j]) / (|q| · sqrt(Σ_j normLut[j][codes_j]))`
    * — the numerator is the dot of the query with the RECONSTRUCTED
    * corpus vector, the denominator its reconstructed norm; both are m
    * table adds via the codegen `pq_adc` expression.
    *
    * Plan shape (the 100 TB contract, pinned for q136): the query side
    * is broadcast-class by the [[Similarity.bruteForceTopK]] contract —
    * each query row carries its own m·stride dot-LUT, built with
    * codegen `vec_dot` against codebook literals on the tiny query
    * frame; the corpus side reads only (id, codes), computes its
    * reconstructed norm against the LITERAL norm-LUT in the same narrow
    * projection, broadcast-joins, and the only exchange is the
    * per-query top-k window. Dead (sub, code) slots that Lloyd dropped
    * pad the LUTs with 0.0 and are never indexed (encoder emits only
    * live codes).
    *
    * Output: (query_id, rank, neighbor_id, sim) — `sim` is the ADC
    * APPROXIMATION (round 6); self-matches excluded, ties on
    * neighbor id. Recall versus exact top-k is the q136 gate, with the
    * pick's EXACT similarity compared under tolerance (the q96
    * pattern).
    */
  // ------------------------------------------------------------------
  // IVF-PQ: coarse buckets + PQ-quantized residuals (Jégou et al. §V,
  // "IVFADC" — the composition [[Pq]]'s scaladoc promises and q134's
  // partition-pruned layout completes: coarse prune cuts the scan to
  // ~nprobe/K of the corpus, ADC scans the survivors' codes)
  // ------------------------------------------------------------------

  /** Residuals of an IVF-assigned corpus against its coarse centroids:
    * `r = v − c_bucket`, the vectors PQ should quantize — residual
    * magnitudes are a fraction of the originals, so the same ksub
    * spends its codes on a tighter distribution. One broadcast join
    * against the (small-by-contract) centroid frame + an elementwise
    * subtract; zero corpus shuffle. The `zip_with` lambda is
    * interpreted per element — acceptable on a once-per-build path
    * (a native vec_sub expression is the promotion candidate if a
    * profile ever shows it).
    */
  def ivfResiduals(assigned: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroidIdCol: String = "centroid_id"): DataFrame = {
    val cents = broadcast(centroids.select(
      col(centroidIdCol).cast("long").as("bucket"),
      asD(col(vecCol)).as("__centv")))
    assigned
      .select(col(idCol), asD(col(vecCol)).as("__v"), col("bucket"))
      .join(cents, "bucket")
      .withColumn("resid", zip_with(col("__v"), col("__centv"),
        (a, b) => a - b))
      .select(col(idCol), col("bucket"), col("resid"))
  }

  /** Encodes an IVF-assigned corpus as (id, bucket, codes, cn):
    * `codes` quantize the RESIDual against `codebook` (trained by
    * [[pqTrain]] on [[ivfResiduals]] output), and `cn` is the exact
    * reconstruction norm `|c_bucket + r̂|` computed AT ENCODE TIME and
    * stored with the row — the published IVFADC design precomputes the
    * reconstruction-dependent terms at index build so serving never
    * touches vectors; storing the norm denormalized per row costs one
    * double against the `dim − m` floats PQ already saved. The
    * reconstruction `r̂` is a literal-table lookup per subspace
    * (payload = the codebook itself, corpus-independent), so the whole
    * encode is one narrow projection + the centroid broadcast join,
    * zero corpus shuffle.
    */
  def ivfPqEncode(assigned: DataFrame, centroids: DataFrame,
      codebook: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", centroidIdCol: String = "centroid_id")
      : DataFrame = {
    val cb = collectCodebook(codebook)
    val cents = broadcast(centroids.select(
      col(centroidIdCol).cast("long").as("bucket"),
      asD(col(vecCol)).as("__centv")))
    val recon = concat(cb.indices.map { j =>
      element_at(typedLit(cb(j).map(_._2)),
        (element_at(col("codes"), j + 1) + lit(1L)).cast("int"))
    }: _*)
    assigned
      .select(col(idCol), asD(col(vecCol)).as("__v"), col("bucket"))
      .join(cents, "bucket")
      .withColumn("resid", zip_with(col("__v"), col("__centv"),
        (a, b) => a - b))
      .withColumn("codes", codesCol(col("resid"), cb))
      .withColumn("__rec", zip_with(col("__centv"), recon, (a, b) => a + b))
      .withColumn("cn", Similarity.l2norm(col("__rec")))
      .select(col(idCol), col("bucket"), col("codes"), col("cn"))
  }

  /** IVF-PQ ADC top-k: queries probe their `nprobe` nearest coarse
    * buckets, then score ONLY those buckets' code rows as
    * `(dot(q, c_b) + Σ_j dotLut_q[j][codes_j]) / (|q| · cn)` — the
    * numerator splits over the reconstruction `c_b + r̂`: a per-(query,
    * probe) constant plus m codegen table adds against the RESIDUAL
    * codebook LUT, the denominator reads the encode-time norm.
    *
    * Plan shape (the complete 100 TB story): the corpus side reads
    * (id, bucket, codes, cn) — no vectors — and joins BUCKET-KEYED
    * against the broadcast query×probe frame (each row carrying its
    * dot-LUT and its `dot(q, c_b)` constant), so with q134's
    * bucket-partitioned layout the scan prunes to ~nprobe/K of the
    * corpus and each surviving row costs m table adds. The only
    * exchange is the per-query top-k window.
    */
  def ivfPqTopK(encoded: DataFrame, centroids: DataFrame,
      codebook: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroidIdCol: String = "centroid_id"): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cb = collectCodebook(codebook)
    val w = subWidth(cb)
    val m = cb.length
    val stride = cb.map(_.length).max
    val centsSeq = Similarity.collectCentroids(centroids, centroidIdCol, vecCol)
    require(centsSeq.nonEmpty, "ivfPqTopK: empty centroid set")
    val dotLut = array((for {
      j <- 0 until m
      s <- 0 until stride
    } yield
      if (s < cb(j).length)
        Similarity.dot(slice(col("qv"), j * w + 1, w), typedLit(cb(j)(s)._2))
      else lit(0.0)): _*)
    val centFrame = centroids.select(
      col(centroidIdCol).cast("long").as("bucket"),
      asD(col(vecCol)).as("__centv"))
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), asD(col(vecCol)).as("qv"))
      .withColumn("qn", Similarity.l2norm(col("qv")))
      .withColumn("bucket",
        explode(transform(
          Similarity.nearestCentroids(col("qv"), centsSeq, nprobe, "cos"),
          p => p.getField("cid"))))
      .join(centFrame, "bucket")
      .withColumn("qc", Similarity.dot(col("qv"), col("__centv")))
      .withColumn("dlut", dotLut)
      .drop("qv", "__centv"))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    encoded
      .select(col(idCol).as("neighbor_id"), col("bucket"), col("codes"),
        col("cn"))
      .join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        (col("qc") + call_function("pq_adc", col("codes"), col("dlut"),
          lit(stride))) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 6).as("sim"))
  }

  def pqTopK(encoded: DataFrame, codebook: DataFrame, queries: DataFrame,
      k: Int, idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val cb = collectCodebook(codebook)
    val w = subWidth(cb)
    val m = cb.length
    val stride = cb.map(_.length).max
    val normLut: Seq[Double] = cb.flatMap { fam =>
      fam.map(_._3) ++ Seq.fill(stride - fam.length)(0.0)
    }
    val c = encoded
      .select(col(idCol).as("neighbor_id"), col("codes"))
      .withColumn("cn", sqrt(call_function("pq_adc", col("codes"),
        typedLit(normLut), lit(stride))))
    val dotLut = array((for {
      j <- 0 until m
      s <- 0 until stride
    } yield
      if (s < cb(j).length)
        Similarity.dot(slice(col("qv"), j * w + 1, w), typedLit(cb(j)(s)._2))
      else lit(0.0)): _*)
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), asD(col(vecCol)).as("qv"))
      .withColumn("qn", Similarity.l2norm(col("qv")))
      .withColumn("dlut", dotLut)
      .drop("qv"))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        call_function("pq_adc", col("codes"), col("dlut"), lit(stride))
          / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 6).as("sim"))
  }
}
