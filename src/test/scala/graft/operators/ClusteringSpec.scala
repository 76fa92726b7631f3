package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  graft.functions.VectorExpressions.ensureRegistered(spark)

  // two well-separated 2-d blobs around (0,0) and (10,10)
  private val blobA = Seq(
    (0L, Array(0.1f, 0.2f)), (1L, Array(-0.2f, 0.1f)), (2L, Array(0.0f, -0.1f)))
  private val blobB = Seq(
    (3L, Array(10.1f, 9.9f)), (4L, Array(9.8f, 10.2f)), (5L, Array(10.0f, 10.0f)))
  private def corpus = (blobA ++ blobB).toDF("vec_id", "embedding")

  // seed one centroid inside each blob
  private def init = Seq((0L, Array(0.1, 0.2)), (1L, Array(10.1, 9.9)))
    .toDF("cid", "centroid")

  test("lloyd converges to the blob means and assigns every point") {
    val assigned = Clustering.kmeansAssign(corpus, init, iters = 2)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(assigned == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      3L -> 1L, 4L -> 1L, 5L -> 1L), s"got $assigned")

    val cents = Clustering.lloydCentroids(corpus, init, iters = 2)
      .select("cid", "centroid").as[(Long, Seq[Double])].collect().toMap
    // fixed-point mean of blob A x-components: floor-quantized mean of
    // (0.1, -0.2, 0.0) ≈ -0.033334 (floor, not round-half)
    assert(math.abs(cents(0L).head - (-0.033334)) < 1e-6, s"got ${cents(0L)}")
    assert(math.abs(cents(1L).head - 9.966666) < 1e-5, s"got ${cents(1L)}")
  }

  test("centroid update is partition-invariant (fixed-point sums)") {
    val a = Clustering.lloydCentroids(corpus, init, iters = 2)
      .select("cid", "centroid").as[(Long, Seq[Double])].collect().toSet
    val b = Clustering.lloydCentroids(corpus.repartition(7), init, iters = 2)
      .select("cid", "centroid").as[(Long, Seq[Double])].collect().toSet
    assert(a == b, "quantized component sums must not depend on partitioning")
  }

  test("empty clusters drop out instead of corrupting the update") {
    // both seeds inside blob A: blob B's seed is never nearest for seed 1?
    // no — seed far outside both blobs: nothing assigns to it
    val farInit = Seq((0L, Array(5.0, 5.0)), (1L, Array(1e6, 1e6)))
      .toDF("cid", "centroid")
    val cents = Clustering.lloydCentroids(corpus, farInit, iters = 1)
      .select("cid").as[Long].collect().toSeq
    assert(cents == Seq(0L), s"far centroid must vanish, got $cents")
  }

  test("semDedup keeps the lowest id of a near-identical group per cluster") {
    val v = Array(1.0f, 1.0f)
    val df = Seq(
      (0L, v), (1L, v), (2L, v),            // identical triple → keep 0 only
      (3L, Array(-5.0f, 5.0f)),             // alone in its area
      (4L, Array(10.0f, 10.0f))             // same direction as 0-2 but will
    ).toDF("vec_id", "embedding")           //   land in the far cluster seed
    val ini = Seq((0L, Array(1.0, 1.0)), (1L, Array(-5.0, 5.0)),
      (2L, Array(10.0, 10.0))).toDF("cid", "centroid")
    val out = Clustering.semDedup(df, ini, iters = 1, threshold = 0.95)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(out(0L) && !out(1L) && !out(2L), s"got $out")
    assert(out(3L) && out(4L),
      "solo vectors survive; same-direction vec in another cluster is kept")
  }
}
