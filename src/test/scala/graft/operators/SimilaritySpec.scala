package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  graft.functions.VectorExpressions.ensureRegistered(spark)

  private val dim = 8

  test("hyperplanes are deterministic ±1 families of the requested shape") {
    val a = Similarity.hyperplanes(4, dim)
    val b = Similarity.hyperplanes(4, dim)
    assert(a == b, "hash-derived planes must be identical across calls")
    assert(a.size == 4 && a.forall(_.size == dim))
    assert(a.flatten.forall(x => x == 1.0 || x == -1.0))
    // not degenerate: both signs occur
    assert(a.flatten.toSet == Set(1.0, -1.0))
  }

  test("lshNearDupPairs finds identical vectors and is partition-invariant") {
    // two identical vectors (must share every band), one orthogonal-ish
    // noise vector, one negated copy (sim -1, below any threshold)
    val base = (1 to dim).map(_.toFloat).toArray
    val df = Seq(
      (1L, base), (2L, base),
      (3L, base.map(-_)),
      (4L, Array.fill(dim)(0.001f).updated(0, 5f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.lshNearDupPairs(df, threshold = 0.9, dim = dim,
        numPlanes = 8, bands = 4)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 1.0)), s"got $out")
    val repart = Similarity.lshNearDupPairs(df.repartition(5), threshold = 0.9,
        dim = dim, numPlanes = 8, bands = 4)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSeq
    assert(repart == out, "hash-derived planes ⇒ partitioning must not matter")
  }

  test("lshNearDupPairs respects the bucket cap") {
    // 5 identical vectors: every band bucket has 5 members; cap at 4
    // drops them all before pairing (the minhash-style recall trade)
    val base = (1 to dim).map(_.toFloat).toArray
    val df = (1L to 5L).map(i => (i, base)).toDF("vec_id", "embedding")
    val out = Similarity.lshNearDupPairs(df, threshold = 0.5, dim = dim,
      numPlanes = 8, bands = 4, maxBucketSize = 4)
    assert(out.isEmpty, "capped buckets must not pair")
  }
}
