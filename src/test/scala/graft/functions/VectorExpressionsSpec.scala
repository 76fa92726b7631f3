package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-based property tests for the native `vec_nearest` expression
  * (the [[graft.operators.Dedup.emitSortedPairs]] precedent): the
  * hand-rolled insertion top-m loop now serves four operators
  * (ivfAssign / ivfTopKProbed / ivfTopKIndexed / Clustering.assignL2),
  * and before this suite it was guarded only by end-to-end oracles. The
  * reference model recomputes scores with the IDENTICAL ascending-index
  * accumulation and sorts with the identical (Double.compare score,
  * cid) comparator, so expression results must be BIT-equal (compared
  * via doubleToLongBits — NaN-safe), not approximately equal.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  VectorExpressions.ensureRegistered(spark)

  /** Reference model of [[NearestCentroids]]: same IEEE accumulation
    * order (ascending index), same dim clamp (min of the two lengths),
    * same score formulas, same (Double.compare score, cid asc) sort,
    * same top-n truncation.
    */
  private def model(
      v: Seq[Double], cids: Seq[Long], cents: Seq[Seq[Double]],
      aux: Seq[Double], n: Int, metric: String): Seq[(Double, Long)] = {
    var vdot = 0.0
    var i = 0
    while (i < v.length) { vdot += v(i) * v(i); i += 1 }
    val vn = math.sqrt(vdot)
    val scored = cids.indices.map { c =>
      val cv = cents(c)
      val d = math.min(v.length, cv.length)
      var dot = 0.0
      var j = 0
      while (j < d) { dot += v(j) * cv(j); j += 1 }
      val score =
        if (metric == "cos") -(dot / (vn * aux(c))) else vdot - 2.0 * dot + aux(c)
      (score, cids(c))
    }
    scored.sorted(Ordering.fromLessThan[(Double, Long)] { (a, b) =>
      val cmp = java.lang.Double.compare(a._1, b._1)
      cmp < 0 || (cmp == 0 && a._2 < b._2)
    }).take(n)
  }

  /** Runs vec_nearest over a one-row frame holding `v`, with the family
    * embedded as literals exactly as [[graft.operators.Similarity]]
    * builds the call.
    */
  private def run(
      v: Seq[Double], cids: Seq[Long], cents: Seq[Seq[Double]],
      aux: Seq[Double], n: Int, metric: String): Seq[(Double, Long)] =
    Seq(Tuple1(v)).toDF("v")
      .select(call_function("vec_nearest", col("v").cast("array<double>"),
        typedLit(cids), typedLit(cents), typedLit(aux),
        lit(n), lit(metric)).as("out"))
      .collect().head.getSeq[Row](0)
      .map(r => (r.getDouble(0), r.getLong(1)))

  private def bitsEqual(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Boolean =
    a.length == b.length && a.zip(b).forall { case ((sa, ca), (sb, cb)) =>
      java.lang.Double.doubleToLongBits(sa) ==
        java.lang.Double.doubleToLongBits(sb) && ca == cb
    }

  /** Production aux derivation ([[graft.operators.Similarity]]): the
    * centroid self-dot accumulated ascending-index; cos takes its sqrt.
    */
  private def auxFor(cents: Seq[Seq[Double]], metric: String): Seq[Double] =
    cents.map { cv =>
      var s = 0.0
      var i = 0
      while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
      if (metric == "cos") math.sqrt(s) else s
    }

  test("vec_nearest matches the model on randomized families (20 seeds x 2 metrics)") {
    for (seed <- 1 to 20; metric <- Seq("cos", "l2")) {
      val rnd = new scala.util.Random(seed)
      val dim = 1 + rnd.nextInt(8)
      val k = 1 + rnd.nextInt(20)
      // components on a coarse grid -> frequent exact score ties, and
      // duplicated centroid vectors under distinct cids -> guaranteed
      // ties that only the cid tie-break can order
      def grid(): Seq[Double] =
        Seq.fill(dim)((rnd.nextInt(5) - 2) * 0.25)
      val base = Seq.fill(k)(grid())
      val cents = base.zipWithIndex.map { case (c, i) =>
        if (i > 0 && rnd.nextBoolean()) base(rnd.nextInt(i)) else c
      }
      // shuffled non-contiguous cids: sort must follow cid VALUE, not
      // family position
      val cids = rnd.shuffle((0 until k).map(i => i.toLong * 7 + 3))
      val aux = auxFor(cents, metric)
      val v = grid()
      val n = 1 + rnd.nextInt(k + 3)
      val got = run(v, cids, cents, aux, n, metric)
      val want = model(v, cids, cents, aux, n, metric)
      assert(bitsEqual(got, want),
        s"seed=$seed metric=$metric dim=$dim k=$k n=$n\n got=$got\nwant=$want")
    }
  }

  test("vec_nearest: n > K returns all K, ties order by cid ascending") {
    val cents = Seq(Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0))
    val cids = Seq(9L, 2L, 5L)
    val aux = auxFor(cents, "l2")
    val got = run(Seq(1.0, 0.0), cids, cents, aux, n = 10, metric = "l2")
    assert(got.length == 3)
    // the two identical centroids tie at score 0 -> cid 2 before cid 9;
    // cid 5 scores strictly worse, so the order is fully determined
    assert(got.map(_._2) == Seq(2L, 9L, 5L), s"got $got")
    assert(got == model(Seq(1.0, 0.0), cids, cents, aux, 10, "l2"))
  }

  test("vec_nearest: dim mismatch clamps to the shorter side (both directions)") {
    for (metric <- Seq("cos", "l2")) {
      // centroid longer than vec AND shorter than vec in one family
      val cents = Seq(Seq(1.0, 2.0, 3.0, 4.0), Seq(1.0), Seq(1.0, 2.0))
      val cids = Seq(1L, 2L, 3L)
      val aux = auxFor(cents, metric)
      val v = Seq(1.0, 2.0)
      val got = run(v, cids, cents, aux, n = 3, metric = metric)
      val want = model(v, cids, cents, aux, 3, metric)
      assert(bitsEqual(got, want), s"metric=$metric got=$got want=$want")
    }
  }

  test("vec_nearest: zero vector under cos (NaN scores) still matches the model") {
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val cids = Seq(1L, 2L)
    val aux = auxFor(cents, "cos")
    val v = Seq(0.0, 0.0)
    val got = run(v, cids, cents, aux, n = 2, metric = "cos")
    val want = model(v, cids, cents, aux, 2, "cos")
    assert(bitsEqual(got, want), s"got=$got want=$want")
    assert(got.forall(_._1.isNaN), "0/0 must surface as NaN, ordered by cid")
    assert(got.map(_._2) == Seq(1L, 2L))
  }

  test("vec_nearest: null vector yields null") {
    val out = Seq(Tuple1(null.asInstanceOf[Seq[Double]])).toDF("v")
      .select(call_function("vec_nearest", col("v").cast("array<double>"),
        typedLit(Seq(1L)), typedLit(Seq(Seq(1.0))), typedLit(Seq(1.0)),
        lit(1), lit("l2")).as("out"))
      .collect().head
    assert(out.isNullAt(0))
  }
}
