package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class WinnowSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Definitional reference: all k-gram hashes (non-rolling), min of
    * every window, distinct sorted — what the DuckDB oracle computes.
    */
  private def brute(s: String, k: Int, w: Int): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.length < k) return Seq.empty
    val hs = (0 to bytes.length - k).map { i =>
      (0 until k).foldLeft(0L)((h, j) =>
        (h * Winnow.B + (bytes(i + j) & 0xffL)) % Winnow.M)
    }
    val mins =
      if (hs.length <= w) Seq(hs.min)
      else hs.sliding(w).map(_.min).toSeq
    mins.distinct.sorted
  }

  private def viaExpr(s: String, k: Int, w: Int): Seq[Long] =
    Winnow.fingerprint(UTF8String.fromString(s), k, w).toLongArray().toSeq

  test("rolling deque fingerprint equals the definitional form") {
    val rnd = new scala.util.Random(42)
    val alpha = "abc0123456789defghijklmnopqrstuvwxyz"
    for (len <- Seq(0, 3, 7, 8, 9, 10, 25, 200, 2000); trial <- 1 to 3) {
      val s = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      for ((k, w) <- Seq((7, 4), (5, 9), (2, 1)))
        assert(viaExpr(s, k, w) == brute(s, k, w),
          s"mismatch len=$len k=$k w=$w s=$s")
    }
  }

  test("edge cases: shorter than k is empty, fewer hashes than w is one min") {
    assert(viaExpr("abcdef", 7, 4).isEmpty)
    assert(viaExpr("abcdefg", 7, 4) == brute("abcdefg", 7, 4)) // 1 hash
    assert(viaExpr("abcdefghi", 7, 4).length == 1) // 3 hashes < w
  }

  test("shared substring of length >= w+k-1 shares a fingerprint hash") {
    val common = "thequickbrownfoxjumps" // 21 >= 7+4-1
    val a = viaExpr("aaaa0" + common + "0zzzz", 7, 4).toSet
    val b = viaExpr("bb1" + common + "1yy", 7, 4).toSet
    assert(a.intersect(b).nonEmpty)
  }

  test("winnow_fp resolves in SQL and survives whole-stage codegen") {
    graft.functions.WinnowExpression.ensureRegistered(spark)
    val df = Seq("thequickbrownfoxjumpsoverthelazydog", "short", "")
      .toDF("s")
      .select(expr("winnow_fp(s, 7, 4)").as("fp"))
    val rows = df.collect().map(_.getSeq[Long](0).toSeq)
    assert(rows(0) == brute("thequickbrownfoxjumpsoverthelazydog", 7, 4))
    assert(rows(1) == brute("short", 7, 4))
    assert(rows(2).isEmpty)
    // plan is a plain codegen'd projection: no shuffle, no BatchEvalUDF
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEval"))
  }
}
