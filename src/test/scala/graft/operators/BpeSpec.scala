package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def merges(n: Int, docs: (Long, String)*): Seq[(Int, String, String, Long)] =
    Bpe.trainMerges(docs.toDF("doc_id", "text"), "text", n)
      .map(m => (m.step, m.lft, m.rgt, m.cnt))

  private def counts(
      docs: Seq[(Long, String)], ms: Seq[Bpe.Merge]): Map[Long, (Long, Long)] =
    Bpe.encodeTokenCounts(docs.toDF("doc_id", "text"), "doc_id", "text", ms)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("trainMerges: hand-traced merge sequence with overlap and frequency weighting") {
    // words: aaa(x1), ab(x3). round 1: (a,b) weight 3 beats (a,a) weight 2.
    // round 2: (a,a) count 2 — BOTH adjacent positions in "a a a" count.
    // round 3: after the greedy-leftmost rewrite "aa a", only (aa,a)=1
    // remains — a wrong overlap rewrite would leave (a,aa) instead.
    assert(merges(6, 1L -> "aaa ab", 2L -> "ab ab") == Seq(
      (1, "a", "b", 3L),
      (2, "a", "a", 2L),
      (3, "aa", "a", 1L)))
  }

  test("trainMerges: equal counts break ties by (lft, rgt) ascending") {
    // "cb" and "ca" both once: (c,a) wins over (c,b) lexicographically
    assert(merges(1, 1L -> "cb ca").head == ((1, "c", "a", 1L)))
  }

  test("trainMerges: stops early when no pairs remain") {
    assert(merges(5, 1L -> "a b c").isEmpty)
  }

  test("encodeTokenCounts: zero merges counts characters; learned merges compress") {
    val docs = Seq(1L -> "aaa ab", 2L -> "ab ab")
    assert(counts(docs, Nil) == Map(1L -> ((2L, 5L)), 2L -> ((2L, 4L))))
    val ms = Bpe.trainMerges(docs.toDF("doc_id", "text"), "text", 6)
    // "aaa" -> [aaa], "ab" -> [ab]: every word one token
    assert(counts(docs, ms) == Map(1L -> ((2L, 2L)), 2L -> ((2L, 2L))))
  }

  test("encodeTokenCounts: a merged symbol's suffix never false-matches a later merge") {
    // merges (a,l) then (l,b): "alb" -> [al, b]. The 'l' inside symbol
    // "al" must NOT pair with 'b' — the two-space encoding makes
    // " l  b " unmatchable inside " al  b ".
    val ms = Seq(Bpe.Merge(1, "a", "l", 1L), Bpe.Merge(2, "l", "b", 1L))
    assert(counts(Seq(1L -> "alb"), ms) == Map(1L -> ((1L, 2L))))
  }
}
