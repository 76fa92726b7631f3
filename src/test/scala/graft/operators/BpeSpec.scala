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

  test("vocab: full alphabet first, then merge products in order; surface dedup keeps first") {
    val docs = Seq(1L -> "abab ab b").toDF("doc_id", "text")
    val ms = Bpe.trainMerges(docs, "text", 2)
    // round 1: (a,b)x3; round 2 after rewrite ("ab ab", "ab"): (ab,ab)x1
    assert(ms.map(m => (m.lft, m.rgt)) == Seq("a" -> "b", "ab" -> "ab"))
    val v = Bpe.vocab(ms)
    // ids 0..35 are '0'..'9' then 'a'..'z' REGARDLESS of the corpus —
    // the alphabet seeding that makes encodeIds total over normalized
    // text (an unseen base char can never be OOV)
    assert(v.size == 38)
    assert(v(0) == ((0L, "0")) && v(9) == ((9L, "9")))
    assert(v(10) == ((10L, "a")) && v(35) == ((35L, "z")))
    assert(v(36) == ((36L, "ab")) && v(37) == ((37L, "abab")))
    // two merge paths fusing to the same surface form collapse to the
    // FIRST id — the HuggingFace-style vocab-file contract
    val dup = Seq(Bpe.Merge(1, "a", "b", 9L), Bpe.Merge(2, "a", "b", 5L))
    assert(Bpe.vocab(dup).size == 37)
    assert(Bpe.vocab(dup)(36) == ((36L, "ab")))
  }

  test("encodeIds: document-ordered subword ids; empty text emits an empty array") {
    val docs = Seq(1L -> "abab ab b", 2L -> "").toDF("doc_id", "text")
    val ms = Bpe.trainMerges(docs, "text", 2)
    val v = Bpe.vocab(ms)
    val got = Bpe.encodeIds(docs, "doc_id", "text", ms, v)
      .as[(Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: "abab"->[abab]=37, "ab"->[ab]=36, "b"->[b]=11
    assert(got == Map(1L -> ((3L, Seq(37L, 36L, 11L))), 2L -> ((0L, Seq()))))
  }

  test("encodeIds: base chars ABSENT from the training corpus encode without OOV") {
    // trained on "ab" only; the encoded snapshot contains x/y/z and
    // digits the reference corpus never observed — the day-2 shape
    // that crashed when the vocab held only observed characters
    val train = Seq(1L -> "ab ab").toDF("doc_id", "text")
    val ms = Bpe.trainMerges(train, "text", 1)
    val v = Bpe.vocab(ms)
    val snapshot = Seq(10L -> "xyz 42 ab").toDF("doc_id", "text")
    val got = Bpe.encodeIds(snapshot, "doc_id", "text", ms, v)
      .as[(Long, Long, Seq[Long])].collect().head
    // x=33 y=34 z=35, '4'=4 '2'=2, "ab"->merged id 36
    assert(got == ((10L, 6L, Seq(33L, 34L, 35L, 4L, 2L, 36L))))
  }

  test("writeTokenizer/loadTokenizer round-trips; encode-from-written equals in-session encode") {
    val docs = Seq(1L -> "abab ab b", 2L -> "aaa ab").toDF("doc_id", "text")
    val ms = Bpe.trainMerges(docs, "text", 3)
    val v = Bpe.vocab(ms)
    val path = TmpWorkspaces.pidScoped("graft_bpetok_spec_", "roundtrip")
    Bpe.writeTokenizer(spark, path.toString, ms, v)
    val (ms2, v2) = Bpe.loadTokenizer(spark, path.toString)
    assert(ms2 == ms, "merges must round-trip in training order")
    assert(v2 == v, "vocab must round-trip with stable ids")
    val inSession = Bpe.encodeIds(docs, "doc_id", "text", ms, v)
      .as[(Long, Long, Seq[Long])].collect().toSeq.sortBy(_._1)
    val fromArtifact = Bpe
      .encodeIdsFromTokenizer(spark, path.toString, docs, "doc_id", "text")
      .as[(Long, Long, Seq[Long])].collect().toSeq.sortBy(_._1)
    assert(fromArtifact == inSession)
  }

  test("encodeIds: multi-symbol words flatten left-to-right within the word") {
    // merge only (a,l): "albal" -> [al, b, al]; "ba" -> [b, a]
    val docs = Seq(1L -> "albal ba").toDF("doc_id", "text")
    val ms = Seq(Bpe.Merge(1, "a", "l", 1L))
    val v = Bpe.vocab(ms)   // a=10, b=11, l=21, al=36
    assert(v(36) == ((36L, "al")))
    val got = Bpe.encodeIds(docs, "doc_id", "text", ms, v)
      .as[(Long, Long, Seq[Long])].collect().head
    assert(got == ((1L, 5L, Seq(36L, 11L, 36L, 11L, 10L))))
  }
}
