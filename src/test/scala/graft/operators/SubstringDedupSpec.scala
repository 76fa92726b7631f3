package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SubstringDedupSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // normalization drops spaces: "abcdefghij klm" -> "abcdefghijklm"

  test("substringWindows: stride-1 geometry over the normalized text, short docs emit nothing") {
    val df = Seq((1L, "abcd efgh"), (2L, "abc")).toDF("doc_id", "text")
    val got = SubstringDedup.substringWindows(df, "doc_id", "text", 4)
      .as[(Long, Long, String)].collect()
    // doc 1 norm = "abcdefgh" (8 chars) -> 5 windows at pos 0..4;
    // doc 2 norm = "abc" (3 chars < 4) -> none
    assert(got.map(_._1).toSet == Set(1L))
    assert(got.map(_._2).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val h0 = got.find(_._2 == 0L).get._3
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(h0 == md5("abcd"), s"window hash must be md5 of the slice")
  }

  test("substringPairs: maximal runs with exact offsets and lengths, cross-document only") {
    // doc 10 norm: "xxhelloworldyy" — carries "helloworld" at pos 2
    // doc 20 norm: "helloworldzzzz" — carries it at pos 0
    // doc 30 norm: "aaaabbbbccccdd" — shares nothing >= 6
    val df = Seq(
      (10L, "xx hello world yy"),
      (20L, "hello world zzzz"),
      (30L, "aaaa bbbb cccc dd")).toDF("doc_id", "text")
    val got = SubstringDedup.substringPairs(df, "doc_id", "text", minLen = 6)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // the shared maximal run is "helloworld" (10 chars) at (2, 0)
    assert(got == Set((10L, 20L, 2L, 0L, 10L)), s"got $got")
  }

  test("substringPairs: two disjoint repeats between one pair emit two runs; periodic text pairs per diagonal") {
    // doc 1 norm: "aaaaaaqqqqbbbbbb", doc 2 norm: "bbbbbbwwwwaaaaaa"
    // shared: "aaaaaa" at (0, 10) and "bbbbbb" at (10, 0) — two runs
    val df = Seq((1L, "aaaaaa qqqq bbbbbb"), (2L, "bbbbbb wwww aaaaaa"))
      .toDF("doc_id", "text")
    val got = SubstringDedup.substringPairs(df, "doc_id", "text", minLen = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // "aaaaaa" (6 chars): diagonal matches at several offsets because
    // the text is periodic — the MAIN diagonals carry the full runs
    assert(got.contains((1L, 2L, 0L, 10L, 6L)), s"got $got")
    assert(got.contains((1L, 2L, 10L, 0L, 6L)), s"got $got")
    // every reported run is >= minLen and its content matches exactly
    assert(got.forall(_._5 >= 5L), s"got $got")
  }

  test("written index + incremental probe equals the fresh run restricted to snapshot endpoints") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over it"),
      (2L, "completely unrelated filler words"),
      (3L, "the quick brown fox sleeps all day"), // snapshot: shares prefix with 1
      (4L, "completely unrelated filler words too")) // snapshot: shares with 2
      .toDF("doc_id", "text")
    val base = docs.filter($"doc_id" <= 2)
    val snap = docs.filter($"doc_id" >= 3)
    val idx = TmpWorkspaces.pidScoped("graft_ss_spec_", "idx")
    SubstringDedup.substringWriteIndex(base, idx.toString, "doc_id", "text",
      minLen = 10)
    SubstringDedup.substringAppendIndex(snap, idx.toString, "doc_id", "text",
      minLen = 10)

    val fresh = SubstringDedup.substringPairs(docs, "doc_id", "text",
        minLen = 10)
      .filter($"doc_a" >= 3 || $"doc_b" >= 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val probed = SubstringDedup.substringPairsIndexed(spark, idx.toString,
        snap, "doc_id", "text", minLen = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(probed == fresh && fresh.nonEmpty, s"probed $probed vs $fresh")
    // sanity on content: doc 1 and 3 share "thequickbrownfox" (16)
    assert(fresh.contains((1L, 3L, 0L, 0L, 16L)), s"got $fresh")
  }

  test("posting cap drops boilerplate window keys whole: under-reports, never fabricates") {
    // 4 docs all sharing one 6-char window; cap = 3 postings drops it
    val df = (1L to 4L).map(i => (i, s"shared window $i"))
      .toDF("doc_id", "text")
    val uncapped = SubstringDedup.substringPairs(df, "doc_id", "text",
      minLen = 6, maxPostingSize = 10000)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(uncapped.nonEmpty)
    val capped = SubstringDedup.substringPairs(df, "doc_id", "text",
      minLen = 6, maxPostingSize = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped),
      s"capping must only remove pairs: $capped vs $uncapped")
    assert(capped.size < uncapped.size,
      "the viral window key must actually be dropped")
  }
}
