package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // --------------------------------------------------------------
  // blockDedup
  // --------------------------------------------------------------

  private val docs = Seq(
    // doc 0: two 3-token blocks
    (0L, "a b c d e f"),
    // doc 1: first block duplicates doc 0's first block; second is new
    (1L, "a b c x y z"),
    // doc 2: entirely duplicate content (both blocks seen earlier)
    (2L, "d e f x y z"),
    // doc 3: short tail block, unique
    (3L, "p q r s")).toDF("doc_id", "text")

  test("blockDedup keeps first occurrence globally and reassembles in order") {
    val out = Dedup.blockDedup(docs, "doc_id", "text", blockTokens = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 2L, "a b c d e f"),
      (1L, 2L, 1L, "x y z"),
      (2L, 2L, 0L, ""),
      (3L, 2L, 2L, "p q r s")))
  }

  test("blockDedup dedups repeats WITHIN one document too") {
    val d = Seq((7L, "a b c a b c a b c")).toDF("doc_id", "text")
    val out = Dedup.blockDedup(d, "doc_id", "text", blockTokens = 3)
      .as[(Long, Long, Long, String)].head()
    assert(out == ((7L, 3L, 1L, "a b c")))
  }

  test("blockDedup winner is partition-invariant (hash order, not arrival)") {
    val once = Dedup.blockDedup(docs, "doc_id", "text", 3)
    val repart = Dedup.blockDedup(docs.repartition(7), "doc_id", "text", 3)
    assert(once.except(repart).isEmpty && repart.except(once).isEmpty)
  }

  // --------------------------------------------------------------
  // clusterRepresentatives
  // --------------------------------------------------------------

  test("clusterRepresentatives keeps best-quality doc per component, singletons survive") {
    val corpus = Seq(
      (0L, 10L), (1L, 30L), (2L, 20L), // component {0,1,2} via pairs
      (3L, 5L),                        // singleton
      (4L, 7L), (5L, 7L)               // component {4,5}, quality tie
    ).toDF("doc_id", "quality")
    val pairs = Seq((0L, 1L), (1L, 2L), (4L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.clusterRepresentatives(corpus, pairs, "doc_id", "quality")
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, false),
      (1L, 0L, true),   // quality 30 wins the {0,1,2} cluster
      (2L, 0L, false),
      (3L, 3L, true),   // singleton keeps itself
      (4L, 4L, true),   // tie at 7 -> smaller id wins
      (5L, 4L, false)))
  }
}
