package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val corpus = Seq(
    0L -> "apple banana",             // the query doc
    1L -> "apple apple cherry",
    2L -> "banana cherry cherry date",
    3L -> "date date date")           // shares no query term
    .toDF("doc_id", "text")

  test("bm25TopK: textbook fixed-point scores, self excluded, non-matching docs absent") {
    val got = Retrieval
      .bm25TopK(corpus, corpus.filter($"doc_id" === 0L), k = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    // N=4, total=12; df(apple)=df(banana)=2 -> idf = ln 2, idf_fp=693147.
    // doc 1 (apple tf=2, dl=3): 693147 * (22*2*12)/(10*2*12+3*12+9*3*4)
    //   = 693147 * 528/384 = floor(953077.125)
    // doc 2 (banana tf=1, dl=4): 693147 * 264/300 = floor(609969.36)
    // doc 3 shares no term -> absent; doc 0 is the query -> excluded
    assert(got == Seq(
      (0L, 1L, 1L, 0.953077),
      (0L, 2L, 2L, 0.609969)))
  }

  test("bm25TopK: repeated query terms add once (Lucene distinct-term semantics)") {
    val dup = Seq(9L -> "apple apple apple banana").toDF("doc_id", "text")
    val base = Retrieval.bm25TopK(corpus, corpus.filter($"doc_id" === 0L), k = 3)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    // same terms {apple, banana} with different multiplicity: identical
    // scores (df/N/dl all unchanged — query id 9 is not in the corpus)
    val got = Retrieval.bm25TopK(corpus, dup, k = 3)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(0L, 1L, 2L))   // doc 0 now scores too
    assert(got(1L) == base(1L) && got(2L) == base(2L))
  }

  test("bm25TopKIndexed: the written shard-pruned index serves exactly the ad-hoc ranking") {
    val path = TmpWorkspaces.pidScoped("graft_bm25idx_spec_", "serve")
    Retrieval.bm25WriteIndex(corpus, path.toString)
    val adhoc = Retrieval
      .bm25TopK(corpus, corpus.filter($"doc_id" === 0L), k = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    val served = Retrieval
      .bm25TopKIndexed(spark, path.toString, corpus.filter($"doc_id" === 0L), k = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(adhoc.nonEmpty && served == adhoc,
      s"index round-trip drifted:\n$served\nvs\n$adhoc")
  }

  test("rrfFuse: fixed-point reciprocal-rank sums with id tie-break") {
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L))
      .toDF("query_id", "neighbor_id", "rnk")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L))
      .toDF("query_id", "neighbor_id", "rnk")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._2)
    // 20: floor(1e6/61)+floor(1e6/62) = 16393+16129 = 32522 (rank 1)
    // 10: 16393 (rank 2) beats 30: 16129 (rank 3)
    assert(got == Seq(
      (1L, 1L, 20L, 32522L),
      (1L, 2L, 10L, 16393L),
      (1L, 3L, 30L, 16129L)))
  }

  test("rrfFuse: equal fused scores order by neighbor id") {
    val a = Seq((1L, 50L, 1L)).toDF("query_id", "neighbor_id", "rnk")
    val b = Seq((1L, 40L, 1L)).toDF("query_id", "neighbor_id", "rnk")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 2)
      .select($"rnk", $"neighbor_id").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 40L), (2L, 50L)))
  }
}
