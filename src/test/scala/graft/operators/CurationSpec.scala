package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("stratifiedTopK keeps exactly k per stratum and is partition-invariant") {
    val df = spark.range(1000)
      .select(col("id"), (col("id") % 7).cast("string").as("stratum"))
    val once = Curation.stratifiedTopK(df, "stratum", "id", 3)
    assert(once.count() == 7 * 3)
    assert(once.groupBy("stratum").count().filter(col("count") =!= 3).isEmpty)
    // same sample regardless of input partitioning (hash order, not RNG)
    val repart = Curation.stratifiedTopK(df.repartition(13), "stratum", "id", 3)
    assert(once.select("stratum", "id").except(repart.select("stratum", "id")).isEmpty &&
      repart.select("stratum", "id").except(once.select("stratum", "id")).isEmpty)
  }

  test("bernoulliFlag rate lands near the hex-prefix fraction") {
    val df = spark.range(10000).select(col("id"))
    val n = df.filter(Curation.bernoulliFlag(col("id"), "3")).count()
    // 4/16 = 25%: md5 uniformity keeps 10k draws well within ±3%
    assert(n > 2200 && n < 2800, s"got $n of 10000")
  }

  test("hashSplit is group-consistent: one split per key value") {
    val df = spark.range(500)
      .select(concat(lit("src"), (col("id") % 20)).as("source"))
      .withColumn("split", Curation.hashSplit(col("source")))
    val perKey = df.groupBy("source").agg(countDistinct("split").as("d"))
    assert(perKey.filter(col("d") =!= 1).isEmpty)
    val splits = df.select("split").distinct().as[String].collect().toSet
    assert(splits == Set("train", "test"), s"got $splits")
  }

  test("vocabTopK ranks by count desc with lexicographic tie-break") {
    val df = Seq(
      ("en", "b b b a a c"),
      ("en", "a"),          // a ties b at 3 -> 'a' ranks first
      ("fr", "x y")).toDF("lang", "text")
    val out = Curation.vocabTopK(df, "lang", "text", 2)
      .orderBy("lang", "rk")
      .select("lang", "tok", "cnt", "rk")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out == Seq(("en", "a", 3L, 1L), ("en", "b", 3L, 2L),
      ("fr", "x", 1L, 1L), ("fr", "y", 1L, 2L)))
  }

  test("tokenChunks covers every token with stride overlap; short docs get one chunk") {
    val df = Seq((1L, (1 to 30).map(i => s"t$i").mkString(" ")), (2L, "only two"))
      .toDF("doc_id", "text")
    val out = Curation.tokenChunks(df, "text", chunkSize = 16, stride = 8)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 1: starts 1,9,17,25 -> sizes 16,16,14,6
    assert(out.filter(_._1 == 1L).map(r => (r._2, r._3)) ==
      Seq((0L, 16L), (1L, 16L), (2L, 14L), (3L, 6L)))
    assert(out.find(r => r._1 == 1L && r._2 == 3L).get._4 ==
      (25 to 30).map(i => s"t$i").mkString(" "))
    assert(out.filter(_._1 == 2L) == Seq((2L, 0L, 2L, "only two")))
  }

  test("redactPii replaces URLs before emails and masks long digit runs") {
    val rows = Seq(
      // the email inside the URL is consumed by the URL mask
      "see https://a.b/c?user=x@y.com then mail me at jo.e+1@ex.org",
      "call 12345678 not 123456",
      "clean text stays clean")
      .toDF("t")
      .select(Curation.redactPii(col("t")).as("r"))
      .as[String].collect()
    assert(rows(0) == "see <URL> then mail me at <EMAIL>")
    assert(rows(1) == "call <NUM> not 123456")
    assert(rows(2) == "clean text stays clean")
  }

  test("redactPii is case-insensitive: mixed-case emails and schemes redact") {
    val rows = Seq(
      "write User@Example.COM today",
      "or HTTPS://Example.com/Path works too")
      .toDF("t")
      .select(Curation.redactPii(col("t")).as("r"))
      .as[String].collect()
    assert(rows(0) == "write <EMAIL> today")
    assert(rows(1) == "or <URL> works too")
  }
}
