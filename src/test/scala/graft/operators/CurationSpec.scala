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
}
