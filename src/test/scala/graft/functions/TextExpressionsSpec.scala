package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native text expressions must be DROP-IN twins of the HOF
  * compositions they replaced inside languageId/qualityColumns: same
  * counts, same sums, on the same frames — asserted here against both
  * a hand model and the original `filter`/`aggregate` compositions.
  */
class TextExpressionsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  TextExpressions.ensureRegistered(spark)

  test("count_in_set counts occurrences (not distinct), empty and miss cases") {
    val df = Seq(
      (1L, Seq("the", "cat", "the", "a")),
      (2L, Seq("xyz")),
      (3L, Seq.empty[String])).toDF("id", "toks")
    val got = df.select(col("id"),
        call_function("count_in_set", col("toks"),
          typedLit(Seq("the", "a", "of"))).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 0L, 3L -> 0L))
  }

  test("count_in_set equals the interpreted filter composition it replaced") {
    val words = Seq("the", "a", "of", "and", "to")
    val df = spark.range(200).select(
      split(concat(lit("the quick a fox of id"), col("id")), " ").as("toks"))
    val both = df.select(
        call_function("count_in_set", col("toks"), typedLit(words)).as("fast"),
        size(filter(col("toks"),
          t => words.map(w => t === w).reduce(_ || _))).cast("long").as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(both.isEmpty)
  }

  test("sum_strlen equals the aggregate/transform fold it replaced") {
    val df = Seq(Seq("abc", "", "zz"), Seq("é", "ab")).toDF("toks")
    val got = df.select(
        call_function("sum_strlen", col("toks")).as("s"),
        aggregate(transform(col("toks"), t => length(t).cast("double")),
          lit(0.0), _ + _).as("old"))
      .as[(Long, Double)].collect()
    assert(got.toSeq == Seq((5L, 5.0), (3L, 3.0)))
  }

  test("count_in_set rejects a non-foldable set") {
    val df = Seq((Seq("a"), Seq("a"))).toDF("toks", "dyn")
    val e = intercept[Exception] {
      df.select(call_function("count_in_set", col("toks"), col("dyn")))
        .collect()
    }
    assert(e.getMessage.contains("count_in_set") ||
      e.getMessage.contains("foldable"), e.getMessage)
  }
}
