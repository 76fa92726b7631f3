package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function parity layer — SURVEY.md §2.9.
  *
  * Covers the functions the reference exposes
  * (flink-table-runtime-blink/…/runtime/functions/SqlFunctionUtils.java,
  * FlinkSqlOperatorTable — see SURVEY §2.9 inventory) that Spark lacks or
  * names differently. Two surfaces:
  *
  *  1. Column API (this object): composed from `org.apache.spark.sql
  *     .functions._` built-ins wherever possible — these stay inside
  *     whole-stage codegen, no UDF serialization boundary;
  *  2. SQL names via [[registerAll]]: `spark.udf.register` for the few
  *     genuinely custom ones so `spark.sql("SELECT SPLIT_INDEX(…)")`
  *     works like the reference's SQL surface.
  */
object FlinkFunctions {

  // ---- string family ------------------------------------------------

  /** Flink SPLIT_INDEX(str, sep, index) — 0-based, LITERAL separator,
    * null when out of bounds or index < 0 (SqlFunctionUtils#splitIndex).
    * The separator Column is regexp-escaped so metachar separators
    * ('.', '|') split literally, and negative indices yield null instead
    * of an INVALID_ARRAY_INDEX error (ADVICE.md r01). Composed: codegen'd.
    */
  def splitIndex(s: Column, sep: Column, idx: Column): Column = {
    // \Q…\E-quote the separator: escape any embedded \E first.
    val quoted = concat(lit("\\Q"),
      regexp_replace(sep, "\\\\E", "\\\\E\\\\\\\\E\\\\Q"), lit("\\E"))
    when(idx >= 0, try_element_at(split(s, quoted), idx + lit(1)))
      .otherwise(lit(null).cast("string"))
  }

  def splitIndex(s: Column, sep: String, idx: Int): Column =
    if (idx < 0) lit(null).cast("string")
    else try_element_at(
      split(s, lit(java.util.regex.Pattern.quote(sep))), lit(idx + 1))

  /** Flink IS_DECIMAL(str): parseable as a number. */
  def isDecimal(s: Column): Column =
    s.rlike("^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)$")

  /** Flink IS_DIGIT(str): all characters decimal digits. */
  def isDigit(s: Column): Column = s.rlike("^\\d+$")

  /** Flink IS_ALPHA(str): all characters letters. */
  def isAlpha(s: Column): Column = s.rlike("^[A-Za-z]+$")

  // ---- math family ---------------------------------------------------

  /** Flink RAND_INTEGER(bound): uniform int in [0, bound). */
  def randInteger(bound: Column): Column =
    floor(rand() * bound).cast("int")

  /** Flink TRUNCATE(x, d): truncate toward zero to d decimal places
    * (SqlFunctionUtils#struncate). Composed floor/ceil keeps codegen.
    */
  def truncate(x: Column, d: Int): Column = {
    val p = pow(lit(10.0), lit(d))
    (when(x >= 0, floor(x * p)).otherwise(ceil(x * p)) / p)
  }

  // ---- collection family (1-based semantics, SURVEY §2.9) -------------

  /** Flink CARDINALITY(array|map). */
  def cardinality(c: Column): Column = size(c).cast("long")

  /** Flink `arr[i]` 1-based element access, null out of bounds. */
  def elementAt1(c: Column, i: Column): Column = try_element_at(c, i)

  /** Flink ELEMENT(arr): the sole element of a 1-element array, null if
    * empty, error if more than one (ScalarOperatorGens element).
    */
  def element(c: Column): Column =
    when(size(c) <= 1, try_element_at(c, lit(1)))
      .otherwise(raise_error(lit("ELEMENT() on array with more than one element")))

  // ---- SQL registration ------------------------------------------------

  /** Register SQL-callable names. UDF-backed (these are off the hot
    * aggregation path; the Column API above is the codegen path).
    */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("SPLIT_INDEX", (s: String, sep: String, i: Int) => {
      if (s == null || sep == null) null
      else {
        val parts = s.split(java.util.regex.Pattern.quote(sep), -1)
        if (i >= 0 && i < parts.length) parts(i) else null
      }
    })
    spark.udf.register("IS_DECIMAL", (s: String) =>
      s != null && s.matches("^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)$"))
    spark.udf.register("IS_DIGIT", (s: String) => s != null && s.matches("^\\d+$"))
    spark.udf.register("IS_ALPHA", (s: String) => s != null && s.matches("^[A-Za-z]+$"))
    spark.udf.register("RAND_INTEGER", (bound: Int) =>
      java.util.concurrent.ThreadLocalRandom.current().nextInt(bound))
    spark.udf.register("TRUNCATE", (x: Double, d: Int) => {
      val p = math.pow(10, d)
      if (x >= 0) math.floor(x * p) / p else math.ceil(x * p) / p
    })
  }
}
