package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time temporal (as-of) join: for each left row, the latest right
  * row with the same key and `rightTs <= leftTs` — the batch semantics of
  * the reference's `FOR SYSTEM_TIME AS OF a.rowtime` versioned-table join
  * (flink-table-runtime-blink RT/join/temporal/TemporalRowTimeJoinOperator,
  * SURVEY.md §2.4).
  *
  * Implemented as a union + one windowed pass, NOT a theta-join:
  * both sides are tagged and unioned, partitioned by key, sorted by
  * (ts, side, version tie-break), and the right payload is carried
  * forward with `last_value(ignoreNulls)` over an unbounded-preceding
  * frame; left rows then peel off with their matched payload. One
  * shuffle + one sort — at 100 TB this scales like a sort-merge join on
  * the key with NO quadratic (left x versions) candidate blowup, and
  * skewed keys stay a single sorted run instead of a hot join bucket.
  * The right payload travels as ONE struct so all matched columns come
  * from the same version row.
  */
object TemporalJoin {

  /** @param left       probe side
    * @param right      versioned build side
    * @param key        equi-join key column name (present on both sides)
    * @param leftTs     left event-time column
    * @param rightTs    right version-time column
    * @param rightCols  right payload columns to surface (renamed as-is)
    * @param rightVersionTieBreak right column ordering later versions at
    *                   identical (key, ts) deterministically (e.g. an id)
    */
  def asOf(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightCols: Seq[String], rightVersionTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightCols.map(col): _*)

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__ver", lit(Long.MaxValue))
      .withColumn("__payload", lit(null).cast(
        right.select(rightCols.map(col): _*).schema.fields
          .foldLeft(new org.apache.spark.sql.types.StructType)((s, f) => s.add(f))))
    val r = right
      .select(col(key) +: Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        col(rightVersionTieBreak).cast("long").as("__ver"),
        payload.as("__payload")): _*)
    val lProjected = Seq(col(key), col("__ts"), col("__side"),
      col("__ver"), col("__payload")) ++ leftCols.filterNot(_ == key).map(col)
    val unioned = l.select(lProjected: _*)
      .unionByName(r, allowMissingColumns = true)

    // right (side 0) sorts before left (side 1) at equal ts → "at or
    // before" is inclusive; among equal-ts versions the tie-break wins
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__ver"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__matched", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__matched.$c").as(c)): _*)
  }
}
