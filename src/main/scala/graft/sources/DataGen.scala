package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DataGen source (reference: `DataGenTableSourceFactory`, new in 1.11
  * — SURVEY.md §2.1): bounded sequence and unbounded rate generators
  * with per-field generated expressions.
  *
  * Fields are deterministic functions of the row id (`xxhash64`-based
  * pseudo-randoms rather than `rand()`) so generated fixtures are
  * reproducible across runs and partitions — the property the
  * reference's seeded random fields provide. Bounded generation is a
  * `spark.range` (parallel, no driver materialization); unbounded is
  * the `rate-micro-batch` source with the same field exprs.
  */
object DataGen {

  /** Bounded sequence table: `id` 0..n-1 plus derived fields.
    * Each (name, sqlExpr) may reference `id`.
    */
  def sequence(spark: SparkSession, n: Long, numPartitions: Int,
      fields: (String, String)*): DataFrame =
    fields.foldLeft(spark.range(0, n, 1, numPartitions).toDF()) {
      case (df, (name, e)) => df.withColumn(name, expr(e))
    }

  /** Pseudo-random helper exprs for sequence/rate fields. */
  def randLong(idCol: String, bound: Long): String =
    s"pmod(xxhash64($idCol), ${bound}L)"
  def randDouble(idCol: String, max: Double): String =
    s"pmod(xxhash64($idCol), 1000000L) / 1000000.0 * $max"

  /** Unbounded rate stream: `rowsPerBatch` rows per micro-batch with
    * monotonically increasing `id` (`value`), plus derived fields.
    */
  def rateStream(spark: SparkSession, rowsPerBatch: Long,
      fields: (String, String)*): DataFrame = {
    val base = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toString)
      .load()
      .withColumnRenamed("value", "id")
    fields.foldLeft(base) {
      case (df, (name, e)) => df.withColumn(name, expr(e))
    }
  }
}
