package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract:
  * a Spark-side implementation plus (when SQL-expressible) an ANSI SQL
  * oracle the driver runs in DuckDB over the same parquet tables.
  *
  * Determinism rules every query follows (so the hash compare is stable):
  *  - every computed column is explicitly aliased AND explicitly typed
  *    (DECIMAL casts for money math — exact arithmetic on both engines;
  *    doubles only where the value is bit-reproducible),
  *  - every result carries a total ORDER BY,
  *  - timestamps leave the result as DATE / BIGINT epoch / STRING to dodge
  *    µs-vs-ns physical-type mismatches between Spark and DuckDB parquet.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  /** Decimal cast helper: the common "money" type used on both sides. */
  val Money = "decimal(12,2)"
}
