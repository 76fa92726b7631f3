package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions._

/** User-defined function machinery — SURVEY.md §2.11
  * (flink-table-common/…/functions/{ScalarFunction,AggregateFunction,
  * TableFunction}.java): the three UDF kinds a reference user writes,
  * re-expressed through Spark's extension points.
  *
  *  - ScalarFunction  → `spark.udf.register` Scala closure (q66);
  *  - AggregateFunction<T,ACC> (createAccumulator/accumulate/merge/
  *    getValue) → typed `Aggregator[IN,BUF,OUT]` registered via
  *    `functions.udaf` — same accumulator lifecycle, plus Spark's
  *    map-side partial aggregation for free (q67);
  *  - TableFunction<T> (eval + collect, LATERAL TABLE) → `Dataset
  *    .flatMap` with a product encoder (q68) — the typed analog of the
  *    Correlate/UNNEST path covered by q10/q55.
  *
  * Determinism: all money math in exact long cents inside accumulators;
  * doubles only materialize at the final division, identically ordered
  * on both engines.
  */
object UdfQueries {

  // ------------------------------------------------------------------
  // q66 ScalarFunction: per-row price tier via a registered Scala UDF
  // ------------------------------------------------------------------

  val q66UdfScalar: QueryDef = QueryDef(
    "q66_udf_scalar",
    (s, dir) => {
      // eval(BigDecimal, BigDecimal): exact decimal math, like a
      // reference ScalarFunction's eval() overload
      val tier = udf((p: java.math.BigDecimal, d: java.math.BigDecimal) => {
        if (p == null || d == null) null
        else {
          val net = p.multiply(java.math.BigDecimal.ONE.subtract(d))
          if (net.compareTo(new java.math.BigDecimal(50000)) >= 0) "high"
          else if (net.compareTo(new java.math.BigDecimal(20000)) >= 0) "mid"
          else "low"
        }
      })
      s.udf.register("price_tier", tier)
      Tables.load(s, dir, "lineitem")
        .groupBy(tier(col("l_extendedprice"), col("l_discount")).as("tier"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("tier"))
    },
    Some("""
      SELECT CASE
               WHEN l_extendedprice * (1 - l_discount) >= 50000 THEN 'high'
               WHEN l_extendedprice * (1 - l_discount) >= 20000 THEN 'mid'
               ELSE 'low'
             END AS tier,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY 1
      ORDER BY tier
    """))

  // ------------------------------------------------------------------
  // q67 AggregateFunction: quantity-weighted average price as a typed
  // Aggregator (exact long-cents accumulator, mergeable)
  // ------------------------------------------------------------------

  /** ACC = (sum of cents*qty, sum of qty) — exact, order-insensitive. */
  object WeightedAvgPrice
      extends Aggregator[(Long, Long), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), in: (Long, Long)): (Long, Long) =
      (b._1 + in._2 * in._1, b._2 + in._1)
    def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(r: (Long, Long)): Double =
      if (r._2 == 0) Double.NaN else r._1.toDouble / r._2.toDouble / 100.0
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val q67Udaf: QueryDef = QueryDef(
    "q67_udaf",
    (s, dir) => {
      s.udf.register("wavg_price", udaf(WeightedAvgPrice))
      Tables.load(s, dir, "lineitem")
        .withColumn("qty", col("l_quantity").cast("long"))
        .withColumn("cents",
          (col("l_extendedprice").cast(QueryDef.Money) * 100).cast("long"))
        .groupBy(col("l_returnflag"))
        .agg(expr("wavg_price(qty, cents)").as("wavg_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
               / 100.0 AS wavg_price
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """))

  // ------------------------------------------------------------------
  // q68 TableFunction: typed flatMap tokenizer (one row in, n rows out)
  // ------------------------------------------------------------------

  val q68Udtf: QueryDef = QueryDef(
    "q68_udtf",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "part")
        .filter(col("p_partkey") <= 200)
        .select(col("p_partkey").as[Long], col("p_name").as[String])
        .flatMap { case (k, name) =>
          name.split(" ").iterator.zipWithIndex.map {
            case (tok, i) => (k, i, tok)
          }
        }
        .toDF("p_partkey", "pos", "token")
        .select(col("p_partkey"), col("pos").cast("int").as("pos"),
          col("token"))
        .orderBy(col("p_partkey"), col("pos"))
    },
    Some("""
      SELECT p_partkey, CAST(u.pos AS INT) AS pos, u.token AS token
      FROM (
        SELECT p_partkey,
               unnest([{'pos': i - 1, 'token': t[i]}
                       for i in generate_series(1, len(t))]) AS u
        FROM (SELECT p_partkey, string_split(p_name, ' ') AS t
              FROM part WHERE p_partkey <= 200))
      ORDER BY p_partkey, pos
    """))

  // ------------------------------------------------------------------
  // q79 TableAggregateFunction (emitValue emits N rows per group, e.g.
  // the reference's Top2 example): flatMapGroups with an O(1) top-2
  // buffer — constant memory per group, no full-group sort
  // ------------------------------------------------------------------

  val q79TableAgg: QueryDef = QueryDef(
    "q79_table_agg",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag").as[String],
          col("l_orderkey").as[Long], col("l_linenumber").as[Long],
          col("l_extendedprice").as[Double])
        .groupByKey(_._1)
        .flatMapGroups { (flag, rows) =>
          // price desc, then (orderkey, linenumber) asc — total order
          val ord = Ordering.by[(String, Long, Long, Double),
            (Double, Long, Long)](r => (-r._4, r._2, r._3))
          var best: List[(String, Long, Long, Double)] = Nil
          rows.foreach { r =>
            best = (r :: best).sorted(ord).take(2)
          }
          best.sorted(ord).zipWithIndex.map { case (r, i) =>
            (flag, i + 1, r._2, r._3, r._4)
          }.iterator
        }
        .toDF("l_returnflag", "rnk", "l_orderkey", "l_linenumber", "price")
        .orderBy(col("l_returnflag"), col("rnk"))
    },
    Some("""
      SELECT l_returnflag, CAST(rnk AS INT) AS rnk, l_orderkey,
             l_linenumber, price
      FROM (SELECT l_returnflag, l_orderkey, l_linenumber,
                   l_extendedprice AS price,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag
                     ORDER BY l_extendedprice DESC, l_orderkey,
                              l_linenumber) AS rnk
            FROM lineitem)
      WHERE rnk <= 2
      ORDER BY l_returnflag, rnk
    """))

  val all: Seq[QueryDef] = Seq(q66UdfScalar, q67Udaf, q68Udtf, q79TableAgg)
}
