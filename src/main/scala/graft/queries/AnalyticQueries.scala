package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic / ranking window functions — SURVEY.md §2.6.
  * RANK / DENSE_RANK / FIRST_VALUE / LAST_VALUE are 1.11 surface;
  * NTILE / PERCENT_RANK / CUME_DIST are our documented superset
  * (absent in Flink 1.11, native in Spark — SURVEY §2.6 analytic row).
  */
object AnalyticQueries {

  /** q24_first_last — FIRST_VALUE/LAST_VALUE over an explicit ROWS frame. */
  val q24FirstLast: QueryDef = QueryDef(
    "q24_first_last",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "orders")
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          first(col("o_orderkey")).over(full).as("first_ok"),
          last(col("o_orderkey")).over(full).as("last_ok"),
          count(lit(1)).over(full).as("n_orders"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_custkey,
             FIRST_VALUE(o_orderkey) OVER w AS first_ok,
             LAST_VALUE(o_orderkey) OVER w AS last_ok,
             COUNT(*) OVER w AS n_orders
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_orderkey
    """))

  /** q25_rank_family — RANK/DENSE_RANK (+ NTILE/PERCENT_RANK/CUME_DIST
    * superset) over a deterministic total order.
    */
  val q25RankFamily: QueryDef = QueryDef(
    "q25_rank_family",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.load(s, dir, "customer")
        .select(
          col("c_custkey"),
          col("c_mktsegment"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_mktsegment,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk,
             NTILE(4) OVER w AS quartile,
             PERCENT_RANK() OVER w AS prnk,
             CUME_DIST() OVER w AS cdist
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_custkey
    """))

  /** q26_stats_agg — STDDEV/VAR family (1.11 surface: STDDEV_POP/SAMP,
    * VAR_POP/SAMP). Integer inputs keep double math bit-stable; rounded
    * to 6 decimals to absorb Welford-vs-two-pass differences.
    */
  val q26StatsAgg: QueryDef = QueryDef(
    "q26_stats_agg",
    (s, dir) =>
      Tables.load(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n"),
          round(stddev_samp(col("p_size").cast("double")), 6).as("sd_samp"),
          round(stddev_pop(col("p_size").cast("double")), 6).as("sd_pop"),
          round(var_samp(col("p_size").cast("double")), 6).as("v_samp"),
          round(var_pop(col("p_size").cast("double")), 6).as("v_pop"))
        .orderBy(col("p_brand")),
    Some("""
      SELECT p_brand, COUNT(*) AS n,
             round(stddev_samp(CAST(p_size AS DOUBLE)), 6) AS sd_samp,
             round(stddev_pop(CAST(p_size AS DOUBLE)), 6) AS sd_pop,
             round(var_samp(CAST(p_size AS DOUBLE)), 6) AS v_samp,
             round(var_pop(CAST(p_size AS DOUBLE)), 6) AS v_pop
      FROM part
      GROUP BY p_brand
      ORDER BY p_brand
    """))

  /** q27_minby_maxby — DataSet minBy/maxBy parity (SURVEY §2.5 DataSet
    * aggs row) via native min_by/max_by.
    */
  val q27MinByMaxBy: QueryDef = QueryDef(
    "q27_minby_maxby",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("cheapest_ok"),
          max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("priciest_ok"))
        .orderBy(col("o_orderstatus")),
    Some("""
      SELECT o_orderstatus,
             MIN(CASE WHEN rn_asc = 1 THEN o_orderkey END) AS cheapest_ok,
             MIN(CASE WHEN rn_desc = 1 THEN o_orderkey END) AS priciest_ok
      FROM (
        SELECT o_orderstatus, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey) AS rn_asc,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_desc
        FROM orders) t
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """))

  val all: Seq[QueryDef] = Seq(q24FirstLast, q25RankFamily, q26StatsAgg, q27MinByMaxBy)
}
