package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch relational surface — SURVEY.md §2.3–§2.8.
  *
  * Mirrors the reference capabilities (Blink batch physical nodes:
  * BatchExecHashAggregate / BatchExecHashJoin / BatchExecSortMergeJoin /
  * BatchExecRank / BatchExecSortLimit / set-op rewrite rules — see
  * SURVEY.md §2 for the class anchors) re-expressed as declarative
  * DataFrame plans so Catalyst picks hash/sort-merge/broadcast physical
  * strategies and pushes filters/projections into the parquet scans.
  *
  * Scale notes (100 TB posture):
  *  - dimension tables (region/nation/supplier/part ≤ a few GB at any SF)
  *    are joined with explicit `broadcast()` hints — no shuffle of the
  *    fact table for enrichment joins;
  *  - fact-fact joins key on the join column and rely on AQE for skew;
  *  - aggregates are plain groupBy → Spark plans partial/final
  *    (map-side combine) automatically.
  */
object RelationalQueries {

  private def money(c: Column): Column = c.cast(QueryDef.Money)

  private def li(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "lineitem")
  private def ord(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "orders")
  private def cust(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "customer")
  private def supp(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "supplier")
  private def nat(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "nation")
  private def reg(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "region")
  private def prt(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "part")

  /** q1_agg — TPC-H Q1 shape: scan → pushed filter → hash agg → sort.
    * Reference: BatchExecHashAggregate + BatchExecSort (SURVEY §2.5/§2.7).
    */
  val q1Agg: QueryDef = QueryDef(
    "q1_agg",
    (s, dir) =>
      li(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // money math stays exact DECIMAL; the FINAL column is cast to
          // DOUBLE because the driver's hash canonicalizes decimals
          // asymmetrically (trailing-zero repr) — ADVICE.md r01 high.
          sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(money(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """))

  /** q2_star_join — revenue by nation through the dim chain; all dims
    * broadcast (reference picks broadcast below
    * table.optimizer.join.broadcast-threshold — SURVEY §2.4).
    */
  val q2StarJoin: QueryDef = QueryDef(
    "q2_star_join",
    (s, dir) =>
      li(s, dir)
        .join(broadcast(supp(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name")),
    Some("""
      SELECT r_name, n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name
    """))

  /** q3_topn — TPC-H Q3 shape: fact-fact join + agg + deterministic
    * top-10 (BatchExecSortLimit → TakeOrderedAndProjectExec).
    */
  val q3TopN: QueryDef = QueryDef(
    "q3_topn",
    (s, dir) => {
      val o = ord(s, dir).filter(col("o_orderstatus") =!= "F")
      li(s, dir)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_custkey"))
        .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some("""
      SELECT o_orderkey, o_custkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus <> 'F'
      GROUP BY o_orderkey, o_custkey
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10
    """))

  /** q4_semi_join — EXISTS rewrite → left_semi
    * (reference: FlinkSubQueryRemoveRule, SURVEY §2.4 join types).
    */
  val q4SemiJoin: QueryDef = QueryDef(
    "q4_semi_join",
    (s, dir) => {
      val big = li(s, dir).filter(col("l_quantity") > 49).select(col("l_orderkey"))
      ord(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), money(col("o_totalprice")).cast("double").as("o_total"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_total
      FROM orders
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
      ORDER BY o_orderkey
    """))

  /** q5_anti_join — NOT EXISTS rewrite → left_anti: parts that never
    * shipped in bulk (predicate chosen to yield rows at every SF).
    */
  val q5AntiJoin: QueryDef = QueryDef(
    "q5_anti_join",
    (s, dir) => {
      val bulk = li(s, dir).filter(col("l_quantity") > 45).select(col("l_partkey"))
      prt(s, dir)
        .join(bulk, col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"), col("p_brand"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey, p_name, p_brand
      FROM part
      WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
      ORDER BY p_partkey
    """))

  /** q6_rollup — grouping sets / ROLLUP + GROUPING markers
    * (reference: DecomposeGroupingSetsRule → Expand, SURVEY §2.5).
    */
  val q6Rollup: QueryDef = QueryDef(
    "q6_rollup",
    (s, dir) =>
      li(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
        .orderBy(
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
    Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
             CAST(GROUPING(l_linestatus) AS INT) AS g_ls
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """))

  /** q7_window_rank — per-nation top-3 suppliers by balance
    * (reference: BatchExecRank / ROW_NUMBER pattern, SURVEY §2.6).
    */
  val q7WindowRank: QueryDef = QueryDef(
    "q7_window_rank",
    (s, dir) => {
      val w = Window.partitionBy(col("n_name"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
      supp(s, dir)
        .join(broadcast(nat(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("n_name"), col("s_name"),
          money(col("s_acctbal")).cast("double").as("bal"), col("rn"))
        .orderBy(col("n_name"), col("rn"))
    },
    Some("""
      SELECT n_name, s_name, CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal, CAST(rn AS INT) AS rn
      FROM (
        SELECT n_name, s_name, s_acctbal,
               ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey) AS rn
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
      ) t
      WHERE rn <= 3
      ORDER BY n_name, rn
    """))

  /** q8_window_running — running sum / lag over explicit ROWS frame
    * (reference: BatchExecOverAggregate, SURVEY §2.5/§2.6 frames).
    */
  val q8WindowRunning: QueryDef = QueryDef(
    "q8_window_running",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      ord(s, dir)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          money(col("o_totalprice")).cast("double").as("price"),
          sum(money(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_total"),
          lag(money(col("o_totalprice")), 1).over(w).cast("double").as("prev_price"),
          lead(money(col("o_totalprice")), 1).over(w).cast("double").as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
             CAST(LAG(CAST(o_totalprice AS DECIMAL(12,2)), 1) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev_price,
             CAST(LEAD(CAST(o_totalprice AS DECIMAL(12,2)), 1) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS next_price
      FROM orders
      ORDER BY o_custkey, o_orderkey
    """))

  /** q9_setops — INTERSECT (reference: ReplaceIntersectWithSemiJoinRule). */
  val q9SetOps: QueryDef = QueryDef(
    "q9_setops",
    (s, dir) => {
      val o = ord(s, dir)
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    },
    Some("""
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY o_custkey
    """))

  /** q9b_except — EXCEPT (reference: ReplaceMinusWithAntiJoinRule). */
  val q9bExcept: QueryDef = QueryDef(
    "q9b_except",
    (s, dir) => {
      val o = ord(s, dir)
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .except(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    },
    Some("""
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      ORDER BY o_custkey
    """))

  /** q10_unnest — UNNEST/explode (reference: LogicalUnnestRule →
    * Catalyst Generate, SURVEY §2.3): top document tokens.
    */
  val q10Unnest: QueryDef = QueryDef(
    "q10_unnest",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20),
    Some("""
      SELECT token, COUNT(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      WHERE token <> ''
      GROUP BY token
      ORDER BY cnt DESC, token
      LIMIT 20
    """))

  /** q12_distinct_agg — COUNT(DISTINCT) split (reference:
    * SplitAggregateRule skew mitigation; Catalyst plans Expand + 2-phase).
    */
  val q12DistinctAgg: QueryDef = QueryDef(
    "q12_distinct_agg",
    (s, dir) =>
      ord(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"),
          max(money(col("o_totalprice"))).cast("double").as("max_price"),
          min(money(col("o_totalprice"))).cast("double").as("min_price"))
        .orderBy(col("o_orderstatus")),
    Some("""
      SELECT o_orderstatus,
             COUNT(DISTINCT o_custkey) AS n_cust,
             COUNT(*) AS n_orders,
             CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
             CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """))

  /** q13_scalar_subquery — HAVING vs scalar subquery threshold
    * (reference: FlinkSubQueryRemoveRule scalar path).
    */
  val q13ScalarSubquery: QueryDef = QueryDef(
    "q13_scalar_subquery",
    (s, dir) => {
      val o = ord(s, dir)
      // scalar subquery as a broadcast cross-join: no driver-side collect,
      // the 1-row threshold relation broadcasts to every executor.
      val thr = o.agg(
        (sum(money(col("o_totalprice"))).cast("double") / count(lit(1)) * 2).as("thr"))
      o.groupBy(col("o_custkey"))
        .agg(sum(money(col("o_totalprice"))).cast("double").as("total"))
        .crossJoin(broadcast(thr))
        .filter(col("total") > col("thr"))
        .select(col("o_custkey"), col("total"))
        .orderBy(col("o_custkey"))
    },
    Some("""
      SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY o_custkey
      HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) >
             (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) * 2 FROM orders)
      ORDER BY o_custkey
    """))

  /** q14_outer_join — LEFT OUTER dim → fact with preserved empty groups. */
  val q14OuterJoin: QueryDef = QueryDef(
    "q14_outer_join",
    (s, dir) =>
      nat(s, dir)
        .join(cust(s, dir), col("c_nationkey") === col("n_nationkey"), "left")
        .groupBy(col("n_name"))
        .agg(
          count(col("c_custkey")).as("n_cust"),
          coalesce(sum(money(col("c_acctbal"))), lit(0).cast("decimal(12,2)"))
            .cast("double").as("sum_bal"))
        .orderBy(col("n_name")),
    Some("""
      SELECT n_name, COUNT(c_custkey) AS n_cust,
             CAST(COALESCE(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 0) AS DOUBLE) AS sum_bal
      FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name
    """))

  /** q15_full_outer — FULL OUTER join of two aggregates. */
  val q15FullOuter: QueryDef = QueryDef(
    "q15_full_outer",
    (s, dir) => {
      val byCust = ord(s, dir).groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      val c = cust(s, dir).filter(col("c_acctbal") > 0)
        .select(col("c_custkey"), col("c_mktsegment"))
      c.join(byCust, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_mktsegment"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("custkey"))
    },
    Some("""
      SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_mktsegment,
             COALESCE(n_orders, 0) AS n_orders
      FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 0) c
      FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
        ON c_custkey = o_custkey
      ORDER BY custkey
    """))

  val all: Seq[QueryDef] = Seq(
    q1Agg, q2StarJoin, q3TopN, q4SemiJoin, q5AntiJoin, q6Rollup,
    q7WindowRank, q8WindowRunning, q9SetOps, q9bExcept, q10Unnest,
    q12DistinctAgg, q13ScalarSubquery, q14OuterJoin, q15FullOuter)
}
