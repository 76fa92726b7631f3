package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining batch-surface coverage for SURVEY.md §2.8/§2.9 rows not
  * yet exercised elsewhere: bag set-ops, CUBE / GROUPING SETS, lateral
  * positional explode, RANGE window frames, the wider string/temporal
  * scalar families, multiset COLLECT, and the approx-distinct superset.
  */
object CoverageQueries {

  // ------------------------------------------------------------------
  // q52 INTERSECT ALL / EXCEPT ALL (bag semantics, §2.8)
  // ------------------------------------------------------------------

  val q52SetopsAll: QueryDef = QueryDef(
    "q52_setops_all",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val done = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val both = open.intersectAll(done)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_inter"))
      val only = open.exceptAll(done)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_exc"))
      both.join(only, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("n_inter"), lit(0L)).as("n_inter"),
          coalesce(col("n_exc"), lit(0L)).as("n_exc"))
        .orderBy(col("o_custkey"))
    },
    Some("""
      WITH open_o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
      done_o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
      i AS (SELECT o_custkey, COUNT(*) AS n_inter
            FROM (SELECT * FROM open_o INTERSECT ALL SELECT * FROM done_o)
            GROUP BY 1),
      e AS (SELECT o_custkey, COUNT(*) AS n_exc
            FROM (SELECT * FROM open_o EXCEPT ALL SELECT * FROM done_o)
            GROUP BY 1)
      SELECT COALESCE(i.o_custkey, e.o_custkey) AS o_custkey,
             COALESCE(n_inter, 0) AS n_inter, COALESCE(n_exc, 0) AS n_exc
      FROM i FULL OUTER JOIN e ON i.o_custkey = e.o_custkey
      ORDER BY o_custkey
    """))

  // ------------------------------------------------------------------
  // q53 CUBE + GROUPING_ID (§2.5 grouping sets family)
  // ------------------------------------------------------------------

  val q53Cube: QueryDef = QueryDef(
    "q53_cube",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping_id(col("o_orderstatus"), col("o_orderpriority"))
            .cast("int").as("gid"))
        .orderBy(col("gid"),
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
    Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus ASC NULLS FIRST,
               o_orderpriority ASC NULLS FIRST
    """))

  // ------------------------------------------------------------------
  // q54 explicit GROUPING SETS via SQL (§2.5)
  // ------------------------------------------------------------------

  val q54GroupingSets: QueryDef = QueryDef(
    "q54_grouping_sets",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
      """)
    },
    Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """))

  // ------------------------------------------------------------------
  // q55 lateral positional explode (Correlate/UNNEST WITH ORDINALITY)
  // ------------------------------------------------------------------

  val q55Posexplode: QueryDef = QueryDef(
    "q55_posexplode",
    (s, dir) =>
      Tables.load(s, dir, "part")
        .filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
        .select(col("p_partkey"), col("pos").cast("int").as("pos"), col("word"))
        .orderBy(col("p_partkey"), col("pos")),
    Some("""
      SELECT p_partkey, CAST(u.pos AS INT) AS pos, u.word AS word
      FROM (
        SELECT p_partkey,
               unnest([{'pos': i - 1, 'word': t[i]}
                       for i in generate_series(1, len(t))]) AS u
        FROM (SELECT p_partkey, string_split(p_name, ' ') AS t
              FROM part WHERE p_partkey <= 200))
      ORDER BY p_partkey, pos
    """))

  // ------------------------------------------------------------------
  // q56 RANGE window frame over a numeric key (§2.6 frames)
  // ------------------------------------------------------------------

  val q56RangeFrame: QueryDef = QueryDef(
    "q56_range_frame",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("okey"))
        .rangeBetween(-100, 0)
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey").as("okey"))
        .withColumn("n_in_range", count(lit(1)).over(w))
        .orderBy(col("o_custkey"), col("okey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey AS okey,
             COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                            RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
               AS n_in_range
      FROM orders
      ORDER BY o_custkey, okey
    """))

  // ------------------------------------------------------------------
  // q57 wider string-function family (§2.9 string row)
  // ------------------------------------------------------------------

  val q57StringFns2: QueryDef = QueryDef(
    "q57_string_fns2",
    (s, dir) =>
      Tables.load(s, dir, "part")
        .filter(col("p_partkey") <= 500)
        .select(
          col("p_partkey"),
          initcap(col("p_brand")).as("brand_ic"),
          overlay(col("p_type"), lit("XX"), lit(2), lit(2)).as("type_ov"),
          locate("a", col("p_name")).cast("int").as("pos_a"),
          translate(col("p_type"), "aeiou", "AEIOU").as("type_tr"),
          lpad(col("p_brand"), 12, "*").as("brand_pad"),
          repeat(col("p_brand"), 2).as("brand_rep"),
          reverse(col("p_brand")).as("brand_rev"),
          ascii(col("p_name")).cast("int").as("head_code"),
          base64(encode(col("p_brand"), "UTF-8")).as("brand_b64"),
          hex(encode(col("p_brand"), "UTF-8")).as("brand_hex"),
          sha2(col("p_brand"), 256).as("brand_sha256"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey,
             -- initcap: capitalize each space-separated word
             list_aggregate(list_transform(string_split(lower(p_brand), ' '),
               w -> upper(substr(w, 1, 1)) || substr(w, 2)), 'string_agg', ' ')
               AS brand_ic,
             substr(p_type, 1, 1) || 'XX' || substr(p_type, 4) AS type_ov,
             CAST(CASE WHEN position('a' IN p_name) IS NULL THEN 0
                  ELSE position('a' IN p_name) END AS INT) AS pos_a,
             translate(p_type, 'aeiou', 'AEIOU') AS type_tr,
             lpad(p_brand, 12, '*') AS brand_pad,
             repeat(p_brand, 2) AS brand_rep,
             reverse(p_brand) AS brand_rev,
             CAST(ascii(p_name) AS INT) AS head_code,
             to_base64(encode(p_brand)) AS brand_b64,
             upper(to_hex(encode(p_brand))) AS brand_hex,
             sha256(p_brand) AS brand_sha256
      FROM part
      WHERE p_partkey <= 500
      ORDER BY p_partkey
    """))

  // ------------------------------------------------------------------
  // q58 wider temporal-function family (§2.9 temporal row)
  // ------------------------------------------------------------------

  val q58TemporalFns2: QueryDef = QueryDef(
    "q58_temporal_fns2",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") <= 2000)
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm").as("fmt"),
          unix_timestamp(expr("timestampadd(DAY, 30, o_orderdate)")).as("plus30d"),
          expr("timestampdiff(DAY, o_orderdate, timestamp'1998-01-01 00:00:00')")
            .cast("long").as("days_to_98"),
          quarter(col("o_orderdate")).cast("int").as("qtr"),
          weekofyear(col("o_orderdate")).cast("int").as("wk"),
          dayofweek(col("o_orderdate")).cast("int").as("dow"),
          unix_timestamp(date_trunc("quarter", col("o_orderdate")))
            .as("qtr_start"),
          round(months_between(lit("1998-01-01").cast("timestamp"),
            col("o_orderdate")), 4).as("months_to_98"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d %H:%M') AS fmt,
             CAST(epoch(o_orderdate + INTERVAL 30 DAY) AS BIGINT) AS plus30d,
             CAST(datediff('day', o_orderdate, TIMESTAMP '1998-01-01')
                  AS BIGINT) AS days_to_98,
             CAST(quarter(o_orderdate) AS INT) AS qtr,
             CAST(weekofyear(o_orderdate) AS INT) AS wk,
             CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
             CAST(epoch(date_trunc('quarter', o_orderdate)) AS BIGINT)
               AS qtr_start,
             -- Spark months_between: whole months + (d1-d2)/31 (times
             -- are midnight here, so no seconds component)
             round((1998 - year(o_orderdate)) * 12 + (1 - month(o_orderdate))
                   + (1 - day(o_orderdate)) / 31.0, 4) AS months_to_98
      FROM orders
      WHERE o_orderkey <= 2000
      ORDER BY o_orderkey
    """))

  // ------------------------------------------------------------------
  // q59 multiset COLLECT (§2.5 agg functions): value→count map,
  // serialized deterministically
  // ------------------------------------------------------------------

  val q59Multiset: QueryDef = QueryDef(
    "q59_multiset",
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("l_returnflag"))
        .agg(array_join(sort_array(collect_list(
          concat(col("l_linestatus"), lit(":"), col("n")))), ",")
          .as("multiset"))
        .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
             string_agg(ls || ':' || n, ',' ORDER BY ls || ':' || n) AS multiset
      FROM (SELECT l_returnflag, l_linestatus AS ls, COUNT(*) AS n
            FROM lineitem GROUP BY 1, 2)
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """))

  // ------------------------------------------------------------------
  // q60 approx_count_distinct — superset capability (HLL++). The HLL
  // estimate itself is engine-specific, so the hash-stable contract is
  // the exact count plus a tolerance assertion: |approx-exact|/exact
  // must stay within HLL++'s default rsd (0.05) ×3. The DuckDB twin
  // emits the exact count and TRUE, so a drifting estimate flips the
  // boolean and fails the hash gate.
  // ------------------------------------------------------------------

  val q60ApproxDistinct: QueryDef = QueryDef(
    "q60_approx_distinct",
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey")).as("approx"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("approx") - col("exact_orders"))
            <= col("exact_orders") * lit(0.15)).as("within_tolerance"))
        .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
             COUNT(DISTINCT l_orderkey) AS exact_orders,
             TRUE AS within_tolerance
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """))

  // ------------------------------------------------------------------
  // q100 approx percentile — superset capability like q60: the sketch
  // estimate is engine-specific, so the hash-stable contract is the
  // exact percentile plus a tolerance boolean. percentile_approx with
  // accuracy 10000 must land within 1% of the exact p50/p95 (DuckDB
  // twin: exact quantile + TRUE).
  // ------------------------------------------------------------------

  val q100ApproxPercentile: QueryDef = QueryDef(
    "q100_approx_percentile",
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("p50_exact"),
          expr("percentile(l_extendedprice, 0.95)").as("p95_exact"),
          expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("p50_a"),
          expr("percentile_approx(l_extendedprice, 0.95, 10000)").as("p95_a"))
        .select(col("l_returnflag"),
          round(col("p50_exact"), 4).as("p50_exact"),
          round(col("p95_exact"), 4).as("p95_exact"),
          (abs(col("p50_a") - col("p50_exact"))
            <= col("p50_exact") * 0.01).as("p50_ok"),
          (abs(col("p95_a") - col("p95_exact"))
            <= col("p95_exact") * 0.01).as("p95_ok"))
        .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
             round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_exact,
             TRUE AS p50_ok, TRUE AS p95_ok
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """))

  val all: Seq[QueryDef] = Seq(
    q100ApproxPercentile,
    q52SetopsAll, q53Cube, q54GroupingSets, q55Posexplode, q56RangeFrame,
    q57StringFns2, q58TemporalFns2, q59Multiset, q60ApproxDistinct)
}
