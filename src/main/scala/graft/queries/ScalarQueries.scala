package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.FlinkFunctions
import org.apache.spark.sql.functions._

/** Scalar-function surface — SURVEY.md §2.9 (string / math / temporal /
  * conditional / JSON / collection families). Every expression here is a
  * Spark built-in or a codegen-friendly composition from
  * [[graft.functions.FlinkFunctions]]; no black-box UDFs on these paths.
  */
object ScalarQueries {

  /** q16_string_fns — string family over `part` (reference inventory:
    * SqlFunctionUtils / StringCallGen, SURVEY §2.9).
    */
  val q16StringFns: QueryDef = QueryDef(
    "q16_string_fns",
    (s, dir) =>
      Tables.load(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("u_name"),
          lower(col("p_brand")).as("l_brand"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_type"), 1, 5).as("type5"),
          concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "a", "X").as("name_x"),
          lpad(col("p_brand"), 12, "_").as("brand_pad"),
          reverse(col("p_name")).as("name_rev"),
          instr(col("p_name"), "e").cast("long").as("pos_e"),
          md5(col("p_name")).as("name_md5"),
          sha2(col("p_name"), 256).as("name_sha256"),
          FlinkFunctions.splitIndex(col("p_name"), " ", 0).as("first_word"),
          ascii(col("p_brand")).cast("int").as("brand_ascii"),
          repeat(col("p_brand"), 2).as("brand_twice"),
          trim(lpad(col("p_brand"), 12, " ")).as("brand_trim"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey,
             upper(p_name) AS u_name,
             lower(p_brand) AS l_brand,
             length(p_name) AS name_len,
             substring(p_type, 1, 5) AS type5,
             concat_ws('#', p_brand, p_type) AS brand_type,
             regexp_replace(p_name, 'a', 'X', 'g') AS name_x,
             lpad(p_brand, 12, '_') AS brand_pad,
             reverse(p_name) AS name_rev,
             instr(p_name, 'e') AS pos_e,
             md5(p_name) AS name_md5,
             sha256(p_name) AS name_sha256,
             string_split(p_name, ' ')[1] AS first_word,
             ascii(p_brand) AS brand_ascii,
             repeat(p_brand, 2) AS brand_twice,
             trim(lpad(p_brand, 12, ' ')) AS brand_trim
      FROM part
      ORDER BY p_partkey
    """))

  /** q17_math_fns — math family (SqlFunctionUtils math + ScalarOperatorGens). */
  val q17MathFns: QueryDef = QueryDef(
    "q17_math_fns",
    (s, dir) =>
      Tables.load(s, dir, "part")
        .select(
          col("p_partkey"),
          abs(col("p_size") - 25).cast("int").as("abs_sz"),
          (col("p_size") % 7).cast("int").as("mod_sz"),
          round(col("p_retailprice").cast("decimal(12,2)"), 1).as("price_r1"),
          floor(col("p_retailprice")).cast("long").as("price_floor"),
          ceil(col("p_retailprice")).cast("long").as("price_ceil"),
          sqrt(col("p_size").cast("double")).as("sqrt_sz"),
          pow(lit(2), (col("p_size") % 5).cast("double")).as("pow2"),
          signum(col("p_size") - 25).cast("int").as("sign_sz"),
          greatest(col("p_size"), lit(10)).cast("long").as("gr"),
          least(col("p_size"), lit(40)).cast("long").as("ls"),
          FlinkFunctions.truncate(col("p_retailprice"), 1).as("price_trunc1"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey,
             abs(p_size - 25) AS abs_sz,
             p_size % 7 AS mod_sz,
             round(CAST(p_retailprice AS DECIMAL(12,2)), 1) AS price_r1,
             CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
             CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
             sqrt(CAST(p_size AS DOUBLE)) AS sqrt_sz,
             power(2, p_size % 5) AS pow2,
             CAST(sign(p_size - 25) AS INT) AS sign_sz,
             CAST(greatest(p_size, 10) AS BIGINT) AS gr,
             CAST(least(p_size, 40) AS BIGINT) AS ls,
             CASE WHEN p_retailprice >= 0 THEN floor(p_retailprice * 10) ELSE ceil(p_retailprice * 10) END / 10 AS price_trunc1
      FROM part
      ORDER BY p_partkey
    """))

  /** q18_temporal_fns — temporal family (SqlDateTimeUtils, SURVEY §2.9). */
  val q18TemporalFns: QueryDef = QueryDef(
    "q18_temporal_fns",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          weekday(col("o_orderdate")).cast("long").as("wd"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since"),
          last_day(col("o_orderdate").cast("date")).as("month_end"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey,
             year(o_orderdate) AS y,
             quarter(o_orderdate) AS q,
             month(o_orderdate) AS m,
             dayofmonth(o_orderdate) AS d,
             isodow(o_orderdate) - 1 AS wd,
             dayofyear(o_orderdate) AS doy,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             CAST(o_orderdate AS DATE) + 30 AS plus30,
             datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
             last_day(CAST(o_orderdate AS DATE)) AS month_end,
             CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      FROM orders
      ORDER BY o_orderkey
    """))

  /** q19_conditional — CASE/COALESCE/NULLIF/IF family. */
  val q19Conditional: QueryDef = QueryDef(
    "q19_conditional",
    (s, dir) =>
      Tables.load(s, dir, "customer")
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "debt")
            .when(col("c_acctbal") < 5000, "low")
            .otherwise("high").as("bal_bucket"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(none)")).as("seg_or"),
          (col("c_acctbal") > 0).cast("boolean").as("positive"))
        .orderBy(col("c_custkey")),
    Some("""
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN 'debt'
                  WHEN c_acctbal < 5000 THEN 'low'
                  ELSE 'high' END AS bal_bucket,
             nullif(c_mktsegment, 'BUILDING') AS seg_nb,
             coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg_or,
             c_acctbal > 0 AS positive
      FROM customer
      ORDER BY c_custkey
    """))

  /** q20_json — JSON access over events.props (superset of 1.11, which
    * only had JSON formats — SURVEY §2.9 JSON row).
    */
  val q20Json: QueryDef = QueryDef(
    "q20_json",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .select(
          col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
             MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """))

  /** q21_events_hourly — batch shape of the tumbling group window
    * (reference: StreamExecGroupWindowAggregate TUMBLE — SURVEY §2.5;
    * streaming twin lives in graft.streaming).
    */
  val q21EventsHourly: QueryDef = QueryDef(
    "q21_events_hourly",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("hour_epoch")),
    Some("""
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
             COUNT(*) AS n,
             COUNT(DISTINCT user_id) AS n_users
      FROM events
      GROUP BY 1
      ORDER BY hour_epoch
    """))

  /** q22_collection — array functions, 1-based access parity
    * (reference: CARDINALITY / ELEMENT / item access — SURVEY §2.9).
    */
  val q22Collection: QueryDef = QueryDef(
    "q22_collection",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(
          col("doc_id"),
          FlinkFunctions.cardinality(col("toks")).as("n_toks"),
          FlinkFunctions.elementAt1(col("toks"), lit(1)).as("first_tok"),
          element_at(col("toks"), -1).as("last_tok"),
          array_contains(col("toks"), "the").as("has_the"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_toks,
             string_split(text, ' ')[1] AS first_tok,
             string_split(text, ' ')[-1] AS last_tok,
             list_contains(string_split(text, ' '), 'the') AS has_the
      FROM documents
      ORDER BY doc_id
    """))

  /** q23_listagg — COLLECT / LISTAGG parity with deterministic ordering
    * (reference agg functions inventory, SURVEY §2.5).
    */
  val q23Listagg: QueryDef = QueryDef(
    "q23_listagg",
    (s, dir) =>
      Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          array_join(array_sort(collect_list(col("s_name"))), ",").as("suppliers"),
          count(lit(1)).as("n"))
        .orderBy(col("n_name")),
    Some("""
      SELECT n_name,
             string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
             COUNT(*) AS n
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name
    """))

  /** q92_string_fns3 — third string/binary batch (reference inventory:
    * SqlFunctionUtils OVERLAY/TRANSLATE/LEFT/RIGHT, binary
    * TO_BASE64/FROM_BASE64/HEX, BIT_LENGTH/OCTET_LENGTH, SURVEY §2.9).
    * DuckDB lacks OVERLAY, so its twin is the substring-splice
    * identity; base64 round-trips through encode().
    */
  val q92StringFns3: QueryDef = QueryDef(
    "q92_string_fns3",
    (s, dir) =>
      Tables.load(s, dir, "part")
        .select(
          col("p_partkey"),
          expr("overlay(p_name placing 'XX' from 3 for 2)").as("ovl"),
          translate(col("p_name"), "aeiou", "AEIOU").as("trans"),
          expr("left(p_name, 6)").as("l6"),
          expr("right(p_name, 6)").as("r6"),
          base64(col("p_brand").cast("binary")).as("b64"),
          expr("decode(unbase64(base64(cast(p_brand as binary))), 'UTF-8')")
            .as("b64_rt"),
          hex(col("p_brand").cast("binary")).as("hx"),
          expr("char(66)").as("chr_b"),
          bit_length(col("p_brand")).cast("long").as("bits"),
          octet_length(col("p_name")).cast("long").as("octets"),
          regexp_extract(col("p_type"), "([a-z]+)", 1).as("first_lower"),
          format_string("%s/%d", col("p_brand"), col("p_partkey"))
            .as("fmt"),
          expr("replace(p_type, ' ', '-')").as("dashed"),
          col("p_name").startsWith("a").as("starts_a"),
          col("p_type").endsWith("STEEL").as("ends_steel"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey,
             substring(p_name, 1, 2) || 'XX' || substring(p_name, 5)
               AS ovl,
             translate(p_name, 'aeiou', 'AEIOU') AS trans,
             left(p_name, 6) AS l6,
             right(p_name, 6) AS r6,
             to_base64(encode(p_brand)) AS b64,
             p_brand AS b64_rt,
             upper(hex(encode(p_brand))) AS hx,
             chr(66) AS chr_b,
             CAST(bit_length(p_brand) AS BIGINT) AS bits,
             CAST(octet_length(encode(p_name)) AS BIGINT) AS octets,
             coalesce(regexp_extract(p_type, '([a-z]+)', 1), '')
               AS first_lower,
             printf('%s/%d', p_brand, p_partkey) AS fmt,
             replace(p_type, ' ', '-') AS dashed,
             starts_with(p_name, 'a') AS starts_a,
             suffix(p_type, 'STEEL') AS ends_steel
      FROM part
      ORDER BY p_partkey
    """))

  /** q107_string_fns4 — remaining §2.9 surface: PARSE_URL, STR_TO_MAP,
    * CONVERT_TZ, RPAD, UUID (reference: SqlFunctionUtils#parseUrl /
    * #strToMap, SqlDateTimeUtils#convertTz, BuiltInFunctionDefinitions
    * UUID — SURVEY §2.9). DuckDB lacks parse_url/str_to_map, so the
    * oracle recomputes each part from the same source columns; UUID is
    * non-deterministic, so the hash-stable contract is the v4 shape
    * check (boolean). CONVERT_TZ: naive-as-UTC → wall-clock string,
    * DuckDB twin via timezone(tz, timezone('UTC', ts)).
    */
  val q107StringFns4: QueryDef = QueryDef(
    "q107_string_fns4",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") <= 2000)
        .withColumn("prio", regexp_replace(col("o_orderpriority"), " ", "_"))
        .withColumn("url", concat(lit("https://orders.example.com/o/"),
          col("o_orderkey"), lit("?status="), col("o_orderstatus"),
          lit("&prio="), col("prio")))
        .withColumn("kv", concat(lit("status="), col("o_orderstatus"),
          lit(",prio="), col("prio")))
        .select(
          col("o_orderkey"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY')").as("query"),
          expr("parse_url(url, 'QUERY', 'prio')").as("q_prio"),
          expr("element_at(str_to_map(kv, ',', '='), 'status')")
            .as("m_status"),
          expr("element_at(str_to_map(kv, ',', '='), 'prio')").as("m_prio"),
          rpad(col("o_orderstatus"), 4, "*").as("status_rpad"),
          expr("uuid() rlike '^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-" +
            "[89ab][0-9a-f]{3}-[0-9a-f]{12}$'").as("uuid_v4"),
          date_format(from_utc_timestamp(col("o_orderdate"),
            "America/New_York"), "yyyy-MM-dd HH:mm:ss").as("ny_wall"),
          date_format(from_utc_timestamp(col("o_orderdate"), "Asia/Tokyo"),
            "yyyy-MM-dd HH:mm:ss").as("tokyo_wall"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey,
             'orders.example.com' AS host,
             '/o/' || o_orderkey AS path,
             'status=' || o_orderstatus || '&prio='
               || replace(o_orderpriority, ' ', '_') AS query,
             replace(o_orderpriority, ' ', '_') AS q_prio,
             o_orderstatus AS m_status,
             replace(o_orderpriority, ' ', '_') AS m_prio,
             rpad(o_orderstatus, 4, '*') AS status_rpad,
             TRUE AS uuid_v4,
             strftime(timezone('America/New_York',
               timezone('UTC', o_orderdate)), '%Y-%m-%d %H:%M:%S')
               AS ny_wall,
             strftime(timezone('Asia/Tokyo', timezone('UTC', o_orderdate)),
               '%Y-%m-%d %H:%M:%S') AS tokyo_wall
      FROM orders
      WHERE o_orderkey <= 2000
      ORDER BY o_orderkey
    """))

  val all: Seq[QueryDef] = Seq(
    q16StringFns, q17MathFns, q18TemporalFns, q19Conditional, q20Json,
    q21EventsHourly, q22Collection, q23Listagg, q92StringFns3,
    q107StringFns4)
}
