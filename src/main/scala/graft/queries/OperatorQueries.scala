package graft.queries

import graft.{FlinkSql, QueryDef, Tables}
import graft.operators.{AsyncLookup, CdcFormats, LookupJoin, Multimodal, TemporalJoin, TmpWorkspaces}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Custom-operator surface beyond plain relational queries: temporal
  * (as-of) join, lookup join, deduplicate keep-last, CDC changelog
  * decoding, the Flink-SQL dialect layer, and multimodal binary-column
  * plumbing (SURVEY.md §2.4, §2.6, §2.1 CDC, §7 steps 6-8 + north-star
  * extras).
  */
object OperatorQueries {

  // ------------------------------------------------------------------
  // q45 temporal as-of join: last purchase at-or-before each click
  // ------------------------------------------------------------------

  val q45AsofJoin: QueryDef = QueryDef(
    "q45_asof_join",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      TemporalJoin.asOf(clicks, purchases, key = "user_id",
          leftTs = "ts", rightTs = "ts",
          rightCols = Seq("purchase_id", "purchase_value"),
          rightVersionTieBreak = "purchase_id")
        .select(col("click_id"), col("user_id"),
          col("purchase_id"), col("purchase_value"))
        .orderBy(col("click_id"))
    },
    Some("""
      SELECT c.event_id AS click_id, c.user_id,
             p.event_id AS purchase_id, p.value AS purchase_value
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND c.ts >= p.ts
      ORDER BY click_id
    """))

  // ------------------------------------------------------------------
  // q46 lookup join: point lookups + LRU cache against a dim store
  // ------------------------------------------------------------------

  val q46LookupJoin: QueryDef = QueryDef(
    "q46_lookup_join",
    (s, dir) => {
      val dim = Tables.load(s, dir, "nation")
        .join(broadcast(Tables.load(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
      val (store, outSchema) = LookupJoin.storeFrom(dim)
      LookupJoin.enrich(
          Tables.load(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"), col("s_nationkey")),
          "s_nationkey", store, outSchema, cacheSize = 8)
        .orderBy(col("s_suppkey"))
    },
    Some("""
      SELECT s_suppkey, s_name, s_nationkey, n_name, r_name
      FROM supplier
      LEFT JOIN nation ON s_nationkey = n_nationkey
      LEFT JOIN region ON n_regionkey = r_regionkey
      ORDER BY s_suppkey
    """))

  // ------------------------------------------------------------------
  // q98 batched lookup join — the async-lookup-I/O analog: distinct
  // keys of each 64-row batch go out as ONE multi-get per partition.
  // Same semantics as q46, so the same left-outer oracle.
  // ------------------------------------------------------------------

  val q98LookupBatched: QueryDef = QueryDef(
    "q98_lookup_batched",
    (s, dir) => {
      val dim = Tables.load(s, dir, "nation")
        .join(broadcast(Tables.load(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
      val (store, outSchema) = LookupJoin.batchedStoreFrom(dim)
      LookupJoin.enrichBatched(
          Tables.load(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"), col("s_nationkey")),
          "s_nationkey", store, outSchema, batchSize = 64)
        .orderBy(col("s_suppkey"))
    },
    Some("""
      SELECT s_suppkey, s_name, s_nationkey, n_name, r_name
      FROM supplier
      LEFT JOIN nation ON s_nationkey = n_nationkey
      LEFT JOIN region ON n_regionkey = r_regionkey
      ORDER BY s_suppkey
    """))

  // ------------------------------------------------------------------
  // q122 ASYNC lookup join (AsyncWaitOperator / unorderedWait analog):
  // per-key lookups run concurrently behind a capacity-32 in-flight
  // window with simulated per-key latency (deterministic, hash-derived
  // — no RNG) and UNORDERED emission, so completion order differs from
  // input order; the final ORDER BY restores determinism and the same
  // left-outer oracle as q46/q98 proves every row enriched exactly
  // once regardless of completion interleaving.
  // ------------------------------------------------------------------

  val q122AsyncLookup: QueryDef = QueryDef(
    "q122_async_lookup",
    (s, dir) => {
      val dim = Tables.load(s, dir, "nation")
        .join(broadcast(Tables.load(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
      val (store, outSchema) = AsyncLookup.asyncStoreFrom(
        dim, k => (k.asInstanceOf[Number].longValue() % 4).toLong)
      AsyncLookup.enrichAsync(
          Tables.load(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"), col("s_nationkey")),
          "s_nationkey", store, outSchema, capacity = 32,
          timeoutMs = 30000, ordered = false)
        .orderBy(col("s_suppkey"))
    },
    Some("""
      SELECT s_suppkey, s_name, s_nationkey, n_name, r_name
      FROM supplier
      LEFT JOIN nation ON s_nationkey = n_nationkey
      LEFT JOIN region ON n_regionkey = r_regionkey
      ORDER BY s_suppkey
    """))

  // ------------------------------------------------------------------
  // q47 deduplicate keep-last (the reference's StreamExecDeduplicate
  // ROW_NUMBER()=1 ORDER BY time DESC pattern, batch semantics)
  // ------------------------------------------------------------------

  val q47DedupKeepLast: QueryDef = QueryDef(
    "q47_dedup_keep_last",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.load(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("last_event_id"),
          unix_micros(col("ts")).as("ts_us"))
        .orderBy(col("user_id"), col("event_type"))
    },
    Some("""
      SELECT user_id, event_type, event_id AS last_event_id,
             CAST(epoch_us(ts) AS BIGINT) AS ts_us
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1
      ORDER BY user_id, event_type
    """))

  // ------------------------------------------------------------------
  // q48 debezium CDC decode → changelog rollup by row_kind
  // ------------------------------------------------------------------

  private val cdcPayload = new StructType()
    .add("o_orderkey", "long").add("o_custkey", "long")

  val q48CdcDebezium: QueryDef = QueryDef(
    "q48_cdc_debezium",
    (s, dir) => {
      // envelopes derived deterministically from orders: F→insert,
      // O→update (before has custkey -1), P→delete
      val env = Tables.load(s, dir, "orders").select(
        to_json(struct(
          when(col("o_orderstatus") =!= "F",
            struct(col("o_orderkey"), lit(-1L).as("o_custkey"))).as("before"),
          when(col("o_orderstatus") =!= "P",
            struct(col("o_orderkey"), col("o_custkey"))).as("after"),
          when(col("o_orderstatus") === "F", "c")
            .when(col("o_orderstatus") === "O", "u")
            .otherwise("d").as("op"),
          lit(0L).as("ts_ms"))).as("j"))
      CdcFormats.fromDebezium(env, col("j"), cdcPayload)
        .groupBy(col("row_kind"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_key"))
        .orderBy(col("row_kind"))
    },
    Some("""
      WITH k AS (
        SELECT CASE o_orderstatus WHEN 'F' THEN 'c' WHEN 'O' THEN 'u'
                    ELSE 'd' END AS op, o_orderkey
        FROM orders),
      cl AS (
        SELECT '+I' AS row_kind, o_orderkey FROM k WHERE op = 'c'
        UNION ALL SELECT '-U', o_orderkey FROM k WHERE op = 'u'
        UNION ALL SELECT '+U', o_orderkey FROM k WHERE op = 'u'
        UNION ALL SELECT '-D', o_orderkey FROM k WHERE op = 'd')
      -- CAST: DuckDB SUM(BIGINT) yields HUGEINT, which pandas widens to
      -- float64 and the driver's hash then mismatches Spark's int64.
      SELECT row_kind, COUNT(*) AS n,
             CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
      FROM cl GROUP BY row_kind ORDER BY row_kind
    """))

  // ------------------------------------------------------------------
  // q49 canal CDC decode → same rollup shape (old-overlay semantics)
  // ------------------------------------------------------------------

  val q49CdcCanal: QueryDef = QueryDef(
    "q49_cdc_canal",
    (s, dir) => {
      val env = Tables.load(s, dir, "orders").select(
        to_json(struct(
          array(struct(col("o_orderkey"), col("o_custkey"))).as("data"),
          when(col("o_orderstatus") === "O",
            array(struct(lit(null).cast("long").as("o_orderkey"),
              lit(-1L).as("o_custkey")))).as("old"),
          when(col("o_orderstatus") === "F", "INSERT")
            .when(col("o_orderstatus") === "O", "UPDATE")
            .otherwise("DELETE").as("type"))).as("j"))
      CdcFormats.fromCanal(env, col("j"), cdcPayload)
        .groupBy(col("row_kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_key"),
          sum(col("o_custkey")).as("sum_cust"))
        .orderBy(col("row_kind"))
    },
    Some("""
      WITH cl AS (
        SELECT '+I' AS row_kind, o_orderkey, o_custkey
        FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT '-U', o_orderkey, -1   -- old overlays changed field only
        FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT '+U', o_orderkey, o_custkey
        FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT '-D', o_orderkey, o_custkey
        FROM orders WHERE o_orderstatus = 'P')
      SELECT row_kind, COUNT(*) AS n,
             CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
             CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
      FROM cl GROUP BY row_kind ORDER BY row_kind
    """))

  // ------------------------------------------------------------------
  // q50 Flink-SQL dialect: TUMBLE group-window text runs unchanged
  // ------------------------------------------------------------------

  val q50FlinkSqlTumble: QueryDef = QueryDef(
    "q50_flink_sql_tumble",
    (s, dir) => {
      graft.streaming.StreamRunner.useHeapState(s)
      Tables.registerAll(s, dir)
      FlinkSql.sql(s, """
        SELECT unix_timestamp(TUMBLE_START(ts, INTERVAL '1' DAY)) AS day_start,
               event_type,
               COUNT(*) AS n,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY TUMBLE(ts, INTERVAL '1' DAY), event_type
        ORDER BY day_start, event_type
      """)
    },
    Some("""
      SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
             event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      FROM events
      GROUP BY 1, 2
      ORDER BY day_start, event_type
    """))

  // ------------------------------------------------------------------
  // q51 multimodal: binary payload + metadata → featurize + frames
  // ------------------------------------------------------------------

  val q51Multimodal: QueryDef = QueryDef(
    "q51_multimodal",
    (s, dir) => {
      val assets = Multimodal.attachPayload(
        Tables.load(s, dir, "documents"), "text")
      val feats = Multimodal.featurize(assets, "doc_id")
      val frames = Multimodal.sampleFrames(assets, "doc_id", frameBytes = 100)
        .groupBy(col("asset_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("frame_bytes")).as("total_bytes"))
      feats.join(frames, "asset_id")
        .select(col("asset_id"), col("head_byte"), col("n_bytes"),
          col("content_hash"), col("n_frames"), col("total_bytes"))
        .orderBy(col("asset_id"))
    },
    Some("""
      SELECT doc_id AS asset_id,
             CASE WHEN length(text) = 0 THEN -1
                  ELSE ascii(substr(text, 1, 1)) END AS head_byte,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS content_hash,
             CAST(greatest(1, ceil(octet_length(encode(text)) / 100.0)) AS BIGINT)
               AS n_frames,
             CAST(octet_length(encode(text)) AS BIGINT) AS total_bytes
      FROM documents
      ORDER BY asset_id
    """))

  // ------------------------------------------------------------------
  // q97 full CDC pipeline as a STREAM: debezium envelopes synthesized
  // from orders (every order inserts; 'O' orders update price+100 12h
  // later; 'P' orders delete 24h later) → CdcFormats.fromDebezium →
  // RetractableAgg consuming the decoded row_kind changelog → final
  // per-customer snapshot. Composes the FLIP-105 decode, the row_kind
  // convention, and retractable aggregation end-to-end; the oracle
  // aggregates the analytically-final live set under the same
  // watermark cutoff.
  // ------------------------------------------------------------------

  private val cdcPricedPayload = new StructType()
    .add("o_orderkey", "long").add("o_custkey", "long")
    .add("price", "double")

  val q97CdcRetractPipeline: QueryDef = QueryDef(
    "q97_cdc_retract_pipeline",
    (s, dir) => {
      graft.streaming.StreamRunner.requireRocksDb(s)
      import s.implicits._
      val ord = graft.streaming.StreamRunner.tableStream(s, dir, "orders")
      val pay = struct(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").as("price"))
      val payUpd = struct(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") + 100).as("price"))
      val none = when(lit(false), pay)
      val ts0 = unix_millis(col("o_orderdate").cast("timestamp"))
      def env(op: String, offMs: Long, before: org.apache.spark.sql.Column,
          after: org.apache.spark.sql.Column) =
        to_json(struct(before.as("before"), after.as("after"),
          lit(op).as("op"), (ts0 + offMs).as("ts_ms")))
      // all of an order's envelopes in ONE pass over the source (a
      // 3-way union would re-read the orders file once per branch)
      val envelopes = ord.select(explode(array_compact(array(
        env("c", 0L, none, pay),
        when(col("o_orderstatus") === "O",
          env("u", 43200000L, pay, payUpd)),
        when(col("o_orderstatus") === "P",
          env("d", 86400000L, pay, none))))).as("j"))
      val changelog = CdcFormats
        .fromDebezium(envelopes, col("j"), cdcPricedPayload)
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .withWatermark("ts", "1 hour")
        .select(col("o_custkey").as("key"), col("row_kind").as("rowKind"),
          col("ts_ms").as("tsMs"), col("o_orderkey").as("id"),
          col("price").as("value"))
        .as[graft.streaming.RetractableAgg.RaEvent]
      // snapshot emission: one state row per key per timer fire, so the
      // sink carries O(keys × fires), never the O(changes) changelog —
      // the per-record emission semantics are q90's subject, not this
      // pipeline's, and staging 240k+ updates through the harness sink
      // was the one driver-memory-shaped step in the repo (r3 verdict)
      val table = graft.streaming.StreamRunner.runToTable(
        graft.streaming.RetractableAgg.snapshots(changelog).toDF(), "append")
      table.groupBy(col("key").as("o_custkey"))
        .agg(max_by(
          struct(col("cnt"), col("sumCents"), col("minCents"),
            col("maxCents")), col("seq")).as("f"))
        .select(col("o_custkey"), col("f.cnt").as("cnt"),
          col("f.sumCents").as("sum_cents"),
          col("f.minCents").as("min_cents"),
          col("f.maxCents").as("max_cents"))
        .filter(col("cnt") > 0)
        .orderBy(col("o_custkey"))
    },
    Some("""
      WITH synth_ms AS (
        SELECT epoch_ms(o_orderdate) AS ms FROM orders
        UNION ALL SELECT epoch_ms(o_orderdate) + 43200000
        FROM orders WHERE o_orderstatus = 'O'
        UNION ALL SELECT epoch_ms(o_orderdate) + 86400000
        FROM orders WHERE o_orderstatus = 'P'),
      cutoff AS (SELECT MAX(ms) - 3600000 AS wm FROM synth_ms),
      live AS (
        SELECT o_custkey,
               CASE WHEN o_orderstatus = 'O'
                         AND epoch_ms(o_orderdate) + 43200000
                             <= (SELECT wm FROM cutoff)
                    THEN o_totalprice + 100 ELSE o_totalprice END AS v
        FROM orders
        WHERE epoch_ms(o_orderdate) <= (SELECT wm FROM cutoff)
          AND NOT (o_orderstatus = 'P'
                   AND epoch_ms(o_orderdate) + 86400000
                       <= (SELECT wm FROM cutoff)))
      SELECT o_custkey, COUNT(*) AS cnt,
             CAST(SUM(CAST(ROUND(v * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
             MIN(CAST(ROUND(v * 100) AS BIGINT)) AS min_cents,
             MAX(CAST(ROUND(v * 100) AS BIGINT)) AS max_cents
      FROM live GROUP BY o_custkey ORDER BY o_custkey
    """))

  // ------------------------------------------------------------------
  // q118 binaryFile-source ingestion round-trip: documents written as
  // one .bin asset per doc (executor-side, no collect), read back
  // through spark.read.format("binaryFile") — the path real media
  // corpora enter by — and featurized. The oracle computes the same
  // byte-level features from the text directly, so any divergence in
  // the write→scan→parse chain (encoding, truncation, path parsing)
  // hash-fails.
  // ------------------------------------------------------------------

  val q118BinaryIngest: QueryDef = QueryDef(
    "q118_binary_ingest",
    (s, dir) => {
      // PID-scoped fixed workspace — see [[TmpWorkspaces.pidScoped]]
      // for the leak-bound / concurrent-JVM / dead-PID-sweep contract
      val assetDir = TmpWorkspaces.pidScoped("graft_assets_q118_", dir)
      Multimodal.writeAssets(
        Tables.load(s, dir, "documents"), "doc_id", "text", assetDir.toString)
      Multimodal.featurize(
          Multimodal.ingestBinaryDir(s, assetDir.toString), "asset_id")
        .orderBy(col("asset_id"))
    },
    Some("""
      SELECT doc_id AS asset_id,
             CASE WHEN length(text) = 0 THEN -1
                  ELSE ascii(substr(text, 1, 1)) END AS head_byte,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS content_hash
      FROM documents
      ORDER BY asset_id
    """))

  val all: Seq[QueryDef] = Seq(
    q45AsofJoin, q46LookupJoin, q47DedupKeepLast,
    q48CdcDebezium, q49CdcCanal, q50FlinkSqlTumble, q51Multimodal,
    q97CdcRetractPipeline, q98LookupBatched, q118BinaryIngest,
    q122AsyncLookup)
}
