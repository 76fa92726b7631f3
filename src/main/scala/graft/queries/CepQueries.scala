package graft.queries

import graft.QueryDef
import graft.streaming.{Cep, StreamRunner}
import graft.streaming.Cep.{CepEvent, Pattern, Step}
import org.apache.spark.sql.functions._

/** CEP pattern queries (flink-cep / MATCH_RECOGNIZE subset): run as
  * real streaming jobs through [[graft.streaming.Cep]]. The NO_SKIP
  * variant emits every match combination — expressible as an ordered
  * self-join, so it gets a full DuckDB oracle (with the same watermark
  * cutoff: only events the watermark passed are processed). The greedy
  * SKIP_PAST_LAST variant is not SQL-expressible (that is the point of
  * CEP) → rows-only check + ScalaTest spec.
  */
object CepQueries {

  private val Wm = "1 hour"
  private val WithinMs = 3L * 24 * 3600 * 1000 // 3 days

  private def cepStream(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    StreamRunner.eventsStream(s, dir)
      .withWatermark("ts", Wm)
      .select(col("user_id").as("key"),
        expr("unix_micros(ts) div 1000").as("tsMs"),
        col("event_type").as("tag"), col("event_id").as("id"), col("ts"),
        col("value").as("num"))
      .as[CepEvent]
  }

  private def pattern(skipPastLast: Boolean) = Pattern(
    steps = Seq(
      Step("signup", _.tag == "signup"),
      Step("purchase", _.tag == "purchase"),
      Step("error", _.tag == "error")),
    withinMs = WithinMs, skipPastLast = skipPastLast)

  // ------------------------------------------------------------------
  // q61 NO_SKIP: every signup → purchase → error within 3 days
  // ------------------------------------------------------------------

  val q61CepAllMatches: QueryDef = QueryDef(
    "q61_cep_all_matches",
    (s, dir) => {
      StreamRunner.requireRocksDb(s)
      val m = Cep(cepStream(s, dir), pattern(skipPastLast = false)).toDF()
      StreamRunner.runToTable(m
          .select(col("key").as("user_id"),
            col("ids")(0).as("signup_id"), col("ids")(1).as("purchase_id"),
            col("ids")(2).as("error_id"),
            col("startTsMs").as("start_ms"), col("endTsMs").as("end_ms")),
          "append")
        .orderBy(col("user_id"), col("signup_id"), col("purchase_id"),
          col("error_id"))
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, event_type, event_id,
               CAST(floor(epoch_us(ts) / 1000) AS BIGINT) AS ms
        FROM events
        WHERE ts <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
      )
      SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id,
             r.event_id AS error_id, s.ms AS start_ms, r.ms AS end_ms
      FROM e s
      JOIN e p ON p.user_id = s.user_id AND p.event_type = 'purchase'
              AND (p.ms > s.ms OR (p.ms = s.ms AND p.event_id > s.event_id))
      JOIN e r ON r.user_id = s.user_id AND r.event_type = 'error'
              AND (r.ms > p.ms OR (r.ms = p.ms AND r.event_id > p.event_id))
      WHERE s.event_type = 'signup' AND r.ms - s.ms <= $WithinMs
      ORDER BY s.user_id, signup_id, purchase_id, error_id
    """))

  // ------------------------------------------------------------------
  // q62 SKIP_PAST_LAST: greedy single-pass matching. SQL-checkable
  // after all: each partial advances deterministically (first matching
  // event per step, non-strict steps survive gaps), so a signup s has a
  // fixed completion chain — first purchase after s, first error after
  // that purchase — valid iff error.ms - s.ms <= within. Greedy
  // arbitration = repeatedly pick the candidate with the earliest
  // completion position (ties → oldest signup) among signups after the
  // previous match's completion event; a recursive CTE walks that.
  // ------------------------------------------------------------------

  val q62CepSkipPastLast: QueryDef = QueryDef(
    "q62_cep_skip_past_last",
    (s, dir) => {
      StreamRunner.requireRocksDb(s)
      val m = Cep(cepStream(s, dir), pattern(skipPastLast = true)).toDF()
      StreamRunner.runToTable(m
          .select(col("key").as("user_id"),
            col("ids")(0).as("signup_id"), col("ids")(1).as("purchase_id"),
            col("ids")(2).as("error_id")),
          "append")
        .orderBy(col("user_id"), col("signup_id"))
    },
    Some(s"""
      WITH RECURSIVE e AS (
        SELECT user_id, event_type, event_id,
               CAST(floor(epoch_us(ts) / 1000) AS BIGINT) AS ms,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
                 CAST(floor(epoch_us(ts) / 1000) AS BIGINT), event_id) AS rn
        FROM events
        WHERE ts <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
      ),
      nx AS (
        SELECT *,
               MIN(CASE WHEN event_type = 'purchase' THEN rn END) OVER w
                 AS next_pur_rn,
               MIN(CASE WHEN event_type = 'error' THEN rn END) OVER w
                 AS next_err_rn
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
      ),
      cand AS (
        SELECT s.user_id, s.rn AS s_rn, s.event_id AS signup_id,
               s.ms AS s_ms, p.event_id AS purchase_id,
               r.event_id AS error_id, r.rn AS end_rn
        FROM nx s
        JOIN nx p ON p.user_id = s.user_id AND p.rn = s.next_pur_rn
        JOIN nx r ON r.user_id = s.user_id AND r.rn = p.next_err_rn
        WHERE s.event_type = 'signup' AND r.ms - s.ms <= $WithinMs
      ),
      greedy AS (
        (SELECT user_id, s_rn, signup_id, purchase_id, error_id, end_rn
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY end_rn, s_rn) AS pick FROM cand)
         WHERE pick = 1)
        UNION ALL
        SELECT c.user_id, c.s_rn, c.signup_id, c.purchase_id, c.error_id,
               c.end_rn
        FROM greedy g, LATERAL (
          SELECT * FROM cand c
          WHERE c.user_id = g.user_id AND c.s_rn > g.end_rn
          ORDER BY c.end_rn, c.s_rn LIMIT 1) c
      )
      SELECT user_id, signup_id, purchase_id, error_id
      FROM greedy ORDER BY user_id, signup_id
    """))

  // ------------------------------------------------------------------
  // q78 SQL MATCH_RECOGNIZE: the Flink SQL surface translated onto the
  // same NFA with STRICT row-adjacency (SQL-standard pattern
  // concatenation) — oracle = per-key LEAD adjacency
  // ------------------------------------------------------------------

  val q78MatchRecognize: QueryDef = QueryDef(
    "q78_match_recognize",
    (s, dir) => {
      StreamRunner.requireRocksDb(s)
      graft.MatchRecognizeSql.run(s, dir, """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES A.event_id AS signup_id, B.event_id AS error_id
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (A B)
          WITHIN INTERVAL '1' DAY
          DEFINE A AS A.event_type = 'signup',
                 B AS B.event_type = 'error'
        )""")
        .orderBy(col("user_id"), col("signup_id"), col("error_id"))
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, event_type, event_id,
               CAST(floor(epoch_us(ts) / 1000) AS BIGINT) AS ms
        FROM events
        WHERE ts <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)),
      nxt AS (
        SELECT user_id, event_type, event_id, ms,
               LEAD(event_type) OVER w AS n_type,
               LEAD(event_id) OVER w AS n_id,
               LEAD(ms) OVER w AS n_ms
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id))
      SELECT user_id, event_id AS signup_id, n_id AS error_id
      FROM nxt
      WHERE event_type = 'signup' AND n_type = 'error'
        AND n_ms - ms <= 86400000
      ORDER BY user_id, signup_id, error_id
    """))

  val all: Seq[QueryDef] =
    Seq(q61CepAllMatches, q62CepSkipPastLast, q78MatchRecognize)
}
