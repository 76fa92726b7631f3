package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.functions._

/** Training-data curation surface: deterministic sampling, PII
  * redaction, and leakage-checked train/test splitting — the operations
  * a 100 TB pretraining pipeline runs after dedup and before sharding.
  * All three are hash-deterministic (see [[graft.operators.Curation]]),
  * so each has an exact DuckDB oracle.
  */
object CurationQueries {

  import PipelineQueries.{minhashPairCtes, NumHashes, Bands, ShingleN}

  // ------------------------------------------------------------------
  // q109 deterministic stratified sampling
  // ------------------------------------------------------------------

  /** Exact-5-per-language sample by md5 order (one shuffle on `lang`),
    * plus the zero-shuffle Bernoulli flag (25% rate) on the same rows —
    * both sampling modes in one result.
    */
  val q109StratifiedSample: QueryDef = QueryDef(
    "q109_stratified_sample",
    (s, dir) =>
      Curation.stratifiedTopK(Tables.load(s, dir, "documents"), "lang", "doc_id", 5)
        .withColumn("in_bernoulli", Curation.bernoulliFlag(col("doc_id"), "3"))
        .select(col("lang"), col("doc_id"), col("rk"), col("in_bernoulli"))
        .orderBy(col("lang"), col("rk")),
    Some("""
      SELECT lang, doc_id, rk,
             (substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '3') AS in_bernoulli
      FROM (SELECT lang, doc_id,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM documents) t
      WHERE rk <= 5
      ORDER BY lang, rk
    """))

  // ------------------------------------------------------------------
  // q110 PII redaction
  // ------------------------------------------------------------------

  /** The synthetic documents carry no PII, so the fixture injects a
    * deterministic email / URL / 7-digit reference derived from doc_id
    * (identically in the oracle), then redacts. Counts are taken on the
    * pre-redaction text; the redaction chain replaces URLs first so an
    * address embedded in a URL is never double-masked.
    */
  val q110PiiRedaction: QueryDef = QueryDef(
    "q110_pii_redaction",
    (s, dir) => {
      val withPii = Tables.load(s, dir, "documents").withColumn("text2",
        concat(
          col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or visit https://example.com/d/"),
          col("doc_id").cast("string"), lit(" ref "),
          (col("doc_id") * 7919 + 1000000).cast("string"), lit(" end")))
      withPii.select(
          col("doc_id"),
          Curation.piiCount(col("text2"), Curation.UrlRe).as("n_urls"),
          Curation.piiCount(col("text2"), Curation.EmailRe).as("n_emails"),
          Curation.piiCount(col("text2"), Curation.LongNumRe).as("n_nums"),
          Curation.redactPii(col("text2")).as("redacted"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH wp AS (SELECT doc_id,
        text || ' contact user' || CAST(doc_id AS VARCHAR)
             || '@example.com or visit https://example.com/d/'
             || CAST(doc_id AS VARCHAR) || ' ref '
             || CAST(doc_id * 7919 + 1000000 AS VARCHAR) || ' end' AS text2
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(text2, '${Curation.UrlRe}')) AS BIGINT) AS n_urls,
        CAST(len(regexp_extract_all(text2, '${Curation.EmailRe}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(text2, '${Curation.LongNumRe}')) AS BIGINT) AS n_nums,
        regexp_replace(regexp_replace(regexp_replace(text2,
          '${Curation.UrlRe}', '<URL>', 'g'),
          '${Curation.EmailRe}', '<EMAIL>', 'g'),
          '${Curation.LongNumRe}', '<NUM>', 'g') AS redacted
      FROM wp
      ORDER BY doc_id
    """))

  // ------------------------------------------------------------------
  // q111 hash split + cross-split leakage check
  // ------------------------------------------------------------------

  /** Group-aware train/test split by source (so near-dups sharing a
    * source stay together), then the leakage audit: minhash near-dup
    * pairs whose endpoints landed in DIFFERENT splits. At scale this is
    * the standard pre-sharding QA gate — a non-empty result means the
    * split key is too fine-grained for the duplication structure.
    */
  val q111SplitLeakage: QueryDef = QueryDef(
    "q111_split_leakage",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val splits = docs.select(
        col("doc_id"), Curation.hashSplit(col("source")).as("split"))
      Dedup.minhashDedup(docs, "doc_id", "text",
          NumHashes, Bands, ShingleN, threshold = 0.8)
        .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
        .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
        .filter(col("split_a") =!= col("split_b"))
        .select(col("doc_a"), col("doc_b"), col("jaccard"),
          col("split_a"), col("split_b"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""
      WITH $minhashPairCtes,
      spl AS (SELECT doc_id,
                CASE WHEN substr(md5(source), 1, 1) <= 'b'
                     THEN 'train' ELSE 'test' END AS split
              FROM documents)
      SELECT p.doc_a, p.doc_b, p.jaccard,
             a.split AS split_a, b.split AS split_b
      FROM pairs p
      JOIN spl a ON a.doc_id = p.doc_a
      JOIN spl b ON b.doc_id = p.doc_b
      WHERE a.split <> b.split
      ORDER BY p.doc_a, p.doc_b
    """))

  val all: Seq[QueryDef] =
    Seq(q109StratifiedSample, q110PiiRedaction, q111SplitLeakage)
}
