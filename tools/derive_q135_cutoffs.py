#!/usr/bin/env python3
"""Derive the q135 head/middle/tail NLL cutoffs (T1, T2).

q135 (CurationQueries.q135QualityMix) buckets documents at FIXED NLL
thresholds — the CCNet pattern of shipping per-language perplexity
cutoffs computed offline — precisely so bucketing stays a narrow map
(a global ntile would serialize the corpus through one sort partition
at 100 TB). This script is the "offline" step, checked in so the
constants are regenerable instead of magic: it replays the oracle's
exact unigram-NLL arithmetic (same normalize/tokenize SQL, same
floor(ln*1e6) fixed-point, same round(,6)) over the documents fixture
in DuckDB and prints the corpus NLL tertiles.

Usage:  python3 tools/derive_q135_cutoffs.py [sf_dir]
        (default /root/testdata/sf0.01 — the correctness-gate scale)

The shipped constants were derived at sf0.01 (this script prints
tertiles 3.399790 / 3.403900 there):
    T1 = 3.3998   (33.3rd percentile, rounded to 4 decimals)
    T2 = 3.404    (66.7th percentile, rounded to 3 decimals)
If the fixture's text distribution shifts, re-run this script and
update T1/T2 in BOTH the Spark closure and the oracle SQL of
q135QualityMix (they share the constants by construction).
"""
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# Mirrors TextOps.normalizeSql / tokensSql (operators/TextOps.scala).
TOKENS = ("string_split(trim(regexp_replace(regexp_replace(lower(text),"
          " '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')")

NLL_SQL = f"""
WITH tk AS (SELECT doc_id, unnest({TOKENS}) AS tok
            FROM read_parquet('{SF_DIR}/documents.parquet')),
tf  AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
tot AS (SELECT SUM(tf) AS total_toks FROM tf),
cnts AS (SELECT tok, SUM(tf) AS cnt FROM tf GROUP BY 1),
sc AS (SELECT t.doc_id, t.tf,
              CAST(FLOOR(ln(CAST(c.cnt AS DOUBLE) / tt.total_toks)
                         * 1000000.0) AS BIGINT) AS lpf
       FROM tf t JOIN cnts c USING (tok) CROSS JOIN tot tt),
agg AS (SELECT doc_id, round(-(SUM(tf * lpf)) / (1000000.0 * SUM(tf)), 6)
                 AS nll
        FROM sc GROUP BY 1)
SELECT quantile_cont(nll, 1.0/3) AS t1,
       quantile_cont(nll, 2.0/3) AS t2,
       COUNT(*) AS n_docs, MIN(nll) AS min_nll, MAX(nll) AS max_nll
FROM agg
"""

t1, t2, n, lo, hi = duckdb.sql(NLL_SQL).fetchone()
print(f"fixture: {SF_DIR}  docs={n}  nll range [{lo:.6f}, {hi:.6f}]")
print(f"tertiles: T1={t1:.6f}  T2={t2:.6f}")
print(f"rounded: T1(4dp)={round(t1, 4)}  T2(3dp)={round(t2, 3)}"
      "  — ship these as q135QualityMix's T1/T2")
