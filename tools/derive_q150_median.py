#!/usr/bin/env python3
"""Derive q150/q152's shared BigramNllMedian keep cutoff.

PipelineQueries.BigramNllMedian (= 3.387) is the corpus MEDIAN of the
bigram-LM NLL at the correctness-gate fixture (sf0.01) — chosen so
BOTH the kept and dropped classes are populated at test scale (q150's
"both classes exercised" premise, and q152's survivor frame being a
strict non-empty subset). The gates stay green under any shared
constant (both engines embed the same literal), so if the fixture is
regenerated this script is the check that the constant is still the
median: it replays the oracle's exact bigram-NLL arithmetic (same
normalize/tokenize SQL, same add-one smoothing over the
bigram-position vocabulary, same floor(ln*1e6) fixed-point, same
round(,6)) in DuckDB and prints the median + the class split at the
shipped constant.

Usage:  python3 tools/derive_q150_median.py [sf_dir]
        (default /root/testdata/sf0.01 — the correctness-gate scale)

The shipped constant was derived at sf0.01: median 3.387039, rounded
DOWN to 3 decimals = 3.387 (the median doc itself stays kept; class
split there 249 kept / 251 dropped, and 240/260 at sf0.001). If the
fixture shifts, update BigramNllMedian in PipelineQueries.scala — the
Spark closures and oracle SQL of q150/q152 share it by construction —
and keep TextAnalysisSpec's "both classes populated" assertion green.
"""
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# Mirrors TextOps.normalizeSql / tokensSql (operators/TextOps.scala).
TOKENS = ("string_split(trim(regexp_replace(regexp_replace(lower(text),"
          " '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')")

# Mirrors TextAnalysis.bigramNllCtesSql (operators/TextAnalysis.scala).
NLL_SQL = f"""
WITH t AS (SELECT doc_id, {TOKENS} AS toks
           FROM read_parquet('{SF_DIR}/documents.parquet')),
bi AS (SELECT doc_id, toks[j] AS w1, toks[j + 1] AS w2
       FROM (SELECT doc_id, toks,
                    unnest(generate_series(1, len(toks) - 1)) AS j
             FROM t WHERE len(toks) >= 2) x),
btf AS (SELECT doc_id, w1, w2, COUNT(*) AS btf FROM bi GROUP BY 1, 2, 3),
cb AS (SELECT w1, w2, SUM(btf) AS cb FROM btf GROUP BY 1, 2),
cl AS (SELECT w1, SUM(cb) AS cl FROM cb GROUP BY 1),
v AS (SELECT COUNT(DISTINCT tok) AS v
      FROM (SELECT w1 AS tok FROM btf
            UNION ALL SELECT w2 AS tok FROM btf) u),
sc AS (SELECT b.doc_id, b.btf,
              CAST(FLOOR(ln((c.cb + 1.0) / (l.cl + vv.v))
                         * 1000000.0) AS BIGINT) AS lpf
       FROM btf b
       JOIN cb c ON b.w1 = c.w1 AND b.w2 = c.w2
       JOIN cl l ON b.w1 = l.w1
       CROSS JOIN v vv),
bagg AS (SELECT doc_id, SUM(btf * lpf) AS s, SUM(btf) AS n_big
         FROM sc GROUP BY 1),
bnll AS (SELECT doc_id, round(-(s) / (1000000.0 * n_big), 6) AS nll
         FROM bagg)
SELECT quantile_cont(nll, 0.5) AS median_nll,
       COUNT(*) AS n_docs,
       SUM(CASE WHEN nll <= 3.387 THEN 1 ELSE 0 END) AS kept_at_shipped,
       SUM(CASE WHEN nll > 3.387 THEN 1 ELSE 0 END) AS dropped_at_shipped
FROM bnll
"""

row = duckdb.sql(NLL_SQL).fetchone()
print(f"fixture:            {SF_DIR}")
print(f"median nll:         {row[0]:.6f}")
print(f"docs scored:        {row[1]}")
print(f"kept at 3.387:      {row[2]}")
print(f"dropped at 3.387:   {row[3]}")
print("shipped BigramNllMedian = 3.387 "
      "(PipelineQueries.scala — update if the median moved)")
