#!/usr/bin/env python3
"""Oracle canonicalization lint: DESCRIBE every oracle SQL in DuckDB and
flag output column types the driver's hash canonicalizes differently
from Spark's result schema even when the VALUES are identical:

  - HUGEINT / UHUGEINT — DuckDB's SUM(BIGINT) result type; Spark has no
    int128, so the driver's canonical form never matches.
  - DECIMAL(38,*) — DuckDB widens SUM(DECIMAL(p,s)) to precision 38
    while Spark widens to min(38, p+10); the mismatched precision trips
    the hash.

Three rounds were lost to this trap (q1-family in r1, q93/q94 in r3,
q104 in r4). The fix is always the same: CAST the offending aggregate
to BIGINT / DOUBLE (or a matching explicit DECIMAL) in the oracle SQL.

Usage: lint_oracle_types.py <sfDir> <oracleJson>
Exit 0 = clean, 2 = flagged, 3 = infra unavailable (caller should skip).
"""
import json
import re
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, oracle_json: str) -> int:
    try:
        import duckdb
    except ImportError:
        print("SKIP: duckdb unavailable")
        return 3
    # environment failures (missing/unreadable fixture parquet, bad input
    # file) are declared skips (exit 3), so any remaining traceback
    # (exit 1) is a genuine lint crash the caller should FAIL on
    try:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    except Exception as e:  # noqa: BLE001
        print(f"SKIP: fixture tables not bindable at {sf_dir}: {e}")
        return 3
    try:
        with open(oracle_json) as f:
            oracles = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        print(f"SKIP: oracle json unreadable: {e}")
        return 3
    if not oracles:
        # checking nothing must not pass: an empty map means the caller
        # wired the gate wrong, not that the oracles are clean
        print("SKIP: oracle map is empty — nothing to lint")
        return 3
    flagged, skipped = [], []
    for name, sql in sorted(oracles.items()):
        try:
            rows = con.execute("DESCRIBE " + sql).fetchall()
        except Exception:  # noqa: BLE001 — e.g. oracles over run-time-written asset dirs
            skipped.append(name)
            continue
        for col, typ in [(r[0], r[1]) for r in rows]:
            if "HUGEINT" in typ or re.match(r"DECIMAL\(38,", typ):
                flagged.append(f"{name}.{col}: {typ}")
    if skipped:
        print(f"note: {len(skipped)} not bindable at this SF, skipped: "
              + ", ".join(skipped))
    # every DESCRIBE failing means the environment (sf dir / parquet) is
    # broken, not that the oracles are clean — don't let the gate
    # silently pass exactly when it can't see anything
    if len(skipped) == len(oracles):
        print("SKIP: no oracle could be described (bad sfDir?)")
        return 3
    if flagged:
        print("FLAGGED (cast these to BIGINT/DOUBLE in the oracle SQL):")
        for f in flagged:
            print("  " + f)
        print("note: DECIMAL(38,*) is a false positive iff the Spark side"
              " also widens to precision 38 (SUM over DECIMAL(p,s) with"
              " p >= 28: min(38, p+10) = 38) — verify before 'fixing' a"
              " matching oracle.")
        return 2
    print(f"{len(oracles) - len(skipped)} oracles lint clean")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
