#!/usr/bin/env python3
"""Synthesizes a larger scale factor from an existing fixture dir by
replicating it N times with disjoint key spaces — the BASELINE.md
scaling experiment's input (the driver's fixtures stop at sf0.1).

Copy i shifts every entity key by i*SHIFT so joins stay consistent
(lineitem.l_orderkey moves with orders.o_orderkey, etc.). region and
nation stay single-copy (constant across SF, as in TPC-H). Document
text is token-perturbed per copy so cross-copy rows are NOT near
duplicates — otherwise the dedup operators' pair counts would grow
quadratically with copies instead of tracking corpus size, and the
scaling measurement would measure the fixture, not the engine.

Usage: python3 tools/gen_scaled.py <srcDir> <dstDir> <copies>
"""
import sys

import duckdb

SHIFT = 1_000_000_000


def main(src: str, dst: str, copies: int) -> None:
    import os
    # the per-copy embedding rotation below shifts by i dimensions;
    # DuckDB clamps list slices, so i >= dim would silently yield the
    # UNROTATED vector and reintroduce the byte-identical-clone artifact
    assert copies <= 64, "embedding rotation degenerates past dim=64 copies"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def gen(table: str, select_tmpl: str) -> None:
        parts = [select_tmpl.format(s=i * SHIFT, i=i) for i in range(copies)]
        sql = " UNION ALL ".join(parts)
        con.sql(
            f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT parquet)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT parquet)")
        print(f"{t}: copied")

    gen("customer",
        f"SELECT c_custkey + {{s}} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM '{src}/customer.parquet'")
    gen("supplier",
        f"SELECT s_suppkey + {{s}} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM '{src}/supplier.parquet'")
    gen("part",
        f"SELECT p_partkey + {{s}} AS p_partkey, p_name, p_brand, p_type, "
        f"p_size, p_retailprice FROM '{src}/part.parquet'")
    gen("orders",
        f"SELECT o_orderkey + {{s}} AS o_orderkey, o_custkey + {{s}} AS "
        f"o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
        f"o_orderpriority FROM '{src}/orders.parquet'")
    gen("lineitem",
        f"SELECT l_orderkey + {{s}} AS l_orderkey, l_partkey + {{s}} AS "
        f"l_partkey, l_suppkey + {{s}} AS l_suppkey, l_linenumber, "
        f"l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        f"l_linestatus, l_shipdate FROM '{src}/lineitem.parquet'")
    # ts as epoch-ns BIGINT: duckdb writes TIMESTAMP columns with
    # isAdjustedToUTC=false, which Spark reads as TIMESTAMP_NTZ and
    # withWatermark rejects; the int64-nanos form takes the same
    # LongType -> timestamp_micros path as the driver's ns fixture
    gen("events",
        f"SELECT event_id + {{s}} AS event_id, epoch_ns(ts) AS ts, "
        f"user_id + {{s}} AS user_id, event_type, value, props "
        f"FROM '{src}/events.parquet'")
    # source shifts per copy for the same reason text is perturbed:
    # blocking columns (q33 n-gram jaccard blocks on source) must keep
    # fixture-sized blocks as the corpus grows, or per-block quadratic
    # work measures block inflation instead of corpus scaling — the
    # "10x corpus = 10x new sources" model, not "every source 10x hotter"
    gen("documents",
        f"SELECT doc_id + {{s}} AS doc_id, CASE WHEN {{i}} = 0 THEN text "
        f"ELSE regexp_replace(text, '(\\S+)', '\\1x{{i}}', 'g') END AS "
        f"text, lang, CASE WHEN {{i}} = 0 THEN source "
        f"ELSE source || 'x{{i}}' END AS source, n_chars "
        f"FROM '{src}/documents.parquet'")
    # ASCII invariant, enforced at FIXTURE BUILD time: the byte-slicing
    # media gates (q200/q202/q204 frame family) replay the engine's
    # payload-BYTE arithmetic with DuckDB substring (CHARACTERS) — exact
    # only while byte length == char length corpus-wide (DuckDB: strlen
    # counts bytes, length counts characters). A non-ASCII row must
    # fail HERE, not as an inscrutable hash mismatch at gate time.
    bad = con.sql(
        f"SELECT count(*) FROM '{dst}/documents.parquet' "
        f"WHERE text IS NOT NULL AND strlen(text) <> length(text)"
    ).fetchone()[0]
    assert bad == 0, (
        f"{bad} non-ASCII documents rows: the frame-gate oracles "
        f"(char-sliced) would diverge from the engine (byte-sliced)")
    # rotate each copy's vectors by i dimensions: a permutation keeps
    # every within-copy pairwise cosine (up to fp accumulation order)
    # while decorrelating cross-copy clones — byte-identical replicas
    # would otherwise give quadratic-in-copies near-dup pair growth and
    # concentrate LSH buckets, measuring the fixture instead of the
    # engine (the same reason document text is token-perturbed above)
    # label (the q36 blocking column) shifts per copy like source above
    gen("embeddings",
        f"SELECT vec_id + {{s}} AS vec_id, "
        f"CASE WHEN {{i}} = 0 THEN embedding "
        f"ELSE embedding[{{i}}+1:] || embedding[:{{i}}] END AS embedding, "
        f"label + {{i}} * 1000000 AS label FROM '{src}/embeddings.parquet'")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
