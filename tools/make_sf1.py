"""Synthesize an sf1.0-scale benchmark dataset (10x the driver's sf0.1)
into _bench_data/sf1.0/ for the soak runs (round-3 verdict item 7).

Deterministic replication with key shifting — replica k (0..9) offsets
every entity key by k*OFFSET so join relationships stay intact WITHIN a
replica and key cardinality actually grows 10x (naive row duplication
would inflate every equi-join bucket 10x and every pair-join 100x, which
measures a different workload, not a bigger one). Content columns are
perturbed per replica (documents get a replica token appended; embedding
vectors are cyclically rotated) so exact/near-dup and ANN distributions
keep their shape instead of becoming 10-way identical clusters. Replica 0
is byte-identical to sf0.1. DuckDB-only (no Spark session) — runs in
seconds and writes one parquet per table.

Usage: python tools/make_sf1.py [src_dir] [dst_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "_bench_data/sf1.0"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10_000_000


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({K})) AS k")

    def scale(table: str, select: str) -> None:
        src = f"{SRC}/{table}.parquet"
        dst = f"{DST}/{table}.parquet"
        con.execute(
            f"COPY (SELECT {select} FROM '{src}' CROSS JOIN reps) "
            f"TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows")

    # dims: unchanged
    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                    f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")

    scale("documents",
          f"doc_id + k*{OFF} AS doc_id, "
          "CASE WHEN k = 0 THEN text "
          "     ELSE text || ' r' || k || 'w' || (doc_id % 97) END AS text, "
          "lang, source, "
          "CASE WHEN k = 0 THEN n_chars "
          "     ELSE n_chars + 3 + len(CAST(k AS VARCHAR)) "
          "         + len(CAST(doc_id % 97 AS VARCHAR)) END AS n_chars")
    scale("embeddings",
          f"vec_id + k*{OFF} AS vec_id, "
          "CASE WHEN k = 0 THEN embedding "
          "     ELSE list_concat(embedding[(k+1):], embedding[1:k]) END "
          "  AS embedding, label")
    scale("events",
          f"event_id + k*{OFF} AS event_id, ts, "
          f"user_id + k*{OFF} AS user_id, event_type, value, props")
    scale("customer", f"c_custkey + k*{OFF} AS c_custkey, * EXCLUDE (c_custkey)")
    scale("supplier", f"s_suppkey + k*{OFF} AS s_suppkey, * EXCLUDE (s_suppkey)")
    scale("part", f"p_partkey + k*{OFF} AS p_partkey, * EXCLUDE (p_partkey)")
    scale("orders",
          f"o_orderkey + k*{OFF} AS o_orderkey, "
          f"o_custkey + k*{OFF} AS o_custkey, "
          "* EXCLUDE (o_orderkey, o_custkey)")
    scale("lineitem",
          f"l_orderkey + k*{OFF} AS l_orderkey, "
          f"l_partkey + k*{OFF} AS l_partkey, "
          f"l_suppkey + k*{OFF} AS l_suppkey, "
          "* EXCLUDE (l_orderkey, l_partkey, l_suppkey)")


if __name__ == "__main__":
    main()
