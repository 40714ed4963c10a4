"""Driver-mimic correctness harness: run every __spark_entry__ query on
Spark AND its DuckDB oracle on the same parquet tables; compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Vacuity gate (round-3 verdict finding #1): a query returning 0 rows at a
# replay SF "matches" its oracle trivially — both sides empty proves
# nothing. Any 0-row result is therefore a FAILURE unless the name is
# explicitly allowlisted here with a reason. Currently empty: every
# registry row is required to produce output at every replay SF.
ALLOW_EMPTY: set[str] = set()


def vacuous(name: str, n_rows: int) -> bool:
    """True if this (query, row-count) pair is a vacuous pass."""
    return n_rows == 0 and name not in ALLOW_EMPTY


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def norm_rows(cols, rows):
    out = []
    for r in rows:
        d = dict(zip(cols, r))
        out.append(tuple(norm_cell(d[c]) for c in sorted(cols)))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from genesis_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = get_spark(app_name="oracle-check", cores=8, shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rel = con.execute(oracles[name])
            o_cols = [d[0] for d in rel.description]
            o_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: EXCEPTION {type(e).__name__}: {str(e)[:300]}")
            continue
        status = []
        if sorted(s_cols) != sorted(o_cols):
            status.append(f"cols spark={s_cols} oracle={o_cols}")
        if len(s_rows) != len(o_rows):
            status.append(f"rows spark={len(s_rows)} oracle={len(o_rows)}")
        if not status and vacuous(name, len(s_rows)):
            status.append("VACUOUS: 0 rows at this SF (empty==empty "
                          "proves nothing; fix the fixture or allowlist)")
        if not status:
            sn, on = norm_rows(s_cols, s_rows), norm_rows(o_cols, o_rows)
            if sn != on:
                diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
                status.append(f"values differ, e.g. {diff}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"OK   {name}: {len(s_rows)} rows")
    ed = entrymod.entry(spark)
    n = len(ed.collect())
    print(f"entry(): {n} rows, schema: {ed.columns}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
