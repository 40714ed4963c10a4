"""Block-49 operators: scan pruning, snapshot changelog, skew audit."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
import math

import duckdb

from genesis_spark.queries import (q_scan_prune_plan, q_shuffle_skew_audit,
                                   q_snapshot_changelog)

SF = "/root/testdata/sf0.001"


def test_scan_prune_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, o_custkey FROM '{SF}/orders.parquet'"
    ).fetchall()
    files = {}
    for k, _ in rows:
        ck = k % 1000
        f = files.setdefault(k // 100, [0, math.inf, -math.inf])
        f[0] += 1
        f[1] = min(f[1], ck)
        f[2] = max(f[2], ck)
    want = {}
    for fid, (n, lo, hi) in files.items():
        pruned = hi < 400 or lo > 800
        cur = want.setdefault(fid % 20, [0, 0, 0, 0])
        cur[0] += 1
        cur[1] += pruned
        cur[2] += 0 if pruned else n
        cur[3] += n if pruned else 0
    got = {r["partition_id"]: [r["n_files"], r["n_files_pruned"],
                               r["rows_scanned"], r["rows_skipped"]]
           for r in q_scan_prune_plan(spark, SF).collect()}
    assert got == want
    # pruning must actually fire AND not be total
    assert sum(v[1] for v in got.values()) > 0
    assert sum(v[2] for v in got.values()) > 0


def test_snapshot_changelog_census_exact(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, o_totalprice FROM '{SF}/orders.parquet'"
    ).fetchall()
    a = {k: hashlib.md5(
        f"{k}|{math.floor(p * 100 + 0.5)}".encode()).hexdigest()
        for k, p in rows}
    b = {}
    for k, p in rows:
        if k % 11 != 0:
            cents = math.floor(p * 100 + 0.5) + (1 if k % 7 == 0 else 0)
            b[k] = hashlib.md5(f"{k}|{cents}".encode()).hexdigest()
        if k % 13 == 0:
            nk = k + 10_000_000
            b[nk] = hashlib.md5(str(nk).encode()).hexdigest()
    want = {}
    for k in set(a) | set(b):
        if k not in a:
            op = "insert"
        elif k not in b:
            op = "delete"
        elif a[k] != b[k]:
            op = "update"
        else:
            op = "unchanged"
        cur = want.setdefault(op, [0, 0, math.inf, -math.inf])
        cur[0] += 1
        cur[1] ^= k
        cur[2] = min(cur[2], k)
        cur[3] = max(cur[3], k)
    got = {r["op"]: [r["n_rows"], r["key_xor"], r["min_key"],
                     r["max_key"]]
           for r in q_snapshot_changelog(spark, SF).collect()}
    assert got == want
    assert set(got) == {"insert", "delete", "update", "unchanged"}


def test_skew_audit_matches_python_replay(spark):
    con = duckdb.connect()
    keys = con.execute(
        f"SELECT l_orderkey FROM '{SF}/lineitem.parquet'").fetchall()
    counts = {}
    for (k,) in keys:
        key = 0 if k % 10 < 3 else k % 1000
        counts[key] = counts.get(key, 0) + 1
    cs = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(cs)
    tot = sum(c for _, c in cs)
    gini = (2 * sum((i + 1) * c for i, (_, c) in enumerate(cs))
            * 1_000_000 // (n * tot)) - ((n + 1) * 1_000_000 // n)
    top5 = sum(c for _, c in cs[-5:])
    mx = max(c for _, c in cs)
    row = q_shuffle_skew_audit(spark, SF).collect()[0]
    assert (row["n_keys"], row["n_rows"], row["max_key_rows"]) == \
        (n, tot, mx)
    assert row["max_over_mean_ppm"] == mx * 1_000_000 // (tot // n)
    assert row["top1_share_ppm"] == mx * 1_000_000 // tot
    assert row["top5_share_ppm"] == top5 * 1_000_000 // tot
    assert row["gini_ppm"] == gini
    # the planted hot key must dominate: >= 25% of all rows on one key
    assert row["top1_share_ppm"] >= 250_000
