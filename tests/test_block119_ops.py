"""Block-119 operators: Hilbert-curve clustering key, robots.txt
fetch-status policy (RFC 9309 §2.3.1), two-sample KS drift test."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from pyspark.sql import functions as F

from genesis_spark.queries import (q_robots_fetch_policy,
                                   q_text_ks_two_sample)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- hilbert

def test_hilbert_key_matches_python_oracle(spark):
    from genesis_spark.operators.zorder import hilbert_py, with_hilbert_key

    rows = [(i, (i * 7919) % 65536, (i * 104729) % 65536)
            for i in range(500)]
    df = spark.createDataFrame(rows, "i int, a long, b long")
    got = {r.i: r.hkey for r in
           with_hilbert_key(df, "a", "b", out="hkey").collect()}
    for i, a, b in rows:
        assert got[i] == hilbert_py(a, b), (i, a, b)


def test_hilbert_consecutive_keys_are_grid_adjacent():
    """The defining Hilbert property Morton lacks: d and d+1 always
    map to cells at Manhattan distance exactly 1."""
    from genesis_spark.operators.zorder import hilbert_py

    bits = 4                                      # full 16x16 grid
    inv = {}
    for x in range(16):
        for y in range(16):
            inv[hilbert_py(x, y, bits=bits)] = (x, y)
    assert len(inv) == 256                        # bijection
    for d in range(255):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_prunes_both_dimensions_at_least_as_tight_as_zorder():
    """Same 256-file envelope measurement as the z-order test: a
    dim<4096 predicate on EITHER dimension touches <=25% of files,
    and the Hilbert layout is no worse than Morton on either axis
    (locality is the whole reason it exists)."""
    from genesis_spark.operators.zorder import hilbert_py, zorder_py

    n, files = 1 << 16, 256
    rows = [((i * 7919) % 65536, (i * 31) % 65536) for i in range(n)]

    def touched(sort_key, dim):
        order = sorted(range(n), key=sort_key)
        per, hit = n // files, 0
        for f in range(files):
            chunk = [rows[j][dim] for j in order[f * per:(f + 1) * per]]
            if min(chunk) <= 4095:                # predicate: dim < 4096
                hit += 1
        return hit / files

    by_h = lambda j: hilbert_py(rows[j][0], rows[j][1])
    by_z = lambda j: zorder_py(rows[j][0], rows[j][1])
    for dim in (0, 1):
        assert touched(by_h, dim) <= 0.25
        assert touched(by_h, dim) <= touched(by_z, dim) + 1e-9


# ----------------------------------------------------- robots fetch policy

def test_robots_fetch_policy_branches(spark):
    """Python replay of the RFC 9309 §2.3.1 policy table, plus the
    fixture exercises every branch (400s allow, hard-5xx disallow,
    fresh-cached 5xx uses rules)."""
    rows = q_robots_fetch_policy(spark, SF).collect()
    seen_policies = set()
    for r in rows:
        hid = int(r.host_key[1:])
        status = (503 if hid % 9 == 0 else 404 if hid % 7 == 0
                  else 403 if hid % 11 == 0 else 200)
        assert r.status == status
        assert r.cache_age_h == ((hid // 9) % 3) * 20
        if 200 <= status < 300:
            policy = "parse_live"
        elif 400 <= status < 500:
            policy = "allow_all"
        elif r.cache_age_h <= 24:
            policy = "use_cached"
        else:
            policy = "disallow_all"
        assert r.policy == policy, (r.host_key, r.path)
        if policy == "allow_all":
            want = 1
        elif policy == "disallow_all":
            want = 0
        else:
            want = 0 if r.path.startswith("/private") else 1
        assert r.admitted == want, (r.host_key, r.path)
        seen_policies.add(policy)
    assert seen_policies == {"parse_live", "allow_all",
                             "use_cached", "disallow_all"}


# ----------------------------------------------------------- KS two-sample

def test_ks_two_sample_null_holds_and_shift_rejected(spark):
    """'ab' (even vs odd doc lengths — same distribution) must NOT
    reject; 'ac' (odd lengths scaled 1.5x) MUST. The decision and
    D replayed exactly from the parquet in pure Python."""
    docs = [(r.doc_id, int(r.n_chars)) for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "n_chars").collect()]
    even = sorted(v for d, v in docs if d % 2 == 0)
    odd = sorted(v for d, v in docs if d % 2 == 1)
    shifted = sorted(v + v // 2 for v in odd)

    def ks(s1, s2):
        vals = sorted(set(s1) | set(s2))
        n1, n2 = len(s1), len(s2)
        import bisect
        d_int = max(abs(bisect.bisect_right(s1, v) * n2
                        - bisect.bisect_right(s2, v) * n1)
                    for v in vals)
        reject = (d_int * d_int * 1000000
                  > 1844164 * (n1 + n2) * n1 * n2)
        return d_int, n1, n2, int(reject)

    want = {"ab": ks(even, odd), "ac": ks(even, shifted)}
    got = {r.pair: (r.d_int, r.n1, r.n2, r.reject)
           for r in q_text_ks_two_sample(spark, SF).collect()}
    assert got == want
    assert got["ab"][3] == 0 and got["ac"][3] == 1
