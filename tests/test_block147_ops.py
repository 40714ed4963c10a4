"""Block-147 operators: heading outline audit, histogram selectivity
estimation, brace-nesting fold."""

from __future__ import annotations

import re

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_code_nesting_depth,
                                   q_scan_selectivity_est,
                                   q_text_heading_outline)
from tests.test_block138_ops import _py_content

SF = "/root/testdata/sf0.001"


def test_heading_outline_replay(spark):
    got = {r.doc_id: r for r in
           q_text_heading_outline(spark, SF).collect()}
    wf = 0
    for d, r in got.items():
        lv = [1 + ((d * 5 + i * (1 + d % 3)) % 4)
              for i in range(4 + d % 5)]
        n_h1 = sum(1 for x in lv if x == 1)
        skips = sum(1 for i in range(len(lv) - 1)
                    if lv[i + 1] > lv[i] + 1)
        assert r.n_headings == len(lv)
        assert r.n_h1 == n_h1
        assert r.max_level == max(lv)
        assert r.n_skips == skips
        assert r.first_level == lv[0]
        want = int(n_h1 == 1 and skips == 0 and lv[0] == 1)
        assert r.well_formed == want
        wf += want
    assert any(r.n_skips > 0 for r in got.values())
    assert wf > 0  # some docs are genuinely well-formed


def test_selectivity_est_replay(spark):
    vs = sorted(int(round(r.o_totalprice * 100)) for r in
                spark.read.parquet(f"{SF}/orders.parquet")
                .select("o_totalprice").collect())
    vmin, vmax = vs[0], vs[-1]
    w = (vmax - vmin) // 20 + 1
    hist = {}
    for v in vs:
        b = (v - vmin) // w
        hist[b] = hist.get(b, 0) + 1
    got = {r.q: r for r in q_scan_selectivity_est(spark, SF).collect()}
    assert set(got) == set(range(5))
    for q in range(5):
        lo = vmin + q * ((vmax - vmin) // 6)
        hi = vmin + (q + 2) * ((vmax - vmin) // 6)
        actual = sum(1 for v in vs if lo <= v <= hi)
        est = 0
        for b, cnt in hist.items():
            b0, b1 = vmin + b * w, vmin + (b + 1) * w
            ov = max(0, min(hi + 1, b1) - max(lo, b0))
            est += cnt * (ov * 1000 // w)
        r = got[q]
        assert (r.lo, r.hi, r.actual_rows) == (lo, hi, actual)
        assert r.est_milli == est
        assert r.abs_err_milli == abs(est - actual * 1000)
        # a 20-bin histogram on this data stays within ~15% of truth
        assert r.abs_err_milli <= max(150 * actual, 20000)


def test_nesting_depth_replay(spark):
    got = {r.file_id: r for r in q_code_nesting_depth(spark, SF).collect()}
    under = bal = 0
    for k, r in got.items():
        c = _py_content(k)
        if k % 31 == 0:
            c = "}" + c
        if k % 6 == 0:
            c = c + "\n}"
        s = maxp = minp = 0
        for ch in c:
            if ch == "{":
                s += 1
            elif ch == "}":
                s -= 1
            else:
                continue
            maxp = max(maxp, s)
            minp = min(minp, s)
        assert r.n_open == c.count("{")
        assert r.n_close == c.count("}")
        assert r.balance == s, k
        assert r.max_depth == max(0, maxp)
        assert r.underflow == int(minp < 0)
        assert r.balanced == int(s == 0 and minp >= 0)
        under += r.underflow
        bal += r.balanced
    assert under > 0          # the prepended '}' files dip negative
    assert bal > 0            # some files balance exactly


def test_max_prefix_combine_associative():
    # the fold's combine is associative: any split point of the brace
    # stream yields the same (sum, maxPrefix, minPrefix)
    def leaf(ch):
        d = 1 if ch == "{" else -1
        return (d, d, d)

    def comb(a, b):
        return (a[0] + b[0], max(a[1], a[0] + b[1]),
                min(a[2], a[0] + b[2]))

    stream = "{{}}{}}{{"
    import functools
    full = functools.reduce(comb, map(leaf, stream))
    for cut in range(1, len(stream)):
        l = functools.reduce(comb, map(leaf, stream[:cut]))
        r = functools.reduce(comb, map(leaf, stream[cut:]))
        assert comb(l, r) == full
