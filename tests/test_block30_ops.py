"""Property coverage for curriculum staging, embedding standardization,
and the max-min-fair water-filling allocator (feasibility + optimality
vs a brute-force Python waterline)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from genesis_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_curriculum_stages_follow_ease_order(spark):
    rows = Q.q_corpus_curriculum(spark, SF).collect()
    assert len(rows) == 500
    # easier (higher flesch bin) docs never land in a LATER stage
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r["flesch_bin"], set()).add(r["stage"])
    for b, stages in by_bin.items():
        assert len(stages) == 1  # one stage per bin (histogram contract)
    bins = sorted(by_bin, reverse=True)
    seq = [next(iter(by_bin[b])) for b in bins]
    assert seq == sorted(seq)          # stages non-decreasing as ease falls
    assert {s for ss in by_bin.values() for s in ss} <= {0, 1, 2, 3}


def test_standardize_moments_near_zero_one(spark):
    rows = Q.q_embeddings_standardize(spark, SF).collect()
    from collections import defaultdict
    zs = defaultdict(list)
    for r in rows:
        zs[r["dim"]].append(r["z"])
    assert len(zs) == 64
    for dim, v in zs.items():
        n = len(v)
        m = sum(v) / n
        var = sum(x * x for x in v) / n - m * m
        assert abs(m) < 1e-3, dim
        assert abs(var - 1.0) < 1e-2, dim


def _waterline_bruteforce(demands: list[int], budget: int) -> int | None:
    """Largest integer L with sum(min(d, L)) <= budget (None if all
    demand fits)."""
    if sum(demands) <= budget:
        return None
    lo, hi = 0, max(demands)
    best = 0
    while lo <= hi:
        mid = (lo + hi) // 2
        if sum(min(d, mid) for d in demands) <= budget:
            best, lo = mid, mid + 1
        else:
            hi = mid - 1
    return best


def test_waterfill_driver_row_feasible_and_maximal(spark):
    rows = Q.q_host_budget_waterfill(spark, SF).collect()
    demands = [r["demand"] for r in rows]
    # budget exactly as the query computes it (floor of a double)
    import math
    budget = int(math.floor(sum(demands) * 3.0 / 5))
    alloc = {r["host"]: r["allocation"] for r in rows}
    assert sum(alloc.values()) <= budget
    lstar = _waterline_bruteforce(demands, budget)
    if lstar is None:
        assert all(r["allocation"] == r["demand"] for r in rows)
    else:
        for r in rows:
            assert r["allocation"] == min(r["demand"], lstar)
            assert r["fully_satisfied"] == (r["demand"] <= lstar)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=200), min_size=1,
                max_size=12),
       st.integers(min_value=0, max_value=1500))
def test_waterline_closed_form_matches_bruteforce(demands, budget):
    """The sorted-prefix closed form used by BOTH engines' SQL, replayed
    in DuckDB on arbitrary inputs, must match the brute-force waterline."""
    con = duckdb.connect()
    con.execute("CREATE TABLE d(host VARCHAR, demand BIGINT)")
    for i, dm in enumerate(demands):
        con.execute("INSERT INTO d VALUES (?, ?)", [f"h{i:02d}", dm])
    sql = """
    WITH tot AS (SELECT CAST(count(*) AS BIGINT) n,
                        CAST(? AS BIGINT) b FROM d),
    srt AS (SELECT host, demand,
                   row_number() OVER (ORDER BY demand, host) j,
                   sum(demand) OVER (ORDER BY demand, host
                                     ROWS UNBOUNDED PRECEDING) p FROM d),
    cand AS (SELECT j, p pj, demand dj FROM srt UNION ALL SELECT 0, 0, 0),
    lv AS (SELECT CASE WHEN j >= n THEN 9223372036854775807
                       ELSE CAST(floor((b - pj) * 1.0 / (n - j)) AS BIGINT)
                  END lj, dj
           FROM cand CROSS JOIN tot WHERE pj <= b),
    star AS (SELECT max(lj) lstar FROM lv WHERE lj >= dj)
    SELECT host, demand, least(demand, lstar) allocation FROM d
    CROSS JOIN star ORDER BY host
    """
    got = con.execute(sql, [budget]).fetchall()
    lstar = _waterline_bruteforce(demands, budget)
    for (host, dm, al) in got:
        want = dm if lstar is None else min(dm, lstar)
        assert al == want, (demands, budget, host, lstar)


def test_waterfill_zero_budget(spark):
    # degenerate: budget 0 -> waterline 0 -> all allocations 0 (the
    # closed form's j=0 row is what makes this well-defined)
    assert _waterline_bruteforce([5, 1], 0) == 0
