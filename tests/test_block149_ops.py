"""Block-149 operators: front-matter parsing, calendar join, sliding
distinct."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (_HOLIDAY_DAYS,
                                   q_events_calendar_join,
                                   q_events_sliding_distinct,
                                   q_text_frontmatter_parse)

SF = "/root/testdata/sf0.001"
EPOCH = dt.date(2024, 1, 1)


def test_frontmatter_replay(spark):
    got = {r.doc_id: r for r in
           q_text_frontmatter_parse(spark, SF).collect()}
    for d, r in got.items():
        if d % 3 != 2:
            assert r.has_frontmatter == 1
            assert r.title == f"Doc {d}"
            assert r.author == f"author{d % 20}"
            assert r.n_tags == 2
            assert r.first_tag == f"t{d % 5}"
        else:
            assert (r.has_frontmatter, r.title, r.author,
                    r.n_tags, r.first_tag) == (0, "", "", 0, "")
    assert any(r.has_frontmatter for r in got.values())
    assert any(not r.has_frontmatter for r in got.values())


def test_frontmatter_nongreedy():
    import re
    # the non-greedy block match stops at the FIRST closing fence
    md = "---\ntitle: a\n---\nbody\n---\nnot frontmatter\n---\n"
    m = re.search(r"^---\n([\s\S]*?)\n---\n", md)
    assert m and m.group(1) == "title: a"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet") \
        .select("ts", "user_id", "value").collect()


def test_calendar_join_replay(spark):
    per = defaultdict(lambda: [0, 0])
    for r in _events(spark):
        d = (r.ts.date() - EPOCH).days
        per[d][0] += 1
        per[d][1] += int(round(r.value * 100))
    got = {r.day_index: r for r in
           q_events_calendar_join(spark, SF).collect()}
    assert set(got) == set(per)
    classes = set()
    for d, (n, cents) in per.items():
        r = got[d]
        assert (r.n_events, r.value_cents) == (n, cents)
        assert r.weekday == d % 7
        assert r.is_weekend == int(d % 7 >= 5)
        assert r.is_holiday == int(d in _HOLIDAY_DAYS)
        want = ("holiday" if d in _HOLIDAY_DAYS else
                "weekend" if d % 7 >= 5 else "workday")
        assert r.day_class == want
        classes.add(want)
    # 2024-01-01 really was a Monday — the %7 trick is anchored right
    assert EPOCH.weekday() == 0
    assert "holiday" in classes and "weekend" in classes


def test_sliding_distinct_replay(spark):
    win_users = defaultdict(set)
    win_events = defaultdict(int)
    for r in _events(spark):
        d = (r.ts.date() - EPOCH).days
        for o in (0, 1, 2):
            win_users[d + o].add(r.user_id)
            win_events[d + o] += 1
    got = {r.window_day: r for r in
           q_events_sliding_distinct(spark, SF).collect()}
    assert set(got) == set(win_users)
    for w in win_users:
        assert got[w].n_events_window == win_events[w]
        assert got[w].n_users_distinct == len(win_users[w])
    # a 3-day window's distinct count is sub-additive vs event count
    assert all(got[w].n_users_distinct <= got[w].n_events_window
               for w in win_users)
