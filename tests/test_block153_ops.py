"""Block-153 operators: param type profiling, out-of-order audit,
type-2 clones."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_code_clone_type2,
                                   q_stream_ooo_audit,
                                   q_url_param_profile)
from tests.test_block138_ops import _py_content

SF = "/root/testdata/sf0.001"


def test_param_profile_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    vals = defaultdict(list)
    for k in ks:
        host = f"site{k % 20}.example"
        vals[(host, "id")].append(str(k))
        vals[(host, "page")].append(str(k % 5))
        vals[(host, "sort")].append(
            "asc" if k % 3 == 0 else "desc" if k % 3 == 1 else "top")
        if k % 3 == 0:
            vals[(host, "ref")].append(
                hashlib.md5(str(k).encode()).hexdigest()[:12])
    got = {(r.host, r.param): r for r in
           q_url_param_profile(spark, SF).collect()}
    assert set(got) == set(vals)
    classes = set()
    for key, vs in vals.items():
        r = got[key]
        assert r.n_urls == len(vs)
        assert r.n_distinct == len(set(vs))
        all_num = all(re.fullmatch(r"[0-9]+", v) for v in vs)
        all_hex = all(re.fullmatch(r"[0-9a-f]{8,}", v) for v in vs)
        want = ("int" if all_num else "token" if all_hex else
                "enum" if len(set(vs)) <= 5 else "opaque")
        assert r.value_class == want, key
        assert r.cardinality_ppm == len(set(vs)) * 1000000 // len(vs)
        classes.add(want)
    # id -> int, page -> enum (0..4), ref -> token
    assert {"int", "enum", "token"} <= classes


def test_ooo_audit_replay(spark):
    ev = sorted(spark.read.parquet(f"{SF}/events.parquet")
                .select("user_id", "event_id", "ts").collect(),
                key=lambda r: (r.event_id + (r.event_id % 7) * 3,
                               r.event_id))
    import datetime as dt
    per_user = defaultdict(list)
    for r in ev:
        em = int(r.ts.replace(tzinfo=dt.timezone.utc)
                 .timestamp() * 1000)
        per_user[r.user_id].append(em)
    got = {r.user_id: r for r in q_stream_ooo_audit(spark, SF).collect()}
    assert set(got) == set(per_user)
    total_late = 0
    for u, ems in per_user.items():
        run_max = None
        late = 0
        worst = 0
        for em in ems:
            if run_max is not None and em < run_max:
                late += 1
                worst = max(worst, run_max - em)
            run_max = em if run_max is None else max(run_max, em)
        r = got[u]
        assert (r.n_events, r.n_late, r.max_disorder_ms) == (
            len(ems), late, worst), u
        assert r.late_ppm == late * 1000000 // len(ems)
        total_late += late
    # the event stream really contains disorder to measure
    assert total_late > 0


def test_clone_type2_replay(spark):
    ks = [r.doc_id for r in
          spark.read.parquet(f"{SF}/documents.parquet")
          .select("doc_id").collect()]
    classes = defaultdict(list)
    for k in ks:
        norm = re.sub(r"[0-9]+", "N",
                      re.sub(r"[a-zA-Z_][a-zA-Z0-9_]*", "ID",
                             _py_content(k)))
        classes[hashlib.md5(norm.encode()).hexdigest()].append(k)
    got = {r.file_id: r for r in q_code_clone_type2(spark, SF).collect()}
    for fp, members in classes.items():
        for k in members:
            r = got[k]
            assert r.fp8 == fp[:8], k
            assert r.class_size == len(members)
            assert r.rep_file == min(members)
            assert r.is_clone == int(len(members) > 1)
    # rename-invariance finds clones exact hashing would miss:
    # multi-file classes exist even though raw contents differ
    multi = [m for m in classes.values() if len(m) > 1]
    assert multi
    raw = {k: _py_content(k) for m in multi for k in m}
    assert any(len({raw[k] for k in m}) > 1 for m in multi), \
        "no clone class with raw-differing members"
