"""Block-159 operators: gensim stopword density, Bloom shard sizing,
crawl-delay dispatch budgets."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_robots_crawl_delay_budget,
                                   q_seen_bloom_sizing,
                                   q_text_stopword_density)

SF = "/root/testdata/sf0.001"


def test_stopword_density_replay(spark):
    import genesis_spark.functions.text as TX
    stop = TX.load_stopwords(TX.gensim_stopwords_path())
    assert len(stop) == 337
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect()}
    rows = q_text_stopword_density(spark, SF).collect()
    assert len(rows) == len(docs) > 0
    for r in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", docs[r.doc_id].lower())
                if t]
        n_stop = sum(1 for t in toks if t in stop)
        assert (r.n_tokens, r.n_stop) == (len(toks), n_stop), r.doc_id
        ppm = n_stop * 1_000_000 // max(len(toks), 1)
        assert r.stop_ppm == ppm
        assert r.prose_like == (200_000 <= ppm <= 700_000)
    # fixture prose is dictionary-word based, so both classes must occur
    assert {r.prose_like for r in rows} == {True, False} or \
        all(r.prose_like for r in rows)


def test_bloom_sizing_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    per = Counter((k % 7) if k % 4 < 2 else (k % 48) for k in ks)
    got = {r.shard: r for r in q_seen_bloom_sizing(spark, SF).collect()}
    assert set(got) == set(per)
    for shard, n in per.items():
        r = got[shard]
        assert r.n_keys == n and r.alloc_bits == 4096
        fpr = (1 - math.exp(-7.0 * n / 4096.0)) ** 7
        assert abs(r.achieved_fpr - round(fpr, 6)) < 1e-9
        assert r.over_budget == (fpr > 0.01)
        m_req = math.ceil(n * 9.585)
        assert r.rec_bits == 2 ** math.ceil(math.log2(m_req))
        assert r.rec_bits >= m_req > r.rec_bits // 2
    # hub shards (0-6) carry roughly double the tail load
    hub = sum(per[s] for s in range(7)) / 7
    tail = sum(v for s, v in per.items() if s >= 7) / max(
        len([s for s in per if s >= 7]), 1)
    assert hub > 2.5 * tail


def test_crawl_delay_budget_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    pending = Counter(f"h{(k % 3) if k % 4 < 2 else (k % 30)}" for k in ks)
    got = {r.host_key: r for r in
           q_robots_crawl_delay_budget(spark, SF).collect()}
    assert set(got) == set(pending)
    delay_of = {0: 500, 1: 10000, 2: 1000, 3: 1000}  # 30 s clamps to 10 s
    for host, p in pending.items():
        r = got[host]
        eff = delay_of[int(host[1:]) % 4]
        budget = 600_000 // eff
        backlog = (p + budget - 1) // budget
        assert (r.effective_delay_ms, r.pending, r.cycle_budget,
                r.backlog_cycles, r.starved) == \
            (eff, p, budget, backlog, backlog > 7), host
    # the starvation flag must come from delay x backlog JOINTLY: some
    # slow-delay host is fine (small queue) while a hub starves
    slow_tail_ok = any(not got[h].starved for h in got
                       if int(h[1:]) % 4 == 1 and int(h[1:]) >= 3)
    hub_starved = any(got[f"h{i}"].starved for i in range(3)
                      if i % 4 == 1) or got["h1"].backlog_cycles > 1
    assert slow_tail_ok and hub_starved
