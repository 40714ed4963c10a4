"""Block-91 operators: default-port normalization, dedup mix-shift
audit, Qini uplift curve."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import hashlib
import re

from genesis_spark.queries import (q_corpus_dedup_mix_shift,
                                   q_events_qini_curve,
                                   q_url_default_port)

SF = "/root/testdata/sf0.001"


def test_default_port_normalization_golden(spark):
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()]
    fams = {}
    for k in set(keys):
        scheme = "https" if k % 5 == 0 else "http"
        port = ":80" if k % 3 == 0 else ":443" if k % 5 == 0 else ""
        path = "" if k % 4 == 0 else f"/p{k % 25}"
        url = f"{scheme}://host{k % 90}.onion{port}{path}"
        noport = re.sub(r"^(http://[^/:]+):80(/|$)", r"\1\2", url)
        noport = re.sub(r"^(https://[^/:]+):443(/|$)", r"\1\2", noport)
        norm = noport + "/" if re.fullmatch(r"https?://[^/]+",
                                            noport) else noport
        fams.setdefault(norm, set()).add(
            (url, url != noport, noport != norm))
    got = {r["url_norm"]: r for r in q_url_default_port(spark, SF).collect()}
    assert set(got) == set(fams)
    for fam, urls in fams.items():
        r = got[fam]
        assert r["n_variants"] == len(urls)
        assert r["n_port"] == sum(p for _, p, _ in urls)
        assert r["n_path"] == sum(p for _, _, p in urls)
        assert r["fetches_saved"] == len(urls) - 1
        # normalized form never carries ITS scheme's default port (:80 on
        # https is a real non-default port and must survive), and always
        # has a path
        assert not re.match(r"^http://[^/:]+:80(/|$)", fam)
        assert not re.match(r"^https://[^/:]+:443(/|$)", fam)
        assert re.match(r"https?://[^/]+/", fam)
    assert sum(r["n_port"] for r in got.values()) > 0
    assert sum(r["n_path"] for r in got.values()) > 0


def test_dedup_mix_shift_golden(spark):
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()}
    corpus = dict(docs)
    for d, t in docs.items():
        if d % 2 == 0:
            corpus[d + 100000] = (t if d % 5 == 0
                                  else t.rsplit(" ", 1)[0])
    src = {d: ("web" if d % 3 == 0 else "forum" if d % 3 == 1
               else "docs") for d in corpus}
    keep = {}
    for d, t in corpus.items():
        h = hashlib.md5(t.encode()).hexdigest()
        keep[h] = min(keep.get(h, d), d)
    kept = set(keep.values())
    pre, post = {}, {}
    for d in corpus:
        pre[src[d]] = pre.get(src[d], 0) + 1
        if d in kept:
            post[src[d]] = post.get(src[d], 0) + 1
    tp, to = sum(pre.values()), sum(post.values())
    got = {r["source"]: r for r in
           q_corpus_dedup_mix_shift(spark, SF).collect()}
    assert set(got) == set(pre)
    for s in pre:
        r = got[s]
        assert (r["n_pre"], r["n_post"]) == (pre[s], post[s])
        assert r["pre_ppm"] == pre[s] * 10**6 // tp
        assert r["post_ppm"] == post[s] * 10**6 // to
        assert r["shift_ppm"] == r["post_ppm"] - r["pre_ppm"]
        assert r["survival_ppm"] == post[s] * 10**6 // pre[s]
    # dedup removed something and the mix actually shifted somewhere
    assert to < tp
    assert any(r["shift_ppm"] != 0 for r in got.values())


def test_qini_curve_golden(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "event_type").collect()
    pu = {}
    for r in ev:
        n, c = pu.get(r["user_id"], (0, 0))
        pu[r["user_id"]] = (n + 1, max(c, r["event_type"] == "purchase"))
    users = [(u, (u * 61 + n * 17) % 1000, u % 2, int(c))
             for u, (n, c) in pu.items()]
    users.sort(key=lambda x: (-x[1], x[0]))
    n = len(users)
    dec = {}
    for i, (u, s, arm, conv) in enumerate(users):
        d = i * 10 // n
        nt, ct, nc, cc = dec.get(d, (0, 0, 0, 0))
        if arm == 1:
            nt, ct = nt + 1, ct + conv
        else:
            nc, cc = nc + 1, cc + conv
        dec[d] = (nt, ct, nc, cc)
    got = {r["decile"]: r for r in q_events_qini_curve(spark, SF).collect()}
    assert set(got) == set(dec)
    cum = 0
    for d in sorted(dec):
        nt, ct, nc, cc = dec[d]
        r = got[d]
        assert (r["n_t"], r["c_t"], r["n_c"], r["c_c"]) == (nt, ct, nc, cc)
        assert r["rate_t_ppm"] == (ct * 10**6 // nt if nt else None)
        assert r["rate_c_ppm"] == (cc * 10**6 // nc if nc else None)
        if nt and nc:
            assert r["lift_ppm"] == ct * 10**6 // nt - cc * 10**6 // nc
        cum += ct * nc - cc * nt
        assert r["qini_cum"] == cum
