"""Block-137 operators: TLS cert audit, RFC 5952 IPv6 canonicalization,
favicon-hash infrastructure clustering."""

from __future__ import annotations

from collections import Counter

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_host_favicon_cluster, q_tls_cert_audit,
                                   q_url_ipv6_normalize)

SF = "/root/testdata/sf0.001"


def _rfc6125_match(host: str, san: str) -> bool:
    if host == san:
        return True
    if not san.startswith("*."):
        return False
    suf = san[1:]                       # '.siteN.example'
    if not host.endswith(suf):
        return False
    label = host[:len(host) - len(suf)]
    return bool(label) and "." not in label


def test_tls_cert_audit_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    got = {r.rid: r for r in q_tls_cert_audit(spark, SF).collect()}
    assert set(got) == set(ks)
    verdicts = Counter()
    for k in ks:
        site = f"site{k % 50}.example"
        host = ("www." + site if k % 4 < 2 else
                "api." + site if k % 4 == 2 else site)
        san = ("*." + site if k % 3 == 0 else
               site if k % 3 == 1 else "othersite.example")
        not_after = (k * 7) % 365 + 90 + (k % 2) * 275
        r = got[k]
        assert (r.host, r.san, r.not_after_day) == (host, san, not_after)
        assert r.days_left == not_after - 400
        assert r.san_ok == int(_rfc6125_match(host, san))
        want = ("expired" if r.days_left < 0 else
                "name_mismatch" if not r.san_ok else
                "expiring" if r.days_left < 30 else "ok")
        assert r.verdict == want
        verdicts[want] += 1
    # all four verdict classes occur in the fixture
    assert set(verdicts) == {"expired", "name_mismatch", "expiring", "ok"}


def test_wildcard_never_matches_apex():
    assert _rfc6125_match("www.site1.example", "*.site1.example")
    assert not _rfc6125_match("site1.example", "*.site1.example")
    assert not _rfc6125_match("a.b.site1.example", "*.site1.example")


def _py_rfc5952(vals):
    cg = [format(v, "x") for v in vals]
    best_len, best_start = 0, -1
    i = 0
    while i < 8:
        if vals[i] == 0:
            j = i
            while j < 8 and vals[j] == 0:
                j += 1
            if j - i > best_len:
                best_len, best_start = j - i, i
            i = j
        else:
            i += 1
    if best_len < 2:
        return ":".join(cg), 0, -1
    pre = ":".join(cg[:best_start])
    suf = ":".join(cg[best_start + best_len:])
    return pre + "::" + suf, best_len, best_start


def test_ipv6_normalize_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect() if r.o_orderkey % 5 == 0]
    got = {r.rid: r for r in q_url_ipv6_normalize(spark, SF).collect()}
    assert set(got) == set(ks)
    n_comp = 0
    for k in ks:
        vals = [0 if (k % 97 == 0 or (k + i) % 3 == 0)
                else (k * (i + 3)) % 65536 for i in range(8)]
        want, L, s = _py_rfc5952(vals)
        r = got[k]
        assert r.canonical == want, (k, vals, r.canonical, want)
        assert (r.zero_run_len, r.zero_run_start) == (L, s)
        assert r.compressed == int(L > 0)
        n_comp += r.compressed
    assert n_comp > 0 and n_comp < len(ks)  # both classes occur


def test_ipv6_leftmost_longest_run():
    # tie between two 2-runs -> leftmost compressed
    addr, L, s = _py_rfc5952([0, 0, 5, 9, 0, 0, 3, 4])
    assert addr == "::5:9:0:0:3:4" and (L, s) == (2, 0)
    # longer later run wins over earlier shorter
    addr, L, s = _py_rfc5952([0, 0, 5, 0, 0, 0, 3, 4])
    assert addr == "0:0:5::3:4" and (L, s) == (3, 3)
    # all zeros -> '::'
    assert _py_rfc5952([0] * 8)[0] == "::"


def test_favicon_cluster_replay(spark):
    ks = [r.c_custkey for r in
          spark.read.parquet(f"{SF}/customer.parquet")
          .select("c_custkey").collect()]
    hashes = {k: (k * 2 + 1 if k % 7 == 0
                  else ((k % 30) * 2654435761) % 2147483648 * 2)
              for k in ks}
    clusters = Counter(hashes.values())
    reps = {}
    for k in ks:
        h = hashes[k]
        host = f"h{k}"
        if h not in reps or host < reps[h]:
            reps[h] = host
    got = {r.host: r for r in q_host_favicon_cluster(spark, SF).collect()}
    assert set(got) == {f"h{k}" for k in ks}
    for k in ks:
        r = got[f"h{k}"]
        h = hashes[k]
        assert r.favicon_hash == h
        assert r.cluster_size == clusters[h]
        assert r.rep_host == reps[h]
        assert r.shared_infra == int(clusters[h] >= 3)
    # uniques stay singletons; families really cluster
    assert any(r.cluster_size == 1 for r in got.values())
    assert any(r.cluster_size >= 3 for r in got.values())
