"""Block-60 operators: RFC 3986 dot-segment removal, SSRF admission
guard, shard-hostname family detection."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import re
from collections import defaultdict

from genesis_spark.queries import (q_host_shard_family, q_host_ssrf_guard,
                                   q_url_dot_segments)

SF = "/root/testdata/sf0.001"


def rfc3986_remove_dot_segments(path: str) -> str:
    """The spec's §5.2.4 stack algorithm, verbatim."""
    out: list[str] = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if out:
                out.pop()
        elif buf == "/..":
            buf = "/"
            if out:
                out.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            m = re.match(r"^/?[^/]*", buf)
            out.append(m.group(0))
            buf = buf[m.end():]
    return "".join(out)


def test_dot_segments_match_rfc_stack_algorithm(spark):
    rows = q_url_dot_segments(spark, SF).collect()
    assert rows
    seen_variants = set()
    for r in rows:
        want = rfc3986_remove_dot_segments(r["raw_path"])
        assert r["clean_path"] == want, (r["raw_path"], r["clean_path"],
                                         want)
        assert r["changed"] == int(r["raw_path"] != r["clean_path"])
        seen_variants.add(r["url_id"] % 5)
    assert seen_variants == {0, 1, 2, 3, 4}
    # dotted variants really did change; the clean variant didn't
    by_variant = defaultdict(set)
    for r in rows:
        by_variant[r["url_id"] % 5].add(r["changed"])
    assert by_variant[0] == {0}
    for v in (1, 2, 3, 4):
        assert by_variant[v] == {1}


def test_ssrf_guard_blocks_internal_space(spark):
    rows = q_host_ssrf_guard(spark, SF).collect()
    for r in rows:
        v = r["url_id"] % 9
        expect_cls = {0: "loopback", 1: "private_10", 2: "private_192",
                      3: "private_172", 4: "metadata", 5: "link_local",
                      6: "localhost", 7: "public", 8: "public"}[v]
        if v == 5 and r["host"] == "169.254.169.254":
            expect_cls = "metadata"  # metadata outranks link_local
        assert r["cls"] == expect_cls, r
        assert r["allowed"] == int(expect_cls == "public")


def test_shard_families_flagged(spark):
    rows = {r["family"]: r for r in q_host_shard_family(spark, SF).collect()}
    # img#.cdn{c}.example: 12 numeric shards per cdn -> flagged
    for c in range(5):
        fam = rows.get(f"img#.cdn{c}.example")
        assert fam is not None and fam["is_shard_family"] == 1
        assert fam["n_hosts"] == 12
    # www#.host{c}.net: 3 shards -> flagged at the threshold
    assert rows["www#.host7.net"]["n_hosts"] == 3
    assert rows["www#.host7.net"]["is_shard_family"] == 1
    # static.site{c}.com: no digits in the first label -> not a family
    singles = [f for f in rows if f.startswith("static.site")]
    assert singles and all(rows[f]["n_hosts"] == 1
                           and rows[f]["is_shard_family"] == 0
                           for f in singles)
