"""Block-37 operators: redirect resolution, IP colocation, caption pairs."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import duckdb

from genesis_spark.queries import (q_host_ip_colocation,
                                   q_spans_caption_pairs,
                                   q_url_redirect_resolve)

SF = "/root/testdata/sf0.001"


def _redirect_python_replay(sf_dir):
    con = duckdb.connect()
    keys = [r[0] for r in con.execute(
        f"SELECT DISTINCT o_orderkey FROM '{sf_dir}/orders.parquet'"
    ).fetchall()]
    keyset = set(keys)

    def edge(u):
        if u not in keyset:
            return None
        if u % 97 == 5:
            return u + 1
        if u % 97 == 6:
            return u - 1
        if u % 7 in (1, 2, 3):
            return u + 1
        return None

    out = {}
    for u in keys:
        cur, hops = u, 0
        for _ in range(3):
            t = edge(cur)
            if t is None:
                break
            cur, hops = t, hops + 1
        status = "redirect_limit" if edge(cur) is not None else "ok"
        out[u] = (cur, hops, status)
    return out


def test_redirect_matches_python_replay(spark):
    got = {r["url_id"]: (r["final_url"], r["n_hops"], r["status"])
           for r in q_url_redirect_resolve(spark, SF).collect()}
    want = _redirect_python_replay(SF)
    assert got == want
    # the fixture exercises every interesting shape: terminal URLs,
    # full-length chains, and real loops hitting the redirect limit
    statuses = {s for _, _, s in got.values()}
    assert statuses == {"ok", "redirect_limit"}
    assert {h for _, h, _ in got.values()} == {0, 1, 2, 3}
    # a 2-cycle member classified redirect_limit keeps hops == 3
    assert all(h == 3 for _, h, s in got.values() if s == "redirect_limit")


def test_ip_colocation_skew_and_math(spark):
    rows = q_host_ip_colocation(spark, SF).collect()
    by_subnet = {}
    for r in rows:
        by_subnet.setdefault(r["subnet"], set()).add(r["host_key"])
        n = int(r["host_key"][1:])
        assert r["subnet"] == (n % 8) * ((n // 8) % 8)
        assert r["cidr"] == f"10.0.{r['subnet']}.0/24"
    for r in rows:
        assert r["n_colocated"] == len(by_subnet[r["subnet"]])
        assert r["is_farm"] == (r["n_colocated"] >= 12)
    # the product rule is skewed by construction: subnet 0 absorbs every
    # host with either 3-bit factor 0 and must dominate (a "farm")
    assert 0 in by_subnet
    assert len(by_subnet[0]) == max(len(v) for v in by_subnet.values())


def test_caption_pairs_general_shapes(spark):
    """Constructed spans: doc-opening image, adjacent images, doc-closing
    image — shapes the synthetic interleave never produces."""
    from pyspark.sql import types as T
    span = T.StructType([
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType())])
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(span))])
    rows = [("d1", [("image", None, "d1/img/0", 0),
                    ("section", "alpha", None, 1),
                    ("image", None, "d1/img/1", 2),
                    ("image", None, "d1/img/2", 3),
                    ("section", "beta", None, 4),
                    ("image", None, "d1/img/3", 5)])]
    il = spark.createDataFrame(rows, schema)

    # drive the same plan q_spans_caption_pairs builds, on custom spans;
    # patch _t in the module whose globals the function closes over (the
    # spans family module since the queries.py -> queries/ split)
    from genesis_spark.queries import spans as Q
    orig = Q._t
    try:
        Q._t = lambda s, d, n: il.selectExpr(
            "doc_id", "'x' AS text") if n == "documents" else orig(s, d, n)
        from genesis_spark.sources import interleaved as I
        orig_docs = I.interleaved_docs
        I.interleaved_docs = lambda docs, **kw: il
        out = {r["media_ref"]: (r["caption_prev"], r["caption_next"],
                                r["prev_dist"], r["next_dist"])
               for r in q_spans_caption_pairs(spark, "unused").collect()}
    finally:
        Q._t = orig
        I.interleaved_docs = orig_docs
    assert out == {
        "d1/img/0": ("", "alpha", -1, 1),     # opens the doc: no prev
        "d1/img/1": ("alpha", "beta", 1, 2),  # adjacent image after it
        "d1/img/2": ("alpha", "beta", 2, 1),
        "d1/img/3": ("beta", "", 1, -1),      # closes the doc: no next
    }


def test_caption_pairs_fixture_properties(spark):
    rows = q_spans_caption_pairs(spark, SF).collect()
    assert rows
    for r in rows:
        # synthetic interleave: every image directly follows a section
        assert r["prev_dist"] == 1 and r["caption_prev"] != ""
        # next is a section 1 away unless the image closes the doc
        assert r["next_dist"] in (1, -1)
        assert (r["next_dist"] == -1) == (r["caption_next"] == "")
