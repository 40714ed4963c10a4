"""Block-162 operators: leak victim entity normalization, AV
container/codec compatibility matrix."""

from __future__ import annotations

import re
from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_leak_entity_normalize,
                                   q_media_codec_matrix)

SF = "/root/testdata/sf0.001"

SUFFIX = re.compile(r"(?: (?:inc|llc|gmbh|ltd|incorporated|corp))+$")


def _normalize(raw: str) -> str:
    s = re.sub(r"[.,]", "", raw.lower())
    s = SUFFIX.sub("", s)
    return re.sub(r"\s+", " ", s).strip()


def test_entity_normalize_replay(spark):
    ks = [r.o_orderkey for r in
          spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey").collect()]
    variants = ["Acme-{v} Inc.", "ACME-{v}, LLC", "acme-{v} GmbH",
                "Acme-{v}", "Acme-{v} Incorporated"]
    per = defaultdict(lambda: {"cards": 0, "raw": set(), "sites": set()})
    for k in ks:
        raw = variants[(k // 120) % 5].format(v=k % 120)
        e = per[_normalize(raw)]
        e["cards"] += 1
        e["raw"].add(raw)
        e["sites"].add(f"site{(k // 120) % 3}")
    got = {r.entity: r for r in q_leak_entity_normalize(spark, SF).collect()}
    assert set(got) == set(per)
    for ent, e in per.items():
        r = got[ent]
        assert (r.n_cards, r.n_variants, r.n_sites, r.display_name) == \
            (e["cards"], len(e["raw"]), len(e["sites"]), min(e["raw"])), ent
    # normalization must actually merge: some entity has several raw forms
    assert max(r.n_variants for r in got.values()) >= 3
    # and canonical keys carry no suffix/punctuation residue
    assert all(not SUFFIX.search(ent) and "." not in ent for ent in got)


SUPPORT = {"mkv": {"h264", "h265", "vp9", "av1", "mpeg2"},
           "mp4": {"h264", "h265", "av1"},
           "webm": {"vp9", "av1"},
           "mov": {"h264", "h265", "mpeg2"}}


def test_codec_matrix_replay(spark):
    li = [(r.l_orderkey, r.l_linenumber) for r in
          spark.read.parquet(f"{SF}/lineitem.parquet")
          .select("l_orderkey", "l_linenumber").collect()]
    containers = ["mp4", "mkv", "webm", "mov"]
    codecs = ["h264", "h265", "vp9", "av1", "mpeg2"]
    grid = defaultdict(int)
    for ok, ln in li:
        k = ok + ln
        grid[(containers[k % 4], codecs[k % 5])] += 1
    got = {(r.container, r.codec): r
           for r in q_media_codec_matrix(spark, SF).collect()}
    assert set(got) == set(grid)
    for (c, cod), n in grid.items():
        r = got[(c, cod)]
        compat = cod in SUPPORT[c]
        assert (r.n_clips, r.compatible,
                r.transcode_target) == (n, compat,
                                        "none" if compat else "h264/mp4")
    # the matrix must have both compatible and transcode cells
    flags = {r.compatible for r in got.values()}
    assert flags == {True, False}
