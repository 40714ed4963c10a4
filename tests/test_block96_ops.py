"""Block-96 operators: gazetteer entity tagging, instruction-pair
mining, media bitrate planning."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import (q_corpus_instruction_pairs,
                                   q_media_bitrate_plan,
                                   q_text_gazetteer_tag)

SF = "/root/testdata/sf0.001"

GAZ = {"paris": "place", "tokyo": "place", "berlin": "place",
       "acme": "org", "globex": "org", "initech": "org"}


def test_gazetteer_tag_golden(spark):
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["text"] is not None}
    got = {r["doc_id"]: r for r in q_text_gazetteer_tag(spark, SF).collect()}
    assert set(got) == set(docs)
    for d, t in docs.items():
        xt = t
        if d % 3 == 0:
            xt += " paris tokyo paris"
        if d % 5 == 0:
            xt += " acme globex"
        toks = xt.split(" ")
        mention_toks = [w for w in toks if w in GAZ]
        r = got[d]
        assert r["n_tokens"] == len(toks)
        assert r["n_mentions"] == len(mention_toks)
        assert r["n_entities"] == len(set(mention_toks))
        assert r["n_place"] == sum(GAZ[w] == "place"
                                   for w in mention_toks)
        assert r["n_org"] == sum(GAZ[w] == "org" for w in mention_toks)
        assert r["density_ppm"] == \
            len(mention_toks) * 10**6 // len(toks)
    # injected and clean docs both exist
    assert any(r["n_mentions"] > 0 for r in got.values())
    assert any(r["n_mentions"] == 0 for r in got.values())


def test_instruction_pairs_golden(spark):
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["text"] is not None}
    got = {r["doc_id"]: r for r in
           q_corpus_instruction_pairs(spark, SF).collect()}
    for d, t in docs.items():
        w = t.split(" ")
        nt = max((len(w) + 8) // 9, 1)
        nspk = d % 2 + 2
        toks = [len(w[i * 9:i * 9 + 9]) for i in range(nt)]
        speakers = [i % nspk for i in range(nt)]
        pairs = [(toks[i], toks[i + 1]) for i in range(nt - 1)
                 if speakers[i] == 0 and speakers[i + 1] == 1]
        if not pairs:
            assert d not in got
            continue
        adm = [(a, b) for a, b in pairs if a >= 3 and b >= 3]
        r = got[d]
        assert r["n_candidates"] == len(pairs)
        assert r["n_admitted"] == len(adm)
        assert r["prompt_tokens"] == sum(a for a, _ in adm)
        assert r["response_tokens"] == sum(b for _, b in adm)
        assert r["yield_ppm"] == len(adm) * 10**6 // len(pairs)
    # round-robin guarantees 0->1 adjacencies for every multi-turn doc
    assert len(got) > 0


def test_bitrate_plan_golden(spark):
    parts = [r["p_partkey"] for r in
             spark.read.parquet(f"{SF}/part.parquet")
             .select("p_partkey").collect()]
    per = {}
    for k in parts:
        dur = k % 300 + 10
        if k % 11 == 0:
            kbps0 = k % 40 + 10
        elif k % 3 == 0:
            kbps0 = k % 200 + 70
        elif k % 3 == 1:
            kbps0 = k % 3000 + 400
        else:
            kbps0 = k % 4000 + 4200
        size = kbps0 * 125 * dur // 10
        kbps = size * 80 // (dur * 1000)
        cls = ("stub" if kbps < 64 else "audio-ok" if kbps <= 320
               else "video-ok" if kbps <= 4000 else "bloated")
        save = size - 4000 * 125 * dur // 10 if cls == "bloated" else 0
        n, b, s, mn, mx = per.get(cls, (0, 0, 0, 10**18, -1))
        per[cls] = (n + 1, b + size, s + save, min(mn, kbps),
                    max(mx, kbps))
    got = {r["rate_class"]: r for r in
           q_media_bitrate_plan(spark, SF).collect()}
    assert set(got) == set(per)
    for cls, (n, b, s, mn, mx) in per.items():
        r = got[cls]
        assert (r["n_files"], r["total_bytes"],
                r["transcode_savings"]) == (n, b, s)
        assert (r["min_kbps"], r["max_kbps"]) == (mn, mx)
    # all four classes are exercised and only bloated saves anything
    assert set(got) == {"stub", "audio-ok", "video-ok", "bloated"}
    assert got["bloated"]["transcode_savings"] > 0
    for cls in ("stub", "audio-ok", "video-ok"):
        assert got[cls]["transcode_savings"] == 0
