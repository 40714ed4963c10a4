"""Hand golden for the C4 global duplicate-line removal row: shared
lines drop at every occurrence after the first (min doc_id, idx), lines
differing only by the deterministic '.' suffix are distinct, and the
per-doc text rebuild preserves original order."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

from genesis_spark import queries as Q

_TEXT = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"


def test_sentence_dedup_first_occurrence_and_rebuild(spark, tmp_path):
    # doc 1: line0 '(w1..w6).' [(1+0)%3=1], line1 '(w7..w12).' [(1+1)%3=2]
    # doc 5: line0 '(w1..w6).' [(5+0)%3=2] == doc 1 line0 -> dropped;
    #        line1 '(w7..w12)'  [(5+1)%3=0, no dot] -> distinct, kept
    df = spark.createDataFrame(
        [(1, _TEXT, "s", "en", len(_TEXT)),
         (5, _TEXT, "s", "en", len(_TEXT))],
        "doc_id long, text string, source string, lang string, "
        "n_chars long")
    out = str(tmp_path / "sd")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    got = {r["doc_id"]: r for r in
           Q.q_text_sentence_dedup(spark, out).collect()}
    assert got[1]["n_lines"] == 2 and got[1]["n_kept"] == 2
    assert got[1]["clean_text"] == "w1 w2 w3 w4 w5 w6. w7 w8 w9 w10 w11 w12."
    assert got[5]["n_lines"] == 2 and got[5]["n_kept"] == 1
    assert got[5]["clean_text"] == "w7 w8 w9 w10 w11 w12"
