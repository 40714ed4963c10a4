"""Unit coverage for the session-4 block: CDXJ ingest (parse
round-trip + digest pick), char-entropy closed forms, mojibake repair,
label-propagation community convergence, and the Zipf OLS fit vs a
numpy-free Python replay."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.block

import math

from pyspark.sql import functions as F

from genesis_spark import queries as Q
from genesis_spark.sources import cdx


def test_cdxj_parse_roundtrip(spark):
    line = ('com,example)/a 20250101120000 {"url": "https://example.com/a", '
            '"mime": "text/html", "status": "200", '
            '"digest": "ABCD", "length": "123"}')
    df = spark.createDataFrame([(line,)], "line string")
    r = cdx.parse_cdxj(df).collect()[0]
    assert r["surt"] == "com,example)/a"
    assert r["ts_num"] == 20250101120000
    assert r["url"] == "https://example.com/a"
    assert r["mime"] == "text/html"
    assert r["status"] == "200"
    assert r["digest"] == "ABCD"
    assert r["length_int"] == 123


def test_cdx_latest_per_digest_picks_max_ts_and_counts(spark):
    rows = [
        ("s1", 20250101000000, "https://a/1", "text/html", "200", "D1", 10),
        ("s2", 20250102000000, "https://a/2", "text/html", "200", "D1", 11),
        ("s3", 20250102000000, "https://a/3", "text/html", "200", "D1", 12),
        ("s4", 20250101000000, "https://b/1", "text/html", "200", "D2", 13),
    ]
    df = spark.createDataFrame(
        rows, "surt string, ts_num long, url string, mime string, "
              "status string, digest string, length_int int")
    got = {r["digest"]: r for r in cdx.latest_per_digest(df).collect()}
    # D1: two captures tie on ts -> url DESC breaks the tie.
    assert got["D1"]["url"] == "https://a/3"
    assert got["D1"]["n_captures"] == 3
    assert got["D2"]["n_captures"] == 1


def test_char_entropy_closed_forms(spark, tmp_path):
    # "aaaa" -> H = 0; "abab" -> H = ln 2; the 1e6-unit quantization
    # must match the exact closed form.
    df = spark.createDataFrame(
        [(1, "aaaa", "s", "en", 4), (2, "abab", "s", "en", 4)],
        "doc_id long, text string, source string, lang string, "
        "n_chars long")
    out = str(tmp_path / "ent")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    got = {r["doc_id"]: r for r in
           Q.q_text_char_entropy(spark, out).collect()}
    assert got[1]["entropy_u"] == 0
    assert got[1]["n_distinct"] == 1
    # per-(doc,char) terms quantize BEFORE the sum: 2 * round(term)
    assert got[2]["entropy_u"] == 2 * int(round(-0.5 * math.log(0.5) * 1e6))
    assert got[2]["n_chars"] == 4 and got[2]["n_distinct"] == 2
    # both are short (< 50 chars): never flagged regardless of entropy
    assert not got[1]["suspect"] and not got[2]["suspect"]


def test_mojibake_verdicts_and_repair(spark, tmp_path):
    df = spark.createDataFrame(
        [(4, "clean text", "s", "en", 10),
         (1, "cafe story", "s", "en", 10),
         (2, "byte soup", "s", "en", 9),
         (3, "padded doc", "s", "en", 10)],
        "doc_id long, text string, source string, lang string, "
        "n_chars long")
    out = str(tmp_path / "moji")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    got = {r["doc_id"]: r for r in Q.q_text_mojibake(spark, out).collect()}
    assert got[4]["verdict"] == "clean" and got[4]["fixed"] == "clean text"
    assert got[1]["verdict"] == "mojibake" and got[1]["n_moji"] >= 3
    # repaired text must contain the true unicode and no signatures
    assert "café" in got[1]["fixed"]
    assert "Ã" not in got[1]["fixed"]
    assert got[2]["verdict"] == "replacement" and got[2]["n_repl"] == 2
    assert got[3]["verdict"] == "mojibake"
    assert "Â" not in got[3]["fixed"]


def test_label_prop_two_cliques_converge(spark, tmp_path):
    # Two 4-cliques joined by one bridge edge: after 3 rounds every
    # member of a clique carries the clique's min label, and the
    # bridge does not merge them (unlike connected components).
    import itertools

    def clique(nodes):
        return [(a, b) for a, b in itertools.permutations(nodes, 2)]

    e = clique(["a1", "a2", "a3", "a4"]) + clique(["b1", "b2", "b3", "b4"])
    e.append(("a4", "b1"))
    edges = spark.createDataFrame(e, "a string, b string")
    sym = (edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct())
    lab = (sym.select(F.col("a").alias("node")).distinct()
           .withColumn("label", F.col("node")))
    from pyspark.sql import Window
    w = Window.partitionBy("node").orderBy(F.col("cnt").desc(),
                                           F.col("label").asc())
    for _ in range(3):
        nb = (sym.join(lab.withColumnRenamed("node", "b"), "b")
              .select(F.col("a").alias("node"), "label"))
        cnt = nb.groupBy("node", "label").agg(F.count(F.lit(1)).alias("cnt"))
        lab = (cnt.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1).select("node", "label"))
    got = {r["node"]: r["label"] for r in lab.collect()}
    assert all(got[n] == "a1" for n in ["a1", "a2", "a3", "a4"])
    assert all(got[n] == "b1" for n in ["b1", "b2", "b3", "b4"])


def test_zipf_fit_matches_python_ols(spark):
    sf0001_dir = "/root/testdata/sf0.001"
    r = Q.q_text_zipf_fit(spark, sf0001_dir).collect()[0]
    # python replay over the same vocab census
    import duckdb
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf0001_dir}/documents.parquet'")
    vocab = con.execute("""
        SELECT w, count(*) c FROM (
          SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) w
          FROM documents) WHERE len(w) >= 2 GROUP BY w
        ORDER BY c DESC, w ASC LIMIT 256""").fetchall()
    pts = [(i + 1, c) for i, (_, c) in enumerate(vocab) if c >= 2]
    u = lambda v: int(round(v * 1e6))  # noqa: E731
    n = len(pts)
    sx = sum(u(math.log(rk)) for rk, _ in pts) / 1e6
    sy = sum(u(math.log(c)) for _, c in pts) / 1e6
    sxy = sum(u(math.log(rk) * math.log(c)) for rk, c in pts) / 1e6
    sxx = sum(u(math.log(rk) ** 2) for rk, _ in pts) / 1e6
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert r["n"] == n
    assert r["slope"] == round(slope, 4)
    # frequencies are rank-decreasing, so the slope is negative; the
    # synthetic corpus's near-uniform vocab keeps it far above the
    # natural-text ~-1 (exactly the drift this diagnostic flags)
    assert -2.5 < r["slope"] < 0.0
    assert 0.0 <= r["r2"] <= 1.0
