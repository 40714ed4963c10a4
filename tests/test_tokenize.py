"""Distributed BPE: bpe_train golden vs a pure-Python classical
(Sennrich et al. 2016) reference — pair counts weighted by word freq,
argmax merge with (count desc, pair asc) tie-break, left-to-right greedy
rewrite — on an adversarial tiny corpus AND the real sf0.001 documents
table; bpe_apply tokenization parity on the same reference."""

from __future__ import annotations

from collections import Counter

from genesis_spark.operators.tokenize import bpe_apply, bpe_train

# frozen output of bpe_train(sf0.001 documents, 12) — also the constant
# applied by the text_bpe_apply driver row (genesis_spark/queries.py)
SF0001_MERGES = [("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"),
                 ("s", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
                 ("m", "er"), ("a", "t"), ("a", "n"), ("c", "an")]


def ref_bpe_train(word_freqs: dict[str, int], n: int):
    vocab = Counter()
    for w, c in word_freqs.items():
        vocab[tuple(w)] += c
    merges = []
    for _ in range(n):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new = Counter()
        for syms, c in vocab.items():
            new[tuple(ref_merge_word(list(syms), best))] += c
        vocab = new
    return merges


def ref_merge_word(syms: list[str], m: tuple[str, str]) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and (syms[i], syms[i + 1]) == m:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_tokenize(word: str, merges) -> list[str]:
    syms = list(word)
    for m in merges:
        syms = ref_merge_word(syms, m)
    return syms


def test_bpe_train_tiny_adversarial(spark):
    """Back-to-back merge sites ('abab'), self-overlap ('banana' with
    an->an), and a merge whose parts recur ('cabby') — the cases where a
    naive single-space replace diverges from classical greedy."""
    texts = ["x abab abab banana", "abab cabby", "aaaa aa"]
    tiny = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    wf = Counter(w for t in texts for w in t.split())
    exp = ref_bpe_train(dict(wf), 6)
    got = bpe_train(tiny, 6)
    assert got == exp
    # tokenization parity over every word
    got_tok = Counter(r.token for r in bpe_apply(tiny, got).collect())
    exp_tok = Counter()
    for w, c in wf.items():
        for t in ref_tokenize(w, exp):
            exp_tok[t] += c
    assert got_tok == exp_tok


def test_bpe_train_sf0001_golden(spark):
    """bpe_train on the real sf0.001 documents == the classical reference
    run on the same word counts == the frozen SF0001_MERGES constant the
    text_bpe_apply oracle row applies."""
    import duckdb
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wf = dict(duckdb.sql(r"""
        SELECT word, count(*) FROM (
          SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
          FROM read_parquet('/root/testdata/sf0.001/documents.parquet'))
        WHERE word <> '' GROUP BY word""").fetchall())
    exp = ref_bpe_train(wf, 12)
    assert exp == [tuple(m) for m in SF0001_MERGES]
    got = bpe_train(docs, 12)
    assert got == exp


def test_bpe_train_exhausted_vocab_stops(spark):
    """Fewer possible merges than requested: training stops when no pair
    remains instead of looping."""
    tiny = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    merges = bpe_train(tiny, 10)
    assert merges == [("a", "b")]


def test_tfidf_cosine_pairs_vs_numpy(spark):
    """Inverted-index sparse cosine == dense numpy tf-idf cosine on a
    hand-built corpus; disjoint-vocab docs produce NO candidate pair
    (inverted index never considers them)."""
    import math
    from collections import Counter
    from genesis_spark.operators.dedup import tfidf_cosine_pairs

    texts = {1: "apple banana cherry apple", 2: "apple banana cherry date",
             3: "xylo zulu quark", 4: "apple banana cherry apple"}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.cosine
           for r in tfidf_cosine_pairs(docs, threshold=0.1).collect()}

    tfs = {d: Counter(t.split()) for d, t in texts.items()}
    dfc = Counter(t for tf in tfs.values() for t in tf)
    n = len(texts)

    def vec(d):
        return {t: c * math.log(n / dfc[t]) for t, c in tfs[d].items()}

    def cos(a, b):
        va, vb = vec(a), vec(b)
        dot = sum(va[t] * vb[t] for t in va if t in vb)
        na = math.sqrt(sum(x * x for x in va.values()))
        nb = math.sqrt(sum(x * x for x in vb.values()))
        return round(dot / (na * nb), 4)

    exp = {}
    for a in texts:
        for b in texts:
            if a < b and set(tfs[a]) & set(tfs[b]):
                c = cos(a, b)
                if c >= 0.1:
                    exp[(a, b)] = c
    assert got == exp
    assert (1, 4) in got and got[(1, 4)] == 1.0     # exact dup
    assert not any(3 in p for p in got)             # disjoint vocab


def test_bpe_pair_counts_argmax_is_next_merge(spark):
    """The standalone training-step pass (the oracle row's operator)
    agrees with the iterative trainer: for every prefix of the learned
    merge list, the (cnt desc, a, b) argmax of bpe_pair_counts is
    exactly the merge bpe_train picked next."""
    from genesis_spark.operators.tokenize import bpe_pair_counts

    texts = ["x abab abab banana", "abab cabby", "aaaa aa"]
    tiny = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    merges = bpe_train(tiny, 4)
    for i in range(len(merges)):
        rows = bpe_pair_counts(tiny, merges[:i]).collect()
        best = min(rows, key=lambda r: (-r.cnt, r.a, r.b))
        assert (best.a, best.b) == merges[i]
