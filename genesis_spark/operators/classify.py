"""Per-host topic-classifier harness (M1 + J6 + D8).

Reference flow: every parsed page asks ``trigger_topic_classifier``; the
result is memoized per base_url (shared_data_controller.py:40-52), so the
model runs ONCE per host — on whichever page reaches it first — and the
model itself is a lazily-constructed singleton per process
(topic_classifier_model.py:11-14, loaded once, reused).

Spark-first translation:
  * D8 (per-host cache)  -> dedup BEFORE the model: one representative row
    per base_url (first page in (depth, pos) order — per-host FIFO means
    that is exactly the page the reference would have memoized);
  * M1 (model invoke)    -> ONE mapInPandas over the representatives with
    a lazy per-python-worker model load (module-level cache, the
    ``pipeline(...)`` singleton pattern);
  * J6 (join-back)       -> broadcast join of the (hosts << pages) label
    table back onto the page stream.

At 100 TB: the model only ever sees |distinct hosts| rows; pages never
cross the Python boundary; the label table is O(hosts) and broadcasts.

The default model is a deterministic stub with the reference's DECISION
shape (input = (title+description+keyword)[:512], empty -> 'general',
sub-threshold confidence -> 'general'; topic_classifier_model.py:15-31) —
swap ``model_factory`` for a real transformers pipeline outside this
sandbox.
"""

from __future__ import annotations

import hashlib
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from genesis_spark import conf

MAX_INPUT_CHARS = 512      # topic_classifier_model.py:17-19
SCORE_THRESHOLD = 0.45     # topic_classifier_model.py:28

# per-python-worker model cache: factory runs once per worker process, like
# the reference's singleton pipeline load (topic_classifier_model.py:11-14)
_MODEL_CACHE: dict[str, object] = {}


def stub_model_factory() -> Callable[[str], list[str]]:
    """Deterministic model stand-in: md5-derived (label, score), the
    reference's thresholding applied verbatim."""
    vocab = conf.VALID_CONTENT_TYPES

    def predict(input_text: str) -> list[str]:
        if not input_text:
            return [conf.CONTENT_TYPE_GENERAL]
        h = hashlib.md5(input_text.encode()).digest()
        score = h[0] / 255.0
        label = vocab[h[1] % len(vocab)]
        if score > SCORE_THRESHOLD:
            return [label]
        return [conf.CONTENT_TYPE_GENERAL]

    return predict


# Bag-of-words topic centroids for the REAL (library-free) classifier:
# obvious public marker words per category from the reference's vocabulary
# (constants/enums.py:14-48 names the categories; the keyword lists are
# this repo's own). Categories without a list fall through to 'general'.
TOPIC_KEYWORDS: dict[str, tuple[str, ...]] = {
    "forums": ("forum", "thread", "reply", "post", "member", "board"),
    "news": ("news", "article", "report", "journalist", "headline"),
    "drugs": ("drug", "cannabis", "pills", "gram", "vendor", "shipping"),
    "hacking": ("hack", "exploit", "vulnerability", "payload", "shell"),
    "marketplaces": ("market", "listing", "escrow", "vendor", "order"),
    "cryptocurrency": ("bitcoin", "wallet", "monero", "crypto", "exchange"),
    "leaks": ("leak", "dump", "breach", "database", "records"),
    "ransomware": ("ransom", "encrypted", "victim", "deadline", "payment"),
    "carding": ("card", "cvv", "dumps", "bank", "fullz"),
    "malware": ("malware", "trojan", "stealer", "loader", "botnet"),
}


def keyword_centroid_model_factory(
        topics: dict[str, tuple[str, ...]] = None,
        threshold: float = SCORE_THRESHOLD) -> Callable[[str], list[str]]:
    """REAL nearest-centroid classifier (binary bag-of-words): score each
    topic as |tokens ∩ keywords| / |keywords| (fraction of the topic
    centroid present), argmax with lexicographic tie-break, and the
    reference's decision shape on top — empty input or sub-threshold top
    score -> 'general' (topic_classifier_model.py:15-31). Deterministic,
    library-free; a transformers pipeline drops in via ``model_factory``
    with no harness change."""
    import re
    topics = TOPIC_KEYWORDS if topics is None else topics
    kw = {t: frozenset(ws) for t, ws in topics.items()}

    def predict(input_text: str) -> list[str]:
        if not input_text:
            return [conf.CONTENT_TYPE_GENERAL]
        tokens = frozenset(re.findall(r"[a-z0-9]+", input_text.lower()))
        best_label, best_score = conf.CONTENT_TYPE_GENERAL, 0.0
        for label in sorted(kw):
            score = len(tokens & kw[label]) / len(kw[label])
            if score > best_score:
                best_label, best_score = label, score
        if best_score > threshold:
            return [best_label]
        return [conf.CONTENT_TYPE_GENERAL]

    return predict


def npz_softmax_model_factory(checkpoint_path: str, hash_dim: int = 64,
                              threshold: float = SCORE_THRESHOLD
                              ) -> Callable[[], Callable[[str], list[str]]]:
    """Checkpoint-backed REAL model: a softmax linear classifier over
    hashed bag-of-words whose learned weights are loaded from an ``.npz``
    file (arrays ``W`` [hash_dim, n_classes], ``b`` [n_classes],
    ``classes`` [n_classes] unicode). Returns a *factory* (not a model):
    the checkpoint read happens inside the factory call, i.e. exactly once
    per python worker through ``_MODEL_CACHE`` — the reference's lazy
    ``pipeline(model_path)`` singleton checkpoint load
    (topic_classifier_model.py:11-14) with the same decision shape on top
    (empty input or sub-threshold top probability -> 'general',
    :15-31). Any trainer that writes this ``.npz`` drops into
    ``classify_hosts`` with no harness change; the path must be visible to
    every executor (shipped via ``--files`` or a shared FS on a cluster).

    Feature hashing uses md5 (not ``hash()``) so the mapping is identical
    across worker processes regardless of PYTHONHASHSEED."""
    import re

    def factory() -> Callable[[str], list[str]]:
        import numpy as np
        ckpt = np.load(checkpoint_path, allow_pickle=False)
        W, b = ckpt["W"], ckpt["b"]
        classes = [str(c) for c in ckpt["classes"]]

        def featurize(text: str):
            x = np.zeros(hash_dim)
            for tok in re.findall(r"[a-z0-9]+", text.lower()):
                h = int.from_bytes(
                    hashlib.md5(tok.encode()).digest()[:4], "big")
                x[h % hash_dim] += 1.0
            n = np.linalg.norm(x)
            return x / n if n else x

        def predict(input_text: str) -> list[str]:
            if not input_text:
                return [conf.CONTENT_TYPE_GENERAL]
            z = featurize(input_text) @ W + b
            z -= z.max()
            p = np.exp(z)
            p /= p.sum()
            i = int(p.argmax())
            if p[i] > threshold:
                return [classes[i]]
            return [conf.CONTENT_TYPE_GENERAL]

        return predict

    return factory


def classify_hosts(pages: DataFrame,
                   model_factory: Callable = stub_model_factory,
                   model_key: str = "topic-stub",
                   base_col: str = "base_url", title_col: str = "title",
                   desc_col: str = "important_content",
                   keyword_col: str = "content",
                   order_cols: tuple = ("depth", "pos"),
                   call_counter=None, load_counter=None) -> DataFrame:
    """Label table (base_url, content_type) — ONE model call per distinct
    host, fed the host's first page in ``order_cols`` order.

    ``call_counter`` / ``load_counter`` accept Spark accumulators so tests
    can prove call-per-host and load-per-worker counts.
    """
    w = Window.partitionBy(base_col).orderBy(*order_cols)
    rep = (pages
           .withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") == 1)
           .select(F.col(base_col).alias("base_url"),
                   F.col(title_col).alias("_t"),
                   F.col(desc_col).alias("_d"),
                   F.col(keyword_col).alias("_k")))

    def run(batches):
        if model_key not in _MODEL_CACHE:
            _MODEL_CACHE[model_key] = model_factory()
            if load_counter is not None:
                load_counter.add(1)
        model = _MODEL_CACHE[model_key]
        for pdf in batches:
            labels = []
            for t, d, k in zip(pdf["_t"], pdf["_d"], pdf["_k"]):
                text = ((t or "") + (d or "") + (k or ""))[:MAX_INPUT_CHARS]
                labels.append(model(text))
            if call_counter is not None and len(pdf):
                call_counter.add(len(pdf))
            yield pd.DataFrame({"base_url": pdf["base_url"],
                                "content_type": labels})

    return rep.mapInPandas(run, "base_url string, "
                                "content_type array<string>")


def with_host_labels(pages: DataFrame, labels: DataFrame,
                     base_col: str = "base_url") -> DataFrame:
    """J6: broadcast the O(hosts) label table back onto the page stream;
    unlabeled hosts fall back to 'general' (the reference's default).

    Parsed pages (functions/parse.py) already carry a parser-filled
    ``content_type`` column; the reference OVERWRITES it with the memoized
    classifier decision (crawl_controller assigns m_content_type from
    trigger_topic_classifier), so we drop the incoming column before the
    join rather than leaving two same-named attributes (which would raise
    AMBIGUOUS_REFERENCE on the coalesce below)."""
    if "content_type" in pages.columns:
        pages = pages.drop("content_type")
    joined = pages.join(
        F.broadcast(labels.withColumnRenamed("base_url", base_col)),
        base_col, "left")
    return joined.withColumn(
        "content_type",
        F.coalesce("content_type",
                   F.array(F.lit(conf.CONTENT_TYPE_GENERAL))))
