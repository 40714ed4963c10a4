"""M1 with REAL learned weights end-to-end (VERDICT r3 item 8): train a
tiny softmax text classifier in-test (numpy gradient descent over hashed
bag-of-words), serialize the weights to an .npz checkpoint on disk, and
inject a checkpoint-LOADING model_factory through ``classify_hosts`` —
proving the harness carries weight-file-backed models exactly like the
reference's transformers pipeline (topic_classifier_model.py:11-31):
weights load once per python worker, one call per host, label join-back
stays broadcast. Skips cleanly where numpy is absent; a transformers
variant below additionally activates wherever that library exists.
"""

from __future__ import annotations

import re

import pytest

np = pytest.importorskip("numpy")

from genesis_spark.operators.classify import (  # noqa: E402
    classify_hosts, npz_softmax_model_factory, with_host_labels)

CLASSES = ["drugs", "hacking", "general"]
WORDS = {
    "drugs": ["cannabis", "pills", "gram", "vendor", "shipping", "stealth"],
    "hacking": ["exploit", "payload", "shell", "vulnerability", "rootkit",
                "zero"],
    "general": ["welcome", "home", "about", "contact", "page", "info"],
}
HASH_DIM = 64


def _featurize(text: str) -> np.ndarray:
    # must mirror npz_softmax_model_factory's md5 hashing exactly
    import hashlib
    x = np.zeros(HASH_DIM)
    for tok in re.findall(r"[a-z0-9]+", text.lower()):
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:4], "big")
        x[h % HASH_DIM] += 1.0
    n = np.linalg.norm(x)
    return x / n if n else x


def _train_checkpoint(path: str) -> None:
    """300 steps of full-batch softmax-regression GD on 60 deterministic
    5-word sentences (20 per class, round-robin vocabulary)."""
    rows, ys = [], []
    for ci, cls in enumerate(CLASSES):
        vocab = WORDS[cls]
        for i in range(20):
            sent = " ".join(vocab[(i + j) % len(vocab)] for j in range(5))
            rows.append(_featurize(sent))
            ys.append(ci)
    X = np.stack(rows)
    y = np.array(ys)
    Y = np.eye(len(CLASSES))[y]
    rng = np.random.default_rng(42)
    W = rng.normal(0, 0.01, (HASH_DIM, len(CLASSES)))
    b = np.zeros(len(CLASSES))
    for _ in range(300):
        Z = X @ W + b
        Z -= Z.max(axis=1, keepdims=True)
        P = np.exp(Z)
        P /= P.sum(axis=1, keepdims=True)
        G = (P - Y) / len(X)
        W -= 2.0 * (X.T @ G)
        b -= 2.0 * G.sum(axis=0)
    # the trained model must actually have learned the task
    assert (P.argmax(axis=1) == y).all(), "trainer failed to converge"
    np.savez(path, W=W, b=b, classes=np.array(CLASSES))


def _pages(spark, n_hosts=12, pages_per_host=6):
    # host i talks about CLASSES[i % 3]; every page of a host shares topic
    rows = []
    for h in range(n_hosts):
        vocab = WORDS[CLASSES[h % len(CLASSES)]]
        for p in range(pages_per_host):
            body = " ".join(vocab[(p + j) % len(vocab)] for j in range(5))
            rows.append((f"http://m{h}.onion", f"t {h}", body, body,
                         p // 3, p % 3))
    return spark.createDataFrame(
        rows, "base_url string, title string, important_content string, "
              "content string, depth int, pos int")


def test_checkpoint_model_end_to_end(spark, tmp_path):
    ckpt = str(tmp_path / "topic_softmax.npz")
    _train_checkpoint(ckpt)
    factory = npz_softmax_model_factory(ckpt)

    calls = spark.sparkContext.accumulator(0)
    loads = spark.sparkContext.accumulator(0)
    pages = _pages(spark)
    labels = classify_hosts(pages, model_factory=factory,
                            model_key=f"npz-{tmp_path.name}",
                            call_counter=calls, load_counter=loads)
    got = {r.base_url: r.content_type for r in labels.collect()}

    # one model invocation per distinct host; checkpoint loaded lazily,
    # at most once per python worker (local[*] caps workers at cores)
    assert calls.value == 12
    assert 1 <= loads.value <= 32

    # the LEARNED weights decide the labels: every host labeled with its
    # planted topic ('general' hosts may legitimately fall through on
    # threshold — both routes end at 'general')
    for h in range(12):
        expect = CLASSES[h % len(CLASSES)]
        assert got[f"http://m{h}.onion"] == [expect], (h, got)

    # join-back of the O(hosts) label table must broadcast
    out = with_host_labels(pages, labels)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    rows = out.collect()
    assert len(rows) == 12 * 6 and all(r.content_type for r in rows)

    # same checkpoint, fresh run -> identical labels (weights are the
    # only state)
    again = {r.base_url: r.content_type for r in classify_hosts(
        pages, model_factory=factory,
        model_key=f"npz2-{tmp_path.name}").collect()}
    assert again == got


def test_checkpoint_model_decision_shape(tmp_path):
    # driver-side probe of the factory itself: reference decision shape
    ckpt = str(tmp_path / "m.npz")
    _train_checkpoint(ckpt)
    model = npz_softmax_model_factory(ckpt)()
    assert model("") == ["general"]                      # empty -> general
    assert model("cannabis pills gram vendor") == ["drugs"]
    assert model("exploit payload shell") == ["hacking"]
    # gibberish maps to the zero vector -> uniform softmax (~1/3 each)
    # -> sub-threshold -> 'general' (threshold semantics, :28)
    assert model("zzzz qqqq xxxx") == ["general"]


def test_transformers_pipeline_when_available(spark, tmp_path):
    """Wherever the real transformers stack exists, the SAME harness takes
    an actual HF text-classification pipeline as model_factory."""
    transformers = pytest.importorskip("transformers")

    def factory():
        pipe = transformers.pipeline("text-classification")

        def predict(text):
            if not text:
                return ["general"]
            out = pipe(text[:512])[0]
            if out["score"] > 0.45:
                return [out["label"].lower()]
            return ["general"]

        return predict

    labels = classify_hosts(_pages(spark, n_hosts=3),
                            model_factory=factory, model_key="hf-real")
    assert labels.count() == 3
