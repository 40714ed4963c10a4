"""M1 deployment shape, full circle (round-4 verdict item #4): ship a
trained .npz softmax checkpoint to executors with ``spark-submit --files``
(code via ``--py-files``), resolve it worker-side through SparkFiles, and
classify through ``classify_hosts`` in the child JVM — the exact way the
reference's checkpoint (topic_classifier_model.py:11-14) would ride to a
real cluster. The parent trains the checkpoint; the job must label every
host with its planted topic using ONLY the shipped artifacts."""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import sys

import pytest

np = pytest.importorskip("numpy")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

CLASSES = ["drugs", "hacking", "general"]
WORDS = {
    "drugs": ["cannabis", "pills", "gram", "vendor", "shipping", "stealth"],
    "hacking": ["exploit", "payload", "shell", "vulnerability", "rootkit",
                "zero"],
    "general": ["welcome", "home", "about", "contact", "page", "info"],
}
HASH_DIM = 64


def _featurize(text):
    import hashlib
    x = np.zeros(HASH_DIM)
    for tok in re.findall(r"[a-z0-9]+", text.lower()):
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:4], "big")
        x[h % HASH_DIM] += 1.0
    n = np.linalg.norm(x)
    return x / n if n else x


def _train_checkpoint(path):
    rows, ys = [], []
    for ci, cls in enumerate(CLASSES):
        vocab = WORDS[cls]
        for i in range(20):
            sent = " ".join(vocab[(i + j) % len(vocab)] for j in range(5))
            rows.append(_featurize(sent))
            ys.append(ci)
    X, y = np.stack(rows), np.array(ys)
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
    assert (P.argmax(axis=1) == y).all(), "trainer failed to converge"
    np.savez(path, W=W, b=b, classes=np.array(CLASSES))


JOB = """\
import genesis_spark
assert "genesis_spark.zip" in genesis_spark.__file__, genesis_spark.__file__
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").appName("files-ckpt-job")
         .getOrCreate())

CLASSES = ["drugs", "hacking", "general"]
WORDS = {
    "drugs": ["cannabis", "pills", "gram", "vendor", "shipping", "stealth"],
    "hacking": ["exploit", "payload", "shell", "vulnerability", "rootkit",
                "zero"],
    "general": ["welcome", "home", "about", "contact", "page", "info"],
}
rows = []
for h in range(12):
    vocab = WORDS[CLASSES[h % 3]]
    for p in range(6):
        body = " ".join(vocab[(p + j) % len(vocab)] for j in range(5))
        rows.append((f"http://m{h}.onion", f"t {h}", body, body,
                     p // 3, p % 3))
pages = spark.createDataFrame(
    rows, "base_url string, title string, important_content string, "
          "content string, depth int, pos int")


def factory():
    # worker-side: resolve the --files artifact where THIS executor
    # materialized it, then hand the local path to the npz loader
    from pyspark import SparkFiles
    from genesis_spark.operators.classify import npz_softmax_model_factory
    return npz_softmax_model_factory(
        SparkFiles.get("topic_softmax.npz"))()


from genesis_spark.operators.classify import classify_hosts
labels = {r.base_url: r.content_type for r in classify_hosts(
    pages, model_factory=factory, model_key="npz-files-job").collect()}
for h in range(12):
    expect = CLASSES[h % 3]
    assert labels[f"http://m{h}.onion"] == [expect], (h, labels)
print("FILES_CKPT_OK", len(labels), flush=True)
spark.stop()
"""


@pytest.mark.slow
def test_files_shipped_checkpoint_classifies_in_child_jvm(tmp_path):
    from package import build_zip

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    zip_path = build_zip(str(tmp_path / "genesis_spark.zip"))
    ckpt = tmp_path / "topic_softmax.npz"
    _train_checkpoint(str(ckpt))
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    # cwd OUTSIDE the repo: code resolves from the zip, weights from
    # --files — nothing from the checkout
    res = subprocess.run(
        [spark_submit, "--py-files", zip_path, "--files", str(ckpt),
         str(job)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420)
    out = res.stdout + res.stderr
    assert res.returncode == 0, out[-3000:]
    assert "FILES_CKPT_OK 12" in out
