"""Build + load the --py-files artifact (S11, crawl_model.py:33-68).

The reference's parser-pack loader downloads a zip, unpacks it, and adds
the directory to the import path at runtime (crawl_model.py:33-68). The
Spark-native equivalent is a zip shipped with ``spark-submit --py-files``
(driver + executor sys.path) or attached to a live session with
``SparkContext.addPyFile`` — both covered here:

    python tools/package.py                  -> dist/genesis_spark.zip
    spark-submit --py-files dist/genesis_spark.zip your_job.py

Pure-stdlib zipfile build (no ``zip`` binary needed); round-tripped by
tests/test_pyfiles.py, which launches a real spark-submit subprocess that
imports genesis_spark FROM THE ZIP and runs a parse.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str | None = None) -> str:
    """Write dist/genesis_spark.zip (deterministic order, no __pycache__)."""
    out_path = out_path or os.path.join(REPO, "dist", "genesis_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg_root = os.path.join(REPO, "genesis_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if fn.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


def install_pyfiles(spark, zip_path: str) -> None:
    """Runtime parser-pack load on a LIVE session (the reference's
    unpack-and-import-path flow, crawl_model.py:52-68): ships the zip to
    every executor and prepends it to their sys.path. Driver-side import
    still needs the zip on the driver's sys.path (spark-submit --py-files
    does both; this covers dynamically distributed packs)."""
    spark.sparkContext.addPyFile(zip_path)


if __name__ == "__main__":
    p = build_zip()
    with zipfile.ZipFile(p) as zf:
        names = zf.namelist()
    print(f"{p}: {len(names)} files")
