"""Snapshot table store — checkpoint/resume with per-round lineage (ST4).

The north star lands frontier state in Iceberg with one snapshot per crawl
round. The Iceberg runtime jar isn't available in this sandbox, so this
module provides the same API surface over plain parquet directories:

    root/
      snap-00000/<table>/...parquet     append deltas committed that round
      snap-00000/manifest.json          {snapshot_id, parent, committed_at,
                                         tables, **meta (round, seq_offset)}
      ...

* append-style tables (crawl_order/seen/documents/metrics) commit only the
  round's delta — a read unions every committed snapshot's delta (Iceberg
  manifest-list semantics, minus compaction);
* state-style tables (frontier) commit the full small table each round — a
  read takes the latest version only.

Commits are atomic via write-to-temp + rename of the manifest; a crashed
round leaves no manifest and is invisible to readers, so resume restarts
from the last committed round (exactly-once per round thanks to the
idempotent install MERGE keyed on url_hash — SURVEY.md §4).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

# state-style: read latest version only. frontier_base is the delta-state
# layout's install-time table (engine.read_frontier_delta): written once,
# never rewritten — per-round state changes land as frontier_updates
# APPEND deltas instead of a full-frontier rewrite per round.
STATE_TABLES = {"frontier", "frontier_base"}


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest helpers ----------------------------------------------------
    def snapshots(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.root)):
            mf = os.path.join(self.root, name, "manifest.json")
            if name.startswith("snap-") and os.path.exists(mf):
                with open(mf) as f:
                    out.append(json.load(f))
        return sorted(out, key=lambda m: m["snapshot_id"])

    def latest(self) -> dict | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def _snap_dir(self, snapshot_id: int) -> str:
        return os.path.join(self.root, f"snap-{snapshot_id:05d}")

    # -- commit --------------------------------------------------------------
    def commit(self, tables: dict[str, DataFrame], meta: dict) -> int:
        """Write one snapshot: each DataFrame to its table dir, then the
        manifest (rename-atomic last)."""
        prev = self.latest()
        sid = (prev["snapshot_id"] + 1) if prev else 0
        snap_dir = self._snap_dir(sid)
        if os.path.exists(snap_dir):        # crashed, uncommitted attempt
            shutil.rmtree(snap_dir)
        for name, df in tables.items():
            path = os.path.join(snap_dir, name)
            df.write.mode("overwrite").parquet(path)
        manifest = dict(snapshot_id=sid,
                        parent=prev["snapshot_id"] if prev else None,
                        committed_at=time.time(),
                        tables=sorted(tables), **meta)
        tmp = os.path.join(snap_dir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(snap_dir, "manifest.json"))
        return sid

    # -- read ----------------------------------------------------------------
    def read(self, spark: SparkSession, table: str,
             as_of: int | None = None) -> DataFrame | None:
        paths = []
        latest_path = None
        for m in self.snapshots():
            if as_of is not None and m["snapshot_id"] > as_of:
                break
            if table in m["tables"]:
                p = os.path.join(self._snap_dir(m["snapshot_id"]), table)
                paths.append(p)
                latest_path = p
        if not paths:
            return None
        if table in STATE_TABLES:
            return spark.read.parquet(latest_path)
        return spark.read.parquet(*paths)
