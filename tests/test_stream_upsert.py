"""Out-of-order convergence proof for the foreachBatch CDC-merge
snapshot (streaming/pipeline.run_upsert_stream): a tombstone processed in
an EARLIER micro-batch than an older update must still win (retained
tombstones block resurrection), while a later-timestamp update arriving
later upserts normally. File mtimes order the micro-batches."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from genesis_spark.streaming.pipeline import run_upsert_stream

_SCHEMA = pa.schema([
    ("event_id", pa.int64()),
    ("ts", pa.timestamp("us")),
    ("user_id", pa.int64()),
    ("event_type", pa.string()),
    ("value", pa.float64()),
    ("props", pa.string()),
])


def _write(path, rows, mtime):
    pdf = pd.DataFrame(rows, columns=[f.name for f in _SCHEMA])
    pq.write_table(pa.Table.from_pandas(pdf, schema=_SCHEMA), path)
    os.utime(path, (mtime, mtime))


def test_late_old_update_cannot_resurrect_deleted_key(spark, tmp_path):
    t = dt.datetime(2024, 1, 1)

    def ts(s):
        return t + dt.timedelta(seconds=s)

    src = tmp_path / "events"
    src.mkdir()
    # batch 1 (earlier mtime): user 1 tombstone at ts=10; user 2 v=1.0
    _write(str(src / "b1.parquet"),
           [(100, ts(10), 1, "error", 0.0, "{}"),
            (101, ts(1), 2, "click", 1.0, "{}")], mtime=1_000_000)
    # batch 2 (later mtime): user 1 OLDER update (ts=5) — must NOT
    # resurrect; user 2 newer update — must upsert
    _write(str(src / "b2.parquet"),
           [(102, ts(5), 1, "view", 9.9, "{}"),
            (103, ts(2), 2, "view", 2.5, "{}")], mtime=2_000_000)

    snap = {r["user_id"]: r for r in
            run_upsert_stream(spark, str(src),
                              str(tmp_path / "work")).collect()}
    assert set(snap) == {1, 2}
    # user 1: tombstone won despite the update arriving in a later batch
    assert snap[1]["op"] == "D"
    assert snap[1]["event_id"] == 100
    assert snap[1]["n_ops"] == 2 and snap[1]["n_deletes"] == 1
    # user 2: ordinary last-writer-wins across batches
    assert snap[2]["op"] == "U"
    assert snap[2]["event_id"] == 103
    assert snap[2]["value"] == 2.5
    assert snap[2]["n_ops"] == 2 and snap[2]["n_deletes"] == 0

    # resume on the SAME work_dir with nothing left to process: the
    # committed marker returns the existing snapshot (no re-merge — the
    # additive counters would double if any batch were re-applied, and
    # the pre-fix code raised 'processed no batches' here)
    again = {r["user_id"]: r for r in
             run_upsert_stream(spark, str(src),
                               str(tmp_path / "work")).collect()}
    assert {u: (r["event_id"], r["n_ops"], r["n_deletes"])
            for u, r in again.items()} == \
           {u: (r["event_id"], r["n_ops"], r["n_deletes"])
            for u, r in snap.items()}
