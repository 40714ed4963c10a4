"""Structured Streaming mappings of the reference's continuous loops.

The reference "streams" by periodic re-scan: a RepeatedTimer re-feeds the
frontier every 1800 s (scheduler.py:3-33, crawl_model.py:170-183) and Celery
drains it continuously. Structured Streaming expresses the same contract
declaratively:

  * ``parse_stream``    — continuous page ingest: readStream over a
    web_pages-shaped directory -> the same Arrow parse kernel -> append sink.
    ``Trigger.AvailableNow`` gives the reference's batch-drain semantics;
    a processing-time trigger gives the 1800 s re-feed loop (ST2).
  * ``metrics_stream``  — per-window fetch/parse counters with a watermark
    for late events (the reference's log-file metrics S12, made queryable).
  * ``frontier_sink``   — foreachBatch MERGE of newly discovered URLs into
    the frontier snapshot store: the streaming version of the install path
    (S8) with exactly-once via (batch_id, url_hash) idempotence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genesis_spark import schemas
from genesis_spark.functions.parse import parse_pages


def parse_stream(spark: SparkSession, pages_dir: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming DataFrame of parsed pages from a web_pages parquet dir."""
    reader = (spark.readStream.schema(schemas.WEB_PAGES)
              .format("parquet"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(pages_dir).filter(
        (F.col("status") == 200) & F.col("html").isNotNull())
    return parse_pages(raw, url_col="url", html_col="html")


def run_parse_stream_once(spark: SparkSession, pages_dir: str, out_dir: str,
                          checkpoint_dir: str) -> None:
    """Drain everything currently in pages_dir through the parse kernel into
    an append parquet sink, exactly once (AvailableNow), then stop."""
    parsed = parse_stream(spark, pages_dir)
    q = (parsed.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def metrics_stream(parsed: DataFrame, window: str = "10 minutes",
                   watermark: str = "30 minutes") -> DataFrame:
    """Windowed per-host crawl metrics with late-data watermark. ``parsed``
    must carry an event-time column ``fetched_at``."""
    return (parsed
            .withWatermark("fetched_at", watermark)
            .groupBy(F.window("fetched_at", window).alias("w"),
                     F.col("base_url").alias("host"))
            .agg(F.count("*").alias("n_pages"),
                 F.sum(F.size("sub_url")).alias("n_links"),
                 F.avg("validity_score").alias("avg_score"))
            .select(F.col("w.start").alias("window_start"),
                    "host", "n_pages", "n_links", "avg_score"))


def read_streaming_frontier(spark: SparkSession, store) -> DataFrame | None:
    """Reconstruct the streaming frontier from its delta layout:
    ``frontier_base`` (the first micro-batch's install, written once)
    unioned with every committed ``frontier_adds`` append delta. Every
    url_hash appears in exactly one delta (each batch anti-joins against
    this reconstruction before committing), so the union IS the MERGE."""
    base = store.read(spark, "frontier_base")
    adds = store.read(spark, "frontier_adds")
    if base is None:
        return adds
    return base if adds is None else base.unionByName(adds)


def frontier_sink(parsed: DataFrame, store, checkpoint_dir: str,
                  trigger_seconds: int | None = None):
    """foreachBatch install: explode each micro-batch's admitted links and
    MERGE them into the frontier snapshot store keyed on url_hash —
    idempotent on replays, so end-to-end exactly-once.

    Delta-state layout (round-2 verdict #2): each micro-batch commits ONLY
    its novel links as a ``frontier_adds`` append delta — O(batch), never
    an O(frontier) rewrite per trigger, mirroring the batch engine's
    frontier_base/frontier_updates split (engine.read_frontier_delta). At
    a micro-batch cadence a full-table rewrite is fatal at 10^10 rows.
    Replay-idempotent without a key ledger: a replayed batch anti-joins
    against the reconstruction that already contains its own first
    commit, so the re-commit is an empty delta (batch_id recorded in the
    manifest for lineage)."""

    def install_batch(batch_df: DataFrame, batch_id: int) -> None:
        links = (batch_df.select(F.explode("sub_url").alias("url"))
                 .distinct()
                 .withColumn("url_hash", F.xxhash64("url")))
        spark = batch_df.sparkSession
        existing = read_streaming_frontier(spark, store)
        if existing is not None:
            links = links.join(existing.select("url_hash"), "url_hash",
                               "left_anti")
        delta = links.select(
            "url_hash", "url",
            F.lit(1).alias("depth"), F.lit("pending").alias("state"))
        table = "frontier_base" if existing is None else "frontier_adds"
        store.commit({table: delta}, {"batch_id": batch_id})

    writer = (parsed.writeStream.foreachBatch(install_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(links: DataFrame, max_state_per_host: int = 1 << 20):
    """Streaming URL-seen dedup (D1 as a CUSTOM STATEFUL operator): per
    host_key, emit each URL the first time it is ever seen across ALL
    micro-batches; the per-host seen set lives in the state store as
    xxh64 hashes (``applyInPandasWithState``). This is the streaming form
    of the reference's per-host ``duplication_handler`` list
    (duplication_handler.py:3-19) — state scoped per host, surviving
    micro-batch boundaries and restarts via the checkpoint.

    ``max_state_per_host`` bounds state growth (insertion-order eviction);
    at 10^10 scale the exact anti-join against the frontier snapshot
    remains the source of truth downstream (frontier_sink) — this
    operator's job is cutting duplicate traffic before it, exactly like
    the batch Bloom prefilter.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from genesis_spark.functions.hashing import xxh64

    def fn(key, pdfs, state):
        if state.exists:
            (hashes,) = state.get
            seen = list(hashes)
        else:
            seen = []
        seen_set = set(seen)
        host = key[0]
        out = []
        for pdf in pdfs:
            for u in pdf["url"]:
                h = xxh64(u)
                if h not in seen_set:
                    seen_set.add(h)
                    seen.append(h)
                    out.append((host, u))
        if len(seen) > max_state_per_host:
            drop = seen[:len(seen) - max_state_per_host]
            seen = seen[len(seen) - max_state_per_host:]
            seen_set.difference_update(drop)
        state.update((seen,))
        yield pd.DataFrame(out, columns=["host_key", "url"])

    return links.groupBy("host_key").applyInPandasWithState(
        fn, "host_key string, url string", "hashes array<long>",
        "append", GroupStateTimeout.NoTimeout)


def sessionize_stream(events: DataFrame, gap_seconds: int = 21600):
    """Streaming gap-based sessionization as a CUSTOM STATEFUL operator
    (``applyInPandasWithState``): per user, an event more than
    ``gap_seconds`` after the previous one opens a new session; the
    (last-event-time, session-counter) pair lives in the state store, so
    session numbering is continuous across micro-batches and restarts —
    the streaming twin of the batch ``events_sessionize`` window query,
    which is exactly what its oracle asserts (per-event session ids equal,
    not just aggregates).

    Contract: ingestion must be event-time ordered across batches per user
    (the Kafka/file-source arrangement where a user's events land in one
    time-ordered partition); within a batch the operator sorts. State is
    two scalars per user — O(users), not O(events)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        if state.exists:
            last_sec, n_sessions = state.get
        else:
            last_sec, n_sessions = None, 0
        user = key[0]
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(pdf["ts"])
        ts_all.sort()
        rows = []
        for ts in ts_all:
            # floor to whole epoch seconds — the exact gap rule of the
            # batch query (ts.cast(long)) and of date_diff('second', ...)
            sec = ts.value // 1_000_000_000
            if last_sec is None or sec - last_sec > gap_seconds:
                n_sessions += 1
            rows.append((user, ts, n_sessions))
            last_sec = sec
        state.update((last_sec, n_sessions))
        yield pd.DataFrame(rows, columns=["user_id", "ts", "session_n"])

    return events.groupBy("user_id").applyInPandasWithState(
        fn, "user_id bigint, ts timestamp_ntz, session_n int",
        "last_sec bigint, n_sessions int",
        "append", GroupStateTimeout.NoTimeout)


def count_stream(links: DataFrame):
    """Streaming per-host URL counter as a CUSTOM STATEFUL operator
    (``applyInPandasWithState``) — the heavy-hitter tracker a crawl
    dispatcher runs over the live link stream (which hosts dominate
    traffic RIGHT NOW). State is ONE bigint per host (O(hosts), never
    O(urls)); each micro-batch emits the host's updated cumulative count,
    so the latest emission per host is the exact all-time count — the
    cumulative sequence is monotone, which is what lets a downstream
    ``max()`` recover the final value deterministically regardless of how
    the replay was micro-batched (the property the stream_topk oracle
    relies on)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        host = key[0]
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame([(host, n)], columns=["host_key", "n_cum"])

    return links.groupBy("host_key").applyInPandasWithState(
        fn, "host_key string, n_cum bigint", "n bigint",
        "append", GroupStateTimeout.NoTimeout)


def run_upsert_stream(spark: SparkSession, events_src: str,
                      work_dir: str) -> DataFrame:
    """foreachBatch CDC-MERGE maintenance of a key->state snapshot — the
    streaming form of the frontier/SnapshotStore upsert path (S8/ST4)
    applied to a change log: each micro-batch reduces to one winner per
    key by (ts, event_id), then full-outer-merges into the persisted
    snapshot, keeping whichever side carries the LATER (ts, event_id).
    Tombstones ('error' ops) are RETAINED in the snapshot rather than
    deleted, so a late-arriving older update cannot resurrect a deleted
    key — out-of-order batch delivery converges to the same state as an
    ordered replay (the property q_stream_upsert's batch oracle checks).
    Op counters merge by addition (order-independent).

    Snapshots alternate between two parquet dirs (read v, write v+1) —
    the same copy-on-write discipline as sources/tables.SnapshotStore;
    on Iceberg this is MERGE INTO + snapshot commit per batch.

    Crash-resume is real, not just the checkpoint's: merge progress is
    committed by an ATOMIC marker file (tmp+rename) AFTER each snapshot
    write, recording (version, last applied batch_id). foreachBatch is
    at-least-once, so a batch re-delivered after a write-then-crash is
    detected by batch_id and skipped instead of double-counting the
    additive op counters; a crash BEFORE the marker rename re-merges
    the batch onto the still-current old snapshot (the half-written dir
    is simply overwritten). Re-invoking with the same work_dir resumes
    from the marker — including the nothing-left-to-do case, which
    returns the committed snapshot.

    Returns the FINAL snapshot DataFrame (tombstones included)."""
    import json
    import os

    from pyspark.sql import Window

    snap_dirs = [os.path.join(work_dir, f"snap_v{i}") for i in (0, 1)]
    marker_path = os.path.join(work_dir, "_snapshot_marker.json")

    def read_marker():
        if os.path.exists(marker_path):
            with open(marker_path) as f:
                return json.load(f)
        return {"v": -1, "batch_id": -1}

    def commit_marker(st):
        tmp = marker_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(st, f)
        os.replace(tmp, marker_path)

    def merge(batch_df, batch_id):
        st = read_marker()
        if batch_id <= st["batch_id"]:
            return   # at-least-once re-delivery: already merged+committed
        b = batch_df.withColumn(
            "op", F.when(F.col("event_type") == "error",
                         F.lit("D")).otherwise(F.lit("U")))
        w = (Window.partitionBy("user_id")
             .orderBy(F.desc("ts"), F.desc("event_id")))
        red = (b.withColumn("rn", F.row_number().over(w))
               .withColumn("n_ops_d",
                           F.sum(F.lit(1)).over(
                               Window.partitionBy("user_id")))
               .withColumn("n_del_d",
                           F.sum((F.col("op") == "D").cast("long")).over(
                               Window.partitionBy("user_id")))
               .filter(F.col("rn") == 1)
               .select("user_id", "ts", "event_id", "value", "op",
                       F.col("n_ops_d").alias("n_ops"),
                       F.col("n_del_d").alias("n_deletes")))
        if st["v"] >= 0:
            snap = spark.read.parquet(snap_dirs[st["v"] % 2])
            j = snap.alias("s").join(red.alias("b"), "user_id",
                                     "full_outer")
            take_b = (F.col("s.ts").isNull() |
                      (F.col("b.ts").isNotNull() &
                       ((F.col("b.ts") > F.col("s.ts")) |
                        ((F.col("b.ts") == F.col("s.ts")) &
                         (F.col("b.event_id") > F.col("s.event_id"))))))

            def pick(c):
                return (F.when(take_b, F.col(f"b.{c}"))
                        .otherwise(F.col(f"s.{c}")).alias(c))

            out = j.select(
                "user_id", pick("ts"), pick("event_id"), pick("value"),
                pick("op"),
                (F.coalesce(F.col("s.n_ops"), F.lit(0)) +
                 F.coalesce(F.col("b.n_ops"), F.lit(0))).alias("n_ops"),
                (F.coalesce(F.col("s.n_deletes"), F.lit(0)) +
                 F.coalesce(F.col("b.n_deletes"), F.lit(0)))
                .alias("n_deletes"))
        else:
            out = red
        nxt = snap_dirs[(st["v"] + 1) % 2]
        out.write.mode("overwrite").parquet(nxt)
        commit_marker({"v": st["v"] + 1, "batch_id": batch_id})

    stream = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
              .option("maxFilesPerTrigger", 1)
              .format("parquet").load(events_src))
    q = (stream.writeStream.foreachBatch(merge)
         .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    final = read_marker()
    if final["v"] < 0:
        raise RuntimeError("upsert stream processed no batches")
    return spark.read.parquet(snap_dirs[final["v"] % 2])


def hist_stream(values: DataFrame, lo: float = 0.0, hi: float = 512.0,
                n_bins: int = 32):
    """Streaming mergeable histogram-sketch maintenance as a CUSTOM
    STATEFUL operator (``applyInPandasWithState``) — the live twin of
    operators/sketches.hist_bins: per key the state is ONE fixed array
    of ``n_bins`` bigint counts (O(bins), never O(rows)); each
    micro-batch bins its values with the SAME clamp-into-edge-bins rule
    as the batch sketch and adds them in. Emissions are the cumulative
    non-empty bins, so per-(key, bin) counts are monotone across the
    replay and a downstream ``max()`` recovers the exact final
    histogram regardless of micro-batching — the property the
    stream_histogram oracle checks against a batch GROUP BY. Input:
    (event_type string, value double)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    width = (hi - lo) / n_bins

    def fn(key, pdfs, state):
        bins = (np.array(state.get[0], dtype=np.int64) if state.exists
                else np.zeros(n_bins, dtype=np.int64))
        for pdf in pdfs:
            v = pd.to_numeric(pdf["value"], errors="coerce").dropna()
            b = np.clip(np.floor((v.to_numpy(dtype=np.float64) - lo)
                                 / width).astype(np.int64), 0, n_bins - 1)
            bins += np.bincount(b, minlength=n_bins).astype(np.int64)
        state.update((bins.tolist(),))
        nz = np.nonzero(bins)[0]
        yield pd.DataFrame({"event_type": key[0],
                            "bin": nz.astype(np.int32),
                            "cnt_cum": bins[nz]})

    return values.groupBy("event_type").applyInPandasWithState(
        fn, "event_type string, bin int, cnt_cum bigint",
        "bins array<bigint>", "append", GroupStateTimeout.NoTimeout)


def assemble_stream(spans: DataFrame):
    """Streaming interleaved-document REASSEMBLY as a CUSTOM STATEFUL
    operator (``applyInPandasWithState``) — the ingest shape for the
    north-rule span payload arriving as a row stream (chunked transfer
    / shard-parallel parse output): per doc_id the state accumulates
    (offset, text, is_media) triples across micro-batches; every row
    carries the doc's total span count (``n_spans`` — a chunked
    transfer knows its length), and the doc EMITS exactly once, when
    complete, with its text rebuilt in offset order and its media
    census — then its state is dropped (state is O(open docs), not
    O(stream)). Because emission waits for completeness, the final
    emission set is invariant to how the replay was micro-batched —
    the property the stream_spans_ingest oracle checks against the
    batch reconstruction. Input rows: (doc_id string, offset int,
    text string nullable, media_ref string nullable, n_spans int)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        if state.exists:
            offs, txts, med, total = state.get
            offs, txts, med = list(offs), list(txts), list(med)
        else:
            offs, txts, med, total = [], [], [], -1
        for pdf in pdfs:
            for off, txt, ref, n in zip(pdf["offset"], pdf["text"],
                                        pdf["media_ref"], pdf["n_spans"]):
                offs.append(int(off))
                is_media = isinstance(ref, str) and ref != ""
                med.append(1 if is_media else 0)
                txts.append("" if is_media or txt is None else str(txt))
                total = int(n)
        if total >= 0 and len(offs) == total:
            order = sorted(range(len(offs)), key=lambda i: offs[i])
            text_rt = " ".join(txts[i] for i in order if med[i] == 0)
            yield pd.DataFrame(
                [(key[0], total, text_rt, sum(med))],
                columns=["doc_id", "n_spans", "text_rt", "n_media"])
            state.remove()
        else:
            state.update((offs, txts, med, total))

    return spans.groupBy("doc_id").applyInPandasWithState(
        fn, "doc_id string, n_spans int, text_rt string, n_media int",
        "offs array<int>, txts array<string>, med array<int>, total int",
        "append", GroupStateTimeout.NoTimeout)


def rate_limit_stream(requests: DataFrame, leak: int = 1,
                      cost: int = 1000, cap: int = 2000):
    """Streaming LEAKY-BUCKET politeness limiter as a CUSTOM STATEFUL
    operator (``applyInPandasWithState``): per host, the state is TWO
    scalars — (debt_milli, last_ts_s) — not a history; each request
    first leaks debt for the elapsed seconds, then adds its cost, and
    is emitted with its post-request debt and the violation flag
    (debt > cap). This is the streaming twin of the batch
    ``frontier_leaky_bucket`` closed-form query, which is exactly what
    its oracle asserts per request.

    Ingestion contract: event-time ordered per key across micro-batches
    (the sessionize_stream arrangement); within a batch the operator
    sorts by (ts_s, event_id). O(1) state per host — the shape that
    holds at 10^10 hosts."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        if state.exists:
            debt, last = state.get
        else:
            debt, last = 0, -1
        host = key[0]
        rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf["ts_s"].astype("int64"),
                            pdf["event_id"].astype("int64")))
        rows.sort()
        out = []
        for ts_s, eid in rows:
            ts_s, eid = int(ts_s), int(eid)
            if last >= 0:
                debt = max(0, debt - leak * (ts_s - last))
            debt += cost
            last = ts_s
            out.append((eid, host, debt, int(debt > cap)))
        state.update((int(debt), int(last)))
        yield pd.DataFrame(
            out, columns=["event_id", "event_type", "debt_milli",
                          "violated"])

    return requests.groupBy("event_type").applyInPandasWithState(
        fn, "event_id bigint, event_type string, debt_milli bigint, "
            "violated int",
        "debt bigint, last bigint", "append",
        GroupStateTimeout.NoTimeout)


def forecast_stream(obs: DataFrame):
    """Streaming Holt linear-trend smoothing as a CUSTOM STATEFUL
    operator (``applyInPandasWithState``) — the live per-series
    forecaster a dispatcher runs over daily count series: state per
    event_type is THREE scalars (level, trend, step). Rows (t, y)
    arrive time-ordered; the recursion matches q_events_holt_linear's
    closed batch form exactly (init l = y1, b = y2 - y1, then
    l' = (y + l + b)/2, b' = ((l' - l) + b)/2 — alpha = beta = 1/2,
    exact dyadic doubles). Each batch emits the post-update state with
    its step counter, so the max-step emission per key IS the final
    batch state however the replay was micro-batched."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        if state.exists:
            level, trend, step = state.get
        else:
            level, trend, step = 0.0, 0.0, 0
        etype = key[0]
        rows = []
        for pdf in pdfs:
            for _, row in pdf.sort_values("t").iterrows():
                y = float(row["y"])
                if step == 0:
                    level, trend = y, 0.0
                else:
                    if step == 1:
                        trend = y - level
                    ln = (y + level + trend) / 2.0
                    trend = ((ln - level) + trend) / 2.0
                    level = ln
                step += 1
                rows.append((etype, step, level, trend))
        state.update((level, trend, step))
        yield pd.DataFrame(
            rows, columns=["event_type", "step", "level", "trend"])

    return obs.groupBy("event_type").applyInPandasWithState(
        fn, "event_type string, step int, level double, trend double",
        "level double, trend double, step int",
        "append", GroupStateTimeout.NoTimeout)


def anomaly_stream(points: DataFrame, min_history: int = 5,
                   k_sigma: int = 3):
    """Streaming z-score anomaly detection as a CUSTOM STATEFUL
    operator — per event_type, THREE integer scalars of state
    (n, sum, sum of squares over integer cent values); each arriving
    point is judged against the statistics of all PRIOR points
    (never itself), then folded in. The flag decision is the
    cross-multiplied integer inequality
        (n*x - S)^2 * (n-1) > k^2 * n * (n*Q - S^2)
    — sample variance with no division, so the verdict is exact and a
    batch prefix-window oracle reproduces it bit-for-bit. Points
    before ``min_history`` priors exist are never flagged (cold
    start). Emits one row per point with the verdict and its ordinal,
    so stream==batch is checked per point, not per aggregate."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        if state.exists:
            n, s, q = state.get
        else:
            n, s, q = 0, 0, 0
        etype = key[0]
        out = []
        for pdf in pdfs:
            for _, row in pdf.sort_values(["ts", "event_id"]).iterrows():
                x = int(row["cents"])
                if n >= min_history:
                    lhs = (n * x - s) ** 2 * (n - 1)
                    rhs = k_sigma * k_sigma * n * (n * q - s * s)
                    flag = 1 if lhs > rhs else 0
                else:
                    flag = 0
                n, s, q = n + 1, s + x, q + x * x
                out.append((etype, int(row["event_id"]), n, x, flag))
        state.update((n, s, q))
        yield pd.DataFrame(
            out, columns=["event_type", "event_id", "ordinal",
                          "cents", "is_anomaly"])

    return points.groupBy("event_type").applyInPandasWithState(
        fn,
        "event_type string, event_id long, ordinal long, "
        "cents long, is_anomaly int",
        "n bigint, s bigint, q bigint",
        "append", GroupStateTimeout.NoTimeout)
