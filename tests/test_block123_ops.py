"""Block-123 operators: streaming Holt forecaster, integer-exact PCM
resampling, longest-prefix-match routing join."""

from __future__ import annotations

from collections import defaultdict

import pytest

pytestmark = pytest.mark.block

from genesis_spark.queries import q_host_asn_lpm

SF = "/root/testdata/sf0.001"


def test_forecast_stream_matches_hand_recursion(spark):
    """A constructed 2-series feed through the stateful operator,
    split so batches cut MID-series: final state equals the batch
    recursion computed by hand."""
    import glob
    import os
    import shutil
    import tempfile
    import time

    from genesis_spark.streaming.pipeline import forecast_stream

    series = {"a": [4, 6, 5, 9, 7], "b": [10, 2, 2, 2, 12]}
    rows = [(k, t + 1, y) for k, ys in series.items()
            for t, y in enumerate(ys)]
    tmp = tempfile.mkdtemp(prefix="gs_fc_unit_")
    src, ck = os.path.join(tmp, "obs"), os.path.join(tmp, "ckpt")
    os.makedirs(src)
    t0 = time.time() - 50
    cuts = [(1, 2), (3, 3), (4, 5)]           # uneven micro-batches
    for i, (lo, hi) in enumerate(cuts, 1):
        part = os.path.join(tmp, f"p{i}")
        (spark.createDataFrame(
            [r for r in rows if lo <= r[1] <= hi],
            "event_type string, t int, y long")
         .coalesce(1).write.mode("overwrite").parquet(part))
        f = glob.glob(os.path.join(part, "*.parquet"))[0]
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (t0 + i, t0 + i))
    stream = (spark.readStream.schema("event_type string, t int, y long")
              .option("maxFilesPerTrigger", 1).format("parquet").load(src))
    q = (forecast_stream(stream).writeStream.format("memory")
         .queryName("gs_fc_unit").option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    em = spark.table("gs_fc_unit").collect()
    final = {}
    for r in em:
        if r.event_type not in final or r.step > final[r.event_type].step:
            final[r.event_type] = r
    for k, ys in series.items():
        l, b = float(ys[0]), float(ys[1] - ys[0])
        for y in ys[1:]:
            ln = (y + l + b) / 2.0
            b = ((ln - l) + b) / 2.0
            l = ln
        r = final[k]
        assert (r.step, r.level, r.trend) == (len(ys), l, b), k
    # every observation produced exactly one emission
    steps = defaultdict(set)
    for r in em:
        steps[r.event_type].add(r.step)
    assert all(s == {1, 2, 3, 4, 5} for s in steps.values())


def test_resample_pcm16_kernel_cases(spark):
    import struct

    from genesis_spark.operators.multimodal import (encode_pcm16,
                                                    resample_pcm16)

    T = 5                                     # tiny target: hand-checkable
    const = encode_pcm16(8, 16000, [7] * 8)
    ramp = encode_pcm16(9, 16000, list(range(0, 90, 10)))
    short = encode_pcm16(1, 16000, [3])
    poison = struct.pack(">II", 99, 16000) + b"xx"
    df = spark.createDataFrame(
        [(1, const), (2, ramp), (3, short), (4, poison)],
        "doc_id long, media_blob binary")
    got = {r.doc_id: r for r in
           resample_pcm16(df, target=T).collect()}
    assert set(got) == {1, 2}                 # short + poison skipped
    # constant signal: every out_q = 7*(T-1)
    assert (got[1].out_sum_q, got[1].out_min_q, got[1].out_max_q) == (
        7 * (T - 1) * T, 7 * (T - 1), 7 * (T - 1))
    # linear ramp 0..80 over 9 samples, resampled to 5: positions
    # t*8/4 = 0,2,4,6,8 -> exact samples 0,20,40,60,80 (x4 units)
    assert got[2].out_min_q == 0
    assert got[2].out_max_q == 80 * (T - 1)
    assert got[2].out_sum_q == (0 + 20 + 40 + 60 + 80) * (T - 1)


def test_asn_lpm_python_replay_and_coverage(spark):
    keys = {r.o_orderkey % 500 for r in
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey").collect()}
    prefixes = {}
    for i in range(16):
        prefixes[(i * (1 << 24), 8)] = i + 100
    for i in range(64):
        prefixes[((i % 16) * (1 << 24) + ((i * 7) % 256) * 65536,
                  16)] = i + 1000
    for i in range(128):
        prefixes[((i % 16) * (1 << 24) + ((i * 11) % 256) * 65536
                  + ((i * 29) % 256) * 256, 24)] = i + 10000
    want = {}
    for hid in keys:
        ip = (hid * 2654435761) % (1 << 32)
        best = (0, 0)
        for plen, mod in ((8, 1 << 24), (16, 1 << 16), (24, 1 << 8)):
            key = (ip - ip % mod, plen)
            if key in prefixes:
                best = (plen, prefixes[key])
        want[f"h{hid}"] = (ip, *best)
    got = {r.host_key: (r.ip, r.prefix_len, r.asn) for r in
           q_host_asn_lpm(spark, SF).collect()}
    assert got == want
    plens = {p for _, p, _ in got.values()}
    # the fixture exercises unrouted plus at least two real lengths
    assert 0 in plens and len(plens) >= 3
