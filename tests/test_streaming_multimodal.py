"""Streaming drain + multimodal plumbing tests."""

from __future__ import annotations

import pytest

from genesis_spark.operators import multimodal as MM


def test_streaming_parse_drain(spark, tmp_path):
    from genesis_spark import schemas
    from genesis_spark.streaming.pipeline import run_parse_stream_once

    host = "http://streamhostaaaa.onion"
    rows = [
        (1, f"{host}/p{i}", "streamhostaaaa", 200, f"{host}/p{i}",
         f"<title>t{i}</title><p>the market service is secure and private "
         f"data rec{i}</p>", [])
        for i in range(6)
    ] + [(9, f"{host}/dead", "streamhostaaaa", 404, f"{host}/dead", None, [])]
    src = str(tmp_path / "pages_in")
    spark.createDataFrame(rows, schemas.WEB_PAGES).write.parquet(src)
    out = str(tmp_path / "parsed_out")
    run_parse_stream_once(spark, src, out, str(tmp_path / "ckpt"))
    parsed = spark.read.parquet(out)
    assert parsed.count() == 6           # 404 row filtered
    assert {r.doc_id for r in parsed.select("doc_id").collect()} == \
        {f"{host}/p{i}" for i in range(6)}
    spans = parsed.filter(f"doc_id = '{host}/p0'").select("spans").first().spans
    assert spans[0].kind == "title" and spans[0].text == "t0"


def test_media_meta_decode(spark):
    rows = [("d0", MM.encode_fake_media(640, 480, "png", b"x" * 100)),
            ("d1", MM.encode_fake_media(64, 64, "jpg")),
            ("d2", b"not-a-blob"),
            ("d3", None)]
    df = spark.createDataFrame(rows, "doc_id string, media_blob binary")
    out = {r.doc_id: r.media_meta for r in
           MM.extract_media_meta(df).collect()}
    assert out["d0"].width == 640 and out["d0"].height == 480
    assert out["d0"].ok and out["d1"].format == "jpg"
    assert not out["d2"].ok and not out["d3"].ok
    assert out["d3"].n_bytes == 0


def test_frame_sampling(spark):
    blob = MM.encode_fake_media(8, 8, "mp4", bytes(range(200)))
    df = spark.createDataFrame([("v0", blob)],
                               "doc_id string, media_blob binary")
    frames = MM.sample_frames(df, every_n_bytes=64).collect()
    assert [f.frame_no for f in frames] == [0, 1, 2, 3]
    assert bytes(frames[0].frame) == bytes(range(64))


def test_library_decode_is_gated():
    with pytest.raises(NotImplementedError):
        MM.library_decode(b"\x89PNG")


def test_dedup_stream_state_across_microbatches(spark, tmp_path):
    """applyInPandasWithState URL-seen: duplicates that SPAN micro-batches
    (one file per trigger -> one batch per file) are suppressed by the
    state store, not by within-batch logic."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from genesis_spark.streaming.pipeline import dedup_stream

    src = tmp_path / "links"
    src.mkdir()
    b1 = [("h0", f"http://h0.onion/p{i}") for i in range(5)] + \
         [("h1", "http://h1.onion/a"), ("h0", "http://h0.onion/p0")]
    b2 = [("h0", f"http://h0.onion/p{i}") for i in range(3, 8)] + \
         [("h1", "http://h1.onion/a"), ("h1", "http://h1.onion/b")]
    for name, rows in (("b1", b1), ("b2", b2)):
        pq.write_table(pa.table({
            "host_key": pa.array([r[0] for r in rows]),
            "url": pa.array([r[1] for r in rows])}),
            str(src / f"{name}.parquet"))

    links = (spark.readStream.schema("host_key string, url string")
             .option("maxFilesPerTrigger", 1).format("parquet")
             .load(str(src)))
    q = (dedup_stream(links).writeStream.format("memory")
         .queryName("dedup_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = [(r.host_key, r.url) for r in
           spark.sql("SELECT * FROM dedup_out").collect()]
    # every distinct (host, url) exactly once — 12 input rows, 10 distinct;
    # the h0 p3/p4 and h1 'a' dups cross the file/batch boundary
    assert sorted(got) == sorted(set(r for r in b1 + b2))
    assert len(got) == 10


def test_frontier_sink_delta_appends_no_rewrite(spark, tmp_path):
    """VERDICT r2 #2: the streaming frontier sink must commit O(batch)
    append deltas, never rewrite the frontier per micro-batch. Three
    micro-batches (maxFilesPerTrigger=1) -> one frontier_base + two
    frontier_adds deltas; the reconstruction equals the distinct union of
    all admitted links, and re-draining the same stream dir with a fresh
    checkpoint (a full replay) adds only empty deltas."""
    from genesis_spark import schemas
    from genesis_spark.sources.tables import SnapshotStore
    from genesis_spark.streaming.pipeline import (frontier_sink,
                                                  parse_stream,
                                                  read_streaming_frontier)

    host = "http://deltahostaaaa.onion"
    src = str(tmp_path / "pages_in")
    all_links = set()
    for b in range(3):
        links = [f"{host}/b{b}l{j}" for j in range(4)] + [f"{host}/shared"]
        all_links.update(links)
        anchors = "".join(f'<a href="{u}">x</a>' for u in links)
        rows = [(b, f"{host}/page{b}", "deltahostaaaa", 200,
                 f"{host}/page{b}",
                 f"<title>t{b}</title><p>the market data is private and "
                 f"secure info</p>{anchors}", [])]
        (spark.createDataFrame(rows, schemas.WEB_PAGES)
         .coalesce(1).write.mode("append").parquet(src))

    store = SnapshotStore(str(tmp_path / "snaps"))
    parsed = parse_stream(spark, src, max_files_per_trigger=1)
    q = frontier_sink(parsed, store, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = {r.url for r in read_streaming_frontier(spark, store).collect()}
    # sub_url admission keeps same-host links; every page's links admitted
    assert got == all_links
    n_frontier = len(got)

    snaps = store.snapshots()
    assert snaps[0]["tables"] == ["frontier_base"]
    for m in snaps[1:]:
        assert m["tables"] == ["frontier_adds"]     # never a full rewrite
    assert len(snaps) == 3
    # O(batch) deltas: total rows across base+adds == |distinct links|
    n_base = store.read(spark, "frontier_base").count()
    n_adds = store.read(spark, "frontier_adds").count()
    assert n_base + n_adds == n_frontier
    # '/shared' appears in every batch but lands exactly once
    assert sum(1 for u in got if u.endswith("/shared")) == 1

    # full replay (fresh checkpoint, same input): anti-join makes every
    # delta empty -> frontier unchanged, still no rewrite
    q2 = frontier_sink(parse_stream(spark, src, max_files_per_trigger=1),
                       store, str(tmp_path / "ckpt2"))
    q2.awaitTermination()
    assert read_streaming_frontier(spark, store).count() == n_frontier
    for m in store.snapshots()[3:]:
        assert m["tables"] == ["frontier_adds"]


def _make_png(w: int, h: int) -> bytes:
    import struct
    import zlib
    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + chunk
            + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
            + b"rest-of-file-not-needed")


def test_png_header_decode_real_bytes(spark):
    """decode_png_header parses genuine PNG bytes (stdlib-built, spec CRC)
    and rejects corrupt/truncated/non-PNG blobs without raising."""
    good = _make_png(640, 360)
    bad_crc = bytearray(good)
    bad_crc[30] ^= 0xFF
    rows = [("ok", good), ("crc", bytes(bad_crc)), ("trunc", good[:20]),
            ("fixture", MM.encode_fake_media(32, 16, "jpg")), ("none", None)]
    df = spark.createDataFrame(rows, "doc_id string, media_blob binary")
    out = {r.doc_id: r.media_meta for r in
           MM.extract_media_meta(df, decode_fn=MM.decode_auto).collect()}
    assert out["ok"].ok and (out["ok"].width, out["ok"].height) == (640, 360)
    assert out["ok"].format == "png"
    assert not out["crc"].ok          # CRC mismatch caught
    assert not out["trunc"].ok
    assert out["fixture"].ok and out["fixture"].format == "jpg"
    assert not out["none"].ok and out["none"].n_bytes == 0


def _make_jpeg(w: int, h: int) -> bytes:
    """Genuine JPEG structure: SOI, APP0/JFIF, a DQT, SOF0 with the dims
    (ITU T.81 B.2.2), then SOS onwards omitted (decode stops at SOF)."""
    import struct
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00\x48\x00\x48\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof0 = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x03"
            + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01")
    return b"\xff\xd8" + app0 + dqt + sof0


def test_jpeg_gif_header_decode_real_bytes():
    """decode_jpeg_header walks marker segments to SOF0; decode_gif_header
    reads the little-endian logical screen descriptor; both reject
    malformed bytes without raising. Pure functions — no Spark needed
    (the mapInPandas plumbing is pinned by the PNG test above)."""
    import struct
    j = MM.decode_jpeg_header(_make_jpeg(1920, 1080))
    assert j == (1920, 1080, "jpeg", len(_make_jpeg(1920, 1080)), True)
    # truncated mid-segment / zero dim / marker desync / no SOF before SOS
    assert not MM.decode_jpeg_header(_make_jpeg(64, 64)[:10])[4]
    assert not MM.decode_jpeg_header(_make_jpeg(0, 8))[4]
    assert not MM.decode_jpeg_header(b"\xff\xd8\x00\x00\x00\x00")[4]
    assert not MM.decode_jpeg_header(
        b"\xff\xd8" + b"\xff\xda" + struct.pack(">H", 4) + b"\x01\x00")[4]

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\xf7\x00\x00"
    assert MM.decode_gif_header(gif) == (320, 200, "gif", len(gif), True)
    assert not MM.decode_gif_header(b"GIF89a" + struct.pack("<HH", 0, 5) + b"\x00\x00\x00")[4]
    assert not MM.decode_gif_header(b"GIF88a" + bytes(6))[4]

    # decode_auto dispatch covers all four magics
    assert MM.decode_auto(_make_jpeg(8, 4))[2] == "jpeg"
    assert MM.decode_auto(gif)[2] == "gif"
    assert MM.decode_auto(MM.encode_fake_media(2, 2, "mp4"))[2] == "mp4"
    assert not MM.decode_auto(b"PK\x03\x04not-an-image")[4]


def test_metrics_stream_watermark_drops_late_rows(spark, tmp_path):
    """Late-data contract of the windowed metrics agg: once the watermark
    (30 min) has passed a 10-min window, a late row inside that window is
    DROPPED — the finalized (append-mode) window emits without it."""
    from datetime import datetime

    from pyspark.sql import functions as F
    from genesis_spark.streaming.pipeline import metrics_stream

    schema = ("fetched_at timestamp, base_url string, "
              "sub_url array<string>, validity_score double")
    src = str(tmp_path / "mx_src")

    def emit(rows):
        (spark.createDataFrame(
            [(datetime.fromisoformat(t), h, s, v) for t, h, s, v in rows],
            schema).coalesce(1).write.mode("append").parquet(src))

    T0 = "2026-01-01 00:"
    # batch 1: two on-time rows in window [00:00, 00:10) + one at 01:00
    # that advances the watermark to 00:30 (> window end)
    emit([(f"{T0}05:00", "http://h1.onion", ["a"], 4.0),
          (f"{T0}07:00", "http://h1.onion", ["b", "c"], 6.0),
          ("2026-01-01 01:00:00", "http://h1.onion", [], 1.0)])

    stream = (spark.readStream.schema(schema).parquet(src)
              .withColumn("fetched_at", F.col("fetched_at")))
    q = (metrics_stream(stream).writeStream.format("memory")
         .queryName("mx_late").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "mx_ckpt"))
         .start())
    q.processAllAvailable()

    # batch 2: a LATE row inside the finalized window (behind the
    # watermark) plus a far-future row that flushes remaining windows
    emit([(f"{T0}06:00", "http://h1.onion", ["late1", "late2"], 0.0),
          ("2026-01-01 02:00:00", "http://h1.onion", [], 1.0)])
    q.processAllAvailable()
    # batch 3: advance once more so [01:00, 01:10) also finalizes
    emit([("2026-01-01 03:00:00", "http://h1.onion", [], 1.0)])
    q.processAllAvailable()
    q.stop()

    rows = {str(r.window_start): (r.n_pages, r.n_links, r.avg_score)
            for r in spark.sql("SELECT * FROM mx_late").collect()}
    # the finalized 00:00 window counts ONLY the two on-time rows: the
    # late row (00:06, behind the 00:30 watermark) was dropped
    assert rows["2026-01-01 00:00:00"] == (2, 3, 5.0), rows
    assert rows["2026-01-01 01:00:00"][0] == 1


def test_webp_header_decode_real_bytes():
    """Hand-built spec-conformant WebP containers for all three first-chunk
    variants (VP8X extended, VP8L lossless, VP8 lossy keyframe)."""
    import struct as _s

    def riff(fourcc, payload):
        chunk = fourcc + _s.pack("<I", len(payload)) + payload
        return b"RIFF" + _s.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    vp8x = riff(b"VP8X", bytes([0x10, 0, 0, 0]) +
                (639).to_bytes(3, "little") + (479).to_bytes(3, "little") +
                b"\x00" * 8)
    assert MM.decode_auto(vp8x)[:3] == (640, 480, "webp")

    bits = (99) | (49 << 14)           # w-1=99, h-1=49
    vp8l = riff(b"VP8L", bytes([0x2F]) + _s.pack("<I", bits) + b"\x00" * 8)
    assert MM.decode_auto(vp8l)[:3] == (100, 50, "webp")

    vp8 = riff(b"VP8 ", b"\x00\x00\x00" + b"\x9d\x01\x2a" +
               _s.pack("<H", 320) + _s.pack("<H", 240) + b"\x00" * 8)
    assert MM.decode_auto(vp8)[:3] == (320, 240, "webp")

    # poison: RIFF but not WEBP, and truncated container
    assert not MM.decode_auto(b"RIFF\x04\x00\x00\x00WAVE" + b"\x00" * 20)[4]
    assert not MM.decode_auto(vp8x[:16])[4]


def test_encoders_roundtrip_all_formats():
    """Every promoted real-format encoder must parse back exactly through
    decode_auto — the invariant the media_decode oracle row rests on."""
    from genesis_spark.operators import multimodal as MM
    for fmt, enc in MM._ENCODERS:
        w, h = 79, 31
        got_w, got_h, got_fmt, _, ok = MM.decode_auto(enc(w, h))
        assert (got_w, got_h, got_fmt, ok) == (w, h, fmt, True), fmt
    # doc_id arithmetic path
    for doc_id in (0, 1, 2, 3, 6, 7, 447, 10000):
        w, h, fmt, _, ok = MM.decode_auto(MM.encode_by_doc_id(doc_id))
        assert ok and w == 16 + doc_id % 64 and h == 16 + (doc_id // 7) % 64
        assert fmt == ("png", "jpeg", "gif", "webp")[doc_id % 4]


def test_dedup_stream_restart_from_checkpoint(spark, tmp_path):
    """The state store must survive a full query STOP and a new query
    start on the same checkpoint: URLs seen before the restart stay
    deduped after it (crash-resume for the streaming URL-seen, the ST2
    contract the docstring claims). Sink is parquet — the memory sink is
    not fault-tolerant and refuses checkpoint recovery."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import time

    from genesis_spark.streaming.pipeline import dedup_stream

    src = tmp_path / "links"
    src.mkdir()
    ck = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write(name, rows):
        pq.write_table(pa.table({
            "host_key": pa.array([r[0] for r in rows]),
            "url": pa.array([r[1] for r in rows])}),
            str(src / f"{name}.parquet"))

    def run_once():
        links = (spark.readStream.schema("host_key string, url string")
                 .option("maxFilesPerTrigger", 1).format("parquet")
                 .load(str(src)))
        q = (dedup_stream(links).writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ck)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        return [(r.host_key, r.url)
                for r in spark.read.parquet(out).collect()]

    write("b1", [("h0", "http://h0.onion/a"), ("h0", "http://h0.onion/b")])
    first = run_once()
    assert sorted(first) == [("h0", "http://h0.onion/a"),
                             ("h0", "http://h0.onion/b")]

    # second query, SAME checkpoint: replays nothing already committed,
    # and the new file's duplicate of /a must be suppressed by RESTORED
    # state, not by within-run logic
    time.sleep(1.05)       # distinct mtime so the new file sorts later
    write("b2", [("h0", "http://h0.onion/a"), ("h0", "http://h0.onion/c"),
                 ("h1", "http://h1.onion/x")])
    second = run_once()
    assert sorted(second) == [("h0", "http://h0.onion/a"),
                              ("h0", "http://h0.onion/b"),
                              ("h0", "http://h0.onion/c"),
                              ("h1", "http://h1.onion/x")]
