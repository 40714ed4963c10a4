"""Registry family: Multimodal (image/audio/video) (split from the monolithic queries.py)."""

from __future__ import annotations

from genesis_spark.queries._shared import *  # noqa: F401,F403



def q_media_decode(spark, sf_dir):
    """End-to-end multimodal decode through the driver gate: one
    mapInPandas encodes a REAL format header (png/jpeg/gif/webp cycling on
    doc_id, dims pure doc_id arithmetic) per document; a second
    (``extract_media_meta`` + ``decode_auto``) parses the bytes back.
    The oracle states the expected (width, height, format) in plain SQL —
    so a value-hash match proves the Arrow binary plumbing and all four
    real header parsers round-trip exactly. Two Arrow-batched passes, no
    shuffle; at 100 TB this is the decode stage's production shape."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.encode_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    meta = MM.extract_media_meta(blobs, decode_fn=MM.decode_auto)
    return meta.select("doc_id",
                       F.col("media_meta.width").alias("width"),
                       F.col("media_meta.height").alias("height"),
                       F.col("media_meta.format").alias("format"),
                       F.col("media_meta.ok").alias("ok"))


ORACLE_MEDIA_DECODE = """
SELECT doc_id,
       CAST(16 + doc_id % 64 AS INT) AS width,
       CAST(16 + (doc_id // 7) % 64 AS INT) AS height,
       CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                       WHEN 2 THEN 'gif' ELSE 'webp' END AS format,
       TRUE AS ok
FROM documents
"""


def q_media_resize(spark, sf_dir):
    """The multimodal preprocessing kernel with REAL pixel math: gray8
    raw bitmaps (dims + pixels pure doc_id arithmetic) are encoded in one
    mapInPandas pass, then decode -> nearest-neighbor resample to 8x8 ->
    integer feature extraction runs as a second Arrow-batched pass
    (numpy index gather — the exact production shape of a Pillow-backed
    resize, codec swapped for a header read). The oracle restates the NN
    index mapping floor(t*src/8) in plain integer SQL, so a value-hash
    match proves the resample arithmetic itself, not just plumbing."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.gray8_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    return MM.resize_media(blobs, target_w=8, target_h=8)


ORACLE_MEDIA_RESIZE = """
WITH d AS (
  SELECT doc_id, CAST(8 + doc_id % 16 AS INT) AS w,
         CAST(8 + (doc_id // 3) % 16 AS INT) AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h,
         list_transform(range(64),
           t -> CAST((doc_id * 31
                      + (((t // 8) * h // 8) * w
                         + ((t % 8) * w // 8)) * 7) % 256 AS INT)) AS o
  FROM d
)
SELECT doc_id, w AS src_w, h AS src_h,
       CAST(list_sum(o) AS BIGINT) AS out_sum,
       CAST(list_min(o) AS INT) AS out_min,
       CAST(list_max(o) AS INT) AS out_max
FROM px
"""


def q_media_phash(spark, sf_dir):
    """Perceptual image hash (aHash) + exact-duplicate grouping over the
    gray8 bitmap corpus: encode (mapInPandas, real bytes) -> decode ->
    8x8 NN-resample -> mean-threshold bits -> 4x16-bit segments, then
    one groupBy on the full hash for duplicate counts. The oracle
    restates the resample indices, the integer mean compare (px*64 > s),
    and the bit packing in plain SQL — a value-hash match proves the
    whole perceptual-hash kernel. Segments are the banded layout for
    hamming-distance dedup joins (same 4x16 scheme as dedup_simhash64)."""
    hashes = _phash_segs(spark, sf_dir)
    segcols = ["seg0", "seg1", "seg2", "seg3"]
    grp = hashes.groupBy(*segcols).agg(F.count("*").alias("dup_count"))
    return (hashes.join(grp, segcols)
            .select("doc_id", *segcols, "dup_count"))


ORACLE_MEDIA_PHASH = f"""
WITH {_PHASH_SEGS_SQL}, g AS (
  SELECT seg0, seg1, seg2, seg3, count(*) AS dup_count
  FROM segs GROUP BY seg0, seg1, seg2, seg3)
SELECT x.doc_id, x.seg0, x.seg1, x.seg2, x.seg3, g.dup_count
FROM segs x JOIN g USING (seg0, seg1, seg2, seg3)
"""


def q_media_framesample(spark, sf_dir):
    """Uniform video frame sampling end-to-end as a driver row: mapInPandas
    encodes a deterministic RAW clip per doc (n_frames = 4 + doc_id % 9,
    64-byte frames, byte = (doc_id*7 + f*13 + i*3) % 256), a second
    mapInPandas reads the container header, picks frames at
    floor(t*n/4) (t = 0..3) and emits each sampled frame's integer
    byte-sum — REAL byte slicing/summing over Arrow batches
    (operators/multimodal.sample_frames_video). The oracle restates the
    frame-index map and byte arithmetic in integer SQL: a value-hash
    match proves the container plumbing and the sampling kernel."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.video_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    return MM.sample_frames_video(blobs, target=4)


ORACLE_MEDIA_FRAMESAMPLE = """
WITH d AS (
  SELECT doc_id, CAST(4 + doc_id % 9 AS INT) AS n_frames FROM documents),
fidx AS (
  SELECT doc_id, n_frames,
         unnest(list_distinct(list_transform(range(4),
                t -> CAST((t * n_frames) // 4 AS INT)))) AS frame_idx
  FROM d)
SELECT doc_id, n_frames, frame_idx,
       CAST(list_sum(list_transform(range(64),
            i -> (doc_id * 7 + frame_idx * 13 + i * 3) % 256)) AS BIGINT)
         AS frame_sum
FROM fidx
"""


# ---------------------------------------------------------------------------
# block 10: audio modality, distributed KMeans step, token-budget corpus
# selection, plain-text link discovery, tracking-param strip, reciprocal
# host links
# ---------------------------------------------------------------------------

def q_media_audio(spark, sf_dir):
    """Audio modality end-to-end as a driver row (the third modality next
    to gray8 images and RAW video): mapInPandas encodes a deterministic
    PCM16 clip per doc (n = 512 + (doc_id%3)*256 samples, sample s =
    ((doc_id*11 + s*17) % 4096) - 2048), a second mapInPandas decodes the
    container and emits per-256-sample-window ENERGY (exact int64 sum of
    squares) and ZERO-CROSSING counts — real numpy signal math over Arrow
    batches (operators/multimodal.audio_features). The oracle restates
    the synth and both features in integer SQL: a value-hash match proves
    the int16 container plumbing and the windowed kernel."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.audio_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    return MM.audio_features(blobs, window=256)


ORACLE_MEDIA_AUDIO = """
WITH d AS (
  SELECT doc_id, CAST(512 + (doc_id % 3) * 256 AS INT) AS n FROM documents),
w AS (
  SELECT doc_id, unnest(range(n // 256)) AS win_idx FROM d),
x AS (
  SELECT doc_id, CAST(win_idx AS INT) AS win_idx,
         list_transform(range(256),
             i -> ((doc_id*11 + (win_idx*256 + i)*17) % 4096) - 2048) AS s
  FROM w)
SELECT doc_id, win_idx,
       CAST(list_sum(list_transform(s, v -> v * v)) AS BIGINT) AS energy,
       CAST(list_sum(list_transform(range(255),
            i -> CASE WHEN (s[i+1] < 0) <> (s[i+2] < 0)
                 THEN 1 ELSE 0 END)) AS INT) AS zcr
FROM x
"""


# ---------------------------------------------------------------------------
# block 13: video scene detection, audio voice-activity segmentation
# ---------------------------------------------------------------------------

def q_media_scenes(spark, sf_dir):
    """Video scene-cut detection over the RAW frame container — the
    shot-boundary pass a video-training pipeline runs before sampling:
    mapInPandas decodes each clip and computes the absolute byte-delta
    between consecutive frames (real numpy over Arrow batches); a frame
    whose delta exceeds the threshold opens a new scene. Emits one row
    per frame with its delta and scene id (running count of cuts).
    Deltas are exact integers over the deterministic synth, so the
    oracle restates the whole kernel in SQL. Zero shuffles — the scene
    pass fuses into the scan at 100 TB."""
    import numpy as np
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.video_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    return MM.detect_scenes(blobs, threshold=8000)


ORACLE_MEDIA_SCENES = """
WITH d AS (
  SELECT doc_id, CAST(4 + doc_id % 9 AS INT) AS n FROM documents),
fr AS (
  SELECT doc_id, n, unnest(range(n)) AS f FROM d),
dl AS (
  SELECT doc_id, CAST(f AS INT) AS frame_idx,
         CASE WHEN f = 0 THEN CAST(-1 AS BIGINT)
              ELSE CAST(list_sum(list_transform(range(64),
                   i -> abs((doc_id*7 + f*13 + i*3) % 256
                          - (doc_id*7 + (f-1)*13 + i*3) % 256)))
                   AS BIGINT) END AS delta
  FROM fr),
sc AS (
  SELECT doc_id, frame_idx, delta,
         CAST(sum(CASE WHEN delta > 8000 THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY frame_idx
                    ROWS UNBOUNDED PRECEDING) AS INT) AS scene_id
  FROM dl)
SELECT doc_id, frame_idx, delta, scene_id FROM sc
"""


def q_media_vad(spark, sf_dir):
    """Voice-activity segmentation — the speech-segmenting pass over the
    windowed audio features: a window is ACTIVE when its energy clears
    the threshold; consecutive active windows group into one segment
    (run-length via the lag + running-sum trick, the same shape as
    events_sessionize), emitting per-segment (start, end, window count,
    total energy). The feature pass is the real numpy PCM16 kernel
    (media_audio row); the segmentation on top is pure window codegen —
    at 100 TB the window partitions by clip, bounded by windows-per-clip.
    """
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.audio_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    feats = MM.audio_features(blobs, window=256)
    thr = 350_000_000
    act = feats.filter(F.col("energy") > thr)
    w = Window.partitionBy("doc_id").orderBy("win_idx")
    seg = (act.withColumn(
               "new_seg",
               F.when(F.lag("win_idx").over(w).isNull()
                      | (F.col("win_idx") - F.lag("win_idx").over(w) > 1),
                      1).otherwise(0))
           .withColumn("seg_id", F.sum("new_seg").over(
               w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    return (seg.groupBy("doc_id", "seg_id")
            .agg(F.min("win_idx").alias("start_win"),
                 F.max("win_idx").alias("end_win"),
                 F.count("*").alias("n_windows"),
                 F.sum("energy").alias("seg_energy")))


ORACLE_MEDIA_VAD = """
WITH d AS (
  SELECT doc_id, CAST(512 + (doc_id % 3) * 256 AS INT) AS n FROM documents),
w AS (
  SELECT doc_id, unnest(range(n // 256)) AS win_idx FROM d),
x AS (
  SELECT doc_id, CAST(win_idx AS INT) AS win_idx,
         CAST(list_sum(list_transform(range(256),
              i -> ((doc_id*11 + (win_idx*256 + i)*17) % 4096 - 2048)
                 * ((doc_id*11 + (win_idx*256 + i)*17) % 4096 - 2048)))
              AS BIGINT) AS energy
  FROM w),
act AS (SELECT * FROM x WHERE energy > 350000000),
seg AS (
  SELECT doc_id, win_idx, energy,
         CAST(sum(CASE WHEN prev IS NULL OR win_idx - prev > 1
                  THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY win_idx
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg_id
  FROM (SELECT *, lag(win_idx) OVER (PARTITION BY doc_id
                                     ORDER BY win_idx) AS prev
        FROM act))
SELECT doc_id, seg_id, min(win_idx) AS start_win, max(win_idx) AS end_win,
       count(*) AS n_windows, sum(energy) AS seg_energy
FROM seg GROUP BY doc_id, seg_id
"""


def q_media_phash_pairs(spark, sf_dir):
    """Near-duplicate IMAGE pairs by perceptual-hash hamming distance —
    the multimodal twin of dedup_simhash64: candidates share at least
    one of the 4 16-bit aHash segments (4 band equi-joins + union —
    never all-pairs), then the EXACT 64-bit hamming distance (bit_count
    of per-segment xor, pure integer) keeps pairs <= 8. By pigeonhole
    the band filter is lossless for hamming <= 3 (three differing bits
    cannot touch all four segments) and heuristic above that: a
    4-8-bit pair spread across all four segments is missed — the same
    banded-recall tradeoff dedup_simhash64 documents. The oracle replays pixels, bit packing, OR-candidates,
    and popcount in SQL, so Spark and oracle agree on EXACTLY the same
    candidate-filtered pair set.

    Plan/scale: the Arrow hash kernel appears in exactly TWO leaves
    (the two sides of one (band, value)-keyed self-join; AQE's
    runtime exchange reuse can collapse them further) — NOT the
    4-join x 2-side + 2-rescore shape, which would re-encode and
    re-hash the corpus ~10x. Each side posexplodes its 4 segments into
    (band, value) keys and CARRIES all 4 segments through the join, so
    hamming rescoring needs no join-back; duplicate candidates (pairs
    agreeing on several bands) collapse in one distinct. Band buckets
    are 16-bit-bounded. NOTE the output itself is quadratic in exact-
    duplicate cluster size (the round-5 sf10 soak measured 407M pairs /
    90 GB spill at 100-way duplication) — at that dup density run
    media_phash_star instead: identical components, linear edges."""
    segs = _phash_segs(spark, sf_dir)
    segcols = [f"seg{k}" for k in range(4)]
    bands = segs.select(
        "doc_id", *segcols,
        F.posexplode(F.array(*segcols)).alias("band", "val"))
    a = bands.select(F.col("doc_id").alias("id_a"),
                     *[F.col(c).alias(f"a{k}")
                       for k, c in enumerate(segcols)],
                     "band", "val")
    b = bands.select(F.col("doc_id").alias("id_b"),
                     *[F.col(c).alias(f"b{k}")
                       for k, c in enumerate(segcols)],
                     "band", "val")
    pairs = (a.join(b, ["band", "val"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     *[f"a{k}" for k in range(4)],
                     *[f"b{k}" for k in range(4)])
             .distinct())
    ham = sum(F.expr(f"bit_count(a{k} ^ b{k})") for k in range(4))
    return (pairs.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= 8)
            .select("id_a", "id_b", "hamming"))


ORACLE_MEDIA_PHASH_PAIRS = _phash_pairs_oracle()


def q_media_phash_star(spark, sf_dir):
    """STAR-collapsed near-dup image edges — the production form of
    media_phash_pairs for corpora with heavy exact duplication (the
    round-5 sf10 soak measured the clique form at 407M pairs / 90 GB
    spill on a 100-way-replicated corpus; this row is the fix):
    identical 64-bit aHashes collapse to their min-doc_id
    representative first, each member contributes ONE 'exact' star
    edge (hamming 0) instead of a clique — linear in duplicates, and
    hamming(a, b) for same-hash members is 0 = hamming(rep_a, rep_b),
    so components are IDENTICAL to the clique pair set's — and the
    banded hamming join then runs over DISTINCT hashes only ('near'
    edges, 1 <= hamming <= 8 between reps). Downstream clustering
    (dedup_cluster_reps' hash-to-min CC) consumes these edges
    unchanged; only the edge multiplicity differs, never the
    connectivity (proved against the clique form in
    tests/test_phash_star.py).

    Plan/scale: one groupBy on the 8-byte hash (map-side combinable),
    one broadcast-able join for star edges, and the same 4-band
    equi-join as the pairs row but over |distinct hashes| rows —
    exactly the quadratic term the soak saw removed."""
    segs = _phash_segs(spark, sf_dir)
    segcols = [f"seg{k}" for k in range(4)]
    reps = (segs.groupBy(*segcols)
            .agg(F.min("doc_id").alias("rep_id")))
    exact = (segs.join(reps, segcols)
             .filter(F.col("doc_id") != F.col("rep_id"))
             .select(F.col("rep_id").alias("id_a"),
                     F.col("doc_id").alias("id_b"),
                     F.lit(0).cast("int").alias("hamming"),
                     F.lit("exact").alias("kind")))
    bands = reps.select(
        "rep_id", *segcols,
        F.posexplode(F.array(*segcols)).alias("band", "val"))
    a = bands.select(F.col("rep_id").alias("id_a"),
                     *[F.col(c).alias(f"a{k}")
                       for k, c in enumerate(segcols)],
                     "band", "val")
    b = bands.select(F.col("rep_id").alias("id_b"),
                     *[F.col(c).alias(f"b{k}")
                       for k, c in enumerate(segcols)],
                     "band", "val")
    ham = sum(F.expr(f"bit_count(a{k} ^ b{k})") for k in range(4))
    near = (a.join(b, ["band", "val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    *[f"a{k}" for k in range(4)],
                    *[f"b{k}" for k in range(4)])
            .distinct()
            .withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= 8)
            .select("id_a", "id_b", "hamming",
                    F.lit("near").alias("kind")))
    return exact.unionByName(near)


def _phash_star_oracle() -> str:
    ham = " + ".join(
        f"bit_count(xor(a.seg{k}::BIGINT, b.seg{k}::BIGINT))"
        for k in range(4))
    bands = " OR ".join(f"a.seg{k} = b.seg{k}" for k in range(4))
    return f"""
WITH {_PHASH_SEGS_SQL},
reps AS (
  SELECT seg0, seg1, seg2, seg3, min(doc_id) AS rep_id
  FROM segs GROUP BY seg0, seg1, seg2, seg3),
exact AS (
  SELECT r.rep_id AS id_a, s.doc_id AS id_b,
         0 AS hamming, 'exact' AS kind
  FROM segs s JOIN reps r USING (seg0, seg1, seg2, seg3)
  WHERE s.doc_id <> r.rep_id),
near AS (
  SELECT a.rep_id AS id_a, b.rep_id AS id_b,
         CAST({ham} AS INT) AS hamming, 'near' AS kind
  FROM reps a JOIN reps b
    ON a.rep_id < b.rep_id AND ({bands})
  WHERE {ham} <= 8)
SELECT id_a, id_b, CAST(hamming AS INT) AS hamming, kind FROM exact
UNION ALL
SELECT id_a, id_b, CAST(hamming AS INT) AS hamming, kind FROM near
"""


ORACLE_MEDIA_PHASH_STAR = _phash_star_oracle()


def q_media_audio_fingerprint(spark, sf_dir):
    """Duplicate-clip detection for the audio modality: clips synthesize
    per GROUP (doc_id % 200 — so ~2.5 docs share byte-identical audio),
    operators/multimodal.audio_fingerprint reduces each clip to one
    int64 (8 window energies mod 65521, base-31 weighted), and exact
    dedup is a 16-byte-per-clip groupBy — the audio analogue of
    dedup_exact's hash-first rule and media_phash_pairs' image path.
    The oracle restates the PCM synth, the window energies, and the
    fingerprint fold in pure integer SQL: a value-hash match proves the
    int16 container plumbing AND the kernel arithmetic."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 200).alias("g"))

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.audio_by_doc_id(int(g))
                               for g in pdf["g"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    fp = MM.audio_fingerprint(blobs)
    grp = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("group_size"),
                               F.min("doc_id").alias("rep_doc_id"))
    return (fp.join(grp, "fp")
            .select("doc_id", "fp", "group_size", "rep_doc_id"))

ORACLE_MEDIA_AUDIO_FINGERPRINT = f"""
WITH d AS (SELECT doc_id, doc_id % 200 AS g FROM documents),
p AS (SELECT doc_id, g, CAST(512 + (g % 3) * 256 AS INT) AS n FROM d),
e AS (
  SELECT doc_id,
         list_transform(range(8), w ->
           list_sum(list_transform(range(n // 8), i ->
             (((g*11 + (w*(n//8) + i)*17) % 4096) - 2048)
             * (((g*11 + (w*(n//8) + i)*17) % 4096) - 2048)))) AS ew
  FROM p),
f AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(8), w ->
           (ew[w+1] % 65521) * {_FP_POW31_SQL}[w+1])) AS BIGINT) AS fp
  FROM e),
grp AS (SELECT fp, CAST(count(*) AS BIGINT) AS group_size,
               min(doc_id) AS rep_doc_id
        FROM f GROUP BY fp)
SELECT doc_id, fp, group_size, rep_doc_id FROM f JOIN grp USING (fp)
"""


def q_media_color_histogram(spark, sf_dir):
    """Per-image intensity histogram over the gray8 bitmap corpus —
    the exposure/contrast screening pass (near-black scans, blown-out
    frames, flat synthetic fills) that gates imagery BEFORE any model
    decode: mapInPandas encodes the deterministic bitmaps, the
    operators.multimodal.gray8_histogram numpy kernel bins pixels
    (px // 16 -> 16 bins, zero bins emitted), and each bin ships with
    its exact ppm share of the image. The oracle restates synth +
    binning in integer SQL over an unnested pixel-index range — a
    value-hash match proves the Arrow plumbing and the bincount kernel
    end to end (the media_resize/media_phash convention).

    Plan/scale: per-row kernel, no shuffle until the per-doc ppm window
    (partitioned by doc_id — politeness-bucket sized); histogram rows
    are 16x-per-image metadata, never pixels."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.gray8_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    hist = MM.gray8_histogram(blobs, bins=16)
    w_doc = Window.partitionBy("doc_id")
    return (hist
            .withColumn("total", F.sum("n_px").over(w_doc))
            .select("doc_id", "bin", "n_px",
                    F.expr("(n_px * 1000000) DIV total").cast("long")
                    .alias("ppm")))


ORACLE_MEDIA_COLOR_HISTOGRAM = """
WITH d AS (
  SELECT doc_id, CAST(8 + doc_id % 16 AS INT) AS w,
         CAST(8 + (doc_id // 3) % 16 AS INT) AS h
  FROM documents),
px AS (
  SELECT doc_id, w * h AS n_total,
         CAST(((doc_id * 31 + i * 7) % 256) // 16 AS INT) AS bin
  FROM d, unnest(range(w * h)) u(i)),
counts AS (
  SELECT doc_id, bin, CAST(count(*) AS BIGINT) AS n_px,
         any_value(n_total) AS n_total
  FROM px GROUP BY doc_id, bin),
grid AS (
  SELECT d.doc_id, CAST(b AS INT) AS bin, d.w * d.h AS n_total
  FROM d, unnest(range(16)) g(b))
SELECT grid.doc_id, grid.bin,
       coalesce(counts.n_px, 0) AS n_px,
       CAST(coalesce(counts.n_px, 0) * 1000000 // grid.n_total
            AS BIGINT) AS ppm
FROM grid LEFT JOIN counts
  ON counts.doc_id = grid.doc_id AND counts.bin = grid.bin
"""


def q_media_entropy_filter(spark, sf_dir):
    """Blank/flat-image gate — the Shannon-entropy screen that drops
    constant-fill and near-constant imagery before caption pairing or
    model decode (the media twin of the C4 text filters): per image,
    intensity entropy from the 16-bin histogram (H = ln N - (1/N)
    Sum c*ln c — computed from EXACT integer bin counts, quantized to
    1e-6 units the way text_char_entropy established) plus the
    dominant-bin share; keep = entropy above floor AND no bin owns
    >90% of pixels. Every 9th doc is planted as a constant fill, so
    both verdicts are exercised.

    Plan/scale: the histogram kernel is the media_color_histogram
    Arrow path (pixels never shuffle); the entropy fold runs over
    16-row-per-image metadata."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            blobs = []
            for i in pdf["doc_id"]:
                i = int(i)
                if i % 9 == 0:
                    w, h = 8 + i % 16, 8 + (i // 3) % 16
                    blobs.append(MM.encode_gray8(
                        w, h, bytes([i % 256]) * (w * h)))
                else:
                    blobs.append(MM.gray8_by_doc_id(i))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "media_blob": blobs})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    hist = MM.gray8_histogram(blobs, bins=16).filter(F.col("n_px") > 0)
    per = (hist.groupBy("doc_id")
           .agg(F.sum("n_px").cast("long").alias("n_px"),
                F.max("n_px").cast("long").alias("max_bin"),
                F.sum(F.col("n_px").cast("double")
                      * F.log(F.col("n_px").cast("double")))
                .alias("_clnc")))
    return (per.select(
        "doc_id", "n_px",
        F.expr("CAST(floor((ln(n_px) - _clnc / n_px) * 1000000 + 0.5) "
               "AS BIGINT)").alias("entropy_e6"),
        F.expr("max_bin * 1000000 DIV n_px").cast("long")
        .alias("max_bin_ppm"))
        .withColumn("keep",
                    ((F.col("entropy_e6") >= 500000)
                     & (F.col("max_bin_ppm") <= 900000)).cast("int")))


ORACLE_MEDIA_ENTROPY_FILTER = """
WITH d AS (
  SELECT doc_id, CAST(8 + doc_id % 16 AS INT) AS w,
         CAST(8 + (doc_id // 3) % 16 AS INT) AS h
  FROM documents),
px AS (
  SELECT doc_id,
         CASE WHEN doc_id % 9 = 0 THEN CAST((doc_id % 256) // 16 AS INT)
              ELSE CAST(((doc_id * 31 + i * 7) % 256) // 16 AS INT)
         END AS bin
  FROM d, unnest(range(w * h)) u(i)),
counts AS (
  SELECT doc_id, bin, CAST(count(*) AS BIGINT) AS n_px
  FROM px GROUP BY doc_id, bin),
per AS (
  SELECT doc_id, CAST(sum(n_px) AS BIGINT) AS n_px,
         CAST(max(n_px) AS BIGINT) AS max_bin,
         sum(n_px::DOUBLE * ln(n_px::DOUBLE)) AS clnc
  FROM counts GROUP BY doc_id)
SELECT doc_id, n_px,
       CAST(floor((ln(n_px::DOUBLE) - clnc / n_px) * 1000000 + 0.5)
            AS BIGINT) AS entropy_e6,
       CAST(max_bin * 1000000 // n_px AS BIGINT) AS max_bin_ppm,
       CAST(CASE WHEN floor((ln(n_px::DOUBLE) - clnc / n_px) * 1000000
                            + 0.5) >= 500000
                  AND max_bin * 1000000 // n_px <= 900000
                 THEN 1 ELSE 0 END AS INT) AS keep
FROM per
"""


def q_media_aspect_buckets(spark, sf_dir):
    """Aspect-ratio BUCKETING for batched vision training — the image
    analogue of corpus_length_buckets (SDXL-style bucketed batching:
    images batch with same-shape peers so the collate pads nothing):
    each image is assigned to the nearest of 5 canonical aspect
    buckets (1:2, 3:4, 1:1, 4:3, 2:1) by integer-scaled ratio
    thresholds, and the census reports per-bucket population, the
    mean scaled aspect, and the worst/average distortion (ppm vs the
    bucket's canonical ratio) a force-resize to the bucket shape
    would inflict.

    Fixture: deterministic (width, height) metadata derived from
    part keys — pixels are irrelevant to the bucketing math, which
    is the point: the planner runs on metadata only.

    Plan/scale: per-row integer codegen + ONE groupBy(bucket) with
    map-side combine — 5 groups regardless of corpus size; image
    bytes never enter the plan."""
    k = F.col("p_partkey")
    w = (F.lit(160) + (k % 13) * 32).cast("long")
    h = (F.lit(120) + ((k * 7) % 17) * 24).cast("long")
    d = (_t(spark, sf_dir, "part").select(
        k.alias("p_partkey"), w.alias("w"), h.alias("h")))
    a1000 = F.col("a1000")
    bucket = (F.when(a1000 < 625, F.lit("1:2"))
              .when(a1000 < 875, F.lit("3:4"))
              .when(a1000 < 1165, F.lit("1:1"))
              .when(a1000 < 1665, F.lit("4:3"))
              .otherwise(F.lit("2:1")))
    canon = (F.when(a1000 < 625, F.lit(500))
             .when(a1000 < 875, F.lit(750))
             .when(a1000 < 1165, F.lit(1000))
             .when(a1000 < 1665, F.lit(1333))
             .otherwise(F.lit(2000))).cast("long")
    staged = (d.select(F.expr("w * 1000 DIV h").alias("a1000"))
              .withColumn("bucket", bucket)
              .withColumn("canon", canon)
              .withColumn("dist_ppm",
                          F.expr("abs(a1000 - canon) * 1000000 DIV canon")))
    return (staged.groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n_images"),
                 F.round(F.avg("a1000"), 3).alias("mean_a1000"),
                 F.max("dist_ppm").cast("long").alias("max_dist_ppm"),
                 F.expr("sum(dist_ppm) DIV count(*)").cast("long")
                 .alias("avg_dist_ppm")))


ORACLE_MEDIA_ASPECT_BUCKETS = """
WITH m AS (
  SELECT CAST(160 + (p_partkey % 13) * 32 AS BIGINT) AS w,
         CAST(120 + ((p_partkey * 7) % 17) * 24 AS BIGINT) AS h
  FROM part),
s AS (
  SELECT w * 1000 // h AS a1000,
         CASE WHEN w * 1000 // h < 625 THEN '1:2'
              WHEN w * 1000 // h < 875 THEN '3:4'
              WHEN w * 1000 // h < 1165 THEN '1:1'
              WHEN w * 1000 // h < 1665 THEN '4:3'
              ELSE '2:1' END AS bucket,
         CAST(CASE WHEN w * 1000 // h < 625 THEN 500
              WHEN w * 1000 // h < 875 THEN 750
              WHEN w * 1000 // h < 1165 THEN 1000
              WHEN w * 1000 // h < 1665 THEN 1333
              ELSE 2000 END AS BIGINT) AS canon
  FROM m),
t AS (
  SELECT bucket, a1000, abs(a1000 - canon) * 1000000 // canon AS dist_ppm
  FROM s)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_images,
       round(avg(a1000), 3) AS mean_a1000,
       CAST(max(dist_ppm) AS BIGINT) AS max_dist_ppm,
       CAST(sum(dist_ppm) // count(*) AS BIGINT) AS avg_dist_ppm
FROM t GROUP BY bucket
"""


def q_media_metadata_scrub(spark, sf_dir):
    """EXIF-style metadata SCRUB plan — the privacy pass a multimodal
    training corpus runs before images ship (GPS coordinates, device
    serials, and capture timestamps are PII; orientation and software
    tags are benign and orientation is needed for correct decode):
    each image's key=value metadata is split, every key classified
    strip-pii / strip-forensic / keep, and the census reports per-key
    population, action, and the count of images that still carry any
    PII key (the audit gate must read 0 after the scrub runs).

    Fixture: deterministic per-image tag sets keyed on p_partkey —
    GPS on every 3rd image, serial on every 4th, the rest always on.

    Plan/scale: split + explode + ONE groupBy(key) census; tag
    cardinality is EXIF-bounded (~100s of keys at web scale), so the
    agg collapses map-side; pixel bytes never appear."""
    k = F.col("p_partkey")
    meta = F.concat(
        F.lit("Make=m"), (k % 5).cast("string"),
        F.lit(";Model=x"), (k % 7).cast("string"),
        F.lit(";Orientation="), (k % 8).cast("string"),
        F.lit(";DateTime=2024010"), (k % 9).cast("string"),
        F.when(k % 3 == 0,
               F.concat(F.lit(";GPSLat="), (k % 90).cast("string"),
                        F.lit(";GPSLon="), (k % 180).cast("string")))
        .otherwise(F.lit("")),
        F.when(k % 4 == 0,
               F.concat(F.lit(";SerialNumber=sn"), k.cast("string")))
        .otherwise(F.lit("")))
    d = _t(spark, sf_dir, "part").select(k.alias("img_id"),
                                         meta.alias("meta"))
    kv = d.select(F.explode(F.split("meta", ";")).alias("pair"))
    keyed = kv.select(F.substring_index("pair", "=", 1).alias("tag"))
    action = (F.when(F.col("tag").startswith("GPS"), F.lit("strip-pii"))
              .when(F.col("tag") == "SerialNumber",
                    F.lit("strip-forensic"))
              .when(F.col("tag") == "DateTime", F.lit("strip-pii"))
              .otherwise(F.lit("keep")))
    return (keyed.groupBy("tag")
            .agg(F.count(F.lit(1)).cast("long").alias("n_images"))
            .withColumn("action", action)
            .withColumn("is_blocked",
                        (F.col("action") != "keep").cast("int")))


ORACLE_MEDIA_METADATA_SCRUB = """
WITH d AS (
  SELECT 'Make=m' || (p_partkey % 5)
         || ';Model=x' || (p_partkey % 7)
         || ';Orientation=' || (p_partkey % 8)
         || ';DateTime=2024010' || (p_partkey % 9)
         || CASE WHEN p_partkey % 3 = 0
                 THEN ';GPSLat=' || (p_partkey % 90)
                      || ';GPSLon=' || (p_partkey % 180)
                 ELSE '' END
         || CASE WHEN p_partkey % 4 = 0
                 THEN ';SerialNumber=sn' || p_partkey
                 ELSE '' END AS meta
  FROM part),
kv AS (SELECT unnest(string_split(meta, ';')) AS pair FROM d),
keyed AS (SELECT string_split(pair, '=')[1] AS tag FROM kv),
cen AS (
  SELECT tag, CAST(count(*) AS BIGINT) AS n_images
  FROM keyed GROUP BY tag)
SELECT tag, n_images,
       CASE WHEN tag LIKE 'GPS%' THEN 'strip-pii'
            WHEN tag = 'SerialNumber' THEN 'strip-forensic'
            WHEN tag = 'DateTime' THEN 'strip-pii'
            ELSE 'keep' END AS action,
       CAST(CASE WHEN (CASE WHEN tag LIKE 'GPS%' THEN 'strip-pii'
            WHEN tag = 'SerialNumber' THEN 'strip-forensic'
            WHEN tag = 'DateTime' THEN 'strip-pii'
            ELSE 'keep' END) <> 'keep' THEN 1 ELSE 0 END AS INT)
         AS is_blocked
FROM cen
"""


def q_media_bitrate_plan(spark, sf_dir):
    """Media BITRATE/transcode planning — the metadata-only pass a
    video/audio corpus runs before any codec touches bytes (a 4 Mbps
    file of 240p content is wasted storage; a 100 kbps 'video' is a
    corrupt stub): from (bytes, duration) metadata, the exact
    kbps-class census (stub < 64, audio-ok 64-320, video-ok
    321-4000, bloated > 4000) with per-class byte mass and the
    projected savings of transcoding bloated files to the 4000 kbps
    ceiling.

    Fixture: deterministic (bytes, duration_ds) from part keys,
    spanning all four classes.

    Plan/scale: per-row integer arithmetic + one 4-class census —
    the mover that executes it reads only the class column."""
    k = F.col("p_partkey")
    dur_ds = (k % 300 + 10).cast("long")  # deciseconds
    kbps = (F.when(k % 11 == 0, (k % 40 + 10))
            .when(k % 3 == 0, (k % 200 + 70))
            .when(k % 3 == 1, (k % 3000 + 400))
            .otherwise((k % 4000 + 4200))).cast("long")
    # bytes = kbps * 1000/8 * seconds = kbps * 125 * dur_ds / 10
    d = (_t(spark, sf_dir, "part")
         .select(k.alias("media_id"), dur_ds.alias("dur_ds"),
                 F.expr("CAST((({k}) * 125 * (p_partkey % 300 + 10)) "
                        "DIV 10 AS BIGINT)".format(
                            k="CASE WHEN p_partkey % 11 = 0 "
                              "THEN p_partkey % 40 + 10 "
                              "WHEN p_partkey % 3 = 0 "
                              "THEN p_partkey % 200 + 70 "
                              "WHEN p_partkey % 3 = 1 "
                              "THEN p_partkey % 3000 + 400 "
                              "ELSE p_partkey % 4000 + 4200 END"))
                 .alias("bytes")))
    rate = F.expr("bytes * 80 DIV (dur_ds * 1000)")  # exact kbps back
    cls = (F.when(rate < 64, F.lit("stub"))
           .when(rate <= 320, F.lit("audio-ok"))
           .when(rate <= 4000, F.lit("video-ok"))
           .otherwise(F.lit("bloated")))
    staged = d.withColumn("kbps", rate.cast("long")) \
        .withColumn("rate_class", cls)
    ceil_bytes = F.expr("CAST(4000 * 125 * dur_ds DIV 10 AS BIGINT)")
    save = F.when(F.col("rate_class") == "bloated",
                  F.col("bytes") - ceil_bytes).otherwise(F.lit(0)) \
        .cast("long")
    return (staged.withColumn("save_bytes", save)
            .groupBy("rate_class")
            .agg(F.count(F.lit(1)).cast("long").alias("n_files"),
                 F.sum("bytes").cast("long").alias("total_bytes"),
                 F.sum("save_bytes").cast("long")
                 .alias("transcode_savings"),
                 F.min("kbps").cast("long").alias("min_kbps"),
                 F.max("kbps").cast("long").alias("max_kbps")))


ORACLE_MEDIA_BITRATE_PLAN = """
WITH d AS (
  SELECT p_partkey AS media_id,
         CAST(p_partkey % 300 + 10 AS BIGINT) AS dur_ds,
         CAST((CASE WHEN p_partkey % 11 = 0 THEN p_partkey % 40 + 10
               WHEN p_partkey % 3 = 0 THEN p_partkey % 200 + 70
               WHEN p_partkey % 3 = 1 THEN p_partkey % 3000 + 400
               ELSE p_partkey % 4000 + 4200 END)
              * 125 * (p_partkey % 300 + 10) // 10 AS BIGINT) AS bytes
  FROM part),
s AS (
  SELECT media_id, dur_ds, bytes,
         CAST(bytes * 80 // (dur_ds * 1000) AS BIGINT) AS kbps
  FROM d),
c AS (
  SELECT *, CASE WHEN kbps < 64 THEN 'stub'
                 WHEN kbps <= 320 THEN 'audio-ok'
                 WHEN kbps <= 4000 THEN 'video-ok'
                 ELSE 'bloated' END AS rate_class,
         CAST(CASE WHEN kbps > 4000
                   THEN bytes - CAST(4000 * 125 * dur_ds // 10 AS BIGINT)
                   ELSE 0 END AS BIGINT) AS save_bytes
  FROM s)
SELECT rate_class, CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS total_bytes,
       CAST(sum(save_bytes) AS BIGINT) AS transcode_savings,
       CAST(min(kbps) AS BIGINT) AS min_kbps,
       CAST(max(kbps) AS BIGINT) AS max_kbps
FROM c GROUP BY rate_class
"""


def q_media_letterbox(spark, sf_dir):
    """Letterbox-bar detection with REAL pixel scans
    (operators.multimodal.detect_letterbox): synthetic gray8 bitmaps
    carry dark bands (value 16) top and bottom — except every 3rd doc
    crops one-sided and every 5th doc's band is BRIGHT (200), a title
    card the detector must NOT count — and the numpy kernel counts
    consecutive uniform-dark rows from each edge over Arrow batches.
    The oracle restates the fixture's band geometry in integer SQL,
    so a value-hash match proves the row-uniformity scan end to end
    (a detector that ignored darkness or uniformity would flag the
    bright/content rows and mismatch).

    Plan/scale: two mapInPandas stages (encode, detect), zero
    shuffles — the crop-planning pass runs in the scan at 100 TB."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = (_t(spark, sf_dir, "documents").select("doc_id")
         .filter(F.col("doc_id") % 2 == 0))

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.gray8_letterbox_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    return MM.detect_letterbox(blobs)


ORACLE_MEDIA_LETTERBOX = """
WITH d AS (
  SELECT doc_id,
         CAST(8 + doc_id % 16 AS INT) AS w,
         CAST(12 + (doc_id // 3) % 12 AS INT) AS h,
         CAST((doc_id // 4) % 5 AS INT) AS bar,
         (doc_id % 5 = 0) AS bright,
         (doc_id % 3 = 0) AS one_sided
  FROM documents WHERE doc_id % 2 = 0),
expect AS (
  SELECT doc_id, w, h,
         CAST(CASE WHEN bright THEN 0 ELSE bar END AS INT) AS top_bars,
         CAST(CASE WHEN bright OR one_sided THEN 0 ELSE bar END AS INT)
           AS bottom_bars
  FROM d)
SELECT doc_id, w, h, top_bars, bottom_bars,
       CAST(h - top_bars - bottom_bars AS INT) AS content_h,
       CAST(CASE WHEN top_bars > 0 OR bottom_bars > 0 THEN 1 ELSE 0 END
            AS INT) AS letterboxed
FROM expect
"""


def q_media_audio_resample(spark, sf_dir):
    """Audio resampling with REAL interpolation math
    (operators.multimodal.resample_pcm16): the deterministic PCM16
    clips (same synth as media_audio) are linearly resampled to 256
    samples in EXACT integer units of (target-1) — numpy gather +
    integer blend over Arrow batches, no float anywhere — and the
    oracle restates out_q[t] = s[i]*(T-1-r) + s[i+1]*r with
    i = (t*(n-1)) // (T-1), r = (t*(n-1)) % (T-1) in plain integer
    SQL over the same synth formula. A value-hash match on the
    per-clip sum/min/max of out_q proves the index mapping and the
    blend arithmetic end to end.

    Plan/scale: two mapInPandas stages, zero shuffles — the
    rate-normalization pass runs inside the scan at 100 TB."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = (_t(spark, sf_dir, "documents").select("doc_id")
         .filter(F.col("doc_id") % 3 == 1))

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.audio_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    return MM.resample_pcm16(blobs, target=256)


ORACLE_MEDIA_AUDIO_RESAMPLE = """
WITH d AS (
  SELECT doc_id, CAST(512 + (doc_id % 3) * 256 AS INT) AS n
  FROM documents WHERE doc_id % 3 = 1),
q AS (
  SELECT doc_id, n,
         list_transform(range(256), t ->
           ((((doc_id*11 + ((t*(n-1)) // 255)*17) % 4096) - 2048)
              * (255 - (t*(n-1)) % 255))
           + ((((doc_id*11 + (LEAST((t*(n-1)) // 255 + 1, n-1))*17)
                % 4096) - 2048)
              * ((t*(n-1)) % 255))) AS out_q
  FROM d)
SELECT doc_id, n AS n_samples, CAST(256 AS INT) AS target,
       CAST(list_sum(out_q) AS BIGINT) AS out_sum_q,
       CAST(list_min(out_q) AS BIGINT) AS out_min_q,
       CAST(list_max(out_q) AS BIGINT) AS out_max_q
FROM q
"""


def q_media_patches(spark, sf_dir):
    """ViT patch extraction with REAL pixel math
    (operators.multimodal.patchify_gray8): the synthetic gray8
    bitmaps are zero-padded to 8-multiples and split into
    non-overlapping 8x8 patches — numpy pad + reshape/transpose over
    Arrow batches, one row per patch with exact integer sum/min/max.
    The oracle restates pixel (r, c) = (doc_id*31 + (r*w + c)*7) % 256
    inside the patch windows (0 beyond the true dims) in plain
    integer SQL, so a value-hash match proves the pad/reshape/gather
    chain — an off-by-one in the patch grid shifts every sum.

    Plan/scale: two mapInPandas stages, zero shuffles; patch rows are
    metadata-sized."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = (_t(spark, sf_dir, "documents").select("doc_id")
         .filter(F.col("doc_id") % 4 == 2))

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.gray8_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    return MM.patchify_gray8(blobs, patch=8)


ORACLE_MEDIA_PATCHES = """
WITH d AS (
  SELECT doc_id, CAST(8 + doc_id % 16 AS INT) AS w,
         CAST(8 + (doc_id // 3) % 16 AS INT) AS h
  FROM documents WHERE doc_id % 4 = 2),
grid AS (
  SELECT doc_id, w, h,
         CAST(gy AS INT) AS py, CAST(gx AS INT) AS px
  FROM d, UNNEST(range((h + 7) // 8)) t1(gy),
       UNNEST(range((w + 7) // 8)) t2(gx)),
vals AS (
  SELECT doc_id, py, px,
         list_transform(range(64), i ->
           CASE WHEN py * 8 + (i // 8) < h AND px * 8 + (i % 8) < w
                THEN (doc_id * 31
                      + ((py * 8 + (i // 8)) * w + px * 8 + (i % 8)) * 7)
                     % 256
                ELSE 0 END) AS v
  FROM grid)
SELECT doc_id, py, px,
       CAST(list_sum(v) AS BIGINT) AS p_sum,
       CAST(list_min(v) AS INT) AS p_min,
       CAST(list_max(v) AS INT) AS p_max
FROM vals
"""


def q_media_srcset_parse(spark, sf_dir):
    """HTML ``srcset`` candidate parsing — the responsive-image
    discovery op a media crawler needs beyond plain <img src>: the
    comma-separated candidate list (url + optional width ``480w`` or
    density ``2x`` descriptor, messy whitespace) is parsed in pure
    codegen (split + per-candidate tokenization), descriptors
    classified and their numeric values extracted, the
    descriptor-less candidate defaulting to density 1x per the HTML
    spec, and each doc's BEST candidate flagged (largest width if any
    width descriptors exist, else largest density; ties by candidate
    order). The fixture builds deterministic 3-candidate srcset
    strings with irregular spacing in BOTH engines, so the value hash
    proves the parser, not the fixture.

    Plan/scale: pure map + one bounded per-doc window (<= 3 rows per
    doc); fuses into the scan at 100 TB."""
    d = (_t(spark, sf_dir, "documents").select("doc_id")
         .filter(F.col("doc_id") % 3 == 0))
    did = F.col("doc_id")
    base = F.concat(F.lit("http://h"), (did % 50).cast("string"),
                    F.lit(".onion/i"), did.cast("string"))
    srcset = F.concat(
        base, F.lit("_a.jpg "), ((did % 4) * 160 + 320).cast("string"),
        F.lit("w ,  "),
        base, F.lit("_b.jpg   "), ((did % 3) + 1).cast("string"),
        F.lit("x,"),
        base, F.lit("_c.jpg"))
    cand = (d.select("doc_id", srcset.alias("srcset"))
            .select("doc_id",
                    F.posexplode(F.split("srcset", ","))
                    .alias("idx", "raw"))
            .withColumn("c", F.trim("raw"))
            .filter(F.col("c") != ""))
    toks = F.split(F.col("c"), "\\s+")
    url = F.element_at(toks, 1)
    desc = F.when(F.size(toks) >= 2, F.element_at(toks, 2))
    kind = (F.when(desc.rlike("^[0-9]+w$"), F.lit("w"))
            .when(desc.rlike("^[0-9]+x$"), F.lit("x"))
            .when(desc.isNull(), F.lit("x"))           # spec default 1x
            .otherwise(F.lit("invalid")))
    val = (F.when(desc.isNull(), F.lit(1))
           .otherwise(F.regexp_extract(desc, "^([0-9]+)", 1)
                      .cast("int")))
    parsed = cand.select("doc_id", F.col("idx").cast("int").alias("idx"),
                         url.alias("url"), kind.alias("kind"),
                         val.alias("val"))
    w = Window.partitionBy("doc_id")
    best = F.max(F.struct(
        (F.col("kind") == "w").cast("int").alias("isw"),
        F.col("val").alias("v"),
        (-F.col("idx")).alias("ni"))).over(w)
    return (parsed.withColumn(
        "is_best",
        ((F.struct((F.col("kind") == "w").cast("int").alias("isw"),
                   F.col("val").alias("v"),
                   (-F.col("idx")).alias("ni"))) == best).cast("int")))


ORACLE_MEDIA_SRCSET_PARSE = """
WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
built AS (
  SELECT doc_id,
         'http://h' || (doc_id % 50) || '.onion/i' || doc_id
           AS base
  FROM d),
cand AS (
  SELECT doc_id, CAST(t.i AS INT) AS idx, trim(parts[t.i + 1]) AS c
  FROM (SELECT doc_id,
               string_split(base || '_a.jpg ' ||
                            ((doc_id % 4) * 160 + 320) || 'w ,  ' ||
                            base || '_b.jpg   ' || ((doc_id % 3) + 1)
                            || 'x,' || base || '_c.jpg', ',') AS parts
        FROM built),
       UNNEST(range(len(parts))) AS t(i)
  WHERE trim(parts[t.i + 1]) <> ''),
parsed AS (
  SELECT doc_id, idx,
         toks[1] AS url,
         CASE WHEN len(toks) >= 2 THEN toks[2] END AS descr
  FROM (SELECT doc_id, idx, string_split_regex(c, '\\s+') AS toks
        FROM cand)),
cls AS (
  SELECT doc_id, idx, url,
         CASE WHEN regexp_matches(descr, '^[0-9]+w$') THEN 'w'
              WHEN regexp_matches(descr, '^[0-9]+x$') THEN 'x'
              WHEN descr IS NULL THEN 'x'
              ELSE 'invalid' END AS kind,
         CASE WHEN descr IS NULL THEN 1
              ELSE CAST(regexp_extract(descr, '^([0-9]+)', 1) AS INT)
              END AS val
  FROM parsed)
SELECT doc_id, idx, url, kind, val,
       CAST(CASE WHEN struct_pack(
                    isw := CASE WHEN kind = 'w' THEN 1 ELSE 0 END,
                    v := val, ni := -idx)
                 = MAX(struct_pack(
                    isw := CASE WHEN kind = 'w' THEN 1 ELSE 0 END,
                    v := val, ni := -idx))
                   OVER (PARTITION BY doc_id)
            THEN 1 ELSE 0 END AS INT) AS is_best
FROM cls
"""


def q_media_equalize(spark, sf_dir):
    """Histogram equalization with REAL pixel math
    (operators.multimodal.equalize_gray8): the synthetic gray8
    bitmaps get the classic contrast-normalization LUT
    v -> cdf(v)*255 // n, applied as numpy bincount/cumsum/gather
    over Arrow batches; per image: exact integer sum/min/max and the
    distinct-level count of the equalized pixels. The oracle never
    materializes pixels — the stride-7 synth walks every residue
    class mod 256, so each value's count has the CLOSED FORM
    cnt(v) = max(0, (n - r(v) + 255) // 256) with
    r(v) = 183*(v - 31*doc) mod 256 (183 = 7^-1 mod 256), and the
    features reduce to 256-row integer SQL per image. A value-hash
    match therefore proves the kernel's histogram/CDF/LUT arithmetic
    against number theory, not against a second pixel loop.

    Plan/scale: two mapInPandas stages, zero shuffles."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = (_t(spark, sf_dir, "documents").select("doc_id")
         .filter(F.col("doc_id") % 5 == 1))

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.gray8_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    return MM.equalize_gray8(blobs)


ORACLE_MEDIA_EQUALIZE = """
WITH d AS (
  SELECT doc_id, CAST(8 + doc_id % 16 AS INT) AS w,
         CAST(8 + (doc_id // 3) % 16 AS INT) AS h,
         CAST((8 + doc_id % 16) * (8 + (doc_id // 3) % 16) AS BIGINT)
           AS n
  FROM documents WHERE doc_id % 5 = 1),
vals AS (
  SELECT doc_id, w, h, n, CAST(t.v AS BIGINT) AS v,
         (183 * (((t.v - doc_id * 31) % 256 + 256) % 256)) % 256 AS r
  FROM d, UNNEST(range(256)) t(v)),
cnts AS (
  SELECT doc_id, w, h, n, v,
         CASE WHEN r < n THEN (n - r + 255) // 256 ELSE 0 END AS cnt
  FROM vals),
luts AS (
  SELECT doc_id, w, h, n, v, cnt,
         (SUM(cnt) OVER (PARTITION BY doc_id ORDER BY v
                         ROWS UNBOUNDED PRECEDING)) * 255 // n AS lut
  FROM cnts)
SELECT doc_id, w, h,
       CAST(SUM(cnt * lut) AS BIGINT) AS eq_sum,
       CAST(MIN(CASE WHEN cnt > 0 THEN lut END) AS INT) AS eq_min,
       CAST(MAX(CASE WHEN cnt > 0 THEN lut END) AS INT) AS eq_max,
       CAST(COUNT(DISTINCT CASE WHEN cnt > 0 THEN lut END) AS INT)
         AS eq_levels
FROM luts GROUP BY doc_id, w, h
"""


def q_media_audio_qc(spark, sf_dir):
    """Audio ingest QC census with REAL sample math — the gate an
    audio pipeline runs before featurization (clipped or DC-offset
    recordings poison training): over the deterministic PCM16 clips
    (same synth as media_audio), per clip: samples at the clip RAILS
    (|s| >= 2047 — the synth range is [-2048, 2047], so rails occur),
    the DC offset as an exact integer (sum of samples; a healthy
    recording sums near 0 per sample), peak amplitude, and the QC
    verdict (clip fraction > 1% OR |mean offset| > 100 -> reject).
    The mapInPandas kernel does numpy threshold/abs/sum work over
    Arrow batches; the oracle restates every census in integer SQL
    over the synth formula.

    Plan/scale: two mapInPandas stages, zero shuffles."""
    import numpy as np
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = (_t(spark, sf_dir, "documents").select("doc_id")
         .filter(F.col("doc_id") % 3 == 2))

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.audio_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")

    import struct as _struct

    def qc(batches):
        for pdf in batches:
            ids, ns, clips, sums, peaks = [], [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media_blob"]):
                if blob is None or len(blob) < 8:
                    continue
                b = bytes(blob)
                n, _rate = _struct.unpack(">II", b[:8])
                if len(b) != 8 + 2 * n:
                    continue
                s = np.frombuffer(b, dtype="<i2", offset=8).astype(
                    np.int64)
                ids.append(doc_id)
                ns.append(n)
                clips.append(int((np.abs(s) >= 2047).sum()))
                sums.append(int(s.sum()))
                peaks.append(int(np.abs(s).max()))
            yield pd.DataFrame({
                "doc_id": ids,
                "n_samples": pd.Series(ns, dtype="int32"),
                "n_clipped": pd.Series(clips, dtype="int64"),
                "dc_sum": pd.Series(sums, dtype="int64"),
                "peak": pd.Series(peaks, dtype="int64")})

    out = blobs.mapInPandas(
        qc, "doc_id long, n_samples int, n_clipped long, "
            "dc_sum long, peak long")
    return out.select(
        "*",
        ((F.col("n_clipped") * 100 > F.col("n_samples"))
         | (F.abs(F.col("dc_sum")) > 100 * F.col("n_samples")))
        .cast("int").alias("reject"))


ORACLE_MEDIA_AUDIO_QC = """
WITH d AS (
  SELECT doc_id, CAST(512 + (doc_id % 3) * 256 AS INT) AS n
  FROM documents WHERE doc_id % 3 = 2),
s AS (
  SELECT doc_id, n,
         list_transform(range(n),
             i -> ((doc_id*11 + i*17) % 4096) - 2048) AS xs
  FROM d),
agg AS (
  SELECT doc_id, n AS n_samples,
         CAST(len(list_filter(xs, x -> abs(x) >= 2047)) AS BIGINT)
           AS n_clipped,
         CAST(list_sum(xs) AS BIGINT) AS dc_sum,
         CAST(list_max(list_transform(xs, x -> abs(x))) AS BIGINT)
           AS peak
  FROM s)
SELECT doc_id, n_samples, n_clipped, dc_sum, peak,
       CAST(CASE WHEN n_clipped * 100 > n_samples
                   OR abs(dc_sum) > 100 * n_samples
            THEN 1 ELSE 0 END AS INT) AS reject
FROM agg
"""


def q_media_subtitle_align(spark, sf_dir):
    """SRT subtitle alignment audit — the video+caption pairing gate
    of a multimodal corpus (drifting or overlapping cues mean the
    text does NOT describe the frames it is paired with): per track,
    the SRT body ('idx\\nHH:MM:SS,mmm --> HH:MM:SS,mmm\\ntext',
    blank-line separated) is split into cues and both timestamps are
    PARSED back to ms (substring arithmetic on the matched group —
    the fixture's integer formulas never reach the parse path);
    emitted per doc: cue count, captioned ms, OVERLAP count (cue end
    past next cue start — the classic bad-mux signature) and coverage
    ppm vs the declared track length.

    Entirely in the array domain (transform/filter/aggregate +
    element_at) — parse, pairwise-overlap scan and roll-up never
    leave the row: zero shuffles at any corpus size."""
    k = F.col("doc_id")
    ts = lambda ms: (
        f"concat(lpad(cast(({ms}) div 3600000 as string), 2, '0'), ':',"
        f" lpad(cast((({ms}) div 60000) % 60 as string), 2, '0'), ':',"
        f" lpad(cast((({ms}) div 1000) % 60 as string), 2, '0'), ',',"
        f" lpad(cast(({ms}) % 1000 as string), 3, '0'))")
    start = "(i * 3000 + (doc_id % 7) * 100)"
    end = f"({start} + 2000 + ((doc_id + i) % 5) * 300)"
    srt = F.expr(
        "array_join(transform(sequence(0, cast(5 + doc_id % 6 as int)"
        " - 1), i -> concat(i + 1, '\n', " + ts(start) + ", ' --> ', "
        + ts(end) + ", '\n', 'cue ', i, ' words here')), '\n\n')")
    tracks = (_t(spark, sf_dir, "documents")
              .filter(k % 4 == 1)
              .select(k.alias("doc_id"), srt.alias("srt"),
                      (F.lit(3000) * (5 + k % 6) + 2000)
                      .cast("long").alias("track_ms")))
    pat = "([0-9]{2}):([0-9]{2}):([0-9]{2}),([0-9]{3})" \
          " --> ([0-9]{2}):([0-9]{2}):([0-9]{2}),([0-9]{3})"
    ms = lambda g0: (f"cast(regexp_extract(c, '{pat}', {g0}) as bigint)"
                     f" * 3600000"
                     f" + cast(regexp_extract(c, '{pat}', {g0 + 1})"
                     f" as bigint) * 60000"
                     f" + cast(regexp_extract(c, '{pat}', {g0 + 2})"
                     f" as bigint) * 1000"
                     f" + cast(regexp_extract(c, '{pat}', {g0 + 3})"
                     f" as bigint)")
    parsed = tracks.select(
        "doc_id", "track_ms",
        F.expr(f"transform(split(srt, '\n\n'), c -> {ms(1)})")
        .alias("starts"),
        F.expr(f"transform(split(srt, '\n\n'), c -> {ms(5)})")
        .alias("ends"))
    return (parsed.select(
        "doc_id",
        F.expr("size(starts)").cast("long").alias("n_cues"),
        F.expr("aggregate(zip_with(ends, starts, (e, s) -> e - s), "
               "0L, (acc, x) -> acc + x)").alias("caption_ms"),
        F.expr("size(filter(sequence(1, size(starts) - 1), "
               "i -> element_at(ends, i) > element_at(starts, i + 1)))")
        .cast("long").alias("n_overlaps"),
        "track_ms")
        .withColumn("coverage_ppm",
                    F.expr("(caption_ms * 1000000) div track_ms")))


ORACLE_MEDIA_SUBTITLE_ALIGN = """
WITH tracks AS (
  SELECT doc_id,
         array_to_string(list_transform(range(5 + doc_id % 6),
           i -> (i + 1) || chr(10)
             || lpad(CAST((i * 3000 + (doc_id % 7) * 100) // 3600000
                     AS VARCHAR), 2, '0') || ':'
             || lpad(CAST(((i * 3000 + (doc_id % 7) * 100) // 60000) % 60
                     AS VARCHAR), 2, '0') || ':'
             || lpad(CAST(((i * 3000 + (doc_id % 7) * 100) // 1000) % 60
                     AS VARCHAR), 2, '0') || ','
             || lpad(CAST((i * 3000 + (doc_id % 7) * 100) % 1000
                     AS VARCHAR), 3, '0')
             || ' --> '
             || lpad(CAST((i * 3000 + (doc_id % 7) * 100 + 2000
                          + ((doc_id + i) % 5) * 300) // 3600000
                     AS VARCHAR), 2, '0') || ':'
             || lpad(CAST(((i * 3000 + (doc_id % 7) * 100 + 2000
                           + ((doc_id + i) % 5) * 300) // 60000) % 60
                     AS VARCHAR), 2, '0') || ':'
             || lpad(CAST(((i * 3000 + (doc_id % 7) * 100 + 2000
                           + ((doc_id + i) % 5) * 300) // 1000) % 60
                     AS VARCHAR), 2, '0') || ','
             || lpad(CAST((i * 3000 + (doc_id % 7) * 100 + 2000
                          + ((doc_id + i) % 5) * 300) % 1000
                     AS VARCHAR), 3, '0')
             || chr(10) || 'cue ' || i || ' words here'),
           chr(10) || chr(10)) AS srt,
         CAST(3000 * (5 + doc_id % 6) + 2000 AS BIGINT) AS track_ms
  FROM documents WHERE doc_id % 4 = 1),
parsed AS (
  SELECT doc_id, track_ms,
         list_transform(string_split(srt, chr(10) || chr(10)), c ->
           CAST(regexp_extract(c,
             '([0-9]{2}):([0-9]{2}):([0-9]{2}),([0-9]{3}) --> ',
             1) AS BIGINT) * 3600000
           + CAST(regexp_extract(c,
             '([0-9]{2}):([0-9]{2}):([0-9]{2}),([0-9]{3}) --> ',
             2) AS BIGINT) * 60000
           + CAST(regexp_extract(c,
             '([0-9]{2}):([0-9]{2}):([0-9]{2}),([0-9]{3}) --> ',
             3) AS BIGINT) * 1000
           + CAST(regexp_extract(c,
             '([0-9]{2}):([0-9]{2}):([0-9]{2}),([0-9]{3}) --> ',
             4) AS BIGINT)) AS starts,
         list_transform(string_split(srt, chr(10) || chr(10)), c ->
           CAST(regexp_extract(c,
             ' --> ([0-9]{2}):([0-9]{2}):([0-9]{2}),([0-9]{3})',
             1) AS BIGINT) * 3600000
           + CAST(regexp_extract(c,
             ' --> ([0-9]{2}):([0-9]{2}):([0-9]{2}),([0-9]{3})',
             2) AS BIGINT) * 60000
           + CAST(regexp_extract(c,
             ' --> ([0-9]{2}):([0-9]{2}):([0-9]{2}),([0-9]{3})',
             3) AS BIGINT) * 1000
           + CAST(regexp_extract(c,
             ' --> ([0-9]{2}):([0-9]{2}):([0-9]{2}),([0-9]{3})',
             4) AS BIGINT)) AS ends
  FROM tracks)
SELECT doc_id,
       CAST(len(starts) AS BIGINT) AS n_cues,
       CAST(list_sum(list_transform(range(len(starts)),
            i -> ends[CAST(i + 1 AS INT)] - starts[CAST(i + 1 AS INT)]))
            AS BIGINT) AS caption_ms,
       CAST(len(list_filter(range(1, len(starts)),
            i -> ends[CAST(i AS INT)] > starts[CAST(i + 1 AS INT)]))
            AS BIGINT) AS n_overlaps,
       track_ms,
       (CAST(list_sum(list_transform(range(len(starts)),
            i -> ends[CAST(i + 1 AS INT)] - starts[CAST(i + 1 AS INT)]))
            AS BIGINT) * 1000000) // track_ms AS coverage_ppm
FROM parsed
"""


def q_media_hls_parse(spark, sf_dir):
    """HLS master-playlist parsing (RFC 8216 ``#EXT-X-STREAM-INF``)
    — how a video-corpus ingester decides WHICH rendition to fetch
    (archiving the 4K ladder top wastes 10x storage over the
    training-adequate 720p; a broken ladder means a broken encode):
    per manifest, the variant BANDWIDTH/RESOLUTION attribute lists
    parse via regexp_extract_all, the ladder is checked strictly
    increasing in the array domain, and the best variant under the
    3 Mbps fetch budget is selected with its resolution.

    Fixture: 3+k%3 variants at 800k·(v+1)+k%1000 bps,
    640(v+1)x360(v+1).

    Plan/scale: map-only regexp + array codegen."""
    k = F.col("c_custkey")
    manifest = F.expr(
        "concat('#EXTM3U\n', array_join(transform("
        "sequence(0, cast(2 + c_custkey % 3 as int)), v -> "
        "concat('#EXT-X-STREAM-INF:BANDWIDTH=', "
        "800000 * (v + 1) + c_custkey % 1000, ',RESOLUTION=', "
        "640 * (v + 1), 'x', 360 * (v + 1), '\n', "
        "'v', v, '.m3u8')), '\n'))")
    rows = _t(spark, sf_dir, "customer").select(
        F.concat(F.lit("s"), k.cast("string")).alias("stream"),
        manifest.alias("m3u8"))
    bws = F.expr("transform(regexp_extract_all(m3u8, "
                 "'BANDWIDTH=([0-9]+)', 1), x -> cast(x as bigint))")
    res = F.expr("regexp_extract_all(m3u8, "
                 "'RESOLUTION=([0-9]+x[0-9]+)', 1)")
    base = rows.select("stream", bws.alias("bws"), res.alias("res"))
    inc = F.expr("size(filter(sequence(1, size(bws) - 1), "
                 "i -> element_at(bws, i + 1) <= element_at(bws, i)))"
                 " = 0")
    best_idx = F.expr(
        "array_max(filter(sequence(1, size(bws)), "
        "i -> element_at(bws, i) <= 3000000))")
    return base.select(
        "stream",
        F.expr("size(bws)").cast("int").alias("n_variants"),
        F.expr("element_at(bws, 1)").alias("min_bw"),
        F.expr("element_at(bws, size(bws))").alias("max_bw"),
        inc.cast("int").alias("ladder_ok"),
        F.when(best_idx.isNull(), F.lit("none"))
        .otherwise(F.expr(
            "element_at(res, array_max(filter(sequence(1, size(bws)),"
            " i -> element_at(bws, i) <= 3000000)))"))
        .alias("best_res_under_3mbps"))


ORACLE_MEDIA_HLS_PARSE = """
WITH rows_ AS (
  SELECT 's' || c_custkey AS stream,
         '#EXTM3U' || chr(10) || array_to_string(list_transform(
           range(3 + c_custkey % 3), v ->
           '#EXT-X-STREAM-INF:BANDWIDTH='
           || (800000 * (v + 1) + c_custkey % 1000)
           || ',RESOLUTION=' || (640 * (v + 1)) || 'x'
           || (360 * (v + 1)) || chr(10) || 'v' || v || '.m3u8'),
           chr(10)) AS m3u8
  FROM customer),
parsed AS (
  SELECT stream,
         list_transform(regexp_extract_all(m3u8,
           'BANDWIDTH=([0-9]+)', 1), x -> CAST(x AS BIGINT)) AS bws,
         regexp_extract_all(m3u8, 'RESOLUTION=([0-9]+x[0-9]+)', 1)
           AS res
  FROM rows_),
audited AS (
  SELECT stream, bws, res,
         len(list_filter(range(1, len(bws)),
             i -> bws[CAST(i + 1 AS INT)] <= bws[CAST(i AS INT)]))
           = 0 AS inc,
         list_max(list_filter(range(1, len(bws) + 1),
             i -> bws[CAST(i AS INT)] <= 3000000)) AS best_idx
  FROM parsed)
SELECT stream,
       CAST(len(bws) AS INT) AS n_variants,
       bws[1] AS min_bw,
       bws[CAST(len(bws) AS INT)] AS max_bw,
       CAST(inc AS INT) AS ladder_ok,
       CASE WHEN best_idx IS NULL THEN 'none'
            ELSE res[CAST(best_idx AS INT)] END
         AS best_res_under_3mbps
FROM audited
"""


def q_media_duration_budget(spark, sf_dir):
    """Epoch duration budgeting for audio/video clips — corpus_token_budget
    for the time dimension (an AV training epoch is bounded by total
    DURATION, not clip count): per source, clips are admitted in
    deterministic md5 priority order until the 600 s per-source budget
    is exhausted (first clip always admits, matching a greedy packer
    that never emits an empty source). Durations are synthesized from
    lineitem deterministically (1-60 s, hub sources 1-2 carry double
    volume so their cut rate is visibly higher). Cumulative-sum window
    per source — one shuffle on a 5-key column, O(clips) state."""
    key = F.col("l_orderkey") * 7 + F.col("l_linenumber")
    src = F.concat(F.lit("s"), (F.when(key % 4 < 2, key % 2)
                                .otherwise(key % 5)).cast("string"))
    clips = (_t(spark, sf_dir, "lineitem")
             .select(key.cast("long").alias("clip_id"),
                     src.alias("source"),
                     ((key % 60) * 1000 + 1000).alias("duration_ms")))
    w = (Window.partitionBy("source")
         .orderBy(F.md5(F.col("clip_id").cast("string")), "clip_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = clips.withColumn("cum_ms", F.sum("duration_ms").over(w))
    kept = F.when((F.col("cum_ms") <= 600000)
                  | (F.col("cum_ms") == F.col("duration_ms")), 1).otherwise(0)
    return (ranked.withColumn("is_kept", kept)
            .groupBy("source")
            .agg(F.count("*").alias("n_clips"),
                 F.sum("is_kept").alias("n_kept"),
                 F.sum(F.col("is_kept") * F.col("duration_ms"))
                 .alias("kept_ms"),
                 F.floor(F.lit(1000000) - F.sum("is_kept") * 1000000
                         / F.count("*")).cast("long").alias("cut_ppm"))
            .orderBy("source"))


ORACLE_MEDIA_DURATION_BUDGET = """
WITH clips AS (
  SELECT l_orderkey * 7 + l_linenumber AS clip_id,
         's' || (CASE WHEN (l_orderkey * 7 + l_linenumber) % 4 < 2
                      THEN (l_orderkey * 7 + l_linenumber) % 2
                      ELSE (l_orderkey * 7 + l_linenumber) % 5 END)
           AS source,
         ((l_orderkey * 7 + l_linenumber) % 60) * 1000 + 1000
           AS duration_ms
  FROM lineitem
),
ranked AS (
  SELECT source, duration_ms,
         sum(duration_ms) OVER (PARTITION BY source
             ORDER BY md5(CAST(clip_id AS VARCHAR)), clip_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ms
  FROM clips
),
flagged AS (
  SELECT source, duration_ms,
         CASE WHEN cum_ms <= 600000 OR cum_ms = duration_ms
              THEN 1 ELSE 0 END AS is_kept
  FROM ranked
)
SELECT source, count(*) AS n_clips,
       sum(is_kept) AS n_kept,
       sum(is_kept * duration_ms) AS kept_ms,
       CAST(floor(1000000 - sum(is_kept) * 1000000.0 / count(*))
            AS BIGINT) AS cut_ppm
FROM flagged
GROUP BY source
ORDER BY source
"""


def q_media_codec_matrix(spark, sf_dir):
    """Container x codec COMPATIBILITY matrix with a transcode plan —
    the ingest-triage step an AV pipeline runs before any decode work:
    each (container, codec) cell is either directly usable or routed to
    a normalization target (h264/mp4), and the census sizes the
    transcode fleet. The support table is the well-known public matrix
    (WebM carries only VP9/AV1; MP4 carries H.264/H.265/AV1; MKV is
    omnivorous; MOV carries H.264/H.265/MPEG-2). Pure CASE census —
    one partial agg to a 20-cell grid."""
    k = F.col("l_orderkey") + F.col("l_linenumber")
    container = (F.when(k % 4 == 0, "mp4").when(k % 4 == 1, "mkv")
                 .when(k % 4 == 2, "webm").otherwise("mov"))
    codec = (F.when(k % 5 == 0, "h264").when(k % 5 == 1, "h265")
             .when(k % 5 == 2, "vp9").when(k % 5 == 3, "av1")
             .otherwise("mpeg2"))
    clips = _t(spark, sf_dir, "lineitem").select(
        container.alias("container"), codec.alias("codec"))
    compatible = (
        (F.col("container") == "mkv")
        | ((F.col("container") == "mp4")
           & F.col("codec").isin("h264", "h265", "av1"))
        | ((F.col("container") == "webm")
           & F.col("codec").isin("vp9", "av1"))
        | ((F.col("container") == "mov")
           & F.col("codec").isin("h264", "h265", "mpeg2")))
    return (clips.groupBy("container", "codec")
            .agg(F.count("*").alias("n_clips"))
            .withColumn("compatible", compatible)
            .withColumn("transcode_target",
                        F.when(compatible, F.lit("none"))
                        .otherwise(F.lit("h264/mp4")))
            .orderBy("container", "codec"))


ORACLE_MEDIA_CODEC_MATRIX = """
WITH clips AS (
  SELECT CASE (l_orderkey + l_linenumber) % 4
           WHEN 0 THEN 'mp4' WHEN 1 THEN 'mkv' WHEN 2 THEN 'webm'
           ELSE 'mov' END AS container,
         CASE (l_orderkey + l_linenumber) % 5
           WHEN 0 THEN 'h264' WHEN 1 THEN 'h265' WHEN 2 THEN 'vp9'
           WHEN 3 THEN 'av1' ELSE 'mpeg2' END AS codec
  FROM lineitem
),
grid AS (
  SELECT container, codec, count(*) AS n_clips FROM clips GROUP BY 1, 2
)
SELECT container, codec, n_clips,
       (container = 'mkv'
        OR (container = 'mp4' AND codec IN ('h264', 'h265', 'av1'))
        OR (container = 'webm' AND codec IN ('vp9', 'av1'))
        OR (container = 'mov' AND codec IN ('h264', 'h265', 'mpeg2')))
         AS compatible,
       CASE WHEN container = 'mkv'
                 OR (container = 'mp4' AND codec IN ('h264','h265','av1'))
                 OR (container = 'webm' AND codec IN ('vp9', 'av1'))
                 OR (container = 'mov' AND codec IN ('h264', 'h265',
                                                     'mpeg2'))
            THEN 'none' ELSE 'h264/mp4' END AS transcode_target
FROM grid
ORDER BY container, codec
"""
