"""Registry family: Table maintenance & engine health (split from the monolithic queries.py)."""

from __future__ import annotations

from genesis_spark.queries._shared import *  # noqa: F401,F403



def q_join_salted(spark, sf_dir):
    """J-family skew mitigation: lineitem joined to a 3-row returnflag dim
    — the canonical hot-key join (3 keys over the whole fact table) — via
    explicit salting (salt by l_orderkey, dim replicated x8) instead of
    broadcast. The salted result must equal the plain join bit-for-bit;
    the per-flag rollup keeps the hash compact."""
    from genesis_spark.operators.joins import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_quantity")
    dim = spark.createDataFrame(
        [("A", "acknowledged"), ("N", "new"), ("R", "returned")],
        "l_returnflag string, flag_label string")
    j = salted_join(li, dim, key="l_returnflag", salt_src="l_orderkey",
                    n_salt=8)
    return (j.groupBy("l_returnflag", "flag_label")
            .agg(F.count("*").alias("n_items"),
                 F.round(F.sum("l_quantity"), 2).alias("sum_qty")))


ORACLE_JOIN_SALTED = """
WITH dim(l_returnflag, flag_label) AS (
  VALUES ('A', 'acknowledged'), ('N', 'new'), ('R', 'returned')
)
SELECT l.l_returnflag, d.flag_label,
       count(*) AS n_items, round(sum(l.l_quantity), 2) AS sum_qty
FROM lineitem l JOIN dim d USING (l_returnflag)
GROUP BY l.l_returnflag, d.flag_label
"""


def q_snapshot_expire(spark, sf_dir):
    """Iceberg-style snapshot EXPIRY planner — the third leg of table
    maintenance beside corpus_compact (bin-pack) and
    frontier_checkpoint_diff (changelog): keep the last 5 snapshots
    plus everything younger than a 10-hour watermark, then compute
    which data files become ORPHANS (referenced by no live snapshot) —
    the delete list expire_snapshots would emit.  Reference counting is
    one explode + one (file_id) partial-agg; the snapshot census window
    runs over |snapshots| rows, never data."""
    k = F.col("o_orderkey")
    snaps = (_t(spark, sf_dir, "orders")
             .select((k % 30).alias("snap_id")).distinct()
             .select("snap_id",
                     (F.lit(1700000000) + F.col("snap_id") * 3600)
                     .alias("ts")))
    w = Window.orderBy(F.col("ts").desc())
    mx = snaps.agg(F.max("ts").alias("max_ts"))
    live = (snaps.withColumn("rk", F.row_number().over(w))
            .crossJoin(F.broadcast(mx))
            .select("snap_id",
                    ((F.col("rk") <= 5)
                     | (F.col("ts") > F.col("max_ts") - 36000))
                    .alias("live")))
    refs = (live
            .select("live", "snap_id",
                    F.explode(F.sequence(F.lit(0), F.lit(4))).alias("j"))
            .select("live",
                    ((F.col("snap_id") * 7 + F.col("j")) % 100)
                    .alias("file_id")))
    agg = refs.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.sum(F.col("live").cast("long")).alias("n_live_refs"))
    return agg.select("file_id", "n_refs", "n_live_refs",
                      (F.col("n_live_refs") == 0).alias("deletable"))


ORACLE_SNAPSHOT_EXPIRE = """
WITH s AS (SELECT DISTINCT o_orderkey % 30 AS snap_id FROM orders),
t AS (SELECT snap_id, 1700000000 + snap_id * 3600 AS ts FROM s),
mx AS (SELECT max(ts) AS max_ts FROM t),
k AS (SELECT snap_id, ts, row_number() OVER (ORDER BY ts DESC) AS rk
      FROM t),
lv AS (SELECT snap_id, (rk <= 5 OR ts > max_ts - 36000) AS live
       FROM k CROSS JOIN mx),
refs AS (SELECT live,
                (snap_id * 7 + unnest(range(5))) % 100 AS file_id
         FROM lv),
agg AS (SELECT file_id, CAST(count(*) AS BIGINT) AS n_refs,
               CAST(sum(CASE WHEN live THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_live_refs
        FROM refs GROUP BY file_id)
SELECT file_id, n_refs, n_live_refs, n_live_refs = 0 AS deletable
FROM agg
"""


def q_scan_prune_plan(spark, sf_dir):
    """Stats-based scan pruning — the metadata-only planning step a
    lakehouse table format (Iceberg/Delta manifests) runs before any
    I/O: every data file carries column min/max stats; a range
    predicate prunes a file when its [min, max] window cannot overlap.
    Output per partition: files and rows scanned vs skipped — the
    number that says whether the table's sort/cluster layout
    (frontier_zorder's objective) is actually earning its keep.

    Deterministic synthesis: 100-row files keyed by o_orderkey DIV 100
    with a clustered stats column v = o_orderkey % 1000 (each file spans
    a 100-wide v-window at every SF — a well-sorted layout), predicate
    v BETWEEN 400 AND 800, so ~half the files prune at any scale. Plan/scale: one agg to the manifest
    grain (metadata-sized — at 100 TB this is the ONLY full pass, and a
    real table format has it precomputed), then a 20-row rollup; the
    data plane is never touched."""
    k = F.col("o_orderkey")
    manifest = (_t(spark, sf_dir, "orders")
                .select((k / 100).cast("long").alias("file_id"),
                        (k % 1000).alias("ck"))
                .groupBy("file_id")
                .agg(F.count("*").cast("long").alias("n_rows"),
                     F.min("ck").alias("min_ck"),
                     F.max("ck").alias("max_ck")))
    pruned = (F.col("max_ck") < 400) | (F.col("min_ck") > 800)
    return (manifest
            .select((F.col("file_id") % 20).alias("partition_id"),
                    pruned.alias("pruned"), "n_rows")
            .groupBy("partition_id")
            .agg(F.count("*").cast("long").alias("n_files"),
                 F.sum(F.col("pruned").cast("long")).cast("long")
                 .alias("n_files_pruned"),
                 F.sum(F.when(~F.col("pruned"), F.col("n_rows"))
                       .otherwise(F.lit(0))).cast("long")
                 .alias("rows_scanned"),
                 F.sum(F.when(F.col("pruned"), F.col("n_rows"))
                       .otherwise(F.lit(0))).cast("long")
                 .alias("rows_skipped")))


ORACLE_SCAN_PRUNE_PLAN = """
WITH manifest AS (
  SELECT o_orderkey // 100 AS file_id,
         CAST(count(*) AS BIGINT) AS n_rows,
         min(o_orderkey % 1000) AS min_ck,
         max(o_orderkey % 1000) AS max_ck
  FROM orders GROUP BY file_id),
tagged AS (
  SELECT file_id % 20 AS partition_id,
         (max_ck < 400 OR min_ck > 800) AS pruned, n_rows
  FROM manifest)
SELECT partition_id,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT)
         AS n_files_pruned,
       CAST(sum(CASE WHEN NOT pruned THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_scanned,
       CAST(sum(CASE WHEN pruned THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_skipped
FROM tagged GROUP BY partition_id
"""


def q_snapshot_changelog(spark, sf_dir):
    """Snapshot diff → CDC changelog — the INVERSE of events_cdc_apply
    (that row consumes a changelog; this one produces it): given two
    table snapshots, emit the insert/delete/update/unchanged census via
    one full outer join on the key and a value-hash compare. This is
    how incremental consumers are fed from a table that only keeps
    snapshots (and how a crawl's per-round frontier delta would be
    reconstructed if the engine ever lost its append log).

    Deterministic snapshots from orders: B deletes key % 11 == 0,
    bumps the cents value of key % 7 == 0, inserts key + 10^7 for
    key % 13 == 0. Output per op: row count, bit_xor key checksum,
    key range — compact, order-independent, hash-stable.

    Plan/scale: ONE co-partitioned full outer join on the snapshot key
    (both sides bucketable by it) + a 4-row rollup; value comparison is
    an md5 on the serialized row, never a column-by-column shuffle."""
    k = F.col("o_orderkey")
    # hash an INTEGER cents rendering, never a raw double -> string
    # (engines disagree on float formatting); floor(x*100 + 0.5) is the
    # repo-wide quantization discipline
    cents = F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
    a = _t(spark, sf_dir, "orders").select(
        k.alias("key"),
        F.md5(F.concat_ws("|", k.cast("string"), cents.cast("string")))
        .alias("val_a"))
    b_base = _t(spark, sf_dir, "orders").filter(k % 11 != 0).select(
        k.alias("key"),
        F.md5(F.concat_ws(
            "|", k.cast("string"),
            F.when(k % 7 == 0, cents + 1).otherwise(cents)
            .cast("string")))
        .alias("val_b"))
    b_ins = _t(spark, sf_dir, "orders").filter(k % 13 == 0).select(
        (k + 10_000_000).alias("key"),
        F.md5((k + 10_000_000).cast("string")).alias("val_b"))
    b = b_base.unionByName(b_ins)
    j = a.join(b, "key", "full_outer")
    op = (F.when(F.col("val_a").isNull(), F.lit("insert"))
          .when(F.col("val_b").isNull(), F.lit("delete"))
          .when(F.col("val_a") != F.col("val_b"), F.lit("update"))
          .otherwise(F.lit("unchanged")))
    return (j.select(op.alias("op"), "key")
            .groupBy("op")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.expr("bit_xor(key)").cast("long").alias("key_xor"),
                 F.min("key").cast("long").alias("min_key"),
                 F.max("key").cast("long").alias("max_key")))


ORACLE_SNAPSHOT_CHANGELOG = """
WITH a AS (
  SELECT o_orderkey AS key,
         md5(o_orderkey || '|' || CAST(
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             AS VARCHAR)) AS val_a
  FROM orders),
b AS (
  SELECT o_orderkey AS key,
         md5(o_orderkey || '|' || CAST(
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END
             AS VARCHAR)) AS val_b
  FROM orders WHERE o_orderkey % 11 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000 AS key,
         md5(CAST(o_orderkey + 10000000 AS VARCHAR)) AS val_b
  FROM orders WHERE o_orderkey % 13 = 0),
j AS (
  SELECT coalesce(a.key, b.key) AS key, val_a, val_b
  FROM a FULL OUTER JOIN b ON a.key = b.key),
tagged AS (
  SELECT CASE WHEN val_a IS NULL THEN 'insert'
              WHEN val_b IS NULL THEN 'delete'
              WHEN val_a <> val_b THEN 'update'
              ELSE 'unchanged' END AS op, key
  FROM j)
SELECT op, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(key) AS BIGINT) AS key_xor,
       CAST(min(key) AS BIGINT) AS min_key,
       CAST(max(key) AS BIGINT) AS max_key
FROM tagged GROUP BY op
"""


def q_shuffle_skew_audit(spark, sf_dir):
    """Hot-key skew diagnosis — the audit that tells you WHEN
    join_salted's remediation is needed (Spark AQE flags skewed
    partitions at runtime; a pipeline wants the table-level answer
    before submitting): per-key row counts for a deliberately skewed
    key (30% of rows collapse onto key 0), then the skew scorecard —
    max/mean ratio, top-1 and top-5 key share, and the Gini
    coefficient over key counts, all as exact ppm integers (Gini via
    the rank formula G = (2·Σ rank·c)/(n·Σc) - (n+1)/n on counts
    sorted ascending, ties broken by key for cross-engine
    determinism).

    Plan/scale: one keyed partial agg (the census), then windows over
    the per-key counts — #distinct-keys rows, not data rows."""
    lk = F.col("l_orderkey")
    key = F.when(lk % 10 < 3, F.lit(0)).otherwise(lk % 1000)
    counts = (_t(spark, sf_dir, "lineitem")
              .select(key.cast("long").alias("key"))
              .groupBy("key")
              .agg(F.count("*").cast("long").alias("c")))
    w = Window.orderBy("c", "key")
    ranked = counts.select(
        "key", "c", F.row_number().over(w).alias("rank"),
        F.count("*").over(
            Window.partitionBy(F.lit(1))).alias("nk"))
    return ranked.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_key_rows"),
        F.expr("CAST(max(c) * 1000000 DIV (sum(c) DIV count(*)) "
               "AS BIGINT)").alias("max_over_mean_ppm"),
        F.expr("CAST(max(c) * 1000000 DIV sum(c) AS BIGINT)")
        .alias("top1_share_ppm"),
        F.expr("CAST(sum(CASE WHEN rank > nk - 5 THEN c ELSE 0 END) "
               "* 1000000 DIV sum(c) AS BIGINT)")
        .alias("top5_share_ppm"),
        F.expr("CAST((2 * sum(rank * c) * 1000000 "
               "DIV (count(*) * sum(c))) "
               "- ((count(*) + 1) * 1000000 DIV count(*)) AS BIGINT)")
        .alias("gini_ppm"))


ORACLE_SHUFFLE_SKEW_AUDIT = """
WITH counts AS (
  SELECT CASE WHEN l_orderkey % 10 < 3 THEN 0
              ELSE l_orderkey % 1000 END AS key,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY key),
ranked AS (
  SELECT key, c, row_number() OVER (ORDER BY c, key) AS rank,
         count(*) OVER () AS nk
  FROM counts)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(max(c) AS BIGINT) AS max_key_rows,
       CAST(max(c) * 1000000 // (sum(c) // count(*)) AS BIGINT)
         AS max_over_mean_ppm,
       CAST(max(c) * 1000000 // sum(c) AS BIGINT) AS top1_share_ppm,
       CAST(sum(CASE WHEN rank > nk - 5 THEN c ELSE 0 END) * 1000000
            // sum(c) AS BIGINT) AS top5_share_ppm,
       CAST((2 * sum(rank * c) * 1000000 // (count(*) * sum(c)))
            - ((count(*) + 1) * 1000000 // count(*)) AS BIGINT)
         AS gini_ppm
FROM ranked
"""


def q_snapshot_vacuum_plan(spark, sf_dir):
    """Snapshot VACUUM planning (orphan-file GC) — snapshot_expire
    drops old snapshot METADATA; vacuum reclaims the DATA files no
    live snapshot references anymore (the Iceberg
    remove_orphan_files / Delta VACUUM job, and the single biggest
    storage lever of a snapshot store). Over a synthesized
    (snapshot, file) manifest with a keep-last-3 retention: per
    file, the referencing-snapshot span, liveness, and the verdict
    (live / orphan_reclaim); plus exact reclaimable bytes
    per verdict.

    Fixture: snapshots 0-5 each reference a sliding window of
    files, so early files age out of the live set.

    Plan/scale: manifest anti-join by max-referencing-snapshot —
    one groupBy(file) + a census roll-up, no file-system walk in
    the query path."""
    k = F.col("o_orderkey")
    snap = (k % 6).cast("long")
    file_id = ((k % 6) * 40 + (k * 7) % 80).cast("long")
    m = (_t(spark, sf_dir, "orders")
         .select(snap.alias("snapshot_id"), file_id.alias("file_id"),
                 ((file_id % 17 + 1) * 4096).cast("long")
                 .alias("bytes"))
         .distinct())
    per = (m.groupBy("file_id")
           .agg(F.min("snapshot_id").cast("long").alias("first_snap"),
                F.max("snapshot_id").cast("long").alias("last_snap"),
                F.max("bytes").cast("long").alias("bytes")))
    keep_from = 3  # keep-last-3 of snapshots 0..5
    out = (per.withColumn("is_live",
                          (F.col("last_snap") >= keep_from)
                          .cast("int"))
           .withColumn("verdict",
                       F.when(F.col("last_snap") >= keep_from,
                              F.lit("live"))
                       .otherwise(F.lit("orphan_reclaim"))))
    return (out.groupBy("verdict")
            .agg(F.count(F.lit(1)).cast("long").alias("n_files"),
                 F.sum("bytes").cast("long").alias("total_bytes"),
                 F.min("first_snap").cast("long")
                 .alias("oldest_first_snap")))


ORACLE_SNAPSHOT_VACUUM_PLAN = """
WITH m AS (
  SELECT DISTINCT CAST(o_orderkey % 6 AS BIGINT) AS snapshot_id,
         CAST((o_orderkey % 6) * 40 + (o_orderkey * 7) % 80
              AS BIGINT) AS file_id
  FROM orders),
mb AS (
  SELECT snapshot_id, file_id,
         CAST((file_id % 17 + 1) * 4096 AS BIGINT) AS bytes
  FROM m),
per AS (
  SELECT file_id, CAST(min(snapshot_id) AS BIGINT) AS first_snap,
         CAST(max(snapshot_id) AS BIGINT) AS last_snap,
         CAST(max(bytes) AS BIGINT) AS bytes
  FROM mb GROUP BY file_id)
SELECT CASE WHEN last_snap >= 3 THEN 'live'
            ELSE 'orphan_reclaim' END AS verdict,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS total_bytes,
       CAST(min(first_snap) AS BIGINT) AS oldest_first_snap
FROM per GROUP BY 1
"""


def q_snapshot_time_travel(spark, sf_dir):
    """Iceberg-style TIME TRAVEL — reconstruct the table state AS OF
    each snapshot from a base plus an upsert/delete changelog (the
    read-side complement of snapshot_changelog, which PRODUCES a
    changelog, and of frontier_checkpoint_diff, which diffs two
    checkpoints): snapshot 0 = orders (key, cents); snapshot 1
    upserts key%7==0 (unless deleted same snap), deletes key%11==0,
    inserts key+10^7 for key%13==0; snapshot 2 upserts key%5==0 of
    the ORIGINAL keys, deletes key%17==0, inserts key+2*10^7 for
    key%19==0. For s in {0,1,2}: the live-row census (count, bit_xor
    key, bit_xor value, key range) of the state a reader AS OF s
    must see — per key, the latest event with snap <= s wins, delete
    hides the key. Upserts carry full rows (merge-on-read equality
    semantics), so a later upsert CAN resurrect a deleted key — snap
    2's %5 upserts deliberately hit some snap-1 deletions.

    Plan/scale: the event log joins the 3-row snapshot list on
    snap <= s (3x fan-out), ONE (s, key) window picks the winner,
    one census agg per snapshot — the log is read once whatever the
    snapshot count, which is the changelog-scan property that makes
    time travel cheap on a real table."""
    k = F.col("o_orderkey")
    cents = F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
    base = _t(spark, sf_dir, "orders").select(
        F.lit(0).alias("snap"), k.alias("key"), F.lit("upsert").alias("op"),
        cents.alias("val"))
    o = _t(spark, sf_dir, "orders").select(k.alias("k"),
                                           cents.alias("cents"))
    d1 = (o.filter((F.col("k") % 7 == 0) & (F.col("k") % 11 != 0))
          .select(F.lit(1).alias("snap"), F.col("k").alias("key"),
                  F.lit("upsert").alias("op"),
                  (F.col("cents") + 1).alias("val"))
          .unionByName(o.filter(F.col("k") % 11 == 0).select(
              F.lit(1).alias("snap"), F.col("k").alias("key"),
              F.lit("delete").alias("op"),
              F.lit(None).cast("long").alias("val")))
          .unionByName(o.filter(F.col("k") % 13 == 0).select(
              F.lit(1).alias("snap"),
              (F.col("k") + 10_000_000).alias("key"),
              F.lit("upsert").alias("op"),
              (F.col("k") % 1000).alias("val"))))
    d2 = (o.filter((F.col("k") % 5 == 0) & (F.col("k") % 17 != 0))
          .select(F.lit(2).alias("snap"), F.col("k").alias("key"),
                  F.lit("upsert").alias("op"),
                  (F.col("cents") + 2).alias("val"))
          .unionByName(o.filter(F.col("k") % 17 == 0).select(
              F.lit(2).alias("snap"), F.col("k").alias("key"),
              F.lit("delete").alias("op"),
              F.lit(None).cast("long").alias("val")))
          .unionByName(o.filter(F.col("k") % 19 == 0).select(
              F.lit(2).alias("snap"),
              (F.col("k") + 20_000_000).alias("key"),
              F.lit("upsert").alias("op"),
              (F.col("k") % 997).alias("val"))))
    log = base.unionByName(d1).unionByName(d2)
    snaps = spark.range(0, 3).select(F.col("id").cast("int").alias("s"))
    w = (Window.partitionBy("s", "key")
         .orderBy(F.desc("snap"),
                  F.asc("op")))          # same-snap: delete < upsert? no —
    # fixture guarantees no same-(snap,key) conflicts, the order spec is
    # just a total order for determinism
    asf = (log.join(F.broadcast(snaps), F.col("snap") <= F.col("s"))
            .withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("op") == "upsert")))
    return (asf.groupBy("s")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.expr("bit_xor(key)").cast("long").alias("key_xor"),
                 F.expr("bit_xor(val)").cast("long").alias("val_xor"),
                 F.min("key").cast("long").alias("min_key"),
                 F.max("key").cast("long").alias("max_key")))


ORACLE_SNAPSHOT_TIME_TRAVEL = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
log AS (
  SELECT 0 AS snap, k AS key, 'upsert' AS op, cents AS val FROM o
  UNION ALL
  SELECT 1, k, 'upsert', cents + 1 FROM o
    WHERE k % 7 = 0 AND k % 11 <> 0
  UNION ALL
  SELECT 1, k, 'delete', NULL FROM o WHERE k % 11 = 0
  UNION ALL
  SELECT 1, k + 10000000, 'upsert', k % 1000 FROM o WHERE k % 13 = 0
  UNION ALL
  SELECT 2, k, 'upsert', cents + 2 FROM o
    WHERE k % 5 = 0 AND k % 17 <> 0
  UNION ALL
  SELECT 2, k, 'delete', NULL FROM o WHERE k % 17 = 0
  UNION ALL
  SELECT 2, k + 20000000, 'upsert', k % 997 FROM o WHERE k % 19 = 0),
snaps AS (SELECT CAST(i AS INT) AS s FROM range(0, 3) t(i)),
asf AS (
  SELECT s, key, op, val,
         row_number() OVER (PARTITION BY s, key
                            ORDER BY snap DESC, op ASC) AS rn
  FROM log JOIN snaps ON snap <= s)
SELECT s, count(*) AS n_rows,
       CAST(bit_xor(key) AS BIGINT) AS key_xor,
       CAST(bit_xor(val) AS BIGINT) AS val_xor,
       CAST(min(key) AS BIGINT) AS min_key,
       CAST(max(key) AS BIGINT) AS max_key
FROM asf WHERE rn = 1 AND op = 'upsert'
GROUP BY s
"""


def q_snapshot_delta_debt(spark, sf_dir):
    """Delta-DEBT accounting for a merge-on-read table — the metric
    that decides when engine.compact_frontier is worth its rewrite
    (the ops complement of corpus_compact / snapshot_expire): per
    partition, files written since that partition's last compaction
    (snap > 3 + p%3) are uncompacted debt; report file/byte debt,
    the READ AMPLIFICATION a scan pays (1 base + every delta file
    touched), and the compact-now verdict (debt_bytes > 256 KiB OR
    read_amp > 8). Deterministic manifest from orders (file at snap
    k%10, bytes (k%17+1)*4096, partition k%4).

    Plan/scale: one partition census — the debt table is O(4)
    whatever the manifest size; map-side combine does the work."""
    k = F.col("o_orderkey")
    files = _t(spark, sf_dir, "orders").select(
        (k % 4).cast("int").alias("part"),
        (k % 10).cast("int").alias("snap"),
        ((k % 17 + 1) * 4096).cast("long").alias("bytes"))
    cpoint = F.lit(3) + F.col("part") % 3
    marked = files.withColumn("debt",
                              (F.col("snap") > cpoint).cast("long"))
    agg = (marked.groupBy("part")
           .agg(F.count("*").cast("long").alias("n_files"),
                F.sum("debt").cast("long").alias("n_debt_files"),
                F.sum(F.col("debt") * F.col("bytes")).cast("long")
                .alias("debt_bytes")))
    return agg.select(
        "part", "n_files", "n_debt_files", "debt_bytes",
        (F.lit(1) + F.col("n_debt_files")).cast("long").alias("read_amp"),
        ((F.col("debt_bytes") > 256 * 1024)
         | (F.col("n_debt_files") > 8)).cast("int").alias("compact_now"))


ORACLE_SNAPSHOT_DELTA_DEBT = """
WITH files AS (
  SELECT CAST(o_orderkey % 4 AS INT) AS part,
         CAST(o_orderkey % 10 AS INT) AS snap,
         CAST((o_orderkey % 17 + 1) * 4096 AS BIGINT) AS bytes
  FROM orders),
marked AS (
  SELECT *, CASE WHEN snap > 3 + part % 3 THEN 1 ELSE 0 END AS debt
  FROM files),
agg AS (
  SELECT part, CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(debt) AS BIGINT) AS n_debt_files,
         CAST(sum(debt * bytes) AS BIGINT) AS debt_bytes
  FROM marked GROUP BY part)
SELECT part, n_files, n_debt_files, debt_bytes,
       CAST(1 + n_debt_files AS BIGINT) AS read_amp,
       CAST(CASE WHEN debt_bytes > 262144 OR n_debt_files > 8
            THEN 1 ELSE 0 END AS INT) AS compact_now
FROM agg
"""


def q_scan_selectivity_est(spark, sf_dir):
    """Histogram selectivity estimation vs truth — the cost-model
    arithmetic inside every planner, audited end-to-end (a 20-bin
    equi-width histogram on order totals estimates each range
    predicate by full-bin counts plus LINEAR INTERPOLATION of
    partial bins, in exact milli-rows; the estimate is then compared
    to the true count): the audit row a query engine's stats
    subsystem would publish.

    Bin width W = span div 20 + 1 covers the domain with bin(v) =
    (v-min) div W; partial-bin overlap contributes
    cnt·(overlap·1000 div W) milli-rows — integers throughout.

    Plan/scale: one pass builds the 20-cell histogram (map-side
    combinable), one pass counts truth per predicate via a broadcast
    of the 5 ranges; the histogram itself is the broadcastable
    planner artifact."""
    v = F.expr("cast(round(o_totalprice * 100) as bigint)")
    data = _t(spark, sf_dir, "orders").select(v.alias("v"))
    mm = data.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    binned = (data.crossJoin(F.broadcast(mm))
              .withColumn("w", F.expr("(vmax - vmin) div 20 + 1"))
              .withColumn("bin", F.expr("(v - vmin) div w")))
    hist = (binned.groupBy("bin", "vmin", "w")
            .agg(F.count("*").cast("long").alias("cnt")))
    qs = (spark.range(5).crossJoin(F.broadcast(mm))
          .select(F.col("id").alias("q"),
                  F.expr("vmin + id * ((vmax - vmin) div 6)")
                  .alias("lo"),
                  F.expr("vmin + (id + 2) * ((vmax - vmin) div 6)")
                  .alias("hi")))
    est = (hist.crossJoin(F.broadcast(qs.select("q", "lo", "hi")))
           .withColumn("b0", F.expr("vmin + bin * w"))
           .withColumn("b1", F.expr("vmin + (bin + 1) * w"))
           .withColumn("ov", F.expr(
               "greatest(0L, least(hi + 1, b1) - greatest(lo, b0))"))
           .groupBy("q")
           .agg(F.sum(F.expr("cnt * ((ov * 1000) div w)"))
                .cast("long").alias("est_milli")))
    truth = (data.crossJoin(F.broadcast(qs.select("q", "lo", "hi")))
             .groupBy("q")
             .agg(F.sum(F.expr("if(v between lo and hi, 1, 0)"))
                  .cast("long").alias("actual_rows"),
                  F.max("lo").alias("lo"), F.max("hi").alias("hi")))
    return (truth.join(est, "q")
            .select("q", "lo", "hi", "actual_rows", "est_milli",
                    F.abs(F.col("est_milli")
                          - F.col("actual_rows") * 1000)
                    .alias("abs_err_milli")))


ORACLE_SCAN_SELECTIVITY_EST = """
WITH data AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
mm AS (SELECT min(v) AS vmin, max(v) AS vmax FROM data),
binned AS (
  SELECT v, vmin, (vmax - vmin) // 20 + 1 AS w,
         (v - vmin) // ((vmax - vmin) // 20 + 1) AS bin
  FROM data, mm),
hist AS (
  SELECT bin, vmin, w, CAST(count(*) AS BIGINT) AS cnt
  FROM binned GROUP BY bin, vmin, w),
qs AS (
  SELECT i AS q,
         vmin + i * ((vmax - vmin) // 6) AS lo,
         vmin + (i + 2) * ((vmax - vmin) // 6) AS hi
  FROM (SELECT unnest(range(5)) AS i), mm),
est AS (
  SELECT q, CAST(sum(cnt * ((greatest(0, least(hi + 1,
              vmin + (bin + 1) * w) - greatest(lo, vmin + bin * w))
              * 1000) // w)) AS BIGINT) AS est_milli
  FROM hist, qs GROUP BY q),
truth AS (
  SELECT q, CAST(sum(CASE WHEN v BETWEEN lo AND hi THEN 1 ELSE 0 END)
              AS BIGINT) AS actual_rows,
         max(lo) AS lo, max(hi) AS hi
  FROM data, qs GROUP BY q)
SELECT t.q, t.lo, t.hi, t.actual_rows, e.est_milli,
       abs(e.est_milli - t.actual_rows * 1000) AS abs_err_milli
FROM truth t JOIN est e ON e.q = t.q
"""


def q_snapshot_commit_audit(spark, sf_dir):
    """Two-phase-commit log audit for the snapshot store — the
    transaction hygiene scan an Iceberg-style catalog runs over its
    commit log (a PREPARE with no COMMIT holds locks and orphans
    manifests; a DOUBLE commit means a retried writer that did not
    fence — the two failure classes that corrupt table state): the
    phase-event log is rolled up per transaction into prepare/commit
    counts, first-commit latency, and the clean / orphaned /
    duplicate verdict.

    Fixture: txn k prepares at 10k; k%11=0 never commits; k%13=0
    commits TWICE (+3+k%5 and +7 later); orphan wins when both.

    Plan/scale: one union + one groupBy(txn) — map-side combinable;
    the log is append-only and the audit reads only (txn, phase,
    ts)."""
    k = F.col("o_orderkey")
    base = _t(spark, sf_dir, "orders").select(k.alias("txn"))
    prepares = base.select(
        "txn", F.lit("prepare").alias("phase"),
        (F.col("txn") * 10).alias("ts"))
    commits = (base.filter(F.col("txn") % 11 != 0)
               .select("txn", F.lit("commit").alias("phase"),
                       (F.col("txn") * 10 + 3 + F.col("txn") % 5)
                       .alias("ts")))
    dups = (base.filter((F.col("txn") % 13 == 0)
                        & (F.col("txn") % 11 != 0))
            .select("txn", F.lit("commit").alias("phase"),
                    (F.col("txn") * 10 + 7 + F.col("txn") % 5)
                    .alias("ts")))
    log = prepares.unionByName(commits).unionByName(dups)
    agg = (log.groupBy("txn")
           .agg(F.sum((F.col("phase") == "prepare").cast("long"))
                .alias("n_prepare"),
                F.sum((F.col("phase") == "commit").cast("long"))
                .alias("n_commit"),
                F.min(F.when(F.col("phase") == "commit",
                             F.col("ts"))).alias("first_commit_ts"),
                F.min(F.when(F.col("phase") == "prepare",
                             F.col("ts"))).alias("prepare_ts")))
    return agg.select(
        "txn", "n_prepare", "n_commit",
        F.coalesce(F.col("first_commit_ts") - F.col("prepare_ts"),
                   F.lit(-1)).alias("commit_latency"),
        F.when(F.col("n_commit") == 0, "orphaned")
        .when(F.col("n_commit") >= 2, "duplicate")
        .otherwise(F.lit("clean")).alias("verdict"))


ORACLE_SNAPSHOT_COMMIT_AUDIT = """
WITH base AS (SELECT o_orderkey AS txn FROM orders),
log_ AS (
  SELECT txn, 'prepare' AS phase, txn * 10 AS ts FROM base
  UNION ALL
  SELECT txn, 'commit', txn * 10 + 3 + txn % 5
  FROM base WHERE txn % 11 <> 0
  UNION ALL
  SELECT txn, 'commit', txn * 10 + 7 + txn % 5
  FROM base WHERE txn % 13 = 0 AND txn % 11 <> 0),
agg AS (
  SELECT txn,
         CAST(sum(CASE WHEN phase = 'prepare' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_prepare,
         CAST(sum(CASE WHEN phase = 'commit' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_commit,
         min(CASE WHEN phase = 'commit' THEN ts END)
           AS first_commit_ts,
         min(CASE WHEN phase = 'prepare' THEN ts END) AS prepare_ts
  FROM log_ GROUP BY txn)
SELECT txn, n_prepare, n_commit,
       COALESCE(first_commit_ts - prepare_ts, -1) AS commit_latency,
       CASE WHEN n_commit = 0 THEN 'orphaned'
            WHEN n_commit >= 2 THEN 'duplicate'
            ELSE 'clean' END AS verdict
FROM agg
"""


def q_join_bloom_prefilter(spark, sf_dir):
    """Runtime Bloom-prefilter payoff arithmetic for a selective
    broadcast-dim join — the planning row behind Spark's runtime row
    filters (AQE runtime filter / DPP): when only ~2% of parts survive
    the dim predicate, a Bloom built from the build side skips most
    probe rows BEFORE the shuffle. Per l_returnflag stripe: exact probe
    and semi-join match counts, the expected false-positive admissions
    of a k=7, 64 Kibit shard-local filter ((1-e^(-kn/m))^k over the
    non-matching probe rows, rounded), and the resulting shuffle
    reduction in ppm. The point at 100 TB: the reduction number is what
    justifies spending build-side broadcast bytes — this row computes it
    from first principles instead of guessing."""
    part_keys = (_t(spark, sf_dir, "part")
                 .filter(F.col("p_partkey") % 53 == 0)
                 .select("p_partkey"))
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    probe = li.groupBy("l_returnflag").agg(F.count("*").alias("n_probe"))
    match = (li.join(F.broadcast(part_keys),
                     li.l_partkey == part_keys.p_partkey, "left_semi")
             .groupBy("l_returnflag").agg(F.count("*").alias("n_match")))
    n_build = part_keys.count()          # O(1) driver scalar, plan literal
    m_bits = 65536.0
    fpr = (1.0 - __import__("math").exp(-7.0 * n_build / m_bits)) ** 7
    out = (probe.join(match, "l_returnflag")
           .withColumn("n_build", F.lit(n_build).cast("long"))
           .withColumn("expected_fp",
                       F.round((F.col("n_probe") - F.col("n_match"))
                               * F.lit(fpr)).cast("long"))
           .withColumn("shuffled_rows",
                       F.col("n_match") + F.col("expected_fp"))
           .withColumn(
               "reduction_ppm",
               F.floor(F.lit(1000000)
                       - F.col("shuffled_rows") * 1000000
                       / F.col("n_probe")).cast("long")))
    return (out.select("l_returnflag", "n_probe", "n_match", "n_build",
                       "expected_fp", "shuffled_rows", "reduction_ppm")
            .orderBy("l_returnflag"))


ORACLE_JOIN_BLOOM_PREFILTER = """
WITH bkeys AS (
  SELECT p_partkey FROM part WHERE p_partkey % 53 = 0
),
nb AS (SELECT count(*) AS n_build FROM bkeys),
probe AS (
  SELECT l_returnflag, count(*) AS n_probe
  FROM lineitem GROUP BY 1
),
mt AS (
  SELECT l_returnflag, count(*) AS n_match
  FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM bkeys)
  GROUP BY 1
),
calc AS (
  SELECT p.l_returnflag, p.n_probe, m.n_match, nb.n_build,
         CAST(round((p.n_probe - m.n_match)
              * power(1 - exp(-7.0 * nb.n_build / 65536.0), 7))
              AS BIGINT) AS expected_fp
  FROM probe p JOIN mt m USING (l_returnflag) CROSS JOIN nb
)
SELECT l_returnflag, n_probe, n_match, n_build, expected_fp,
       n_match + expected_fp AS shuffled_rows,
       CAST(floor(1000000 - (n_match + expected_fp) * 1000000.0 / n_probe)
            AS BIGINT) AS reduction_ppm
FROM calc
ORDER BY l_returnflag
"""


def q_shuffle_size_plan(spark, sf_dir):
    """Shuffle-partition sizing from measured data volume — the number
    every 100x scale-up gets wrong first (spark.sql.shuffle.partitions
    is cluster-global; a fixed 200 gives 500 MB partitions at 100 GB and
    1 KB partitions at 200 KB): per table, an engine-agnostic byte
    estimate (exact octet length of string columns + fixed 8-byte width
    per numeric/timestamp column) and the partition count that lands
    partitions at the 64 MiB sweet spot, clamped to [1, 2048]. The
    estimate is deliberately serialization-free (no to_json — engines
    render timestamps/doubles differently) so the oracle matches bit-
    for-bit."""
    import functools
    specs = {
        "documents": (["text", "lang", "source"], 2),
        "orders": (["o_orderstatus", "o_orderpriority"], 4),
        "events": (["event_type", "props"], 4),
        "lineitem": (["l_returnflag", "l_linestatus"], 9),
    }
    parts = []
    for tab, (scols, n_num) in specs.items():
        byte_col = functools.reduce(
            lambda a, b: a + b,
            [F.octet_length(F.coalesce(F.col(c), F.lit(""))) for c in scols]
        ) + F.lit(8 * n_num)
        parts.append(
            _t(spark, sf_dir, tab)
            .agg(F.count("*").alias("n_rows"),
                 F.sum(byte_col.cast("bigint")).alias("est_bytes"))
            .select(F.lit(tab).alias("table_name"), "n_rows", "est_bytes"))
    out = functools.reduce(lambda a, b: a.unionByName(b), parts)
    rec = F.least(F.greatest(F.ceil(F.col("est_bytes")
                                    / F.lit(64.0 * 1024 * 1024)),
                             F.lit(1)), F.lit(2048)).cast("long")
    return (out.withColumn("est_mb",
                           F.round(F.col("est_bytes") / F.lit(1048576.0), 2))
            .withColumn("rec_partitions", rec)
            .orderBy("table_name"))


ORACLE_SHUFFLE_SIZE_PLAN = """
WITH census AS (
  SELECT 'documents' AS table_name, count(*) AS n_rows,
         CAST(sum(strlen(coalesce(text, ''))
              + strlen(coalesce(lang, ''))
              + strlen(coalesce(source, '')) + 16) AS BIGINT)
           AS est_bytes
  FROM documents
  UNION ALL
  SELECT 'orders', count(*),
         CAST(sum(strlen(coalesce(o_orderstatus, ''))
              + strlen(coalesce(o_orderpriority, '')) + 32)
              AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'events', count(*),
         CAST(sum(strlen(coalesce(event_type, ''))
              + strlen(coalesce(props, '')) + 32) AS BIGINT)
  FROM events
  UNION ALL
  SELECT 'lineitem', count(*),
         CAST(sum(strlen(coalesce(l_returnflag, ''))
              + strlen(coalesce(l_linestatus, '')) + 72) AS BIGINT)
  FROM lineitem
)
SELECT table_name, n_rows, est_bytes,
       round(est_bytes / 1048576.0, 2) AS est_mb,
       CAST(least(greatest(ceil(est_bytes / 67108864.0), 1), 2048)
            AS BIGINT) AS rec_partitions
FROM census
ORDER BY table_name
"""
