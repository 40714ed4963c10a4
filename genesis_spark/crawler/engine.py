"""The Spark-native frontier + crawl engine (the rebuild's core).

Replaces the reference's Mongo frontier + Celery per-host tasks
(crawl_model.py, generic_parse_controller.py) with a declarative wave loop:

  install  seeds -> validate -> canonicalize -> MERGE-dedup -> priority rank
  rounds   pending hosts, (installed_at, seq) ASC, host-budget per round
  waves    one fetch-join + parse + link-admission job per BFS depth, ALL
           hosts of the wave in parallel (the reference serializes one host
           per Celery task; hosts never interact, so per-host FIFO order is
           reconstructed exactly from (depth, parent_pos, link_pos) — see
           SURVEY.md §2.6 O2: per-host BFS with document-order children IS
           depth-stratified FIFO)

Every stage is DataFrame-native: fetch = equi-join against ``web_pages``
(J4), URL-seen dedup = left_anti join per task (J2, exact truth; the Bloom
prefilter in operators/bloom.py is an optional bandwidth saver), ordering =
window functions + the scalable global-sequence operator. The only Python is
the Arrow-batched parse kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from genesis_spark import conf
from genesis_spark.functions import urls as U
from genesis_spark.functions.parse import parse_pages
from genesis_spark.operators.seq import with_global_seq

# is_uri_validator (helper_method.py:187-192): scheme + non-empty netloc.
# Shared with the pure-Python oracle (urls.is_uri_valid_one) so both paths
# admit exactly the same seed set — see the note on VALID_URI_RE in urls.py.
_VALID_URI_RE = U.VALID_URI_RE


def install_seeds(seeds: DataFrame,
                  host_budget: int = conf.WAVE_HOST_BUDGET) -> DataFrame:
    """Feeder install (crawl_model.py:113-118 + mongo upsert S8): validate
    raw URLs, canonicalize, collapse duplicate canonical forms keeping the
    earliest (installed_at, seed_id), then assign the global priority rank
    and round number (rank div budget). Returns the frontier table."""
    valid = seeds.filter(F.col("url").rlike(_VALID_URI_RE))
    canon = valid.select(
        U.canonicalize_expr(F.col("url")).alias("url"),
        "installed_at", "seed_id")
    dedup = (canon.groupBy("url")
             .agg(F.min(F.struct("installed_at", "seed_id")).alias("first"))
             .select("url",
                     F.col("first.installed_at").alias("installed_at"),
                     F.col("first.seed_id").alias("seq")))
    ranked = with_global_seq(dedup, ["installed_at", "seq"], "host_rank")
    return ranked.select(
        F.xxhash64("url").alias("url_hash"),
        "url",
        U.host_name_expr(F.col("url")).alias("host_key"),
        F.lit(0).alias("depth"),
        U.network_type_expr(F.col("url")).alias("network"),
        F.lit("pending").alias("state"),
        "installed_at", "seq",
        F.lit(0).alias("fail_count"),
        (F.col("host_rank") / host_budget).cast("int").alias("round"),
        "host_rank")


def install_seeds_bucketed(seeds: DataFrame,
                           bucket_budget: int = conf.WAVE_HOST_BUDGET,
                           buckets: int = conf.POLITENESS_BUCKETS,
                           portable_bucket: bool = False) -> DataFrame:
    """Production-scale install: identical validate/canonicalize/MERGE-dedup
    pipeline, but the priority queue is salted per politeness bucket
    (Window.partitionBy(bucket)) instead of globally ordered — one shuffle,
    no global barrier, no sampling pass. This is the 10^10-row path (O1:
    'salted priority queue; global order reconstructed deterministically for
    verification'); ``install_seeds`` keeps the reference-exact global FIFO
    for golden runs. Within a host the order is identical (a host maps to
    one bucket); rounds interleave across buckets instead of globally.

    ``portable_bucket`` swaps the host->bucket hash from xxhash64 (fastest,
    JVM-only) to an md5-based one a DuckDB oracle can replay bit-for-bit —
    the driver CORRECTNESS row runs this variant; everything downstream of
    the bucket assignment (window rank, round) is identical, and
    tests/test_crawl_engine.py asserts both variants agree on the per-host
    FIFO structure."""
    from pyspark.sql import Window

    valid = seeds.filter(F.col("url").rlike(_VALID_URI_RE))
    canon = valid.select(
        U.canonicalize_expr(F.col("url")).alias("url"),
        "installed_at", "seed_id")
    dedup = (canon.groupBy("url")
             .agg(F.min(F.struct("installed_at", "seed_id")).alias("first"))
             .select("url",
                     F.col("first.installed_at").alias("installed_at"),
                     F.col("first.seed_id").alias("seq")))
    host_key = U.host_name_expr(F.col("url"))
    if portable_bucket:
        bucket = (F.conv(F.substring(F.md5(host_key), 25, 8), 16, 10)
                  .cast("long") % buckets)
    else:
        bucket = F.pmod(F.xxhash64(host_key), F.lit(buckets))
    bucketed = dedup.withColumn("bucket", bucket)
    w = Window.partitionBy("bucket").orderBy("installed_at", "seq")
    return (bucketed
            .withColumn("bucket_rank", F.row_number().over(w) - 1)
            .select(F.xxhash64("url").alias("url_hash"), "url",
                    host_key.alias("host_key"),
                    F.lit(0).alias("depth"),
                    U.network_type_expr(F.col("url")).alias("network"),
                    F.lit("pending").alias("state"),
                    "installed_at", "seq", F.lit(0).alias("fail_count"),
                    (F.col("bucket_rank") / bucket_budget).cast("int")
                    .alias("round"),
                    "bucket", "bucket_rank"))


def install_seeds_scaled(seeds: DataFrame,
                         bucket_budget: int = conf.WAVE_HOST_BUDGET,
                         buckets: int = conf.POLITENESS_BUCKETS,
                         portable_bucket: bool = False) -> DataFrame:
    """The bucketed install adapted to the crawl loop: identical to
    ``install_seeds_bucketed`` plus a synthesized unique priority key
    ``host_rank = bucket * 2^40 + bucket_rank`` so ``crawl_frontier`` can
    order deterministically without a global barrier. Per-host FIFO is
    identical to the reference (a host lives in one bucket and
    bucket_rank follows (installed_at, seq)); only the CROSS-host
    interleaving of crawl_seq differs from the golden global order — the
    verification invariants that survive (seen set, documents, per-host
    order) are pinned by tests/test_crawl_engine.py::
    test_scaled_install_crawl_invariants."""
    f = install_seeds_bucketed(seeds, bucket_budget, buckets,
                               portable_bucket)
    return f.withColumn(
        "host_rank",
        F.col("bucket") * F.lit(1 << 40) + F.col("bucket_rank"))


_PASSTHROUGH = ["task_id", "host_rank", "round", "host_key", "depth", "pos"]


def crawl_frontier(spark: SparkSession, frontier: DataFrame, pages: DataFrame,
                   max_depth: int = conf.MAX_ALLOWED_DEPTH,
                   seq_offset: int = 0,
                   use_bloom: bool = False,
                   use_cuckoo: bool = False) -> dict[str, DataFrame]:
    """Crawl every frontier host to completion; returns crawl_order / seen /
    documents / frontier_done DataFrames matching the oracle goldens.

    ``seq_offset`` shifts crawl_seq for multi-round incremental runs.
    ``use_bloom`` puts the sharded Bloom prefilter (D1 north-star) in front
    of the exact URL-seen anti-join: candidates the filter proves unseen
    skip the shuffle; possible-positives still go through the join, so
    results are identical either way (no false negatives by construction).
    ``use_cuckoo`` selects the cuckoo-filter variant of the same contract
    (D1 names "Bloom/cuckoo"; cuckoo additionally supports fingerprint
    deletion for dead-removal — ``operators.cuckoo``). Mutually exclusive.
    """
    if use_bloom and use_cuckoo:
        raise ValueError("use_bloom and use_cuckoo are mutually exclusive")
    pages_j = pages.select(
        F.col("url_hash").alias("p_hash"), F.col("url").alias("p_url"),
        "status", "redirect_url", "html")

    wave = frontier.select(
        F.col("url_hash").alias("task_id"), "host_rank", "round", "host_key",
        "url", F.lit(0).alias("depth"), F.lit(0).alias("pos"))
    seen = spark.createDataFrame([], "task_id long, url string, host_key string")
    order_waves: list[DataFrame] = []
    doc_waves: list[DataFrame] = []
    cached: list[DataFrame] = []
    # seen-prefilter adapter: (empty filter, build fn, probe fn) — the two
    # variants share the incremental grow-by-union / probe-then-anti-join
    # shape, so the wave loop below is written against the adapter
    seen_filt = _build = _probe = None
    if use_bloom:
        from genesis_spark.operators.bloom import (ShardedBloom, build_bloom,
                                                   filter_not_seen)
        seen_filt, _build, _probe = ShardedBloom.empty(), build_bloom, \
            filter_not_seen
    elif use_cuckoo:
        from genesis_spark.operators.cuckoo import (ShardedCuckoo,
                                                    build_cuckoo,
                                                    filter_not_seen_cuckoo)
        seen_filt, _build, _probe = ShardedCuckoo.empty(), build_cuckoo, \
            filter_not_seen_cuckoo

    for d in range(max_depth + 1):
        fetched = wave.join(
            pages_j,
            (F.xxhash64(wave.url) == pages_j.p_hash) & (wave.url == pages_j.p_url),
            "left")
        # ok = fetch success AND same-host redirect (generic_parse_controller
        # :75-82); parse of non-null html never fails in the kernel
        ok = (F.col("status") == 200) & F.col("html").isNotNull() & \
            (U.host_name_expr(F.coalesce("redirect_url", "url")) ==
             U.host_name_expr(F.col("url")))
        crawled = (fetched.withColumn("ok", ok.isNotNull() & ok)
                   .select("task_id", "host_rank", "round", "host_key", "url",
                           "depth", "pos", "ok", "html")
                   .persist())
        cached.append(crawled)
        order_waves.append(crawled.drop("html"))

        parsed = parse_pages(
            crawled.filter("ok").withColumnRenamed("url", "u_req"),
            url_col="u_req", html_col="html", passthrough=_PASSTHROUGH)
        parsed = parsed.persist()
        cached.append(parsed)
        doc_waves.append(parsed)

        if d >= max_depth:
            break
        kids = parsed.select(
            "task_id", "host_rank", "round", "host_key",
            F.col("pos").alias("parent_pos"),
            F.posexplode("sub_url").alias("link_pos", "url"))
        # per-task URL-seen: exact left_anti (J2/D1) + first-occurrence in
        # (parent_pos, link_pos) order — identical to insert-on-admission
        if seen_filt is not None:
            key = F.concat_ws("\x1f", F.col("task_id").cast("string"), "url")
            flagged = _probe(
                kids.withColumn("_k", key), "_k", seen_filt).drop("_k")
            surely_new = flagged.filter(~F.col("_maybe_seen")) \
                .drop("_maybe_seen")
            maybe = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
            fresh = surely_new.unionByName(
                maybe.join(seen.select("task_id", "url"),
                           ["task_id", "url"], "left_anti"))
        else:
            fresh = kids.join(seen.select("task_id", "url"),
                              ["task_id", "url"], "left_anti")
        w_first = Window.partitionBy("task_id", "url").orderBy(
            "parent_pos", "link_pos")
        admitted = (fresh.withColumn("_rn", F.row_number().over(w_first))
                    .filter(F.col("_rn") == 1).drop("_rn"))
        w_bfs = Window.partitionBy("task_id").orderBy("parent_pos", "link_pos")
        wave = (admitted
                .withColumn("pos", F.row_number().over(w_bfs) - 1)
                .withColumn("depth", F.lit(d + 1))
                .drop("parent_pos", "link_pos")
                .persist())
        cached.append(wave)
        seen = seen.unionByName(wave.select("task_id", "url", "host_key"))
        if seen_filt is not None:
            # incremental: hash only THIS wave's admissions into the filter
            # (a from-scratch rebuild would re-hash the whole seen set every
            # wave — O(total rows) per wave instead of O(new rows))
            key = F.concat_ws("\x1f", F.col("task_id").cast("string"), "url")
            seen_filt = seen_filt.union(
                _build(wave.select(key.alias("_k")), "_k"))

    all_rows = order_waves[0]
    for w in order_waves[1:]:
        all_rows = all_rows.unionByName(w)
    ordered = with_global_seq(all_rows, ["host_rank", "depth", "pos"], "_gseq")
    crawl_order_full = (ordered
                        .withColumn("crawl_seq", F.col("_gseq") + F.lit(seq_offset))
                        .withColumn("attempts",
                                    F.when((F.col("depth") == 0) & ~F.col("ok"),
                                           conf.MAX_SEED_ATTEMPTS).otherwise(1))
                        .drop("_gseq"))
    crawl_order_full = crawl_order_full.persist()
    cached.append(crawl_order_full)

    docs = doc_waves[0]
    for w in doc_waves[1:]:
        docs = docs.unionByName(w)
    documents = docs.join(
        crawl_order_full.select("task_id", "depth", "pos", "crawl_seq"),
        ["task_id", "depth", "pos"])

    # seed outcome -> frontier end state (3-strikes abandon, O8)
    seed_ok = crawl_order_full.filter("depth = 0").select(
        F.col("task_id").alias("url_hash"), F.col("ok").alias("_seed_ok"))
    frontier_done = (frontier.join(seed_ok, "url_hash", "left")
                     .withColumn("state", F.when(F.col("_seed_ok"), "done")
                                 .otherwise("failed"))
                     .withColumn("fail_count",
                                 F.when(F.col("_seed_ok"), 0).otherwise(3))
                     .drop("_seed_ok"))

    crawl_order = crawl_order_full.select(
        "crawl_seq", "round", "host_key", "url", "depth", "attempts", "ok",
        "task_id", "host_rank", "pos")
    return {"crawl_order": crawl_order, "seen": seen,
            "documents": documents, "frontier_done": frontier_done,
            "_cached": cached}


def run(spark: SparkSession, seeds: DataFrame, pages: DataFrame,
        host_budget: int = conf.WAVE_HOST_BUDGET,
        bucketed: bool = False) -> dict[str, DataFrame]:
    """Install + crawl the whole frontier in one multi-wave job.

    ``bucketed=True`` uses the production-scale install (no global-rank
    barrier; see install_seeds_scaled) — same seen set, documents, and
    per-host order; cross-host crawl_seq interleaving differs from the
    golden global order."""
    install = install_seeds_scaled if bucketed else install_seeds
    frontier = install(seeds, host_budget)
    return crawl_frontier(spark, frontier, pages)


def read_frontier_delta(spark: SparkSession, store) -> DataFrame:
    """Reconstruct the current frontier from the delta-state layout:
    ``frontier_base`` (written once at install) left-joined with the union
    of per-round ``frontier_updates`` deltas. Sound because every url_hash
    is dispatched in exactly one round, so at most ONE update row exists
    per key — no precedence resolution needed (a 'done'/'failed' seed is
    never re-dispatched)."""
    base = store.read(spark, "frontier_base")
    ups = store.read(spark, "frontier_updates")
    if ups is None:
        return base
    upd = ups.select("url_hash", F.col("state").alias("_u_state"),
                     F.col("fail_count").alias("_u_fails"))
    return (base.join(upd, "url_hash", "left")
            .withColumn("state", F.coalesce("_u_state", "state"))
            .withColumn("fail_count", F.coalesce("_u_fails", "fail_count"))
            .drop("_u_state", "_u_fails"))


def compact_frontier(spark: SparkSession, store) -> int:
    """The Iceberg ``MERGE INTO`` + rewrite shape for the delta-state
    layout: fold the accumulated ``frontier_updates`` into a fresh
    ``frontier_base`` and cut the update log. Keeps ``read_frontier_delta``
    reconstruction O(1)-deep instead of O(rounds): without compaction the
    update union grows one file set per round, and at 10^6 rounds the join
    plan itself becomes the bottleneck. Resume metadata (round/seq_offset)
    is carried forward, so crash-resume across a compaction is unchanged."""
    prev = store.latest()
    merged = read_frontier_delta(spark, store)
    meta = {k: prev[k] for k in ("round", "seq_offset") if k in prev}
    meta["compacts"] = {"frontier_updates": prev["snapshot_id"]}
    return store.commit({"frontier_base": merged}, meta)


def run_rounds(spark: SparkSession, seeds: DataFrame, pages: DataFrame,
               store, host_budget: int = conf.WAVE_HOST_BUDGET,
               stop_after_round: int | None = None,
               delta_state: bool = False,
               bucketed: bool = False,
               use_bloom: bool = False,
               use_cuckoo: bool = False,
               compact_every: int | None = None) -> None:
    """Production shape: one frontier round per iteration, one snapshot per
    round (ST2/ST4). Crash-resume = rerun with the same store; the last
    committed snapshot defines the restart point, uncommitted work is
    invisible (rename-atomic manifests). ``stop_after_round`` simulates a
    crash after committing that round (tests §5.4).

    ``delta_state=True`` is the 10^10-row layout: the frontier is written
    ONCE (``frontier_base``) and each round commits only the delta of
    state changes for the seeds it dispatched (``frontier_updates``) —
    O(round size), instead of rewriting the full frontier table every
    round (O(frontier) rewrite amplification: at 10^10 rows a full
    rewrite per round dwarfs the crawl itself). Reads reconstruct via
    ``read_frontier_delta``; resume semantics are identical (pinned by
    tests/test_resume.py::test_delta_state_resume_and_no_rewrite).

    ``bucketed``/``use_bloom`` select the production-scale install (no
    global-rank barrier) and the sharded Bloom seen-prefilter — the same
    flags as ``run``/``crawl_frontier``; the three 10^10-row paths
    compose (pinned at t3 scale by tests/test_crawl_t3.py)."""
    latest = store.latest()
    install = install_seeds_scaled if bucketed else install_seeds
    if latest is None:
        frontier = install(seeds, host_budget).persist()
        base_name = "frontier_base" if delta_state else "frontier"
        store.commit({base_name: frontier}, {"round": -1, "seq_offset": 0})
        next_round, seq_offset = 0, 0
    else:
        frontier = (read_frontier_delta(spark, store) if delta_state
                    else store.read(spark, "frontier")).persist()
        next_round = latest["round"] + 1
        seq_offset = latest["seq_offset"]

    max_round = frontier.agg(F.max("round")).first()[0]
    if max_round is None:
        return
    for r in range(next_round, max_round + 1):
        todo = frontier.filter((F.col("round") == r) &
                               (F.col("state") == "pending"))
        res = crawl_frontier(spark, todo, pages, seq_offset=seq_offset,
                             use_bloom=use_bloom, use_cuckoo=use_cuckoo)
        seq_offset += res["crawl_order"].count()
        upd = res["frontier_done"].select(
            "url_hash", F.col("state").alias("_new_state"),
            F.col("fail_count").alias("_new_fails"))
        if delta_state:
            new_frontier = None
            delta = res["frontier_done"].select("url_hash", "state",
                                                "fail_count")
        else:
            new_frontier = (frontier.join(upd, "url_hash", "left")
                            .withColumn("state",
                                        F.coalesce("_new_state", "state"))
                            .withColumn("fail_count",
                                        F.coalesce("_new_fails",
                                                   "fail_count"))
                            .drop("_new_state", "_new_fails")).persist()
        # per-partition fetch/parse metrics (S12/ST4): politeness bucket ==
        # fetch partition, so (round, depth, bucket) rows are partition-level
        # lineage for this snapshot
        metrics = (res["crawl_order"]
                   .groupBy("round", "depth",
                            F.pmod(F.xxhash64("host_key"),
                                   F.lit(conf.POLITENESS_BUCKETS))
                            .alias("bucket"))
                   .agg(F.count("*").alias("n_fetched"),
                        F.sum(F.col("ok").cast("int")).alias("n_ok"),
                        F.sum((~F.col("ok")).cast("int")).alias("n_failed"),
                        F.sum(F.col("attempts")).alias("n_attempts")))
        tables = {
            "crawl_order": res["crawl_order"].drop("task_id", "host_rank", "pos"),
            "seen": res["seen"],
            "documents": res["documents"].drop("task_id", "host_rank", "pos",
                                               "round"),
            "metrics": metrics,
        }
        if delta_state:
            tables["frontier_updates"] = delta      # O(round), not O(frontier)
        else:
            tables["frontier"] = new_frontier
        store.commit(tables, {"round": r, "seq_offset": seq_offset})
        if delta_state and compact_every and (r + 1) % compact_every == 0:
            compact_frontier(spark, store)          # bounded update-log depth
        for df in res["_cached"]:
            df.unpersist()
        frontier.unpersist()
        if new_frontier is not None:
            new_frontier.unpersist()
        # re-read from the committed snapshot: every round starts from a flat
        # parquet scan, never a lineage chain through all prior rounds'
        # crawl plans (which grows the DAG superlinearly)
        frontier = (read_frontier_delta(spark, store) if delta_state
                    else store.read(spark, "frontier")).persist()
        if stop_after_round is not None and r >= stop_after_round:
            return
