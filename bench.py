#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl": {"urls_per_sec_local8": ..., "urls_per_sec_local32": ...,
             "scaling_efficiency": ...}}

Two parts:
  1. headline query suite at $SPARK_GRAFT_SF_DIR (default
     /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS];
  2. the north-rule scaling protocol (BASELINE.md): the identical frontier
     crawl on the same synthetic web graph at local[8] vs local[32]
     (N vs 4N cores), reporting URLs scheduled+deduped per second at each
     and efficiency = (T8/T32)/4.

The crawl input is a deterministic fixture (seed 42) cached under
_bench_data/; set SPARK_GRAFT_SKIP_SCALING=1 to skip part 2.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "url_canonicalize", "frontier_install", "frontier_host_agg",
    "seen_anti_join", "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "ann_cosine_topk", "text_quality", "text_token_count",
    "events_windowed", "pricing_summary",
]

BENCH_HOSTS = int(os.environ.get("SPARK_GRAFT_BENCH_HOSTS", "300"))


def _bench_fixture() -> str:
    from genesis_spark.crawler import oracle  # noqa: F401 (import check)
    from genesis_spark.sources import fixtures

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "_bench_data", f"hosts{BENCH_HOSTS}")
    if not os.path.exists(os.path.join(out_dir, "web_pages.parquet")):
        seeds, pages = fixtures.generate(
            n_onion_hosts=BENCH_HOSTS, n_i2p=4, n_clearnet=4, seed=42)
        fixtures.write_parquet(seeds, pages, out_dir)
    return out_dir


def run_queries(sf_dir: str, cores: str) -> tuple[dict[str, float], float]:
    from genesis_spark import queries as Q
    from genesis_spark.session import get_spark

    spark = get_spark(app_name="bench-queries", cores=cores)
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = Q.QUERIES[name]
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)
    spark.stop()
    return timings, total


def run_crawl(fixture_dir: str, cores: int) -> dict:
    from genesis_spark.crawler import engine
    from genesis_spark.session import get_spark

    spark = get_spark(app_name=f"bench-crawl-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    pages = spark.read.parquet(f"{fixture_dir}/web_pages.parquet")
    # steady-state measurement: warm the JVM (codegen) and python workers
    # (Arrow parse) on a 2-host slice before starting the clock — session
    # startup is a fixed cost, not frontier throughput
    warm = engine.run(spark, seeds.limit(2), pages, host_budget=1 << 30)
    warm["crawl_order"].count()
    for df in warm["_cached"]:
        df.unpersist()
    t0 = time.perf_counter()
    # single full-frontier round: pure scheduling+crawl throughput
    res = engine.run(spark, seeds, pages, host_budget=1 << 30)
    n_sched = res["crawl_order"].count()
    n_seen = res["seen"].count()
    dt = time.perf_counter() - t0
    spark.stop()
    return {"cores": cores, "wall_s": round(dt, 2),
            "urls_scheduled": n_sched, "urls_deduped": n_seen,
            "urls_per_sec": round((n_sched + n_seen) / dt, 1)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    timings, total = run_queries(sf_dir, cpus)
    out = {"metric": "headline_suite_seconds", "value": round(total, 3),
           "unit": "sec", "queries": timings,
           "sf": float(sf) if sf.replace(".", "").isdigit() else sf}

    if not os.environ.get("SPARK_GRAFT_SKIP_SCALING"):
        fixture_dir = _bench_fixture()
        r8 = run_crawl(fixture_dir, 8)
        r32 = run_crawl(fixture_dir, 32)
        eff = round((r32["urls_per_sec"] / r8["urls_per_sec"]) / 4, 3)
        out["crawl"] = {
            "n_hosts": BENCH_HOSTS,
            "local8": r8, "local32": r32,
            "urls_per_sec_local8": r8["urls_per_sec"],
            "urls_per_sec_local32": r32["urls_per_sec"],
            "scaling_efficiency": eff,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
