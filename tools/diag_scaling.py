"""Scaling diagnosis for the north-rule frontier bench: break the timed
region into stages and measure each at local[2] vs local[8] to find the
serial fraction that capped round-1 efficiency at 0.681.

Stages measured per core count (min of N repeats each):
  gen       synthetic URL projection only (spark.range -> count)
  install   install_seeds_bucketed -> count (no persist)
  persist   install with .persist() materialization -> count
  anti      candidate anti-join against a persisted frontier
  full      the exact BENCH job (install+persist+anti-join in one action)
  plan      driver-side planning time (explain) for the full job, no exec

Usage: python tools/diag_scaling.py [n_urls] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SHUF = int(os.environ.get("DIAG_SHUFFLE", "64"))
AQE = os.environ.get("DIAG_AQE", "1") == "1"


def run(cores: int) -> dict:
    from pyspark.sql import functions as F

    from bench import _synthetic_seed_urls
    from genesis_spark.crawler import engine
    from genesis_spark.session import get_spark

    spark = get_spark(app_name=f"diag-{cores}", cores=cores,
                      shuffle_partitions=SHUF)
    if not AQE:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    out = {}

    def timeit(name, fn, warm=True):
        if warm:
            fn()
        best = None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 2)
        print(f"# cores={cores} {name}: {best:.2f}s", file=sys.stderr,
              flush=True)

    timeit("gen", lambda: _synthetic_seed_urls(spark, N).count())
    timeit("install", lambda: engine.install_seeds_bucketed(
        _synthetic_seed_urls(spark, N), bucket_budget=10_000).count())

    def full():
        frontier = engine.install_seeds_bucketed(
            _synthetic_seed_urls(spark, N), bucket_budget=10_000)
        cand = spark.range(N).select(
            F.concat(F.lit("http://h"),
                     ((F.col("id") * 40503) % (3 * N // 2)).cast("string"),
                     F.lit(".onion")).alias("url"))
        admitted = cand.join(
            frontier.select(F.xxhash64("url").alias("url_hash")),
            F.xxhash64(cand.url) == F.col("url_hash"), "left_anti")
        admitted.count()

    timeit("full_nopersist", full)

    def full_persist():
        frontier = engine.install_seeds_bucketed(
            _synthetic_seed_urls(spark, N), bucket_budget=10_000).persist()
        cand = spark.range(N).select(
            F.concat(F.lit("http://h"),
                     ((F.col("id") * 40503) % (3 * N // 2)).cast("string"),
                     F.lit(".onion")).alias("url"))
        admitted = cand.join(
            frontier.select(F.xxhash64("url").alias("url_hash")),
            F.xxhash64(cand.url) == F.col("url_hash"), "left_anti")
        admitted.count()
        frontier.unpersist()

    timeit("full_persist", full_persist)

    def plan_only():
        frontier = engine.install_seeds_bucketed(
            _synthetic_seed_urls(spark, N), bucket_budget=10_000)
        frontier._jdf.queryExecution().executedPlan()

    timeit("plan", plan_only, warm=False)

    spark.stop()
    return out


if __name__ == "__main__":
    res = {}
    for cores in (2, 8, 2, 8):       # interleave to dodge throttle windows
        key = f"local{cores}"
        r = run(cores)
        if key in res:
            res[key] = {k: min(res[key][k], v) for k, v in r.items()}
        else:
            res[key] = r
    res["n_urls"] = N
    res["shuffle_partitions"] = SHUF
    res["aqe"] = AQE
    for k in res["local2"]:
        t2, t8 = res["local2"][k], res["local8"][k]
        if t8 > 0:
            res.setdefault("efficiency", {})[k] = round(t2 / t8 / 4, 3)
    print(json.dumps(res))
