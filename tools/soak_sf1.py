"""sf1.0 soak (round-3 verdict item 7): run the top-10 most expensive
registry rows at 10x the driver's bench SF (data from tools/make_sf1.py)
on local[32], recording wall, result rows, peak JVM RSS, and shuffle /
spill totals scraped from the live UI REST API. One JSON line per query
to stderr-free stdout; summary dict at the end for BENCH.md.

Usage: python tools/soak_sf1.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOP10 = ["text_c4_clean", "corpus_clean", "dedup_cluster_reps",
         "cdx_ingest", "dedup_exact_substr", "ann_ivfpq_topk",
         "dedup_simhash64", "media_phash_pairs", "corpus_clean_full",
         "leak_dispatch"]


def rss_mb() -> float:
    """Peak RSS of this process tree (driver python + in-process JVM +
    python workers), via /proc smaps of all descendants."""
    import subprocess
    out = subprocess.run(
        ["ps", "-o", "rss=", "--ppid", str(os.getpid()), "-p",
         str(os.getpid())], capture_output=True, text=True).stdout
    kb = sum(int(x) for x in out.split())
    # python workers are grandchildren of the JVM; walk one more level
    pids = subprocess.run(
        ["ps", "-o", "pid=", "--ppid", str(os.getpid())],
        capture_output=True, text=True).stdout.split()
    for pid in pids:
        out2 = subprocess.run(["ps", "-o", "rss=", "--ppid", pid],
                              capture_output=True, text=True).stdout
        kb += sum(int(x) for x in out2.split())
    return kb / 1024.0


def stage_totals(ui: str, app_id: str) -> dict:
    try:
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=10) as r:
            stages = json.load(r)
    except Exception:
        return {}
    return {
        "shuffle_write_mb": round(sum(
            s.get("shuffleWriteBytes", 0) for s in stages) / 2**20, 1),
        "spill_disk_mb": round(sum(
            s.get("diskBytesSpilled", 0) for s in stages) / 2**20, 1),
        "spill_mem_mb": round(sum(
            s.get("memoryBytesSpilled", 0) for s in stages) / 2**20, 1),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "_bench_data/sf1.0"
    names = sys.argv[2:] or TOP10

    from genesis_spark.session import get_spark
    import __spark_entry__ as E

    qs = E.queries()
    spark = get_spark(app_name="soak-sf1", cores=32, shuffle_partitions=64,
                      extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    peak = {"mb": 0.0}
    stop = threading.Event()

    def monitor():
        while not stop.is_set():
            peak["mb"] = max(peak["mb"], rss_mb())
            time.sleep(2)

    threading.Thread(target=monitor, daemon=True).start()

    results = {}
    prev = stage_totals(ui, app_id)
    for name in names:
        peak["mb"] = rss_mb()          # per-query peak attribution
        t0 = time.perf_counter()
        try:
            n = qs[name](spark, sf_dir).count()
            wall = round(time.perf_counter() - t0, 2)
            cur = stage_totals(ui, app_id)
            delta = {k: round(cur.get(k, 0) - prev.get(k, 0), 1)
                     for k in cur}
            prev = cur
            results[name] = {"wall_s": wall, "rows": n, **delta,
                             "peak_rss_mb": round(peak["mb"])}
            print(json.dumps({name: results[name]}), flush=True)
        except Exception as exc:  # record the cliff, keep soaking
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300],
                             "wall_s": round(time.perf_counter() - t0, 2)}
            print(json.dumps({name: results[name]}), flush=True)
    stop.set()
    print(json.dumps({"sf_dir": sf_dir, "cores": 32,
                      "peak_rss_mb": round(peak["mb"]),
                      "results": results}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
