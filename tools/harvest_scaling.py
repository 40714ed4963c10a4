"""Clean-window harvester for the north-rule N->4N scaling pair.

The sandbox CPU is burst-throttled in multi-minute episodes, so a single
bench run can land 2-10x off steady state. This tool gates each
measurement pair on a CPU probe (8-worker vs 1-worker pure-python spin:
per-worker ratio ~1.0 means the quota is currently delivering >=8 clean
cores), runs local[2] then local[8] frontier benches only inside clean
windows, and keeps the best (min) wall per level across all clean pairs.

Usage: python tools/harvest_scaling.py [minutes] [n_urls]
Writes one JSON line per pair to stderr-progress and the final summary
JSON to stdout.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MINUTES = float(sys.argv[1]) if len(sys.argv) > 1 else 45.0
N_URLS = int(sys.argv[2]) if len(sys.argv) > 2 else None
CLEAN_RATIO = 0.85


def _spin(q, dur):
    t_end = time.monotonic() + dur
    n, x = 0, 1
    while time.monotonic() < t_end:
        for _ in range(10000):
            x = (x * 1103515245 + 12345) % (1 << 31)
        n += 1
    q.put(n)


def _measure(workers: int, dur: float = 2.0) -> int:
    q = mp.Queue()
    ps = [mp.Process(target=_spin, args=(q, dur)) for _ in range(workers)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in ps)


def cpu_probe() -> float:
    """per-worker throughput at 8 workers relative to 1 worker."""
    one = _measure(1)
    eight = _measure(8)
    return round((eight / 8) / max(one, 1), 3)


def main() -> None:
    from bench import N_FRONTIER_URLS, bench_frontier

    n_urls = N_URLS or N_FRONTIER_URLS
    deadline = time.monotonic() + MINUTES * 60
    best = {}
    pairs = []
    while time.monotonic() < deadline:
        probe0 = cpu_probe()
        if probe0 < CLEAN_RATIO:
            print(f"# probe {probe0} < {CLEAN_RATIO}: throttled, waiting",
                  file=sys.stderr, flush=True)
            time.sleep(60)
            continue
        lo = bench_frontier(2, n_urls, repeats=2)
        probe_mid = cpu_probe()
        hi = bench_frontier(8, n_urls, repeats=2)
        probe1 = cpu_probe()
        # cleanliness is judged PER LEVEL (probe before + after that level's
        # session) — an episode during local8 shouldn't discard a clean
        # local2 measurement taken minutes earlier
        lo_clean = probe0 >= CLEAN_RATIO and probe_mid >= CLEAN_RATIO
        hi_clean = probe_mid >= CLEAN_RATIO and probe1 >= CLEAN_RATIO
        pair = {"probe": [probe0, probe_mid, probe1],
                "lo_clean": lo_clean, "hi_clean": hi_clean,
                "local2": lo, "local8": hi}
        pairs.append(pair)
        print("#", json.dumps(pair), file=sys.stderr, flush=True)
        for key, r, ok in (("local2", lo, lo_clean),
                           ("local8", hi, hi_clean)):
            if not ok:
                continue
            if key not in best or r["wall_s"] < best[key]["wall_s"]:
                merged_runs = (best.get(key, {}).get("runs_s", [])
                               + r["runs_s"])
                best[key] = {**r, "runs_s": merged_runs}
            else:
                best[key]["runs_s"] = best[key]["runs_s"] + r["runs_s"]
    out = {"n_urls": n_urls, "pairs": len(pairs)}
    if "local2" in best and "local8" in best:
        out.update(best)
        out["scaling_efficiency"] = round(
            best["local8"]["urls_per_sec"] / best["local2"]["urls_per_sec"]
            / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
