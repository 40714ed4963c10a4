"""Pure-Python oracle crawler — the golden-producing reimplementation of the
reference's scheduling semantics (SURVEY.md §2.6, the crawl-ordering
contract). The Spark engine must reproduce its crawl order, URL-seen set,
frontier end-state and indexed documents exactly.

Semantics covered, with reference citations:
  * feeder install: raw URL validated (is_uri_validator, crawl_model.py:113-118),
    canonicalized, deduplicated by canonical form keeping the earliest
    (engine contract — the reference keys its frontier on the *raw* URL,
    mongo_request_generator.py:14-40, so duplicate raw forms of one canonical
    URL would crawl twice; the rebuild's MERGE-on-url_hash collapses them)
  * round order: pending frontier sorted (installed_at ASC, seq ASC),
    truncated to the per-round host budget (mongo_request_generator.py:45,
    crawl_model.py:73,85)
  * per-host strict FIFO BFS, children in document order from the emitted
    doc's sub_url (= first 10 admitted links, html_parse_manager.py:386,
    generic_parse_controller.py:80,117), per-host URL-seen list insert-on-
    admission (duplication_handler.py:3-19; cleared per host, on_clear)
  * depth cap: expand only while depth < 2 (generic_parse_controller.py:116)
  * failure policy: before the host's first success the failing head retries
    to 4 total attempts then pops; after first success failures pop at once
    (generic_parse_controller.py:108-114)
  * redirect gate: a fetched page indexes/expands only if
    host_name(final_url) == host_name(request_url)
    (generic_parse_controller.py:75-82)

Fetch is the synthetic ``web_pages`` lookup: ok iff the URL has a row with
status == 200 and non-null html.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from genesis_spark import conf
from genesis_spark.functions import parse as P
from genesis_spark.functions import urls as U
from genesis_spark.functions.hashing import xxh64


@dataclass
class OracleResult:
    crawl_order: list[dict] = field(default_factory=list)
    seen: list[dict] = field(default_factory=list)
    frontier: list[dict] = field(default_factory=list)
    documents: list[dict] = field(default_factory=list)


def _fetch(pages_by_url: dict, url: str):
    row = pages_by_url.get(url)
    if row is None or row["status"] != 200 or row["html"] is None:
        return None, None
    return row.get("redirect_url") or url, row["html"]


def crawl_host(pages_by_url: dict, seed_url: str, *,
               round_no: int, host_key: str, start_seq: int,
               result: OracleResult) -> tuple[int, bool, int]:
    """One host task (generic_parse_controller.start_crawler_instance).
    Returns (next_crawl_seq, host_crawled, seed_fail_count)."""
    network = U.network_type_one(seed_url)
    queue: list[tuple[str, int]] = [(seed_url, 0)]
    host_seen: list[str] = []      # duplication_handler scope = this host task
    host_crawled = False
    fail_count = 0
    seq = start_seq
    while queue:
        url, depth = queue[0]
        final_url, html = _fetch(pages_by_url, url)
        parsed = None
        if html is not None and U.host_name_one(final_url) == U.host_name_one(url):
            parsed = P.parse_page(url, html, network)

        if parsed is None:
            if not host_crawled:
                if fail_count > 2:
                    queue.pop(0)
                    result.crawl_order.append(dict(
                        crawl_seq=seq, round=round_no, host_key=host_key,
                        url=url, depth=depth, attempts=fail_count + 1, ok=False))
                    seq += 1
                else:
                    fail_count += 1
                continue
        if parsed is not None and depth < conf.MAX_ALLOWED_DEPTH:
            for child in parsed["sub_url"][:conf.SUB_URL_DEPTH]:
                if child not in host_seen:
                    host_seen.append(child)
                    queue.append((child, depth + 1))
        host_crawled = True
        queue.pop(0)
        ok = parsed is not None
        result.crawl_order.append(dict(
            crawl_seq=seq, round=round_no, host_key=host_key, url=url,
            depth=depth, attempts=1, ok=ok))
        seq += 1
        if ok:
            result.documents.append(dict(crawl_seq=seq - 1, **parsed))
    for u in host_seen:
        result.seen.append(dict(url_hash=xxh64(u), url=u, host_key=host_key))
    return seq, host_crawled, fail_count


def run(seeds: list[dict], pages: list[dict],
        host_budget: int = conf.WAVE_HOST_BUDGET) -> OracleResult:
    """Full frontier run to drain: install -> rounds of host_budget hosts."""
    pages_by_url = {p["url"]: p for p in pages}
    result = OracleResult()

    installed: dict[str, dict] = {}
    for s in sorted(seeds, key=lambda x: (x["installed_at"], x["seed_id"])):
        if not U.is_uri_valid_one(s["url"]):
            continue
        canon = U.clean_url_one(s["url"])
        if canon not in installed:     # MERGE WHEN NOT MATCHED semantics
            installed[canon] = dict(
                url=canon, installed_at=s["installed_at"], seq=s["seed_id"])

    pending = sorted(installed.values(),
                     key=lambda e: (e["installed_at"], e["seq"]))
    crawl_seq = 0
    for round_no in range(0, (len(pending) + host_budget - 1) // host_budget or 1):
        batch = pending[round_no * host_budget:(round_no + 1) * host_budget]
        for entry in batch:
            host_key = U.host_name_one(entry["url"])
            crawl_seq, host_crawled, fails = crawl_host(
                pages_by_url, entry["url"], round_no=round_no,
                host_key=host_key, start_seq=crawl_seq, result=result)
            result.frontier.append(dict(
                url_hash=xxh64(entry["url"]), url=entry["url"],
                host_key=host_key, depth=0,
                state="done" if host_crawled else "failed",
                fail_count=fails, installed_at=entry["installed_at"],
                seq=entry["seq"]))
    return result


def write_goldens(result: OracleResult, out_dir: str) -> None:
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    co = result.crawl_order
    pq.write_table(pa.table({
        "crawl_seq": pa.array([r["crawl_seq"] for r in co], pa.int64()),
        "round": pa.array([r["round"] for r in co], pa.int32()),
        "host_key": pa.array([r["host_key"] for r in co], pa.string()),
        "url": pa.array([r["url"] for r in co], pa.string()),
        "depth": pa.array([r["depth"] for r in co], pa.int32()),
        "attempts": pa.array([r["attempts"] for r in co], pa.int32()),
        "ok": pa.array([r["ok"] for r in co], pa.bool_()),
    }), f"{out_dir}/crawl_order_golden.parquet")
    pq.write_table(pa.table({
        "url_hash": pa.array([r["url_hash"] for r in result.seen], pa.int64()),
        "url": pa.array([r["url"] for r in result.seen], pa.string()),
        "host_key": pa.array([r["host_key"] for r in result.seen], pa.string()),
    }), f"{out_dir}/seen_golden.parquet")
    fr = result.frontier
    pq.write_table(pa.table({
        "url_hash": pa.array([r["url_hash"] for r in fr], pa.int64()),
        "url": pa.array([r["url"] for r in fr], pa.string()),
        "host_key": pa.array([r["host_key"] for r in fr], pa.string()),
        "depth": pa.array([r["depth"] for r in fr], pa.int32()),
        "state": pa.array([r["state"] for r in fr], pa.string()),
        "fail_count": pa.array([r["fail_count"] for r in fr], pa.int32()),
        "installed_at": pa.array([r["installed_at"] * 1_000_000 for r in fr],
                                 pa.timestamp("us")),
        "seq": pa.array([r["seq"] for r in fr], pa.int64()),
    }), f"{out_dir}/frontier_golden.parquet")
    docs = result.documents
    span_type = pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32())]))
    pq.write_table(pa.table({
        "crawl_seq": pa.array([d["crawl_seq"] for d in docs], pa.int64()),
        "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
        "validity_score": pa.array([d["validity_score"] for d in docs], pa.int32()),
        "spans": pa.array(
            [[(s["kind"], s["text"], s["media_ref"], s["offset"])
              for s in d["spans"]] for d in docs], span_type),
    }), f"{out_dir}/documents_golden.parquet")
