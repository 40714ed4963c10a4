"""Deterministic synthetic web-graph fixtures (FIXTURES.md §2-3).

Replaces the network: the crawl engine's fetch operator becomes an equi-join
against the ``web_pages`` table (SURVEY.md §2.4 J4). Seed 42, no wall-clock
(installed_at = fixed epoch + seed_id), idempotent — same bytes on re-run.

Graph shape mirrors what makes the reference's scheduling semantics
observable (generic_parse_controller.py:97-123): per-host trees deeper than
the depth-2 cap, hub hosts whose pages carry more than DOC_SUB_URL_CAP
same-host links so the per-page cap binds, duplicate/fragment/cross-host/
clearnet links, ~4% fetch failures each of 404 and timeout, ~3% cross-host
redirects for the same-host gate (generic_parse_controller.py:75-82).
"""

from __future__ import annotations

import random

from genesis_spark.functions.hashing import xxh64
from genesis_spark.functions.text import DICTIONARY
from genesis_spark.functions.urls import host_name_one

EPOCH = 1_700_000_000  # fixed base for installed_at (FIXTURES.md determinism)
_ONION_ALPHABET = "abcdefghijklmnopqrstuvwxyz234567"
_WORDS = sorted(DICTIONARY)
_OFF_WORDS = ["zzqx", "wvut", "kjhg", "plmn", "qqrr", "xxyy"]  # not in dict


def _label(rng: random.Random, n: int = 56) -> str:
    return "".join(rng.choice(_ONION_ALPHABET) for _ in range(n))


def _sentence(rng: random.Random, n_words: int, dict_ratio: float = 0.85) -> str:
    words = [rng.choice(_WORDS) if rng.random() < dict_ratio
             else rng.choice(_OFF_WORDS) for _ in range(n_words)]
    return " ".join(words) + "."


def _paragraph(rng: random.Random) -> str:
    return " ".join(_sentence(rng, rng.randint(6, 14))
                    for _ in range(rng.randint(1, 3)))


def _page_html(rng: random.Random, base: str, title: str,
               child_hrefs: list[str], extra_links: list[str],
               with_meta: bool, with_contact: bool) -> tuple[str, list[str]]:
    """Synthesize one page; returns (html, document-order hrefs)."""
    out_links: list[str] = []
    parts = [f"<html><head><title>{title}</title>"]
    if with_meta:
        parts.append(f'<meta name="description" content="{_sentence(rng, 12)[:-1]}">')
        parts.append(f'<meta name="keywords" content="{",".join(rng.sample(_WORDS, 4))}">')
    parts.append("</head><body>")
    parts.append(f"<h1>{_sentence(rng, rng.randint(4, 7))[:-1]}</h1>")
    for _ in range(rng.randint(2, 5)):
        parts.append(f"<p>{_paragraph(rng)}</p>")
    if with_contact:
        user = rng.choice(_WORDS)
        # NANP-shaped phone: +1 then 10 digits with a 2-9 lead, so the
        # number sits inside the published national-plan length range the
        # T5 validator enforces (a fully random digit string would be
        # rejected by a real phonenumbers library too)
        phone = f"+1{rng.randint(2, 9)}{rng.randint(0, 10**9 - 1):09d}"
        parts.append(f"<p>contact {user}@{_label(rng, 8)}.com for more "
                     f"information or call {phone} now</p>")
    # media links via <a> — the four extension families
    for ext, _kind in (('.png', 'image'), ('.mp4', 'video'),
                       ('.pdf', 'document'), ('.zip', 'archive')):
        if rng.random() < 0.4:
            href = f"{base}/files/{rng.choice(_WORDS)}{ext}"
            parts.append(f'<a href="{href}">file</a>')
            out_links.append(href)
    if rng.random() < 0.5:
        src = f"/img/{rng.choice(_WORDS)}.jpg"
        parts.append(f'<img src="{src}">')
        out_links.append(src)
    # child links (document order; mix absolute and relative forms)
    for href in child_hrefs:
        rel = href[len(base):] if href.startswith(base) and rng.random() < 0.3 else href
        parts.append(f'<a href="{rel}">{rng.choice(_WORDS)}</a>')
        out_links.append(rel)
    # a duplicate of an earlier child, a self/base link, a fragment, cross-host
    if child_hrefs and rng.random() < 0.5:
        dup = rng.choice(child_hrefs)
        parts.append(f'<a href="{dup}">again</a>')
        out_links.append(dup)
    parts.append(f'<a href="{base}">home</a>')
    parts.append('<a href="#">top</a>')
    for href in extra_links:
        parts.append(f'<a href="{href}">ext</a>')
        out_links.append(href)
    parts.append(f"<div>{_sentence(rng, rng.randint(7, 12))[:-1]}</div>")
    parts.append("</body></html>")
    return "".join(parts), out_links


def generate(n_onion_hosts: int = 16, n_i2p: int = 2, n_clearnet: int = 2,
             seed: int = 42) -> tuple[list[dict], list[dict]]:
    """Build (seeds, web_pages) as row dicts. First ~15% of onion hosts are
    hubs (12-16 children/page — above DOC_SUB_URL_CAP=10 so the per-page cap
    binds); trees reach depth 3 so the depth-2 cap is observable."""
    rng = random.Random(seed)
    seeds: list[dict] = []
    pages: list[dict] = []
    onion_bases: list[str] = []

    def add_page(url: str, host_key: str, html: str, out_links: list[str],
                 force: str | None = None) -> None:
        r = rng.random()
        status = 200 if r < 0.92 else (404 if r < 0.96 else 0)
        redirect = url
        if status == 200 and rng.random() < 0.03 and onion_bases:
            redirect = rng.choice(onion_bases) + "/elsewhere"
        if force == "fail":        # dead seed -> 4-attempt retry path (O8)
            status = 404
        elif force == "redirect":  # cross-host redirect -> same-host gate
            status, redirect = 200, "http://elsewherehost.onion/moved"
        elif force == "ok":
            status, redirect = 200, url
        pages.append({"url_hash": xxh64(url), "url": url, "host_key": host_key,
                      "status": status, "redirect_url": redirect,
                      "html": html, "out_links": out_links})

    n_hubs = max(1, n_onion_hosts * 15 // 100)
    for h in range(n_onion_hosts):
        label = _label(rng)
        base = f"http://{label}.onion"
        onion_bases.append(base)
        host_key = host_name_one(base)
        is_hub = h < n_hubs
        n_children = rng.randint(12, 16) if is_hub else rng.randint(3, 8)
        child_urls = [f"{base}/s{i}" for i in range(n_children)]
        cross = [rng.choice(onion_bases[:-1]) + "/x"] if h > 0 else []
        clearnet = [f"http://clearsite{h}.com/info"] if rng.random() < 0.5 else []

        html, links = _page_html(rng, base, f"{rng.choice(_WORDS)} portal {h}",
                                 child_urls, cross + clearnet,
                                 with_meta=rng.random() < 0.7,
                                 with_contact=rng.random() < 0.3)
        # deterministic seed-failure coverage: every 8th host's root is dead
        # (4-attempt retry then host abandon), every 8th+1 redirects off-host
        force = ("fail" if h % 8 == 5 else
                 "redirect" if h % 8 == 6 else
                 "ok" if is_hub else None)
        add_page(base, host_key, html, links, force=force)

        for i, curl in enumerate(child_urls):
            n_gc = (rng.randint(8, 12) if is_hub and i == 0
                    else rng.randint(0, 4))
            gc_urls = [f"{curl}/g{j}" for j in range(n_gc)]
            html, links = _page_html(rng, base, f"{rng.choice(_WORDS)} s{i}",
                                     gc_urls, [],
                                     with_meta=rng.random() < 0.5,
                                     with_contact=rng.random() < 0.2)
            add_page(curl, host_key, html, links)
            for j, gurl in enumerate(gc_urls):
                # depth-2 pages link one level deeper; those targets are never
                # fetched (depth cap) and deliberately have no page rows
                d3 = [f"{gurl}/d{k}" for k in range(rng.randint(0, 3))]
                html, links = _page_html(rng, base, f"{rng.choice(_WORDS)} g{j}",
                                         d3, [], with_meta=False,
                                         with_contact=rng.random() < 0.1)
                add_page(gurl, host_key, html, links)

        # seed raw form: mix www./trailing-slash/plain (clean-url coverage)
        r = rng.random()
        raw = (f"http://www.{label}.onion/" if r < 0.3
               else base + "/" if r < 0.6 else base)
        seeds.append({"url": raw})
        if rng.random() < 0.1:   # duplicate seed in a different raw form
            seeds.append({"url": base + "/"})

    for n in range(n_i2p):
        base = f"http://{_label(rng, 12)}.i2p"
        html, links = _page_html(rng, base, f"{rng.choice(_WORDS)} i2p {n}",
                                 [f"{base}/s0"], [], True, False)
        add_page(base, host_name_one(base), html, links)
        seeds.append({"url": base})
    for n in range(n_clearnet):
        base = f"http://clearseed{n}.example.com"
        html, links = _page_html(rng, base, f"{rng.choice(_WORDS)} web {n}",
                                 [f"{base}/s0"], [], True, False)
        add_page(base, host_name_one(base), html, links)
        seeds.append({"url": base})

    # invalid feeder entries (is_uri_validator gate, crawl_model.py:113-118)
    seeds.append({"url": "not a url at all"})
    seeds.append({"url": "/relative/only"})
    # leading whitespace: urlparse (py>=3.10) would strip and accept this;
    # the shared anchored VALID_URI_RE rejects it on BOTH the Spark and
    # oracle paths — pins the edge the two validators used to diverge on
    seeds.append({"url": " http://leading-space.onion"})

    rng.shuffle(seeds)
    for i, s in enumerate(seeds):
        s["seed_id"] = i
        s["installed_at"] = EPOCH + i
    return seeds, pages


def write_parquet(seeds: list[dict], pages: list[dict], out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    import os
    os.makedirs(out_dir, exist_ok=True)
    seed_t = pa.table({
        "seed_id": pa.array([s["seed_id"] for s in seeds], pa.int64()),
        "url": pa.array([s["url"] for s in seeds], pa.string()),
        "installed_at": pa.array([s["installed_at"] * 1_000_000 for s in seeds],
                                 pa.timestamp("us")),
    })
    pq.write_table(seed_t, f"{out_dir}/seeds.parquet")
    page_t = pa.table({
        "url_hash": pa.array([p["url_hash"] for p in pages], pa.int64()),
        "url": pa.array([p["url"] for p in pages], pa.string()),
        "host_key": pa.array([p["host_key"] for p in pages], pa.string()),
        "status": pa.array([p["status"] for p in pages], pa.int32()),
        "redirect_url": pa.array([p["redirect_url"] for p in pages], pa.string()),
        "html": pa.array([p["html"] for p in pages], pa.string()),
        "out_links": pa.array([p["out_links"] for p in pages],
                              pa.list_(pa.string())),
    })
    pq.write_table(page_t, f"{out_dir}/web_pages.parquet")
