"""Single source of truth for registry-family classification.

Used by ``tools/registry_manifest.py`` (REGISTRY.md generation) and by
``genesis_spark.queries`` to interleave the registry dict so that a
prefix sample of any ~20+ keys — the driver's CORRECTNESS harness checks
the FIRST 50 — touches every family instead of re-checking whichever
family happened to be inserted first (round-3 verdict item #3: streaming,
leak, spans, robots, media, archive and graph rows had never been
driver-sampled because they all sat past position 50).
"""

from __future__ import annotations

FAMILIES = [
    ("url_", "URL normalization & hygiene"),
    ("frontier_", "Frontier & scheduling"),
    ("host_", "Host intelligence"),
    ("robots_", "Robots & politeness"),
    ("politeness_", "Robots & politeness"),
    ("fetch_", "Fetch & HTTP"),
    ("http_", "Fetch & HTTP"),
    ("dns_", "Fetch & HTTP"),
    ("dedup_", "Deduplication"),
    ("seen_", "Deduplication"),
    ("text_", "Text analysis & quality"),
    ("corpus_", "Corpus curation & training-data planning"),
    ("embeddings_", "Embeddings & ANN"),
    ("ann_", "Embeddings & ANN"),
    ("spans_", "Interleaved text+media spans"),
    ("media_", "Multimodal (image/audio/video)"),
    ("graph_", "Web-graph analytics"),
    ("events_", "Event analytics & experimentation"),
    ("stream_", "Structured Streaming"),
    ("warc_", "Archive & feed sources"),
    ("cdx_", "Archive & feed sources"),
    ("sitemap_", "Archive & feed sources"),
    ("feed_", "Archive & feed sources"),
    ("jsonl_", "Archive & feed sources"),
    ("leak_", "Leak-site extraction"),
    ("dispatch_", "Leak-site extraction"),
    ("snapshot_", "Table maintenance & engine health"),
    ("scan_", "Table maintenance & engine health"),
    ("shuffle_", "Table maintenance & engine health"),
    ("join_", "Table maintenance & engine health"),
    ("split_", "Corpus curation & training-data planning"),
    ("validity_", "Text analysis & quality"),
    ("pricing_", "Reference TPC-H parity"),
]


def family_of(name: str) -> str:
    for pref, fam in FAMILIES:
        if name.startswith(pref):
            return fam
    return "Other"


# The driver's CORRECTNESS harness samples the FIRST 50 keys each round.
# Bump this each round (round-4 verdict item #5) so successive rounds walk
# DIFFERENT registry rows through the driver's own artifact instead of
# re-checking the same 50 forever: each family's internal order is rotated
# by 3*round positions, so round r's prefix-50 shares < 25 keys with round
# r-1's while still touching every family (the interleave is unchanged).
REGISTRY_SAMPLE_ROUND = 5


def interleave_by_family(names: list[str],
                         rotation: int = 0) -> list[str]:
    """Round-robin the names across their families, preserving each
    family's internal order (rotated by ``3*rotation`` positions within
    each family — see REGISTRY_SAMPLE_ROUND). Deterministic: families
    cycle in order of first appearance in ``names``. With F families,
    every family is represented within the first F output positions — so
    the driver's 50-row prefix sample covers all of them (F = 19 < 50),
    and a different rotation surfaces different rows in that prefix."""
    order: list[str] = []
    buckets: dict[str, list[str]] = {}
    for n in names:
        fam = family_of(n)
        if fam not in buckets:
            buckets[fam] = []
            order.append(fam)
        buckets[fam].append(n)
    if rotation:
        for fam, b in buckets.items():
            off = (rotation * 3) % len(b)
            buckets[fam] = b[off:] + b[:off]
    out: list[str] = []
    idx = {fam: 0 for fam in order}
    while len(out) < len(names):
        for fam in order:
            i = idx[fam]
            if i < len(buckets[fam]):
                out.append(buckets[fam][i])
                idx[fam] = i + 1
    return out
