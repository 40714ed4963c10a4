"""One-off refactoring tool: split the monolithic genesis_spark/queries.py
into a genesis_spark/queries/ package, one module per REGISTRY.md family
(round-3 verdict item 6). Statement routing is AST-driven:

  * ``def q_<name>``            -> family module of family_of(name)
  * ``ORACLE_X = ...``          -> family module of the query that maps to
                                   it in the ORACLES dict
  * every other body statement  -> _shared.py (original order preserved,
                                   so import-time evaluation is unchanged)
  * the tail (QUERIES/ORACLES dicts, interleave, flagship) -> __init__.py

Each statement's source segment spans from the previous statement's last
line + 1, so banners/comments ride with the statement they precede.
Cross-family references (3 known cases, asserted below) become explicit
relative imports. The generated package is written to OUT_DIR; the caller
validates (import + key-order identity + oracle replay) before swapping it
in place of queries.py.
"""

from __future__ import annotations

import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from genesis_spark.registry_families import family_of  # noqa: E402

SRC = "genesis_spark/queries.py"
OUT_DIR = "genesis_spark/queries_pkg_tmp"

FAM_SLUG = {
    "URL normalization & hygiene": "url_hygiene",
    "Frontier & scheduling": "frontier",
    "Host intelligence": "host_intel",
    "Robots & politeness": "robots",
    "Fetch & HTTP": "fetch_http",
    "Deduplication": "dedup",
    "Text analysis & quality": "text_quality",
    "Corpus curation & training-data planning": "corpus",
    "Embeddings & ANN": "embeddings_ann",
    "Interleaved text+media spans": "spans",
    "Multimodal (image/audio/video)": "multimodal",
    "Web-graph analytics": "webgraph",
    "Event analytics & experimentation": "events",
    "Structured Streaming": "streaming",
    "Archive & feed sources": "archives",
    "Leak-site extraction": "leaks",
    "Table maintenance & engine health": "maintenance",
    "Reference TPC-H parity": "tpch",
    "Other": "misc",
}

# helpers that must live with a family module because they reference that
# family's ORACLE constants at call time through their own module globals
HELPER_OVERRIDES = {"_ivf_nprobe_sweep_oracle": "embeddings_ann"}

# module -> list of "from .mod import name, ..." lines for the 3 known
# cross-family references
CROSS_IMPORTS = {
    "corpus": ["from .text_quality import ORACLE_TEXT_HASHED_LR, "
               "q_text_hashed_lr"],
    "streaming": ["from .events import ORACLE_EVENTS_CDC_APPLY"],
}


def main() -> None:
    src = open(SRC).read()
    lines = src.split("\n")
    tree = ast.parse(src)
    stmts = list(tree.body)
    # tail starts at the QUERIES dict literal
    tail_i = next(i for i, s in enumerate(stmts)
                  if isinstance(s, ast.Assign)
                  and getattr(s.targets[0], "id", "") == "QUERIES")
    body, tail = stmts[:tail_i], stmts[tail_i:]

    # ORACLE const -> query name (from the first ORACLES dict literal)
    od = next(s for s in tail if isinstance(s, ast.Assign)
              and getattr(s.targets[0], "id", "") == "ORACLES")
    const2q = {v.id: k.value for k, v in zip(od.value.keys, od.value.values)
               if isinstance(v, ast.Name)}

    def segment(prev_end: int, s: ast.stmt) -> tuple[str, int]:
        start, end = prev_end + 1, s.end_lineno
        return "\n".join(lines[start - 1:end]), end

    buckets: dict[str, list[str]] = {slug: [] for slug in FAM_SLUG.values()}
    shared: list[str] = []
    prev_end = 0
    for s in body:
        seg, prev_end = segment(prev_end, s)
        name = (s.name if isinstance(s, ast.FunctionDef)
                else getattr(getattr(s, "targets", [None])[0], "id", None)
                if isinstance(s, ast.Assign) else None)
        if isinstance(s, ast.FunctionDef) and s.name.startswith("q_"):
            buckets[FAM_SLUG[family_of(s.name[2:])]].append(seg)
        elif name in const2q:
            buckets[FAM_SLUG[family_of(const2q[name])]].append(seg)
        elif name in HELPER_OVERRIDES:
            buckets[HELPER_OVERRIDES[name]].append(seg)
        else:
            shared.append(seg)
    tail_src = "\n".join(lines[prev_end:])

    os.makedirs(OUT_DIR, exist_ok=True)

    with open(f"{OUT_DIR}/_shared.py", "w") as f:
        f.write("\n".join(shared))
        f.write(
            "\n\n\n# star-export EVERYTHING (incl. underscore helpers and"
            "\n# module aliases like F/U/D) so family modules see the same"
            "\n# namespace the monolith's functions saw\n"
            "__all__ = [n for n in dict(globals())\n"
            "           if not (n.startswith('__') and n.endswith('__'))]\n")

    mod_order = list(FAM_SLUG.values())
    # text before corpus, events before streaming (cross-imports)
    assert mod_order.index("text_quality") < mod_order.index("corpus")
    assert mod_order.index("events") < mod_order.index("streaming")

    for slug in mod_order:
        segs = buckets[slug]
        title = next(t for t, sl in FAM_SLUG.items() if sl == slug)
        hdr = [f'"""Registry family: {title} (split from the monolithic '
               f'queries.py)."""',
               "", "from __future__ import annotations", "",
               "from genesis_spark.queries._shared import *  # noqa: F401,F403"]
        hdr += CROSS_IMPORTS.get(slug, [])
        with open(f"{OUT_DIR}/{slug}.py", "w") as f:
            f.write("\n".join(hdr) + "\n\n" + "\n".join(segs) + "\n")

    with open(f"{OUT_DIR}/__init__.py", "w") as f:
        f.write('"""Driver-contract query registry (package form): every\n'
                "SQL-expressible operator from SURVEY.md §2 plus the\n"
                "training-data pipeline operators, one module per\n"
                "REGISTRY.md family, assembled here into the QUERIES /\n"
                "ORACLES dicts the driver consumes. Conventions (aliasing,\n"
                "rounding, determinism) are documented in _shared.py.\n"
                '"""\n\n')
        f.write("from genesis_spark.queries._shared import *  # noqa\n")
        for slug in mod_order:
            f.write(f"from genesis_spark.queries.{slug} import *  # noqa\n")
        f.write("\n" + tail_src)

    sizes = {slug: sum(seg.count("\n") + 2 for seg in buckets[slug])
             for slug in mod_order}
    print("shared:", sum(s.count("\n") + 2 for s in shared))
    for slug, n in sorted(sizes.items(), key=lambda kv: -kv[1]):
        print(f"{n:7d}  {slug}")
        assert n < 8000, f"{slug} exceeds the 8k-line bar"


if __name__ == "__main__":
    main()
