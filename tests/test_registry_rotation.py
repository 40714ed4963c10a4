"""Registry-order rotation (VERDICT r3 item #3): the driver's
CORRECTNESS harness hash-checks only the FIRST 50 keys of
``__spark_entry__.queries()``, so the registry dict must lead with a
cross-section of every family, not whichever family was written first."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from genesis_spark.registry_families import (  # noqa: E402
    family_of,
    interleave_by_family,
)


def _registry():
    import __spark_entry__ as E
    return E.queries(), E.oracle_sql()


def test_first_50_keys_cover_every_family():
    qs, _ = _registry()
    all_fams = {family_of(n) for n in qs}
    first_50_fams = {family_of(n) for n in list(qs)[:50]}
    assert first_50_fams == all_fams, sorted(all_fams - first_50_fams)


def test_queries_and_oracles_share_keys_and_order():
    qs, os_ = _registry()
    # every query has an oracle, none were dropped by the reorder, and
    # both dicts iterate in the same order (driver zips them by key)
    assert list(qs) == list(os_)


def test_interleave_is_a_permutation():
    names = [f"url_{i}" for i in range(5)] + [f"events_{i}" for i in range(3)]
    out = interleave_by_family(names)
    assert sorted(out) == sorted(names)
    # round-robin: first two slots are one from each family
    assert {family_of(out[0]), family_of(out[1])} == {
        "URL normalization & hygiene",
        "Event analytics & experimentation"}
    # within-family order preserved
    assert [n for n in out if n.startswith("url_")] == names[:5]


def test_interleave_deterministic():
    qs, _ = _registry()
    names = list(qs)
    assert interleave_by_family(names) == interleave_by_family(names)
