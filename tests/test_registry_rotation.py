"""Registry sample-window rotation (round-4 verdict item #5): the
driver's CORRECTNESS harness checks the first 50 registry keys each
round, so the interleave rotates per round — different rows get
driver-checked while family coverage and key sets stay invariant."""

from __future__ import annotations

from genesis_spark.registry_families import (REGISTRY_SAMPLE_ROUND,
                                             family_of,
                                             interleave_by_family)


def _names(n_per_family=30):
    prefs = ["url_", "frontier_", "dedup_", "text_", "corpus_",
             "media_", "events_", "stream_", "warc_", "leak_"]
    return [f"{p}q{i}" for i in range(n_per_family) for p in prefs]


def test_rotation_preserves_key_set_and_family_coverage():
    names = _names()
    base = interleave_by_family(names)
    rot = interleave_by_family(names, rotation=REGISTRY_SAMPLE_ROUND)
    assert sorted(base) == sorted(rot) == sorted(names)
    fams = {family_of(n) for n in names}
    assert {family_of(n) for n in rot[:len(fams)]} == fams


def test_rotation_moves_the_prefix_window():
    names = _names()
    base50 = set(interleave_by_family(names)[:50])
    rot50 = set(interleave_by_family(
        names, rotation=REGISTRY_SAMPLE_ROUND)[:50])
    # the verdict's done-criterion: successive samples share < 25 keys
    assert len(base50 & rot50) < 25


def test_live_registry_rotated_and_aligned():
    import __spark_entry__ as E
    qs = list(E.queries())
    os_ = list(E.oracle_sql())
    assert len(qs) == len(set(qs))
    # oracle dict preserves the rotated order for its keys
    assert [k for k in qs if k in set(os_)] == os_
    fams = {family_of(k) for k in qs}
    assert {family_of(k) for k in qs[:50]} == fams
