"""The replay vacuity gate (VERDICT r3 finding #1): a registry row whose
Spark AND oracle results are both empty "matches" trivially — 0 rows vs
0 rows hash-compares green while proving nothing about the operator.
`tools/check_oracle.py` must therefore FAIL any 0-row result unless the
name is explicitly allowlisted (and the allowlist must stay empty unless
a row has a documented reason to be empty at some SF)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.check_oracle import ALLOW_EMPTY, vacuous  # noqa: E402


def test_empty_result_is_vacuous():
    # the synthetic empty row the gate exists to reject
    assert vacuous("graph_bipartite_projection", 0)
    assert vacuous("anything_else", 0)


def test_nonempty_result_is_not_vacuous():
    assert not vacuous("graph_bipartite_projection", 780)
    assert not vacuous("x", 1)


def test_allowlist_is_empty():
    # every registry row currently must emit output at every replay SF;
    # adding a name here requires a documented reason in check_oracle.py
    assert ALLOW_EMPTY == set()


def test_allowlisted_name_would_pass():
    # the allowlist mechanism itself works (so a future legitimately-empty
    # row can opt out without weakening the gate for everyone else)
    try:
        ALLOW_EMPTY.add("_synthetic_allowed")
        assert not vacuous("_synthetic_allowed", 0)
    finally:
        ALLOW_EMPTY.discard("_synthetic_allowed")
