"""The bench scaling protocol's clean-session gate (VERDICT r2 #1): the
driver artifact must not record a throttled pair as clean again."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from bench import session_clean  # noqa: E402


def test_clean_probes_stable_runs_pass():
    assert session_clean(1.0, 0.95, [52.1, 53.0, 51.8])


def test_round2_decay_signature_rejected():
    # the exact BENCH_r02 failure: probes passed, runs decayed 110 -> 64
    assert not session_clean(1.035, 0.892, [110.02, 97.79, 79.18, 63.83])


def test_throttled_probe_rejected():
    assert not session_clean(0.66, 1.0, [52.0, 52.0])
    assert not session_clean(1.0, 0.66, [52.0, 52.0])


def test_mild_decay_within_noise_passes():
    # monotone but < 20% first-to-last is normal warm-in, not throttle
    assert session_clean(0.95, 0.95, [58.0, 55.0, 52.0])


def test_non_monotone_spread_passes():
    # a single slow outlier is not the decay signature; min is still valid
    assert session_clean(0.95, 0.95, [80.0, 52.0, 53.0])


def test_first_run_warmup_exempt_from_decay():
    # observed round-3 shape: first timed run carries residual warmup;
    # the settled tail (19.79 -> 17.77, ratio 1.11) is clean
    assert session_clean(0.95, 0.95, [36.96, 19.79, 17.77])


def test_throttle_ending_mid_session_still_rejected():
    # decay persists ACROSS the tail -> still the throttle signature,
    # even with the first-run exemption (r2: 98 -> 79 -> 64 = 1.53x)
    assert not session_clean(0.95, 0.95, [110.02, 97.79, 79.18, 63.83])
    assert not session_clean(0.95, 0.95, [73.46, 21.87, 16.51])


def test_headline_names_resolve_and_have_oracles():
    """Every bench HEADLINE entry must exist in the query registry (a typo
    would crash the driver's per-round bench), and every registry query
    must have an oracle — the driver contract."""
    import bench
    from genesis_spark import queries as Q
    missing = [n for n in bench.HEADLINE if n not in Q.QUERIES]
    assert not missing, missing
    no_oracle = sorted(set(Q.QUERIES) - set(Q.ORACLES))
    assert not no_oracle, no_oracle
