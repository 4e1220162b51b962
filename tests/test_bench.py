"""Tests for bench.py's tunnel-degradation defense and fixture selection.

Round-4 VERDICT item 1: `BENCH_r04.json` recorded a 385.51 ms wall number
against a 35.11 ms device time — a degraded axon-tunnel window published
as the round's headline. bench.py now detects this, retries, and flags
`degraded` in the JSON; these tests pin the detection predicate and the
interior-first fixture preference (round-4 VERDICT item 3).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def test_bench_degradation_detection():
    # The BENCH_r04 failure case: a 350 ms dispatch+fetch residual.
    assert bench.is_degraded_capture(385.51, 35.11)
    # Healthy captures (round-3 and round-5 readings).
    assert not bench.is_degraded_capture(96.63, 35.07)
    assert not bench.is_degraded_capture(106.61, 35.69)
    # Unreadable device time is unverifiable -> degraded.
    assert bench.is_degraded_capture(96.63, None)
    # Boundary: overhead at 2.5x the 60 ms tunnel norm.
    assert not bench.is_degraded_capture(35.0 + 149.9, 35.0)
    assert bench.is_degraded_capture(35.0 + 150.1, 35.0)


def test_bench_retry_budget_is_bounded():
    # A degraded window must retry (not publish silently) but also must
    # terminate: a handful of attempts with sleeps, not an open loop.
    assert 2 <= bench.MAX_TIMING_ATTEMPTS <= 10
    assert bench.RETRY_SLEEP_S * bench.MAX_TIMING_ATTEMPTS <= 600


def test_bench_fixture_prefers_interior_scene():
    # The product renders Replica interiors; the room fixture is the
    # headline content when present, the orbit fixture the fallback.
    names = [os.path.basename(p) for p in bench._FIXTURE_CANDIDATES]
    assert names == ["room_proposal.npz", "synth_proposal.npz"]
    assert bench.FIXTURE in bench._FIXTURE_CANDIDATES
