"""Bench regression-gate unit tests — the transient screen (VERDICT r6).

The r6 driver run failed rc 2 on a single mid-sequence host stall
(revenue_by_nation 8.64s vs a clean 1.44s re-run, zero code change).
The gate now re-times any FAIL candidate once and keeps the min, so a
one-off transient cannot fail a round while a reproducing regression
still does. These tests drive the pure gate functions with injected
prior/probe data — no Spark session involved.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench


PRIOR = {
    "q_fast": 0.4,   # below MIN_PRIOR_SEC — never gated
    "q_small": 1.0,  # ratio can trip but delta stays under MIN_FAIL_DELTA_SEC
    "q_big": 5.0,
    "q_other": 6.0,
    "q_e": 2.0,
    "q_f": 3.0,
}


@pytest.fixture(autouse=True)
def _inject_prior(monkeypatch):
    monkeypatch.setattr(bench, "_prior_round_timings", lambda: dict(PRIOR))
    monkeypatch.setattr(bench, "_prior_probe_sec", lambda: 1.0)
    monkeypatch.setattr(bench, "_noted_regressions", lambda: set())


def _steady(**overrides):
    now = {k: v for k, v in PRIOR.items()}
    now.update(overrides)
    return now


def test_clean_round_no_candidates_no_failures():
    now = _steady()
    assert bench._fail_candidates(now, probe_sec=1.0) == []
    assert bench._regression_gate(now, probe_sec=1.0) == 0


def test_synthetic_stall_flagged_then_cleared_by_retime():
    # one query stalls 5x; the re-measure comes back clean -> min kept
    # -> the gate that produced r6's false rc 2 now passes
    now = _steady(q_big=25.0)
    flagged = bench._fail_candidates(now, probe_sec=1.0)
    assert flagged == ["q_big"]
    now["q_big"] = min(now["q_big"], 5.1)  # the clean re-time
    assert bench._fail_candidates(now, probe_sec=1.0) == []
    assert bench._regression_gate(now, probe_sec=1.0) == 0


def test_reproducing_regression_still_fails():
    now = _steady(q_big=25.0)
    assert bench._fail_candidates(now, probe_sec=1.0) == ["q_big"]
    now["q_big"] = min(now["q_big"], 24.8)  # the re-time reproduces
    assert bench._regression_gate(now, probe_sec=1.0) == 1


def test_small_delta_never_fails():
    # 2x ratio but only +1s absolute: codegen/scheduling jitter, not signal
    now = _steady(q_small=2.0)
    assert bench._fail_candidates(now, probe_sec=1.0) == []
    assert bench._regression_gate(now, probe_sec=1.0) == 0


def test_sub_second_prior_never_gated():
    now = _steady(q_fast=10.0)
    assert bench._fail_candidates(now, probe_sec=1.0) == []


def test_host_factor_absorbs_uniform_slowdown():
    # everything (and the probe) 1.6x slower: hardware, not engine
    now = {k: round(v * 1.6, 3) for k, v in PRIOR.items()}
    assert bench._fail_candidates(now, probe_sec=1.6) == []
    assert bench._regression_gate(now, probe_sec=1.6) == 0


def test_noted_regression_excluded(monkeypatch):
    monkeypatch.setattr(bench, "_noted_regressions", lambda: {"q_big"})
    now = _steady(q_big=25.0)
    assert bench._fail_candidates(now, probe_sec=1.0) == []
    assert bench._regression_gate(now, probe_sec=1.0) == 0


def test_host_snapshot_pinned_across_screen_and_gate(monkeypatch):
    """No-probe median fallback: retiming a transient shifts the
    median, so a gate recomputing the host factor post-retime could
    FAIL a query the screen never offered a re-measure. main() pins
    ONE pre-retime host snapshot for both stages — with it, the
    unscreened 2.0x query passes (it was inside the pre-retime host)
    and only the reproducing regression fails."""
    monkeypatch.setattr(bench, "_prior_probe_sec", lambda: None)
    monkeypatch.setattr(
        bench, "_prior_round_timings",
        lambda: {"q1": 5.0, "q2": 5.0, "q3": 5.0, "q4": 5.0, "q5": 5.0},
    )
    now = {"q1": 25.0, "q2": 16.0, "q3": 10.0, "q4": 5.0, "q5": 5.0}
    host = bench._host_factor(now, probe_sec=1.0, emit=False)
    assert host == 2.0  # median of [5, 3.2, 2, 1, 1]
    flagged = bench._fail_candidates(now, probe_sec=1.0, host=host)
    assert flagged == ["q1", "q2"]  # q3 is inside the pinned host
    now["q1"] = 5.0   # transient: clean on re-measure
    now["q2"] = 16.0  # genuine: reproduces
    # pinned host -> only q2 fails; the buggy recompute (host drops to
    # 1.0 post-retime) would also fail the never-screened q3
    assert bench._regression_gate(now, probe_sec=1.0, host=host) == 1
    assert bench._regression_gate(now, probe_sec=1.0) == 2  # the hazard, pinned
