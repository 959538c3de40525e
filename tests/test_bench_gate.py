"""The bench regression gate (round-7 ask #7): bench.py must flag —
and exit non-zero on — any per-query best-run time beyond 2x its
pinned value (the best run, not the median: a one-off GC spike in a
long shared-JVM pass inflates the median without the operator being
slower), while new/unpinned queries and other-sf runs pass
through."""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE, check_regressions  # noqa: E402


@pytest.fixture()
def pin():
    return {"sf": 0.1, "threshold_x": 2.0, "medians": {"q_a": 1.0, "q_b": 0.5}}


def test_gate_flags_2x_regression(pin):
    # r14: the gate floors at pin + STALL_ALLOWANCE_SEC (2.0), so a
    # 1.0s-pin query flags past max(2x, 3.0s) — the burst band the
    # six-run r13/r14 evidence trail documents cannot flag, a real
    # blow-up still does.
    out = check_regressions({"q_a": 3.5, "q_b": 0.6}, 0.1, pin)
    assert set(out) == {"q_a"}
    assert out["q_a"]["ratio"] == 3.5


def test_gate_skips_other_sf_and_unpinned(pin):
    assert check_regressions({"q_a": 99.0}, 0.001, pin) == {}
    assert check_regressions({"q_new": 99.0}, 0.1, pin) == {}
    assert check_regressions({"q_a": 99.0}, 0.1, None) == {}


def test_gate_boundary_is_strict(pin):
    # the effective boundary for a 1.0s pin is max(2x, pin + 2.0s)
    # = 3.0s: exactly at the boundary passes, just over fails
    assert check_regressions({"q_a": 3.0}, 0.1, pin) == {}
    assert check_regressions({"q_a": 3.0001}, 0.1, pin) != {}


def test_committed_pin_covers_headline_set():
    """Every headline query that existed in the round-7 record has a
    pinned median; queries added later are allowed to be unpinned
    until their first official record lands."""
    with open(os.path.join(REPO, "BENCH_PINNED.json")) as f:
        pin = json.load(f)
    assert pin["sf"] == 0.1
    assert pin["threshold_x"] == 2.0
    pinned = set(pin["medians"])
    assert pinned <= set(HEADLINE)
    # the r1 anchor subset must always be pinned
    assert set(HEADLINE[:18]) <= pinned


def test_gate_uses_best_run_when_available(pin):
    """A one-off GC spike (median beyond 2x, best run within it) must
    NOT flag; a uniform slowdown (best run also beyond) must."""
    spiky = check_regressions({"q_a": 4.9}, 0.1, pin, best={"q_a": 1.0})
    assert spiky == {}
    real = check_regressions({"q_a": 4.9}, 0.1, pin, best={"q_a": 4.5})
    assert set(real) == {"q_a"}
    assert real["q_a"]["ratio"] == 4.5


@pytest.fixture()
def cal_pin():
    return {
        "sf": 0.1,
        "threshold_x": 2.0,
        "medians": {"q_a": 1.0},
        "calibration_sec": {"best": 0.2},
    }


def test_gate_scales_with_host_calibration(cal_pin):
    """r13: with calibration in both the pins and the run, the
    threshold scales by the host-mode ratio — a 2.3x reading on a
    2.5x-slower host passes; the same reading on a same-mode host
    flags."""
    slow_host = check_regressions(
        {"q_a": 4.3}, 0.1, cal_pin, best={"q_a": 4.3}, cal_best=0.5
    )
    assert slow_host == {}  # scaled gate 5.0 (2x * 2.5 cal ratio)
    same_host = check_regressions(
        {"q_a": 4.3}, 0.1, cal_pin, best={"q_a": 4.3}, cal_best=0.2
    )
    # same-mode host: gate = max(2x, pin + 2.0) = 3.0 — 4.3 flags
    assert set(same_host) == {"q_a"}


def test_gate_calibration_scaling_is_floored_and_capped(cal_pin):
    """A FAST host never shrinks the gate below threshold_x (floor
    at 1), and a slow host cannot scale it past CAL_SCALE_CAP —
    a genuine plan regression flags even in the worst host mode."""
    fast_host = check_regressions(
        {"q_a": 1.9}, 0.1, cal_pin, best={"q_a": 1.9}, cal_best=0.05
    )
    assert fast_host == {}  # 1.9 < 2.0: floor keeps the base gate
    # cal ratio 10x, capped at 3 -> effective gate 6x: 6.1 flags
    capped = check_regressions(
        {"q_a": 6.1}, 0.1, cal_pin, best={"q_a": 6.1}, cal_best=2.0
    )
    assert set(capped) == {"q_a"}
    under_cap = check_regressions(
        {"q_a": 5.9}, 0.1, cal_pin, best={"q_a": 5.9}, cal_best=2.0
    )
    assert under_cap == {}


def test_gate_unscaled_without_pin_calibration(pin):
    """Pins without a calibration snapshot keep the plain gate —
    the run's own calibration alone confers nothing."""
    out = check_regressions(
        {"q_a": 3.3}, 0.1, pin, best={"q_a": 3.3}, cal_best=0.9
    )
    assert set(out) == {"q_a"}  # past pin + 2.0s despite no scaling


def test_gate_slow_host_does_not_unbound_large_pins(cal_pin):
    """r14 (ADVICE r13 item 1): fixed-cost drift is additive, so a
    slow host must NOT multiply a multi-second pin's gate by the full
    calibration ratio.  pin 10s, pin_cal 0.2, cal_best 0.6 (scale 3):
    dominated slice = min(10, 10*0.2) = 2s, gate = 2*10 + 2*2*2 = 28s
    — a genuine 3x regression (30s) flags, where the r13 uniform
    scaling would have let anything under 60s pass."""
    cal_pin["medians"]["q_big"] = 10.0
    flagged = check_regressions(
        {"q_big": 30.0}, 0.1, cal_pin, best={"q_big": 30.0}, cal_best=0.6
    )
    assert set(flagged) == {"q_big"}
    within = check_regressions(
        {"q_big": 27.9}, 0.1, cal_pin, best={"q_big": 27.9}, cal_best=0.6
    )
    assert within == {}


def test_gate_dominated_band_keeps_full_scaling(cal_pin):
    """Pins inside the dominated band (<= CAL_DOMINATED_X * pin_cal)
    keep exactly the r13 multiplicative behavior: pin 1.0 with
    pin_cal 0.2 is fully dominated, so scale 2.5 -> gate 5.0."""
    ok = check_regressions(
        {"q_a": 4.9}, 0.1, cal_pin, best={"q_a": 4.9}, cal_best=0.5
    )
    assert ok == {}
    over = check_regressions(
        {"q_a": 5.1}, 0.1, cal_pin, best={"q_a": 5.1}, cal_best=0.5
    )
    assert set(over) == {"q_a"}


def test_gate_stall_allowance_floors_tiny_pins(cal_pin):
    """r14: per-session stall bursts add an absolute ~1-2s to random
    sub-second-pin names (six-run evidence trail in bench.py); the
    gate floors at pin + STALL_ALLOWANCE_SEC so a 0.3s-pin query
    cannot flag below 2.3s, while a genuine blow-up still does."""
    cal_pin["medians"]["q_tiny"] = 0.3
    burst = check_regressions(
        {"q_tiny": 2.2}, 0.1, cal_pin, best={"q_tiny": 2.2}, cal_best=0.2
    )
    assert burst == {}  # 7.3x pin but inside the absolute burst band
    real = check_regressions(
        {"q_tiny": 2.4}, 0.1, cal_pin, best={"q_tiny": 2.4}, cal_best=0.2
    )
    assert set(real) == {"q_tiny"}


def test_gate_stall_allowance_does_not_touch_large_pins(cal_pin):
    """For pins where 2x > pin + 2s the multiplicative gate dominates
    — the allowance changes nothing above ~2s pins."""
    cal_pin["medians"]["q_big"] = 5.0
    out = check_regressions(
        {"q_big": 10.1}, 0.1, cal_pin, best={"q_big": 10.1}, cal_best=0.2
    )
    assert set(out) == {"q_big"}  # 2.02x flags exactly as before
