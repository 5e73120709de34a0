"""Unit tests for bench.py's canary-normalized regression flags and the
loaded-rerun detail-file guard (VERDICT r5 tasks 2 and 7). Pure logic —
no Spark session."""

from __future__ import annotations

import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    LOADED_CANARY_RATIO,
    REGRESSION_RATIO,
    _detail_path_guarding_idle_record,
    _normalized_regressions,
)


def test_loaded_run_stops_flagging_false_regressions():
    """A uniformly 1.7x-slower machine-moment (canary 0.54s vs 0.32s)
    must not flag queries whose only slowdown IS that drift."""
    prev = {"q1": 1.0, "q2": 2.0}
    now = {"q1": 1.7, "q2": 3.4}  # raw ratio 1.7 > 1.5 — pre-fix these flagged
    out = io.StringIO()
    flags = _normalized_regressions(now, prev, 0.544, 0.320, out=out)
    assert flags == {}
    assert "canary-normalized" in out.getvalue()


def test_real_regression_still_flags_under_load():
    """A genuine 3x code regression stays visible through 1.7x drift:
    normalized ratio 3.0/1.7 = 1.76 > 1.5."""
    flags = _normalized_regressions(
        {"q1": 3.0}, {"q1": 1.0}, 0.544, 0.320, out=io.StringIO()
    )
    assert flags == {"q1": round(3.0 / (0.544 / 0.320), 2)}


def test_missing_canary_falls_back_to_raw_ratio():
    """Rounds before canary_sec existed: no normalization, old behavior."""
    flags = _normalized_regressions(
        {"q1": 1.7}, {"q1": 1.0}, 0.544, None, out=io.StringIO()
    )
    assert flags == {"q1": 1.7}
    flags = _normalized_regressions(
        {"q1": 1.7}, {"q1": 1.0}, None, 0.320, out=io.StringIO()
    )
    assert flags == {"q1": 1.7}


def test_fast_canary_moment_cannot_manufacture_flags():
    """The round-6 false-flag mode (VERDICT r6 task 2): canary ratio < 1
    (this machine-moment FASTER than baseline) used to scale unchanged
    wall times past the threshold — scheduling-bound sub-second queries
    do not speed up with the machine, so an unchanged 1.0x raw is NOT a
    regression. The dual gate requires raw > 1.5 too."""
    flags = _normalized_regressions(
        {"q1": 1.0}, {"q1": 1.0}, 0.160, 0.320, out=io.StringIO()
    )
    assert flags == {}
    assert REGRESSION_RATIO < 2.0


def test_r6_scenario_zero_false_flags_real_slowdown_still_flags():
    """Replay of the recorded round-6 run (canary_ratio 0.681, worst RAW
    common-query ratio 1.31x on sub-second queries): the 12 entries it
    wrote to `regressions` must all vanish, while a genuine 2x slowdown
    in the same run still flags (raw 2.0 > 1.5, norm 2.0/0.681 > 1.5)."""
    canary_prev, canary_now = 1.000, 0.681  # ratio 0.681: fast moment
    prev = {
        "events_session_window": 0.37,
        "record_linkage_blocking": 0.52,
        "skew_profile_report": 0.61,
        "sprt_sequential_monitor": 0.37,
        "real_regression": 1.00,
    }
    now = {
        # raw 1.0-1.31x — the r6 false-flag band
        "events_session_window": 0.37 * 1.22,
        "record_linkage_blocking": 0.52 * 1.31,
        "skew_profile_report": 0.61 * 1.25,
        "sprt_sequential_monitor": 0.37 * 1.30,
        # a genuine 2x code regression
        "real_regression": 2.00,
    }
    flags = _normalized_regressions(
        now, prev, canary_now, canary_prev, out=io.StringIO()
    )
    assert flags == {"real_regression": round(2.0 / 0.681, 2)}


def test_slow_canary_moment_still_masks_drift_only_inflation():
    """Injected canary 1.5 (machine 1.5x slower): drift-only raw 1.5-1.7x
    stays unflagged (norm ~1.0-1.13), a genuine 3x still flags."""
    flags = _normalized_regressions(
        {"drift_only": 1.7, "real": 3.0},
        {"drift_only": 1.0, "real": 1.0},
        0.480,
        0.320,
        out=io.StringIO(),
    )
    assert flags == {"real": 2.0}


def test_new_and_unchanged_queries_not_flagged():
    flags = _normalized_regressions(
        {"q_new": 5.0, "q_same": 1.0},
        {"q_same": 1.0},
        0.32,
        0.32,
        out=io.StringIO(),
    )
    assert flags == {}


def test_detail_guard_redirects_loaded_rerun(tmp_path):
    p = tmp_path / "BENCH_DETAIL_r06.json"
    p.write_text(json.dumps({"canary_sec": 0.320, "queries": {}}))
    # 1.7x canary: redirect to the _loaded sibling
    got = _detail_path_guarding_idle_record(str(p), 0.544)
    assert got == str(tmp_path / "BENCH_DETAIL_r06_loaded.json")
    # inside the 1.2x band: overwrite in place (normal rerun)
    assert _detail_path_guarding_idle_record(str(p), 0.350) == str(p)
    # no prior file: normal write
    fresh = str(tmp_path / "BENCH_DETAIL_r07.json")
    assert _detail_path_guarding_idle_record(fresh, 0.544) == fresh
    # prior file without a canary (pre-canary rounds): overwrite
    p.write_text(json.dumps({"queries": {}}))
    assert _detail_path_guarding_idle_record(str(p), 0.544) == str(p)
    assert LOADED_CANARY_RATIO == 1.2


def test_retry_flagged_keeps_min_and_respects_budget():
    from bench import _retry_flagged

    timings = {"a": 2.0, "b": 3.0, "c": 4.0}
    calls = []

    def time_one(name):
        calls.append(name)
        return {"a": 0.9, "b": 5.0, "c": 1.0}[name]

    _retry_flagged({"a": 2.1, "b": 1.9}, timings, time_one, budget=24)
    # retried queries keep the MIN of old and new; unflagged untouched
    assert timings == {"a": 0.9, "b": 3.0, "c": 4.0}
    assert calls == ["a", "b"]


def test_retry_flagged_budget_bounds_work():
    from bench import _retry_flagged

    flagged = {f"q{i}": 2.0 for i in range(40)}
    timings = {f"q{i}": 2.0 for i in range(40)}
    calls = []
    _retry_flagged(flagged, timings, lambda n: calls.append(n) or 1.0, budget=24)
    assert len(calls) == 24


def test_run_median_guard_on_r8_driver_fixture():
    """VERDICT r8 task 4, tested on the REAL offending record: the
    driver's loaded BENCH_DETAIL_r08 run carried 38 flags at a uniform
    ~1.5x (median 1.47 over 141 common queries) vs the r7 detail — pure
    machine variance. The run-median raw-threshold scale must collapse
    that to <= 2 residual flags (the two known scheduler-noise
    sub-second queries) while leaving the recorded ratios intact."""
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(base, "BENCH_DETAIL_r08.json")) as f:
        d8 = json.load(f)
    with open(os.path.join(base, "BENCH_DETAIL_r07.json")) as f:
        d7 = json.load(f)
    assert len(d8["regressions"]) >= 30  # the pre-fix false-flag storm
    flags = _normalized_regressions(
        d8["queries"],
        d7["queries"],
        d8["canary_sec"],
        d7.get("canary_sec"),
        out=io.StringIO(),
    )
    assert len(flags) <= 2, flags


def test_run_median_guard_inactive_on_small_overlap():
    """Below _MEDIAN_MIN_COMMON common queries the median guard stays
    out of the way: a lone genuine 3x regression still flags even
    though it IS the run median."""
    from bench import _run_median_scale

    assert _run_median_scale([3.0]) == 1.0
    flags = _normalized_regressions(
        {"q1": 3.0}, {"q1": 1.0}, None, None, out=io.StringIO()
    )
    assert flags == {"q1": 3.0}


def test_run_median_floor_at_one():
    """A uniformly FAST run (median < 1) must not tighten the raw gate
    below REGRESSION_RATIO — the fast-canary lesson from r6 applies to
    the median too."""
    from bench import _MEDIAN_MIN_COMMON, _run_median_scale

    assert _run_median_scale([0.7] * _MEDIAN_MIN_COMMON) == 1.0
