"""Unit tests for bench.py's scaling-evidence protocol helpers — the
pure arithmetic the judge-facing artifact depends on (steal-clean run
selection, pooled-median efficiency, never-max selection). No Spark.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def _level(runs_sec, steal_pct, cores):
    import statistics

    clean = [t for t, s in zip(runs_sec, steal_pct) if s <= bench.STEAL_CLEAN_PCT]
    basis = clean if len(clean) >= bench.MIN_CLEAN_RUNS else list(runs_sec)
    med = statistics.median(basis)
    return {
        "sec": round(med, 3),
        "all_runs_sec": list(runs_sec),
        "run_steal_pct": list(steal_pct),
        "clean_runs": len(clean),
        "steal_contaminated": len(clean) < bench.MIN_CLEAN_RUNS,
        "turns_per_sec": round(1000.0 / med, 1),
        "cores": cores,
    }


def _attempt(lo_runs, lo_steal, hi_runs, hi_steal):
    return {
        f"local{bench.LO_CORES}": _level(lo_runs, lo_steal, bench.LO_CORES),
        f"local{bench.HI_CORES}": _level(hi_runs, hi_steal, bench.HI_CORES),
    }


def test_pooled_efficiency_uses_only_steal_clean_runs():
    # lo has one contaminated run that is SLOWER; if it leaked into the
    # pool it would inflate lo_median and therefore the efficiency.
    a = _attempt([20.0, 20.0, 40.0], [1.0, 2.0, 20.0],
                 [5.0, 5.0, 5.0], [0.0, 0.0, 0.0])
    out = bench._pooled_efficiency([a], rows=1000)
    assert out["lo_median_sec"] == 20.0  # 40s run excluded
    assert out["efficiency"] == round((20.0 / 5.0) / 4, 3)
    assert out["n_clean_runs_pooled"] == {"lo": 2, "hi": 3}


def test_pooled_efficiency_is_median_not_max_across_attempts():
    # two attempts with different efficiencies: the pool must combine
    # their runs (median), never pick the better attempt.
    a1 = _attempt([20.0, 20.0, 20.0], [0, 0, 0], [6.0, 6.0, 6.0], [0, 0, 0])
    a2 = _attempt([24.0, 24.0, 24.0], [0, 0, 0], [5.0, 5.0, 5.0], [0, 0, 0])
    out = bench._pooled_efficiency([a1, a2], rows=1000)
    assert out["lo_median_sec"] == 22.0  # median of pooled [20x3, 24x3]
    assert out["hi_median_sec"] == 5.5
    e1 = (20.0 / 6.0) / 4
    e2 = (24.0 / 5.0) / 4
    assert min(e1, e2) < out["efficiency"] < max(e1, e2)


def test_pooled_efficiency_falls_back_to_all_runs_when_nothing_clean():
    a = _attempt([20.0, 22.0, 21.0], [9, 9, 9], [5.0, 5.0, 5.0], [0, 0, 0])
    out = bench._pooled_efficiency([a], rows=1000)
    assert out["lo_median_sec"] == 21.0  # all-runs fallback


def test_sane_hw_band_brackets_observed_probe_noise():
    # quiet-state probe readings observed while building the protocol
    observed = [0.989, 0.914, 0.934, 0.866, 0.871, 1.017, 0.87,
                0.902, 0.936, 0.967, 0.822, 0.945, 0.917, 0.798]
    lo, hi = bench.SANE_HW
    assert all(lo <= x <= hi for x in observed)
    # and the gross-window readings it exists to catch stay OUTSIDE
    for pathological in (3.765, 0.5):
        assert not (lo <= pathological <= hi)


def test_prev_round_loader_parses_driver_wrapper(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": {"queries": {"q": 1.5}}})
    )
    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"queries": {"q": 2.0}})  # bare shape, higher round
    )
    name, prev = bench._load_prev_queries()
    assert name == "r03"
    assert prev == {"q": 2.0}


def test_prev_round_loader_handles_missing_artifacts(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    assert bench._load_prev_queries() == ("", {})
