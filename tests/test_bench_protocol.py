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


# ---- time-matched normalization (round 4) ---------------------------

def _level_hw(runs_sec, steal_pct, hw, cores):
    lv = _level(runs_sec, steal_pct, cores)
    lv["run_hw_rows_per_sec"] = list(hw)
    return lv


def _attempt_hw(lo, hi):
    return {f"local{bench.LO_CORES}": lo, f"local{bench.HI_CORES}": hi}


def test_time_matched_cancels_monotone_drift():
    # A machine whose per-core speed decays 20% while the lo level
    # runs (the measured r4 signature): raw efficiency is deflated,
    # but dividing each run by its concurrent machine rate recovers
    # the true engine efficiency exactly.
    rows = 1000
    true_eff = 0.9
    # machine capability (relative): lo window 1.0 -> 0.8, hi steady 0.8
    lo_caps = [1.0, 0.9, 0.8]
    hi_caps = [0.8, 0.8, 0.8]
    # engine rate scales with capability: lo_rate = k*cap, hi_rate =
    # 4*true_eff*k*cap (same k). Use hw probe = 100*cap rows/s.
    k = 50.0
    lo_runs = [round(rows / (k * c), 3) for c in lo_caps]
    hi_runs = [round(rows / (4 * true_eff * k * c), 3) for c in hi_caps]
    lo = _level_hw(lo_runs, [0, 0, 0], [100 * c for c in lo_caps],
                   bench.LO_CORES)
    # the probe at the hi level runs at 4x the processes, so the
    # machine's own 4x parallelism is inside the hi probe reading
    hi4 = _level_hw(hi_runs, [0, 0, 0], [400 * c for c in hi_caps],
                    bench.HI_CORES)
    out = bench._pooled_tm([_attempt_hw(lo, hi4)], rows)
    assert abs(out["efficiency_time_matched"] - true_eff) < 0.005
    # and the raw pooled efficiency IS deflated by the drift
    raw = bench._pooled_efficiency([_attempt_hw(lo, hi4)], rows)
    assert raw["efficiency"] < true_eff - 0.02


def test_time_matched_matches_raw_over_hw_in_quiet_window():
    rows = 1000
    lo = _level_hw([20.0, 20.0, 20.0], [0, 0, 0], [100, 100, 100],
                   bench.LO_CORES)
    hi = _level_hw([6.0, 6.0, 6.0], [0, 0, 0], [380, 380, 380],
                   bench.HI_CORES)
    out = bench._pooled_tm([_attempt_hw(lo, hi)], rows)
    raw = bench._pooled_efficiency([_attempt_hw(lo, hi)], rows)
    hw_eff = (380 / 100) / 4
    assert abs(out["efficiency_time_matched"]
               - raw["efficiency"] / hw_eff) < 0.005


def test_collapsed_probe_voids_tm_validity():
    lo_ok = _level_hw([20.0, 20.0], [0, 0], [100, 100], bench.LO_CORES)
    lo_bad = _level_hw([20.0, 20.0], [0, 0], [100, 40], bench.LO_CORES)
    assert bench._probes_consistent(lo_ok)
    assert not bench._probes_consistent(lo_bad)  # 40 < 0.55*100


def test_tm_norm_rates_filters_steal_like_raw_pool():
    rows = 1000
    lv = _level_hw([20.0, 20.0, 40.0], [0, 0, 20.0], [100, 100, 100],
                   bench.LO_CORES)
    rates = bench._tm_norm_rates(lv, rows)
    assert len(rates) == 2  # contaminated run excluded
    assert all(abs(r - (1000 / 20.0) / 100) < 1e-9 for r in rates)


def test_tm_absent_on_pre_r4_attempt_shape():
    a = _attempt([20.0, 20.0], [0, 0], [5.0, 5.0], [0, 0])
    assert bench._pooled_tm([a], 1000) is None
