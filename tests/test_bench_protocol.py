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


# ---- final-line budget (round 5: driver tail capture is 2000 chars) --

def _worst_case_compact():
    """A compact dict at least as large as any real round produces:
    80 long-named queries, a full extract block, regressions, and
    maximal warnings."""
    queries = {
        f"winnow_containment_documents_variant_{i:02d}": round(
            0.11 * (i + 1), 3
        )
        for i in range(80)
    }
    return {
        "sf": 0.1,
        "unit": "sec",
        "extract": {
            "rows": 3400000,
            "cores": {"lo": 4, "hi": 16},
            "scaling_efficiency": 0.865,
            "window_valid": False,
            "normalized_efficiency": None,
            "scaling_efficiency_time_matched": 0.979,
            "tm_valid": True,
            "lo_turns_per_sec": 31092.8,
            "hi_turns_per_sec": 107549.6,
            "skew": {
                "salt1_spread": 19.68,
                "salt8_spread": 4.77,
                "salt1_task_ms_max": 6593,
                "salt8_task_ms_max": 1399,
            },
        },
        "metric": "headline_queries_total",
        "queries": queries,
        "value": 123.456,
        "headline_rounds": 3,
        "query_regressions": {
            "vs": "r04",
            **{
                f"winnow_containment_documents_variant_{i:02d}": {
                    "r04_sec": 1.0,
                    "median_sec": 2.0,
                    "min_sec": 1.9,
                }
                for i in range(10)
            },
        },
        "warnings": [
            "second scaling attempt skipped: budget projection (210s "
            "elapsed + ~140s retry would starve the skew/headline "
            "reserve)",
            "no window-valid scaling attempt: headline pooled over all "
            "attempts; treat as measurement failure, not an engine "
            "number",
            "coverage tier truncated at 12 queries: driver-kill guard",
        ],
        "detail_file": "BENCH_DETAIL_r05.json",
    }


def test_fit_line_worst_case_fits_driver_tail_capture():
    compact = _worst_case_compact()
    line = bench._fit_line(compact)
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)
    # the never-shed core survives
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["value"] == 123.456
    assert parsed["extract"]["scaling_efficiency"] == 0.865
    assert parsed["extract"]["tm_valid"] is True
    assert parsed["extract"]["skew"]["salt8_spread"] == 4.77
    assert parsed["detail_file"] == "BENCH_DETAIL_r05.json"


def test_fit_line_sheds_fastest_queries_first():
    compact = _worst_case_compact()
    line = bench._fit_line(compact)
    parsed = json.loads(line)
    q = parsed.get("queries", {})
    if q:
        # survivors must be the SLOWEST ones
        kept = min(q.values())
        assert kept >= 0.11 * (parsed["queries_omitted"])


def test_fit_line_small_compact_untouched():
    compact = {"metric": "m", "value": 1.0, "queries": {"a": 1.0}}
    line = bench._fit_line(compact)
    assert json.loads(line) == {
        "metric": "m", "value": 1.0, "queries": {"a": 1.0}
    }


def test_fit_line_real_r05_shape_keeps_most_queries():
    # the REAL round shape (the actual HEADLINE list, one warning):
    # must fit the budget while keeping (nearly) all per-query medians
    # — shedding a few fastest entries is fine, losing the dict is not
    compact = _worst_case_compact()
    compact["queries"] = {n: 12.345 for n in bench.HEADLINE}
    compact.pop("query_regressions")
    compact["warnings"] = compact["warnings"][:1]
    line = bench._fit_line(compact)
    assert len(line) <= bench.LINE_BUDGET
    kept = json.loads(line).get("queries", {})
    assert len(kept) >= len(bench.HEADLINE) - 6


# ---- regression min-guard (round 5) ----------------------------------

def test_regression_needs_median_and_min():
    prev = {"q_noise": 2.6, "q_real": 1.0, "q_fine": 1.0}
    qtimes = {"q_noise": 7.0, "q_real": 2.0, "q_fine": 1.1}
    qmins = {"q_noise": 1.7, "q_real": 1.8, "q_fine": 1.0}
    out = bench._flag_regressions(qtimes, qmins, prev, "r04")
    # q_noise: median regressed 2.7x but min is FASTER -> not flagged
    # (the exact r4 minhash_lsh_candidates false positive)
    assert "q_noise" not in out
    # q_real: both median (2x) and min (1.8x) regressed -> flagged
    assert out["q_real"] == {
        "r04_sec": 1.0, "median_sec": 2.0, "min_sec": 1.8
    }
    assert "q_fine" not in out


def test_prev_round_loader_falls_back_to_detail_file(tmp_path, monkeypatch):
    # r4's driver line was tail-clipped (parsed null) but its committed
    # DETAIL side file has the medians — the loader must use them
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    (tmp_path / "BENCH_r04.json").write_text(json.dumps({"parsed": None}))
    (tmp_path / "BENCH_DETAIL_r04.json").write_text(
        json.dumps({"query_spread": {"q": {"runs": [2.0, 1.0, 3.0]}}})
    )
    name, prev = bench._load_prev_queries()
    assert name == "r04"
    assert prev == {"q": 2.0}


def test_prev_round_loader_prefers_queries_median_key(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    (tmp_path / "BENCH_r05.json").write_text(json.dumps({"parsed": None}))
    (tmp_path / "BENCH_DETAIL_r05.json").write_text(
        json.dumps({"queries_median": {"q": 1.25},
                    "query_spread": {"q": {"runs": [9.0]}}})
    )
    assert bench._load_prev_queries() == ("r05", {"q": 1.25})


# ------------------------------------------------- A-B-A level schedule


def _arm(runs_sec, steal_pct, hw, cores, rows=1000.0):
    import statistics

    clean = [t for t, s in zip(runs_sec, steal_pct) if s <= bench.STEAL_CLEAN_PCT]
    basis = clean if len(clean) >= bench.MIN_CLEAN_RUNS else list(runs_sec)
    med = statistics.median(basis)
    return {
        "sec": round(med, 3),
        "best_sec": round(min(runs_sec), 3),
        "all_runs_sec": list(runs_sec),
        "run_steal_pct": list(steal_pct),
        "run_hw_rows_per_sec": list(hw),
        "clean_runs": len(clean),
        "steal_contaminated": len(clean) < bench.MIN_CLEAN_RUNS,
        "turns_per_sec": round(rows / med, 1),
        "best_turns_per_sec": round(rows / min(runs_sec), 1),
        "cores": cores,
    }


def test_merge_levels_recomputes_union_median_and_clean_flag():
    # arm A: one clean + one steal-dirty run; arm B: one clean run.
    a = _arm([10.0, 30.0], [0.5, 9.9], [100.0, 100.0], 4)
    b = _arm([12.0], [0.4], [110.0], 4)
    m = bench._merge_levels(a, b, rows=1000.0)
    # union clean basis = [10.0, 12.0] -> median 11.0; dirty run kept
    # in the lists but out of the basis
    assert m["all_runs_sec"] == [10.0, 30.0, 12.0]
    assert m["clean_runs"] == 2
    assert m["steal_contaminated"] is False
    assert m["sec"] == 11.0
    assert m["turns_per_sec"] == round(1000.0 / 11.0, 1)
    assert m["best_sec"] == 10.0
    assert m["run_hw_rows_per_sec"] == [100, 100, 110]
    assert m["cores"] == 4


def test_merge_levels_contaminated_union_falls_back_to_all_runs():
    a = _arm([10.0], [9.9], [100.0], 4)
    b = _arm([20.0], [9.8], [100.0], 4)
    m = bench._merge_levels(a, b, rows=1000.0)
    assert m["steal_contaminated"] is True
    assert m["sec"] == 15.0  # median over ALL runs when nothing clean


def test_aba_schedule_cancels_linear_drift_where_sequential_does_not():
    """Property: under a linear machine-RATE drift, the
    mirror-symmetric lo×2 → hi×3 → lo×2 schedule's raw efficiency
    (median over the merged lo runs vs median over hi runs) stays
    within 0.5% of truth, while the sequential lo-block → hi-block
    schedule is biased an order of magnitude further. Continuous-time
    simulation: each run's duration solves ∫ rate(t) dt = work, so
    later runs really are shorter AND shift every subsequent start."""
    import statistics

    work_lo, work_hi = 24.0, 7.5   # seconds of work at rate 1.0
    slope = 0.002                  # rate(t) = 1 + slope * t  (per sec)

    def simulate(schedule):
        # duration d from ∫_T^{T+d} (1 + s·t) dt = W:
        #   d = (sqrt((1+s·T)^2 + 2·s·W) - (1+s·T)) / s
        t, out = 0.0, {"lo": [], "hi": []}
        for which in schedule:
            w = work_lo if which == "lo" else work_hi
            a = 1.0 + slope * t
            d = ((a * a + 2 * slope * w) ** 0.5 - a) / slope
            out[which].append(d)
            t += d
        return out

    def eff(r):
        return (statistics.median(r["lo"]) / statistics.median(r["hi"])) / (
            work_lo / work_hi
        )

    err_seq = abs(eff(simulate(["lo"] * 3 + ["hi"] * 3)) - 1.0)
    err_aba = abs(
        eff(simulate(["lo", "lo", "hi", "hi", "hi", "lo", "lo"])) - 1.0
    )
    assert err_aba < 0.005, err_aba
    assert err_seq > 10.0 * err_aba, (err_seq, err_aba)


def _mkattempt_for_spread(lo_runs, lo_hw, hi_runs, hi_hw):
    lo = _level_hw(lo_runs, [0.0] * len(lo_runs), lo_hw, bench.LO_CORES)
    hi = _level_hw(hi_runs, [0.0] * len(hi_runs), hi_hw, bench.HI_CORES)
    return lo, hi


def test_spread_gate_forgives_probe_tracked_drift():
    """A 25% cross-arm clock drift that the per-run probes track must
    NOT void the window (the A-B-A mirror cancels it), but the same
    timing spread WITHOUT probe corroboration — residual contamination
    — still must. Exercises _scaling_attempt's normalized _clean via
    the same arithmetic (kept in sync by the assertions on
    MAX_RUN_SPREAD)."""
    import statistics

    def norm_spread(runs_sec, hw):
        med_hw = statistics.median(hw)
        normed = [t * (h / med_hw) for t, h in zip(runs_sec, hw)]
        return statistics.median(normed) / min(normed)

    # lo arms: 24 s at machine rate 100, then 16 s at rate 150
    # (machine sped up 50%; work units 2400 == 2400 -> spread 1.0)
    drift_tracked = norm_spread([24.0, 24.0, 16.0, 16.0],
                                [100, 100, 150, 150])
    assert drift_tracked <= bench.MAX_RUN_SPREAD
    # an arm slowed 50% with NO probe corroboration: residual
    # contamination, must still trip (median over 4 = mean of the
    # middle two = 30 over min 24 = 1.25 > 1.2)
    contaminated = norm_spread([24.0, 24.0, 36.0, 36.0],
                               [100, 100, 100, 100])
    assert contaminated > bench.MAX_RUN_SPREAD


def test_coverage_cost_hints_merge_and_unknown_first(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    (tmp_path / "BENCH_DETAIL_r04.json").write_text(json.dumps(
        {"coverage_timings": {"secs": {"a": 5.0, "b": 1.0, "dead": None}}}
    ))
    (tmp_path / "BENCH_DETAIL_r05.json").write_text(json.dumps(
        {"coverage_timings": {"secs": {"a": 2.0}}}  # later round wins
    ))
    hints = bench._coverage_cost_hints()
    assert hints == {"a": 2.0, "b": 1.0}
    # ordering rule used by the coverage tier: unknown first, then cheap
    names = ["a", "b", "new_query"]
    ordered = sorted(names, key=lambda n: hints.get(n, -1.0))
    assert ordered == ["new_query", "b", "a"]


def test_scaling_attempt_aba_plumbing(monkeypatch):
    """The A-B-A attempt must: call lo/hi/lo with the right runs and
    min-clean args, merge the lo arms, and stamp the schedule."""
    calls = []

    def fake_subprocess(args):
        calls.append(args)
        cores = int(args[2])
        if cores == bench.LO_CORES:
            n = int(args[4])
            return _arm([20.0] * n, [0.0] * n, [100.0] * n, cores)
        return _arm([5.5, 5.5, 5.5], [0.0] * 3, [400.0] * 3, cores)

    monkeypatch.setattr(bench, "_subprocess_json", fake_subprocess)
    monkeypatch.setattr(
        bench, "_hardware_ceiling",
        lambda lo, hi: {"efficiency": 0.95, "lo_rows_per_sec": 100,
                        "hi_rows_per_sec": 380},
    )
    monkeypatch.setattr(bench, "_elapsed", lambda: 0.0)
    monkeypatch.setenv("BENCH_HEADLINE", "0")  # scaling-only: arm=2
    att = bench._scaling_attempt(runs=3, rows=1000, idx=1)
    lo_calls = [c for c in calls if int(c[2]) == bench.LO_CORES]
    assert [int(c[4]) for c in lo_calls] == [2, 2]   # mirror arms
    assert int(lo_calls[0][6]) == 2  # arm A clean quota = min(2, arm)
    assert int(lo_calls[1][6]) == 1  # arm B tops up what A left: 2-2
    lo = att[f"local{bench.LO_CORES}"]
    assert len(lo["all_runs_sec"]) == 4  # merged 2+2
    assert "A-B-A" in att["schedule"]
    assert att["window_valid"] is True
    # eff = (1000/5.5) / (1000/20) / 4
    assert abs(att["efficiency"] - (20.0 / 5.5) / 4) < 0.01

    monkeypatch.setenv("BENCH_HEADLINE", "1")  # full bench: arm=1
    calls.clear()
    bench._scaling_attempt(runs=3, rows=1000, idx=1)
    lo_calls = [c for c in calls if int(c[2]) == bench.LO_CORES]
    assert [int(c[4]) for c in lo_calls] == [1, 1]
    assert int(lo_calls[0][6]) == 1
