"""bench.py stdout contract: the driver keeps only the LAST ~2,000 chars
of bench stdout and json.loads them (BENCH_r06.json shipped parsed:null
when the line outgrew that window). These tests emulate that capture
against the compact line bench actually prints."""

from __future__ import annotations

import json
import os

import bench

DRIVER_TAIL_CHARS = 2000


def _full_report(query_names, n_reps=3):
    """A realistic FULL report: per-query timings plus every heavy
    section that round 6 proved can bloat the line past the window."""
    timings = {q: round(1.0 + 0.001 * i, 4) for i, q in enumerate(query_names)}
    return {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "reps": {q: [v, v + 0.01, v + 0.02] for q, v in timings.items()},
        "n_reps": n_reps,
        "n_timed": len(timings),
        "sf": "sf0.1",
        "cc": {"seconds": 1.9, "rounds": 5, "edges": 485},
        "replay_events_per_sec": 3264151,
        "replay_n_events": 5000000,
        "state_footprint": {"bytes_per_key": 9.8},
        "propagation_latency": {"p50": 2.0, "max": 2.02},
        "aggview": {"events_per_sec": 26600},
        "aggview_minmax": {"events_per_sec": 9500},
    }


def _emulate_driver(stdout_text: str):
    """The driver's capture: last DRIVER_TAIL_CHARS of stdout, parse the
    final line as JSON."""
    tail = stdout_text[-DRIVER_TAIL_CHARS:]
    return json.loads(tail.strip().splitlines()[-1])


def test_compact_line_fits_budget_with_real_headline_set():
    report = _full_report(bench.HEADLINE + ["cc_stress_placeholder"])
    line = json.dumps(bench.compact_report(report))
    assert len(line) <= bench.STDOUT_BUDGET
    # the real headline set is small enough that per-query timings fit
    parsed = _emulate_driver(line)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["n_timed"] == len(report["queries"])
    assert len(parsed["queries"]) == len(report["queries"])


def test_tail_capture_parses_even_after_earlier_noise():
    report = _full_report(bench.HEADLINE)
    stdout = "WARN noisy jvm line\n" * 200 + json.dumps(
        bench.compact_report(report)
    )
    parsed = _emulate_driver(stdout)
    assert parsed["value"] == report["value"]
    assert parsed["detail"] == "BENCH_DETAIL.json"


def test_oversized_registry_drops_queries_not_parseability():
    # 120 queries with long names: per-query timings can no longer fit —
    # they must be dropped wholesale and flagged, never clipped
    names = [f"extremely_long_query_family_name_variant_{i:03d}" for i in range(120)]
    report = _full_report(names)
    report["errors"] = {"q_bad": "boom"}
    report["partial"] = True
    compact = bench.compact_report(report)
    line = json.dumps(compact)
    assert len(line) <= bench.STDOUT_BUDGET
    assert compact["queries_dropped"] == 120
    assert compact["n_errors"] == 1
    assert compact["partial"] is True
    assert _emulate_driver("x" * 5000 + "\n" + line)["queries_dropped"] == 120


def test_compact_report_keeps_headline_metric_fields():
    report = _full_report(bench.HEADLINE)
    compact = bench.compact_report(report)
    for key in ("metric", "value", "unit", "sf", "n_timed", "n_reps"):
        assert compact[key] == report[key]
    # heavy sections must NOT leak into the stdout line
    for key in ("reps", "cc", "aggview", "propagation_latency"):
        assert key not in compact

def test_load_suspect_flag_logic():
    # clean run: probes stable within the drift ratio — including the
    # ~1.7x JVM heap/GC drift an idle host shows (the r10 false-positive)
    assert bench.load_suspect({"start": 0.20, "middle": 0.22, "end": 0.25}) is False
    assert bench.load_suspect({"start": 0.17, "middle": 0.29, "end": 0.29}) is False
    # loaded host: end probe 3x the start probe -> flagged
    assert bench.load_suspect({"start": 0.20, "middle": 0.21, "end": 0.65}) is True
    # drift exactly at the boundary is NOT suspect (strict >)
    assert bench.load_suspect({"start": 0.20, "end": 0.50}) is False
    # degenerate inputs never flag: empty, single probe, zero/None values
    assert bench.load_suspect({}) is False
    assert bench.load_suspect({"start": 0.20}) is False
    assert bench.load_suspect({"start": 0.0, "end": 0.0}) is False
    assert bench.load_suspect({"start": None, "end": 0.2}) is False


def test_load_suspect_propagates_to_compact_line():
    report = _full_report(bench.HEADLINE)
    report["load_suspect"] = True
    report["calibration"] = {"start": 0.2, "middle": 0.2, "end": 0.5}
    compact = bench.compact_report(report)
    assert compact["load_suspect"] is True
    assert len(json.dumps(compact)) <= bench.STDOUT_BUDGET
    # calibration detail itself stays in BENCH_DETAIL, not the stdout line
    assert "calibration" not in compact
    # a clean report carries no flag at all (absence == healthy)
    clean = bench.compact_report(_full_report(bench.HEADLINE))
    assert "load_suspect" not in clean


def test_spread_suspect_flag_logic():
    # clean: every query's reps within the 2x spread ratio
    assert bench.spread_suspects({"a": [1.0, 1.2, 1.1], "b": [0.5, 0.6]}) == []
    # star's round-8 case: [2.77, 5.96, 5.38] spread 2.15x -> flagged
    assert bench.spread_suspects({"star": [2.77, 5.96, 5.38]}) == ["star"]
    # boundary is NOT suspect (strict >), degenerate inputs never flag
    assert bench.spread_suspects({"a": [1.0, 2.0]}) == []
    assert bench.spread_suspects({"a": [1.0]}) == []
    assert bench.spread_suspects({"a": []}) == []
    assert bench.spread_suspects({"a": [0.0, 0.0]}) == []
    assert bench.spread_suspects({"a": [None, 1.0]}) == []
    # multiple suspects preserve dict order
    assert bench.spread_suspects(
        {"a": [1.0, 2.5], "b": [1.0, 1.1], "c": [0.2, 0.9]}
    ) == ["a", "c"]


def test_spread_suspect_propagates_to_compact_line():
    report = _full_report(bench.HEADLINE)
    report["spread_suspect"] = ["star_sales_by_region_segment"]
    compact = bench.compact_report(report)
    assert compact["spread_suspect"] == ["star_sales_by_region_segment"]
    assert len(json.dumps(compact)) <= bench.STDOUT_BUDGET
    # a long suspect list is capped at 8 names on the stdout line (the
    # full list lives in BENCH_DETAIL.json) so the budget always holds
    report["spread_suspect"] = [f"suspect_query_{i}" for i in range(20)]
    compact = bench.compact_report(report)
    assert len(compact["spread_suspect"]) == 8
    assert len(json.dumps(compact)) <= bench.STDOUT_BUDGET
    # absence == healthy
    assert "spread_suspect" not in bench.compact_report(_full_report(bench.HEADLINE))


def test_prior_round_timings_reads_queries_and_tolerates_absence(tmp_path):
    detail = tmp_path / "BENCH_DETAIL.json"
    detail.write_text(json.dumps({
        "sf": 0.1,
        "queries": {"q1": 1.74, "q_broken": None, "q_str": "x"},
    }))
    prior = bench.prior_round_timings(str(detail), 0.1)
    assert prior == {"q1": 1.74}
    # a prior detail at a DIFFERENT sf never drives reruns (timings at
    # sf0.1 vs sf0.01 are not comparable)
    assert bench.prior_round_timings(str(detail), 0.01) == {}
    # missing file (first round) and corrupt file -> {} (no reruns), no raise
    assert bench.prior_round_timings(str(tmp_path / "nope.json"), 0.1) == {}
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert bench.prior_round_timings(str(bad), 0.1) == {}


def test_measured_drift_is_max_over_min():
    """r14 Next #4: the artifact publishes the MEASURED probe drift
    (max/min) under its own key — the old line published only the
    threshold constant, which the r14 judge read as a measurement."""
    assert bench.measured_drift({"start": 0.2, "middle": 0.3, "end": 0.25}) == 1.5
    assert bench.measured_drift({"start": 0.2}) is None
    assert bench.measured_drift({}) is None
    # zero/garbage probes are excluded, not divided by
    assert bench.measured_drift({"a": 0.0, "b": 0.4, "c": 0.2}) == 2.0
    # load_suspect now derives from the same measurement
    assert not bench.load_suspect({"a": 0.2, "b": 0.4})
    assert bench.load_suspect({"a": 0.1, "b": 0.3})


def test_drift_gate_constants_sane():
    """The gate is tighter than the suspect threshold (a gated retry
    must trigger before the artifact would even be flagged), and the
    attempt cap bounds the retry loop."""
    assert bench.DRIFT_GATE < bench.LOAD_DRIFT_RATIO
    assert bench.DRIFT_GATE_ATTEMPTS >= 1


def test_cross_round_movers_classification():
    """r15 verdict Next #3: out-of-band movers flagged with direction +
    history; in-band and history-less queries only counted. The band is
    the cross-round envelope widened by CROSS_ROUND_TOLERANCE (sized to
    the r15 same-code swing star_sales 1.38 vs 2.29)."""
    hist = {
        "steady": {13: 1.0, 14: 1.1, 15: 0.95},
        "regressed": {13: 1.0, 14: 1.0, 15: 1.0},
        "improved": {13: 4.0, 14: 4.2, 15: 3.9},
    }
    timings = {
        "steady": 1.2,          # inside [0.95/1.6, 1.1*1.6]
        "regressed": 2.0,       # above 1.0*1.6
        "improved": 2.0,        # below 3.9/1.6
        "brand_new": 0.5,       # no history
        "errored": None,        # untimed: skipped entirely
    }
    out = bench.cross_round_movers(timings, hist)
    assert out["tolerance"] == bench.CROSS_ROUND_TOLERANCE == 1.6
    assert out["window_rounds"] == [13, 14, 15]
    assert out["n_within_band"] == 1 and out["n_no_history"] == 1
    assert set(out["movers"]) == {"regressed", "improved"}
    assert out["movers"]["regressed"]["direction"] == "up"
    assert out["movers"]["regressed"]["band"] == [0.625, 1.6]
    assert out["movers"]["improved"]["direction"] == "down"
    assert out["movers"]["improved"]["history"] == {
        "13": 4.0, "14": 4.2, "15": 3.9
    }


def test_round_history_reads_real_artifacts_and_tolerates_foreign_sf(
    tmp_path,
):
    """round_history parses BENCH_r*.json 'parsed' payloads at the same
    sf, keeps the last HISTORY_ROUNDS rounds, and skips corrupt/foreign
    files rather than failing the bench."""
    for n, sf, q in (
        (1, 0.1, {"a": 1.0}),
        (2, 0.01, {"a": 9.9}),          # foreign sf: skipped
        (3, 0.1, {"a": 1.2, "b": 2.0}),
        (4, 0.1, {"a": 1.1}),
        (5, 0.1, {"a": 1.3}),
        (6, 0.1, {"a": 1.4}),
    ):
        (tmp_path / f"BENCH_r{n:02d}.json").write_text(
            json.dumps({"parsed": {"sf": sf, "queries": q}})
        )
    (tmp_path / "BENCH_r07.json").write_text("not json")
    hist = bench.round_history(str(tmp_path), 0.1)
    # last HISTORY_ROUNDS=4 same-sf rounds: 3,4,5,6 (round 1 aged out)
    assert hist["a"] == {3: 1.2, 4: 1.1, 5: 1.3, 6: 1.4}
    assert hist["b"] == {3: 2.0}
    assert bench.round_history(str(tmp_path), 0.5) == {}


def test_cross_round_movers_on_committed_history():
    """The section classifies the two r15-adjudicated queries (verdict
    Next #3 names them) — with the r15 values themselves inside the
    window the classification is 'within band', the adjudication the
    judge reached manually."""
    hist = bench.round_history(
        os.path.dirname(os.path.abspath(bench.__file__)), 0.1
    )
    if not hist:  # fresh clone without BENCH_r*.json artifacts
        return
    assert "star_sales_by_region_segment" in hist
    assert "sim_ivf_pq_fit" in hist
    t = {"star_sales_by_region_segment": 2.18, "sim_ivf_pq_fit": 5.38}
    out = bench.cross_round_movers(t, hist)
    assert out["movers"] == {} and out["n_within_band"] == 2


def test_round_history_excludes_current_round(tmp_path):
    """ADVICE r16: a same-round RE-run must not band-compare against a
    window containing its own round's committed snapshot."""
    for n, q in ((14, {"a": 1.0}), (15, {"a": 1.1}), (16, {"a": 5.0})):
        (tmp_path / f"BENCH_r{n}.json").write_text(
            json.dumps({"parsed": {"sf": 0.1, "queries": q}})
        )
    # default window includes r16's own 5.0 -> a 5.0 re-measure is in band
    assert bench.round_history(str(tmp_path), 0.1)["a"] == {
        14: 1.0, 15: 1.1, 16: 5.0
    }
    # excluding the current round restores the honest band
    hist = bench.round_history(str(tmp_path), 0.1, exclude_round=16)
    assert hist["a"] == {14: 1.0, 15: 1.1}
    out = bench.cross_round_movers({"a": 5.0}, hist)
    assert out["movers"]["a"]["direction"] == "up"


def test_drift_gate_met_flag_and_history(tmp_path):
    """r16 verdict Next #4 (nit #1): the gate verdict is a first-class
    boolean in the compact line, and round_drift_gates reads it back per
    history round (None for rounds that predate the flag) so bands can
    weight noisy rounds without re-deriving two-field comparisons."""
    report = _full_report(bench.HEADLINE)
    # all-attempts-fail path: best-of-attempts published above the gate
    report["drift_gate_met"] = False
    compact = bench.compact_report(report)
    assert compact["drift_gate_met"] is False
    assert len(json.dumps(compact)) <= bench.STDOUT_BUDGET
    report["drift_gate_met"] = True
    assert bench.compact_report(report)["drift_gate_met"] is True
    # per-round read-back, including a pre-flag round (None) and a
    # foreign-sf round (skipped)
    for n, parsed in (
        (14, {"sf": 0.1, "queries": {}}),  # predates the flag
        (15, {"sf": 0.01, "queries": {}, "drift_gate_met": True}),
        (16, {"sf": 0.1, "queries": {}, "drift_gate_met": False}),
        (17, {"sf": 0.1, "queries": {}, "drift_gate_met": True}),
    ):
        (tmp_path / f"BENCH_r{n}.json").write_text(
            json.dumps({"parsed": parsed})
        )
    gates = bench.round_drift_gates(str(tmp_path), 0.1)
    assert gates == {14: None, 16: False, 17: True}
    assert bench.round_drift_gates(str(tmp_path), 0.1, exclude_round=17) == {
        14: None, 16: False
    }


def test_cross_round_movers_propagate_to_compact_line():
    report = {
        "metric": "headline_queries_total", "value": 1.0, "unit": "sec",
        "sf": 0.1, "n_timed": 1, "n_reps": 3,
        "queries": {"a": 1.0},
        "cross_round_movers": {
            "window_rounds": [13, 14, 15], "tolerance": 1.6,
            "n_within_band": 0, "n_no_history": 0,
            "movers": {
                "a": {"current": 1.0, "band": [0.1, 0.5],
                      "history": {"15": 0.3}, "direction": "up"},
            },
        },
    }
    compact = bench.compact_report(report)
    assert compact["cross_round_movers"] == {"a": "up"}
    assert len(json.dumps(compact)) <= bench.STDOUT_BUDGET
    del report["cross_round_movers"]
    assert "cross_round_movers" not in bench.compact_report(report)


def test_queries_survive_full_suspect_and_mover_load():
    """r17 verdict #3: the c8 run carried 8 spread-suspect names, the
    line outgrew STDOUT_BUDGET, and the old wholesale queries-drop
    emptied PERF's scaling.per_query. Per-query timings are the payload:
    under the full worst-case flag load (real 47-query headline set + 8
    suspects + 8 movers + host-speed fields + errors) the queries map
    must survive — suspect/mover DETAIL is what gets trimmed to counts."""
    report = _full_report(bench.HEADLINE + ["sim_ivf_pq_fit",
                                            "sim_ivf_pq_serve",
                                            "dedup_clusters_embedding"])
    report["spread_suspect"] = sorted(report["queries"])[:20]
    report["cross_round_movers"] = {
        "movers": {
            q: {"current": 9.9, "band": [0.1, 0.5],
                "history": {"17": 0.3}, "direction": "up"}
            for q in sorted(report["queries"])[:12]
        }
    }
    report["drift_gate_met"] = True
    report["host_speed_vs_history"] = 0.597
    report["host_speed_suspect"] = True
    report["errors"] = {"q_bad": "boom"}
    compact = bench.compact_report(report)
    assert len(json.dumps(compact)) <= bench.STDOUT_BUDGET
    # the payload survived intact
    assert len(compact["queries"]) == len(report["queries"])
    # trimmed lists are replaced by counts, never silently vanished
    for key, count_key in (
        ("cross_round_movers", "n_cross_round_movers"),
        ("spread_suspect", "n_spread_suspect"),
    ):
        assert (key in compact) != (count_key in compact)
    # core adjudication fields always survive
    assert compact["drift_gate_met"] is True
    assert compact["host_speed_vs_history"] == 0.597
    assert compact["host_speed_suspect"] is True


def test_host_speed_ratio_logic():
    """r17 verdict #2: replay_events_per_sec is the absolute host-speed
    anchor — current rate vs the history-window median, flagged when it
    moves >20% either way."""
    hist = {14: 3.0e6, 15: 3.2e6, 16: 3.13e6}
    # the r17 case: 1.87M on a 3.13M-median history -> 0.6, suspect
    assert bench.host_speed_ratio(1.87e6, hist) == 0.597
    assert abs(bench.host_speed_ratio(1.87e6, hist) - 1.0) > (
        bench.HOST_SPEED_TOLERANCE
    )
    # healthy host: within tolerance
    assert abs(bench.host_speed_ratio(3.1e6, hist) - 1.0) <= (
        bench.HOST_SPEED_TOLERANCE
    )
    # degenerate inputs -> None (first round, failed replay)
    assert bench.host_speed_ratio(None, hist) is None
    assert bench.host_speed_ratio(0, hist) is None
    assert bench.host_speed_ratio(3.0e6, {}) is None
    assert bench.host_speed_ratio(3.0e6, {14: 0}) is None


def test_replay_rate_history_reads_artifacts(tmp_path):
    for n, sf, rate in (
        (13, 0.1, 2.9e6),
        (14, 0.1, 3.0e6),
        (15, 0.01, 9.9e6),   # foreign sf: skipped
        (16, 0.1, 3.13e6),
        (17, 0.1, 1.87e6),
        (18, 0.1, None),     # replay failed that round: skipped
    ):
        (tmp_path / f"BENCH_r{n}.json").write_text(json.dumps(
            {"parsed": {"sf": sf, "replay_events_per_sec": rate}}
        ))
    (tmp_path / "BENCH_r19.json").write_text("not json")
    hist = bench.replay_rate_history(str(tmp_path), 0.1)
    assert hist == {13: 2.9e6, 14: 3.0e6, 16: 3.13e6, 17: 1.87e6}
    # same-round rerun exclusion, mirroring round_history
    assert 17 not in bench.replay_rate_history(
        str(tmp_path), 0.1, exclude_round=17
    )
    assert bench.replay_rate_history(str(tmp_path), 0.5) == {}
