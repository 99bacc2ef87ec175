"""Pin bench.py's degradation/noisy gating and sidecar mechanics.

r12 verdict item 1: the r23 sweep published a below-baseline headline
with py-canary end +29% over prior median and 49.6% spread, yet
`degraded` stayed false because both canaries sat under the 1.5x pair
gate. The `noisy` tier is the actuator for those softer signals and
demotes the sweep as a comparison baseline. These tests are pure
Python — no SparkSession.
"""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def test_degraded_sweep_excluded():
    assert bench._excluded_as_baseline({"degraded": True})


def test_explicit_noisy_field_wins():
    assert bench._excluded_as_baseline({"degraded": False, "noisy": True})
    assert not bench._excluded_as_baseline(
        {"degraded": False, "noisy": False, "headline_spread_pct": 99.0})


def test_retroactive_spread_gate():
    # pre-format-3 artifact, no noisy field: spread > 30% excludes
    assert bench._excluded_as_baseline(
        {"degraded": False, "headline_spread_pct": 49.6})
    assert not bench._excluded_as_baseline(
        {"degraded": False, "headline_spread_pct": 4.3})


def test_retroactive_canary_end_gate():
    # py-canary end 1.29x its own recorded prior median -> excluded
    assert bench._excluded_as_baseline(
        {"degraded": False, "headline_spread_pct": 10.0,
         "canary_py_end_sec": 1.339, "canary_py_prior_median_sec": 1.04})
    # flat canaries, quiet spread -> usable baseline
    assert not bench._excluded_as_baseline(
        {"degraded": False, "headline_spread_pct": 10.0,
         "canary_end_sec": 0.536, "canary_prior_median_sec": 0.531,
         "canary_py_end_sec": 1.04, "canary_py_prior_median_sec": 1.05})


def test_r23_is_retroactively_noisy_and_baseline_is_quiet():
    """The exact adjudication from the r12 verdict, pinned against the
    committed artifacts: r23 (226,765 rows/s, measured-noisy) must be
    excluded while the quiet r22 sweep (318,505) stays eligible — and
    whatever sweep _prior_round_full() picks (the most recent QUIET
    one; r24+ files land after this test was written) must itself pass
    the exclusion gate and never be r23."""
    with open(os.path.join(REPO, "bench_full_r23.json")) as fh:
        assert bench._excluded_as_baseline(json.load(fh))
    with open(os.path.join(REPO, "bench_full_r22.json")) as fh:
        assert not bench._excluded_as_baseline(json.load(fh))
    prior = bench._prior_round_full()
    assert prior and not bench._excluded_as_baseline(prior)
    assert prior.get("rows_per_sec") != 226765   # never the r23 phantom


def test_bounded_line_strips_query_load1_and_format_field():
    result = {
        "format": 3, "value": 1.0, "rows_per_sec": 300000,
        "queries": {"q%03d" % i: 0.5 for i in range(300)},
        "query_load1": {"q%03d" % i: 1.0 for i in range(300)},
        "retimed_outliers": {"q1": {"was": 2.0, "final": 1.0}},
        "noisy": False, "degraded": False,
        "headline_retime_attempted": True,
    }
    line = bench._bounded_stdout_line(result, "bench_full_r99.json",
                                      budget=1800)
    assert len(line) <= 1800
    parsed = json.loads(line)
    assert "query_load1" not in parsed
    assert parsed["format"] == 3
    assert parsed["retimed_outliers"] == 1  # count, not the dict
    assert parsed["headline_retime_attempted"] is True
    assert parsed["queries_elided"] + len(parsed["queries"]) == 300


def test_fold_regressions_roundtrip(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import fold_regressions
    monkeypatch.setattr(fold_regressions, "REPO", str(tmp_path))
    perf = tmp_path / "PERF.md"
    perf.write_text("# PERF\n\nintro text\n\n"
                    "<!-- bench-regressions:start (auto) -->\nold block\n"
                    "<!-- bench-regressions:end -->\n\ntrailing section\n")
    sidecar = tmp_path / "bench_regressions_r24.md"
    sidecar.write_text("<!-- bench-regressions:start (auto) -->\n"
                       "new block r24\n<!-- bench-regressions:end -->\n")
    assert fold_regressions.pending_sidecars() == [str(sidecar)]
    folded = fold_regressions.fold()
    assert folded == [str(sidecar)]
    text = perf.read_text()
    assert "new block r24" in text and "old block" not in text
    assert "trailing section" in text          # rest of PERF.md intact
    assert not sidecar.exists()                # sidecar consumed
    assert fold_regressions.fold() == []       # idempotent


def test_bounded_line_membership_is_prior_cost_ranked(monkeypatch):
    """r13 verdict item 6: the line's per-query entries are picked by
    the PRIOR quiet sweep's cost ranking (stable membership across
    rounds), falling back to current cost for history-less queries —
    a query that got faster this sweep must stay on the line."""
    prior = {"queries": {"stayed_fast": 9.0, "cheap_prior": 0.01}}
    monkeypatch.setattr(bench, "_prior_round_full", lambda **kw: prior)
    result = {
        "format": 3, "value": 1.0,
        # stayed_fast IMPROVED to 0.05 s — current-cost ranking would
        # drop it below every filler query; prior-cost ranking keeps
        # it first. new_heavy has no history -> ranked by current.
        "queries": {"stayed_fast": 0.05, "new_heavy": 8.0,
                    "cheap_prior": 0.02,
                    **{"filler%03d" % i: 1.0 for i in range(300)}},
        "retimed_outliers": {},
    }
    line = bench._bounded_stdout_line(result, "bench_full_r99.json",
                                      budget=1800)
    parsed = json.loads(line)
    assert len(line) <= 1800
    assert "stayed_fast" in parsed["queries"]      # prior rank 9.0
    assert "new_heavy" in parsed["queries"]        # current-cost fallback
    assert "cheap_prior" not in parsed["queries"]  # cheap both rounds
