"""Unit tests for tools/scale_probe.py's keep-cleaner accumulation —
the r11 defense against host-noise overwrites (one loaded sweep must
not replace a clean artifact; a CODE change must)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from scale_probe import _keep_cleaner  # noqa: E402


def _rec(sf01, sf1, killers=(), diff=None):
    return {"sf01_sec": sf01, "sf1_sec": sf1,
            "time_ratio": round(sf1 / sf01, 2),
            "plan_shape_identical": not diff,
            "scale_killers": list(killers),
            "plan_diff": diff or {}}


def test_noisier_rerun_does_not_overwrite():
    clean = _rec(1.0, 2.0)
    noisy = _rec(2.4, 8.9)
    assert _keep_cleaner(clean, noisy) is clean


def test_cleaner_rerun_wins():
    noisy = _rec(2.4, 8.9)
    clean = _rec(1.0, 2.0)
    assert _keep_cleaner(noisy, clean) is clean


def test_plan_shape_change_always_wins():
    """A slower record with a DIFFERENT plan reflects a code change and
    must replace the stale fast one."""
    old = _rec(1.0, 2.0)
    new = _rec(3.0, 9.0, diff={"Exchange": [1, 2]})
    assert _keep_cleaner(old, new) is new


def test_killer_change_always_wins():
    old = _rec(1.0, 2.0, killers=["BroadcastNestedLoopJoin"])
    new = _rec(3.0, 9.0)
    assert _keep_cleaner(old, new) is new


def test_headline_records_compare_on_total():
    old = {"sf01_sec": 1.786, "sf1_sec": 2.816, "rows": [6, 60]}
    new = {"sf01_sec": 2.446, "sf1_sec": 8.938, "rows": [6, 60]}
    assert _keep_cleaner(old, new) is old
    assert _keep_cleaner(new, old) is old


def test_format_migration_takes_new():
    """Old pre-plan-capture records always yield to the new format."""
    old = {"sf01_sec": 0.1, "sf1_sec": 0.1}
    new = _rec(5.0, 9.0)
    assert _keep_cleaner(old, new) is new
