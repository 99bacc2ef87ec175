"""Resumable window backfill: bounded scans, per-window versions,
marker + note idempotency layers."""

from __future__ import annotations

from datetime import datetime

from s3_redshift_backup_tool_spark.plans.backfill import backfill_windows
from s3_redshift_backup_tool_spark.plans.markers import CompletionMarkers
from s3_redshift_backup_tool_spark.plans.versioned import VersionedTable


def _run(spark, events, tmp_path, **kw):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    return t, backfill_windows(
        spark, events, table="events", ts_col="ts",
        start=datetime(2024, 1, 2), end=datetime(2024, 1, 5),
        target=t, markers_root=str(tmp_path / "markers"), **kw)


def test_backfill_windows_and_resume(spark, events, tmp_path):
    t, res = _run(spark, events, tmp_path)
    assert len(res) == 3 and not any(r.skipped for r in res)
    total = sum(r.rows for r in res)
    # the union of half-open (start, end] windows == one bounded scan
    from s3_redshift_backup_tool_spark.operators.cdc import (
        time_window_predicate)
    want = events.filter(time_window_predicate(
        "ts", datetime(2024, 1, 2), datetime(2024, 1, 5))).count()
    assert total == want > 0
    assert t.read().count() == total

    # full resume: every window marker present -> all skipped, no growth
    t2, res2 = _run(spark, events, tmp_path)
    assert all(r.skipped for r in res2)
    assert t2.read().count() == total


def test_backfill_crash_between_commit_and_marker(spark, events, tmp_path):
    t, res = _run(spark, events, tmp_path)
    total = t.read().count()
    # simulate the crash window: delete ONE day's marker, keep its commit
    markers = CompletionMarkers(str(tmp_path / "markers"))
    import os
    key = markers._key("sync", "events", "SUCCESS", "20240103")
    os.remove(key)
    t3, res3 = _run(spark, events, tmp_path)
    redone = [r for r in res3 if r.window.split(":")[2] == "20240103"][0]
    assert redone.skipped and redone.version is not None  # note layer hit
    assert t3.read().count() == total                     # no double-commit
    assert markers.check("events", date_str="20240103")   # marker restored
