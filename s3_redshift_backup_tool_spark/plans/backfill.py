"""Resumable calendar-window backfill into a versioned table.

The reference's users backfill history by re-running the sync over
date ranges; its chunk loop pages by LIMIT/OFFSET. Here a backfill is
a sequence of BOUNDED time-window scans (``time_window_predicate`` —
half-open ``(start, end]`` windows, pushdown-able), each committing one
version of a :class:`~..plans.versioned.VersionedTable` and publishing
one completion marker keyed by the window date (the same
Airflow-sensor contract as daily syncs — an orchestrator can fan
sensors over the window list).

Exactly-once across crashes, from two idempotency layers:
- marker present  -> window skipped (the normal resume);
- marker missing but the table has a version stamped with this
  window's note (crash fell between commit and marker) -> the commit
  is NOT repeated; only the marker is re-published.

Scale shape: each window is one bounded scan + one append commit —
no state accumulates in the driver across windows, so a years-deep
backfill is just a longer loop (or N orchestrator tasks sharing the
marker root, one window each).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

from ..operators.cdc import time_window_predicate
from .markers import CompletionMarkers
from .versioned import VersionedTable


@dataclass
class WindowResult:
    window: str
    rows: int
    version: int | None
    skipped: bool


def day_windows(start: datetime, end: datetime,
                step_days: int = 1) -> list[tuple[datetime, datetime]]:
    out = []
    cur = start
    while cur < end:
        nxt = min(cur + timedelta(days=step_days), end)
        out.append((cur, nxt))
        cur = nxt
    return out


def backfill_windows(
    spark: SparkSession,
    source: DataFrame,
    *,
    table: str,
    ts_col: str,
    start: datetime,
    end: datetime,
    target: VersionedTable,
    markers_root: str,
    step_days: int = 1,
) -> list[WindowResult]:
    markers = CompletionMarkers(markers_root)
    results: list[WindowResult] = []
    for w0, w1 in day_windows(start, end, step_days):
        label = f"backfill:{table}:{w0:%Y%m%d}:{w1:%Y%m%d}"
        date_key = w0.strftime("%Y%m%d")
        if markers.check(table, date_str=date_key):
            results.append(WindowResult(label, 0, None, skipped=True))
            continue
        committed = target.find_note(label)
        if committed is not None:
            # crash fell between commit and marker: don't re-commit
            markers.write_table_marker(table, "SUCCESS", label,
                                       date_str=date_key)
            results.append(WindowResult(label, 0, committed, skipped=True))
            continue
        delta = source.filter(time_window_predicate(ts_col, w0, w1))
        n = delta.count()
        version = target.commit(delta, note=label) if n else None
        markers.write_table_marker(table, "SUCCESS", label,
                                   date_str=date_key)
        results.append(WindowResult(label, n, version, skipped=False))
    return results
