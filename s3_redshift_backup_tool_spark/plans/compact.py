"""Target compaction: collapse an append-only CDC target to latest-per-key.

The reference's target is append-only COPY (updates arrive as new rows
with a fresher ``updated_at``); consumers de-duplicate at query time.
This plan materializes that view — the Spark-side MERGE/upsert the
reference leaves to Redshift:

    compacted = row_number() OVER (PARTITION BY key ORDER BY ts DESC) = 1

One shuffle on the key. The rewrite goes through a temp directory then an
atomic-ish swap, so readers never see a half-written target; at scale the
same plan lands on a transactional table format (Delta/Iceberg MERGE)
without changing the dedup semantics.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession

from ..operators.dedup import latest_record_dedup


@dataclass
class CompactResult:
    rows_before: int
    rows_after: int
    rows_removed: int


def _recover_target(target_path: str, backup_suffix: str) -> None:
    """Repair a half-finished rewrite swap: a crash between the two
    renames leaves the previous target at the backup path — restore it
    instead of failing on a missing target; if both exist the rewrite
    completed and the backup is stale."""
    backup = f"{target_path}{backup_suffix}"
    if os.path.isdir(backup):
        if os.path.isdir(target_path):
            shutil.rmtree(backup, ignore_errors=True)
        else:
            os.rename(backup, target_path)


def compact_target(
    spark: SparkSession,
    target_path: str,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> CompactResult:
    """Rewrite ``target_path`` keeping only the latest record per key."""
    _recover_target(target_path, "__precompact")
    df = spark.read.parquet(target_path)
    rows_before = df.count()
    compacted = latest_record_dedup(df, key_cols, ts_col,
                                    tiebreak_cols=tiebreak_cols)

    tmp = f"{target_path}__compact_{uuid.uuid4().hex[:8]}"
    compacted.write.mode("overwrite").parquet(tmp)
    rows_after = spark.read.parquet(tmp).count()

    backup = f"{target_path}__precompact"
    os.rename(target_path, backup)
    try:
        os.rename(tmp, target_path)
    except OSError:
        os.rename(backup, target_path)   # restore on failure
        raise
    shutil.rmtree(backup, ignore_errors=True)
    return CompactResult(rows_before=rows_before, rows_after=rows_after,
                         rows_removed=rows_before - rows_after)


@dataclass
class LayoutResult:
    rows: int
    files_before: int
    files_after: int


def optimize_target_layout(
    spark: SparkSession,
    target_path: str,
    zorder_cols: list[str],
    n_files: int = 8,
    bits: int = 16,
) -> LayoutResult:
    """OPTIMIZE-ZORDER analog for a parquet target: rewrite the table
    clustered on ``zorder_cols`` (operators.layout.write_zordered), fixing
    two scan-side costs in one pass — small-file proliferation from many
    incremental syncs, and min/max pruning that only works on the
    original write order. Swap semantics match :func:`compact_target`."""
    import glob

    from ..operators.layout import write_zordered

    _recover_target(target_path, "__preoptimize")
    df = spark.read.parquet(target_path)
    rows = df.count()
    files_before = len(glob.glob(os.path.join(target_path, "*.parquet")))

    tmp = f"{target_path}__optimize_{uuid.uuid4().hex[:8]}"
    write_zordered(df, tmp, zorder_cols, n_files=n_files, bits=bits)

    backup = f"{target_path}__preoptimize"
    os.rename(target_path, backup)
    try:
        os.rename(tmp, target_path)
    except OSError:
        os.rename(backup, target_path)
        raise
    shutil.rmtree(backup, ignore_errors=True)
    files_after = len(glob.glob(os.path.join(target_path, "*.parquet")))
    return LayoutResult(rows=rows, files_before=files_before,
                        files_after=files_after)
