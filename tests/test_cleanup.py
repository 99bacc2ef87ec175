"""Staging retention cleanup (reference K5 / s3clean CLI semantics)."""

from __future__ import annotations

import os
import time

from s3_redshift_backup_tool_spark.plans.cleanup import clean_staging


def _touch(path, mtime=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(b"x" * 10)
    if mtime is not None:
        os.utime(path, (mtime, mtime))


def test_dry_run_by_default(tmp_path):
    root = str(tmp_path / "stage")
    _touch(os.path.join(root, "year=2026/a.parquet"))
    rep = clean_staging(root, loaded_files={os.path.join(root, "year=2026/a.parquet")})
    assert rep.dry_run and rep.deletable == 1 and rep.deleted == 0
    assert os.path.exists(os.path.join(root, "year=2026/a.parquet"))


def test_deletes_only_loaded_or_old(tmp_path):
    root = str(tmp_path / "stage")
    now = time.time()
    loaded = os.path.join(root, "year=2026/loaded.parquet")
    old = os.path.join(root, "year=2025/old.parquet")
    fresh = os.path.join(root, "year=2026/unloaded.parquet")
    _touch(loaded)
    _touch(old, mtime=now - 8 * 86400)
    _touch(fresh)
    rep = clean_staging(root, loaded_files={loaded},
                        older_than_seconds=7 * 86400, confirm=True, now=now)
    assert rep.deleted == 2 and rep.skipped_unloaded == 1
    assert not os.path.exists(loaded) and not os.path.exists(old)
    assert os.path.exists(fresh)                      # never delete unloaded
    assert not os.path.exists(os.path.dirname(old))   # empty dir pruned
    assert rep.bytes_reclaimed == 20


def test_batched_deletes(tmp_path):
    root = str(tmp_path / "stage")
    files = set()
    for i in range(2500):
        p = os.path.join(root, f"f{i:04d}.parquet")
        _touch(p)
        files.add(p)
    rep = clean_staging(root, loaded_files=files, confirm=True)
    assert rep.deleted == 2500
    assert rep.batches == 3   # ceil(2500 / 1000) — the S3 1000-key limit
