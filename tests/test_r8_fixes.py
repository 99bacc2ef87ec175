"""Round-8 regression tests for the round-7 advisor findings (ADVICE.md):

1. snapshot_diff: an update that sets a column to NULL must emit the NULL
   (not resurrect the old value via coalesce), and apply_diff must replay
   NULL-keyed D/U rows (null-SAFE anti-join).
2. ahash_media: a decodable-but-empty payload (zero-frame WAV) yields the
   NULL sentinel, not a ZeroDivisionError that kills the job.
3. execute_compaction: a crash between the two swap renames (no live dir)
   is recovered on the next run — roll forward if the new dir is complete,
   roll back otherwise.
4. IncrementalRollup: a legacy v1 state directory raises a clear
   'rebuild required' error, not an unresolved-column AnalysisException.
5. numeric_histogram: an entirely-NULL column returns the NULL-bucket-only
   histogram instead of TypeError(float(None)) on the driver.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------ 1. snapshot_diff NULLs

def test_snapshot_diff_update_to_null_surfaces_null(spark):
    from s3_redshift_backup_tool_spark.operators.cdc import snapshot_diff
    old = spark.createDataFrame([(1, "alive"), (2, "same")],
                                "k long, s string")
    new = spark.createDataFrame([(1, None), (2, "same")],
                                "k long, s string")
    rows = {r["k"]: (r["s"], r["op"])
            for r in snapshot_diff(old, new, ["k"]).collect()}
    assert rows == {1: (None, "U")}      # NULL kept, not coalesced away


def test_snapshot_diff_delete_row_carries_old_values(spark):
    from s3_redshift_backup_tool_spark.operators.cdc import snapshot_diff
    old = spark.createDataFrame([(1, "gone")], "k long, s string")
    new = spark.createDataFrame([], "k long, s string")
    rows = snapshot_diff(old, new, ["k"]).collect()
    assert [(r["k"], r["s"], r["op"]) for r in rows] == [(1, "gone", "D")]


def test_apply_diff_replays_null_keyed_changes(spark):
    from s3_redshift_backup_tool_spark.operators.cdc import (
        apply_diff, snapshot_diff)
    old = spark.createDataFrame([(None, "x"), (1, "a"), (2, "b")],
                                "k long, s string")
    new = spark.createDataFrame([(None, "y"), (2, "b"), (3, "c")],
                                "k long, s string")
    diff = snapshot_diff(old, new, ["k"])
    ops = {(r["k"], r["op"]) for r in diff.collect()}
    assert (None, "U") in ops            # NULL-keyed update detected
    rebuilt = apply_diff(old, diff, ["k"])
    assert {tuple(r) for r in rebuilt.collect()} == \
        {tuple(r) for r in new.collect()}


def test_apply_diff_roundtrip_update_to_null(spark):
    from s3_redshift_backup_tool_spark.operators.cdc import (
        apply_diff, snapshot_diff)
    old = spark.createDataFrame([(1, "v", 2.5), (2, None, 1.0)],
                                "k long, s string, x double")
    new = spark.createDataFrame([(1, None, 2.5), (2, "w", None)],
                                "k long, s string, x double")
    diff = snapshot_diff(old, new, ["k"])
    rebuilt = apply_diff(old, diff, ["k"])
    assert {tuple(r) for r in rebuilt.collect()} == \
        {tuple(r) for r in new.collect()}


# ------------------------------------------------ 2. ahash empty payload

def test_ahash_zero_frame_wav_is_null_sentinel(spark):
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import encode_wav
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        ahash_media, attach_media)
    empty = encode_wav(np.zeros(0))      # valid header, zero frames
    tone = encode_wav(np.sin(np.arange(2000) / 10.0))
    df = spark.createDataFrame(
        [(1, bytearray(empty)), (2, bytearray(tone))],
        "doc_id long, blob binary")
    media = attach_media(df, "blob", "doc_id", media_type="audio",
                         fmt="wav")
    out = {r["media_id"]: r["ahash"] for r in ahash_media(media).collect()}
    assert out[1] is None                # degenerate -> sentinel, no crash
    assert out[2] is not None            # siblings in the batch unharmed


# ------------------------------------------- 3. compaction crash recovery

def _parquet_files(d):
    return [f for f in os.listdir(d) if f.endswith(".parquet")]


def test_compaction_recovers_rollforward_after_crash(spark, tmp_path):
    """Simulate a crash AFTER rename(d, __oldc) with a complete __tmpc:
    next run must roll the new directory forward."""
    from s3_redshift_backup_tool_spark.operators.layout import (
        execute_compaction)
    d = str(tmp_path / "tbl")
    spark.range(5_000).repartition(8).write.parquet(d)
    # build the complete compacted dir aside, then simulate the crash
    tmp = d + "__tmpc"
    spark.read.parquet(d).repartition(1).write.parquet(tmp)
    os.rename(d, d + "__oldc")           # live dir now missing
    assert not os.path.isdir(d)
    report = execute_compaction(spark, str(tmp_path / "tbl"),
                                target_bytes=1 << 30)
    assert os.path.isdir(d) and not os.path.isdir(d + "__oldc") \
        and not os.path.isdir(d + "__tmpc")
    assert spark.read.parquet(d).count() == 5_000
    assert len(_parquet_files(d)) == 1   # rolled FORWARD to the new dir
    assert report["."][0] == 1           # already compact after recovery


def test_compaction_recovers_rollback_when_tmp_incomplete(spark, tmp_path):
    """Crash with an INCOMPLETE __tmpc (no _SUCCESS): roll back to old."""
    from s3_redshift_backup_tool_spark.operators.layout import (
        execute_compaction)
    d = str(tmp_path / "tbl")
    spark.range(5_000).repartition(4).write.parquet(d)
    tmp = d + "__tmpc"
    spark.read.parquet(d).repartition(1).write.parquet(tmp)
    os.remove(os.path.join(tmp, "_SUCCESS"))   # mark tmp incomplete
    os.rename(d, d + "__oldc")
    report = execute_compaction(spark, d, target_bytes=1 << 30)
    assert os.path.isdir(d) and not os.path.isdir(d + "__oldc") \
        and not os.path.isdir(d + "__tmpc")
    assert spark.read.parquet(d).count() == 5_000
    # the ORIGINAL 4 files were restored (incomplete tmp discarded),
    # then this run re-compacted them normally
    assert report["."][0] == 4


def test_compaction_recovers_partition_dir(spark, tmp_path):
    """Same recovery inside a hive-partitioned table: the orphaned
    p=1__oldc entry must not be treated as a partition named p=1__oldc."""
    from s3_redshift_backup_tool_spark.operators.layout import (
        execute_compaction)
    d = str(tmp_path / "ptbl")
    (spark.range(4_000).withColumn("p", (F.col("id") % 2).cast("int"))
          .repartition(6).write.partitionBy("p").parquet(d))
    live = os.path.join(d, "p=1")
    os.rename(live, live + "__oldc")     # crash left p=1 missing
    report = execute_compaction(spark, d, target_bytes=1 << 30)
    assert set(report) == {"p=0", "p=1"}
    assert not os.path.isdir(live + "__oldc")
    back = spark.read.parquet(d)
    assert back.count() == 4_000
    assert back.select("p").distinct().count() == 2


# --------------------------------------------- 4. rollup legacy state

def test_rollup_legacy_state_raises_clear_error(spark, tmp_path):
    from s3_redshift_backup_tool_spark.plans.rollup import IncrementalRollup
    state = str(tmp_path / "state")
    # persist a v1-format (finalized-columns) state directory
    spark.createDataFrame(
        [("a", 3, 10.0, 1.0, 6.0)],
        "g string, n_rows long, sum_value double, min_value double, "
        "max_value double").write.parquet(state)
    r = IncrementalRollup(spark, state, ["g"], "v")
    with pytest.raises(ValueError, match="rebuild required"):
        r.read()
    delta = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="rebuild required"):
        r.apply(delta)


def test_rollup_wrong_measure_names_missing_columns(spark, tmp_path):
    from s3_redshift_backup_tool_spark.plans.rollup import IncrementalRollup
    state = str(tmp_path / "state")
    good = IncrementalRollup(spark, state, ["g"], "v")
    good.apply(spark.createDataFrame([("a", 1.0)], "g string, v double"))
    bad = IncrementalRollup(spark, state, ["g"], "w")
    with pytest.raises(ValueError, match="missing partial columns"):
        bad.read()


# --------------------------------------- 5. histogram of all-NULL column

def test_numeric_histogram_all_null_column(spark):
    from s3_redshift_backup_tool_spark.operators.quality import (
        numeric_histogram)
    df = spark.createDataFrame([(None,), (None,), (None,)],
                               "x double")
    rows = numeric_histogram(df, "x", bins=5).collect()
    assert len(rows) == 1
    assert rows[0]["bucket"] is None and rows[0]["n"] == 3
    assert rows[0]["lo"] is None


def test_numeric_histogram_empty_relation(spark):
    from s3_redshift_backup_tool_spark.operators.quality import (
        numeric_histogram)
    df = spark.createDataFrame([], "x double")
    assert numeric_histogram(df, "x", bins=5).count() == 0
