"""Structured-Streaming incremental sync (SURVEY §2.12).

The availableNow + checkpoint pass is the streaming-native replacement
for the watermark/blacklist loop: each invocation processes exactly the
new files, exactly once, across restarts.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.streaming.incremental import (
    incremental_file_sync, sessionized_counts, streaming_upsert_sync,
    windowed_event_counts)


def test_available_now_exactly_once(spark, orders, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    batch1 = orders.limit(100)
    batch1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    incremental_file_sync(spark, src, schema, tgt, ckpt)
    assert spark.read.parquet(tgt).count() == 100

    # second pass with no new files: nothing re-processed
    incremental_file_sync(spark, src, schema, tgt, ckpt)
    assert spark.read.parquet(tgt).count() == 100

    # new files arrive -> only they are processed (no reprocessing of
    # the first 100)
    orders.limit(250).write.mode("append").parquet(src)
    incremental_file_sync(spark, src, schema, tgt, ckpt)
    assert spark.read.parquet(tgt).count() == 100 + 250


def test_streaming_upsert_latest_version_wins(spark, tmp_path):
    """CDC UPSERT stream: re-arriving keys replace their prior version
    in the target (the reference can only append + compact offline)."""
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")

    v1 = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00"), (2, "b", "2024-01-01 00:00:00"),
         (3, "c", "2024-01-01 00:00:00")],
        "id long, val string, ts string").withColumn("ts", F.to_timestamp("ts"))
    v1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    streaming_upsert_sync(spark, src, schema, tgt, ckpt,
                          key_cols=["id"], ts_col="ts")
    assert spark.read.parquet(tgt).count() == 3

    # updates for ids 2,3 (one stale + one fresh version of id 3 in the
    # SAME batch: the fresh one must win) and a new id 4
    v2 = spark.createDataFrame(
        [(2, "b2", "2024-01-02 00:00:00"),
         (3, "c_stale", "2024-01-01 12:00:00"),
         (3, "c2", "2024-01-03 00:00:00"),
         (4, "d", "2024-01-02 00:00:00")],
        "id long, val string, ts string").withColumn("ts", F.to_timestamp("ts"))
    v2.write.mode("append").parquet(src)

    streaming_upsert_sync(spark, src, schema, tgt, ckpt,
                          key_cols=["id"], ts_col="ts")
    got = {r["id"]: r["val"] for r in spark.read.parquet(tgt).collect()}
    assert got == {1: "a", 2: "b2", 3: "c2", 4: "d"}

    # no new files: idempotent no-op
    streaming_upsert_sync(spark, src, schema, tgt, ckpt,
                          key_cols=["id"], ts_col="ts")
    assert spark.read.parquet(tgt).count() == 4


def test_streaming_upsert_recovers_half_finished_swap(spark, tmp_path):
    """Crash between the two swap renames (target moved aside, new copy
    not yet promoted) must not lose pre-batch keys: the next run restores
    the aside copy before the stream starts, then the checkpoint replays
    the batch and the merge sees all earlier keys."""
    import shutil

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")

    v1 = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00"), (2, "b", "2024-01-01 00:00:00")],
        "id long, val string, ts string").withColumn("ts", F.to_timestamp("ts"))
    v1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    streaming_upsert_sync(spark, src, schema, tgt, ckpt,
                          key_cols=["id"], ts_col="ts")

    # simulate the worst crash window: target renamed aside, promote
    # never happened, and a stale half-written __tmp is lying around
    os.rename(tgt, tgt + "__old")
    os.makedirs(tgt + "__tmp")
    with open(os.path.join(tgt + "__tmp", "part-garbage"), "w") as f:
        f.write("not parquet")
    assert not os.path.exists(tgt)

    v2 = spark.createDataFrame(
        [(3, "c", "2024-01-02 00:00:00")],
        "id long, val string, ts string").withColumn("ts", F.to_timestamp("ts"))
    v2.write.mode("append").parquet(src)
    streaming_upsert_sync(spark, src, schema, tgt, ckpt,
                          key_cols=["id"], ts_col="ts")

    got = {r["id"]: r["val"] for r in spark.read.parquet(tgt).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}  # ids 1,2 NOT lost
    assert not os.path.exists(tgt + "__old")
    assert not os.path.exists(tgt + "__tmp")
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_streaming_upsert_drops_stale_old_after_promote(spark, tmp_path):
    """Crash after promote but before cleanup leaves target AND __old;
    recovery must keep the (newer) target and drop the aside copy."""
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")

    v1 = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00")],
        "id long, val string, ts string").withColumn("ts", F.to_timestamp("ts"))
    v1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    streaming_upsert_sync(spark, src, schema, tgt, ckpt,
                          key_cols=["id"], ts_col="ts")

    # stale aside copy with DIFFERENT (older) content than target
    stale = spark.createDataFrame(
        [(99, "stale", "2020-01-01 00:00:00")],
        "id long, val string, ts string").withColumn("ts", F.to_timestamp("ts"))
    stale.write.mode("overwrite").parquet(tgt + "__old")

    v2 = spark.createDataFrame(
        [(2, "b", "2024-01-02 00:00:00")],
        "id long, val string, ts string").withColumn("ts", F.to_timestamp("ts"))
    v2.write.mode("append").parquet(src)
    streaming_upsert_sync(spark, src, schema, tgt, ckpt,
                          key_cols=["id"], ts_col="ts")

    got = {r["id"]: r["val"] for r in spark.read.parquet(tgt).collect()}
    assert got == {1: "a", 2: "b"}  # stale copy discarded, not resurrected


def test_available_now_with_transform(spark, orders, tmp_path):
    src = str(tmp_path / "src")
    orders.limit(50).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    incremental_file_sync(
        spark, src, schema, str(tmp_path / "tgt"), str(tmp_path / "ckpt"),
        transform=lambda df: df.filter(F.col("o_orderkey") % 2 == 0)
                               .select("o_orderkey", "o_totalprice"))
    out = spark.read.parquet(str(tmp_path / "tgt"))
    assert out.columns == ["o_orderkey", "o_totalprice"]
    assert out.filter(F.col("o_orderkey") % 2 == 1).count() == 0


def test_windowed_counts_streaming_matches_batch(spark, events, tmp_path):
    """The same windowed-agg plan over a stream (availableNow) and over
    the batch DataFrame must agree — streaming is a scheduling mode, not
    different semantics."""
    src = str(tmp_path / "ev")
    ev = events.select("event_id", "user_id", "event_type", "ts", "value")
    ev.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    agg = windowed_event_counts(stream, window_duration="1 day")
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["window"]["start"], r["n_events"])
           for r in spark.sql("SELECT * FROM win_counts").collect()}

    expect = {(r["window"]["start"], r["n_events"])
              for r in windowed_event_counts(ev, window_duration="1 day").collect()}
    assert got == expect and len(got) > 0


def test_session_windows_have_gap_semantics(spark, events):
    out = sessionized_counts(events.limit(2000), gap="30 minutes")
    row = out.first()
    assert row["session_window"]["start"] <= row["session_window"]["end"]
    assert out.count() > 0
