"""Structured-Streaming form of the incremental sync loop.

The reference's cron/Airflow-driven micro-batch loop (SURVEY §2.12;
parcel_download_hourly_run.sh, src/cli/airflow_integration.py) is exactly
what ``trigger(availableNow=True)`` + a checkpoint does natively: each
invocation processes all new files since the last checkpoint, exactly
once, then stops. The checkpoint subsumes the watermark's file-tracking
role; the CDC predicate still applies inside the micro-batch.

Also provides real event-time windowed aggregation (tumbling / sliding /
session) with lateness watermarks — a capability the reference lacks
entirely (its "watermark" is a progress cursor, not a lateness bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def incremental_file_sync(
    spark: SparkSession,
    source_glob: str,
    schema: T.StructType,
    target_path: str,
    checkpoint_path: str,
    transform=None,
) -> None:
    """One availableNow pass: new files -> transform -> append target.

    Exactly-once across restarts via the checkpoint — the streaming-native
    replacement for the processed_files blacklist (R1-R3 + P5 in one
    built-in mechanism)."""
    stream = spark.readStream.schema(schema).parquet(source_glob)
    if transform is not None:
        stream = transform(stream)
    (stream.writeStream
           .format("parquet")
           .option("path", target_path)
           .option("checkpointLocation", checkpoint_path)
           .trigger(availableNow=True)
           .start()
           .awaitTermination())


def _recover_swap(target_path: str) -> None:
    """Repair a half-finished merge swap before the stream starts.

    Possible crash states of ``_merge``'s swap: a stale ``__tmp`` (crash
    mid-write or pre-promote — discard, the checkpoint will replay the
    batch), a ``__old`` with no target (crash between the two renames —
    restore it), or both target and ``__old`` (crash before the final
    cleanup — drop the old copy)."""
    import os
    import shutil

    tmp = target_path.rstrip("/") + "__tmp"
    old = target_path.rstrip("/") + "__old"
    shutil.rmtree(tmp, ignore_errors=True)
    if os.path.exists(old):
        if os.path.exists(target_path):
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(old, target_path)


def streaming_upsert_sync(
    spark: SparkSession,
    source_glob: str,
    schema: T.StructType,
    target_path: str,
    checkpoint_path: str,
    key_cols: list[str],
    ts_col: str,
) -> None:
    """Streaming CDC UPSERT: each micro-batch is compacted to its latest
    record per key, then merged into the target — existing keys are
    rewritten with the new version, new keys appended. The reference is
    append-only + offline compaction; this closes the loop for
    update-heavy CDC streams.

    Merge = per-batch anti-join rewrite: target rows whose key appears in
    the batch are dropped and replaced. The rewrite is a full target pass
    per batch — correct and simple at this scale; a table format with
    MERGE (Delta/Iceberg) replaces the rewrite with file-level pruning at
    100 TB, same logical plan. Exactly-once across restarts comes from
    the checkpoint (replayed batches re-merge idempotently — the merge is
    a set operation, not an append) plus a crash-atomic directory swap:
    the old target is renamed aside before the new one takes its place,
    and ``_recover_swap`` repairs any half-finished swap at startup, so
    no crash window can lose pre-batch keys."""
    from ..operators.dedup import latest_record_dedup

    _recover_swap(target_path)

    def _merge(batch_df: DataFrame, _epoch: int) -> None:
        import os as _os
        import shutil as _sh
        sp = batch_df.sparkSession
        batch = latest_record_dedup(batch_df, key_cols, ts_col)
        if _os.path.exists(target_path):
            cur = sp.read.parquet(target_path)
            keep = cur.join(batch.select(*key_cols), key_cols, "left_anti")
            merged = keep.unionByName(batch)
        else:
            merged = batch
        # write-then-swap: never overwrite the directory being read, and
        # never leave a window with no target — rename the current target
        # aside, promote the new one, then drop the old. A crash at any
        # point leaves either target or target__old intact for
        # _recover_swap to restore.
        tmp = target_path.rstrip("/") + "__tmp"
        old = target_path.rstrip("/") + "__old"
        merged.write.mode("overwrite").parquet(tmp)
        _sh.rmtree(old, ignore_errors=True)
        if _os.path.exists(target_path):
            _os.rename(target_path, old)
        _os.rename(tmp, target_path)
        _sh.rmtree(old, ignore_errors=True)

    (spark.readStream.schema(schema).parquet(source_glob)
          .writeStream.foreachBatch(_merge)
          .option("checkpointLocation", checkpoint_path)
          .trigger(availableNow=True)
          .start()
          .awaitTermination())


def streaming_change_log_sync(
    spark: SparkSession,
    source_glob: str,
    schema: T.StructType,
    target_path: str,
    checkpoint_path: str,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> None:
    """Streaming LOG-BASED CDC sink: micro-batches of Debezium-shaped
    change rows (op c/u/d + monotone sequence + full row image) are
    folded into a materialized table — the streaming form of
    ``operators.cdc.apply_change_log`` and the delete-aware completion
    of :func:`streaming_upsert_sync` (which has no 'd' concept).

    Out-of-order safety: the target RETAINS DELETE TOMBSTONES (the
    stored rows keep ``seq_col`` and ``op_col``). Each merge treats the
    current target as log entries and re-compacts target ∪ batch by
    max(struct(seq, ...)), so a stale update replayed AFTER its key's
    tombstone (at-least-once delivery, shuffled batch boundaries)
    cannot resurrect the row — the tombstone's higher seq wins. This is
    Kafka-compaction semantics; drop tombstones on a retention schedule
    with plans/cleanup.py if the key space churns. Read the live view
    with :func:`read_change_log_target`.

    Exactly-once across restarts = checkpoint (replays re-merge
    idempotently: compaction is a max, not an append) + the same
    crash-atomic rename-aside swap as the upsert sink."""
    from ..operators.cdc import compact_change_log

    _recover_swap(target_path)

    def _merge(batch_df: DataFrame, _epoch: int) -> None:
        import os as _os
        import shutil as _sh
        sp = batch_df.sparkSession
        batch = compact_change_log(batch_df, key_cols, seq_col, op_col)
        if _os.path.exists(target_path):
            cur = sp.read.parquet(target_path)
            # additive schema evolution: a column newly added to the
            # source (the routine ALTER TABLE ... ADD COLUMN a CDC tap
            # forwards) appears in the batch but not the stored target —
            # allowMissingColumns backfills NULL on the old rows, the
            # correct relational answer. Columns DROPPED upstream keep
            # their stored values on untouched keys (tombstone-grade
            # history, never invented data).
            merged = compact_change_log(
                cur.unionByName(batch, allowMissingColumns=True),
                key_cols, seq_col, op_col)
        else:
            merged = batch
        tmp = target_path.rstrip("/") + "__tmp"
        old = target_path.rstrip("/") + "__old"
        merged.write.mode("overwrite").parquet(tmp)
        _sh.rmtree(old, ignore_errors=True)
        if _os.path.exists(target_path):
            _os.rename(target_path, old)
        _os.rename(tmp, target_path)
        _sh.rmtree(old, ignore_errors=True)

    (spark.readStream.schema(schema).parquet(source_glob)
          .writeStream.foreachBatch(_merge)
          .option("checkpointLocation", checkpoint_path)
          .trigger(availableNow=True)
          .start()
          .awaitTermination())


def read_change_log_target(spark: SparkSession, target_path: str,
                           seq_col: str, op_col: str = "op") -> DataFrame:
    """Live view of a :func:`streaming_change_log_sync` target: filter
    delete tombstones, drop the bookkeeping columns."""
    cur = spark.read.parquet(target_path)
    return (cur.where(F.lower(F.col(op_col)) != "d")
               .drop(op_col, seq_col))


def streaming_merge_versioned(
    spark: SparkSession,
    source_glob: str,
    schema: T.StructType,
    table_path: str,
    checkpoint_path: str,
    key_cols: list[str],
    ts_col: str,
) -> None:
    """Streaming CDC upsert into a :class:`plans.versioned.VersionedTable`
    — the 100 TB successor to :func:`streaming_upsert_sync`'s full-target
    rewrite, exactly as that docstring promises: each micro-batch is
    compacted to its latest record per key and MERGEd copy-on-write, so
    only the files containing touched keys are rewritten and every batch
    publishes an atomic, time-travelable version.

    Exactly-once without the directory swap: the streaming checkpoint
    replays at-least-once, and each batch stamps ``cdc-batch-{epoch}``
    as its manifest note — a replayed batch finds its own note and
    skips, so redelivery cannot double-apply. (The note check + commit
    run on the single writer, per VersionedTable's contract.)"""
    from ..operators.dedup import latest_record_dedup
    from ..plans.versioned import VersionedTable

    table = VersionedTable(spark, table_path)

    def _merge(batch_df: DataFrame, epoch: int) -> None:
        note = f"cdc-batch-{epoch}"
        if table.find_note(note) is not None:
            return                      # replayed batch: already landed
        if batch_df.isEmpty():
            return                      # no empty versions
        batch = latest_record_dedup(batch_df, key_cols, ts_col)
        table.merge(batch, keys=key_cols, note=note)

    (spark.readStream.schema(schema).parquet(source_glob)
          .writeStream.foreachBatch(_merge)
          .option("checkpointLocation", checkpoint_path)
          .trigger(availableNow=True)
          .start()
          .awaitTermination())


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark_delay: str = "1 hour",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling/sliding event-time aggregation with a lateness watermark.

    Works on both batch and streaming DataFrames (same plan). For
    streaming input the watermark bounds state size — at 100 TB/day of
    events the state store holds only open windows."""
    streaming = events.isStreaming
    if streaming:
        events = events.withWatermark(ts_col, watermark_delay)
    w = F.window(F.col(ts_col), window_duration, slide_duration or window_duration)
    keys = [w] + [F.col(c) for c in (group_cols or [])]
    return (events.groupBy(*keys)
                  .agg(F.count(F.lit(1)).alias("n_events"),
                       F.sum("value").alias("sum_value")))


def sessionized_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    user_col: str = "user_id",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Session windows (gap-based) per user — `session_window` is
    state-store-backed in streaming, shuffle-once in batch."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark_delay)
    return (events.groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
                  .agg(F.count(F.lit(1)).alias("n_events"),
                       F.sum("value").alias("sum_value")))


def streaming_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Exactly-once event dedup for at-least-once CDC feeds: drop re-
    deliveries of the same key. Batch input -> plain dropDuplicates;
    streaming input -> dropDuplicatesWithinWatermark, whose state store
    holds only keys younger than the lateness bound — at 100 TB/day the
    state is O(keys per watermark window), not O(all keys ever), which is
    what makes streaming dedup feasible at all. Same logical result on
    both paths for data whose duplicates arrive within the delay."""
    if df.isStreaming:
        return (df.withWatermark(ts_col, watermark_delay)
                  .dropDuplicatesWithinWatermark(key_cols))
    return df.dropDuplicates(key_cols)


def stream_stream_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    user_col: str = "user_id",
    purchase_ts: str = "p_ts",
    click_ts: str = "c_ts",
    lookback: str = "2 hours",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner interval join: each purchase pairs with the
    same user's clicks in [p_ts - lookback, p_ts]. With watermarks on
    BOTH sides plus the time-range condition, Spark bounds the join state
    to the interval width — the streaming analog of the batch bucketed
    range join (operators/temporal.py). Batch inputs run the identical
    plan (the watermark is a no-op there), so stream/batch equivalence is
    testable query-for-query."""
    p = purchases
    c = clicks
    if p.isStreaming:
        p = p.withWatermark(purchase_ts, watermark_delay)
    if c.isStreaming:
        c = c.withWatermark(click_ts, watermark_delay)
    cond = (
        (p[user_col] == c[user_col])
        & (c[click_ts] >= p[purchase_ts] - F.expr(f"INTERVAL {lookback}"))
        & (c[click_ts] <= p[purchase_ts])
    )
    return p.join(c, cond).drop(c[user_col])


def streaming_curate(
    spark: SparkSession,
    source_glob: str,
    schema: T.StructType,
    out_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    min_quality: float = 0.3,
    scrub: bool = True,
    gopher_min_words: int | None = None,
) -> None:
    """Streaming corpus intake: each availableNow pass takes newly
    crawled document files through quality gate -> cross-batch exact
    dedup -> PII redaction -> corpus append, exactly once.
    ``gopher_min_words`` additionally applies the Gopher rule gate
    (same per-row expressions as the batch funnel's stage 0), so the
    streaming and batch intake paths enforce one contract.

    The dedup is ``dropDuplicates`` on the content digest with NO
    watermark: corpus identity never expires, so the state store keeps
    one 16-byte digest per distinct document ever seen — the streaming
    ledger form of exact_dedup (bounded by distinct docs, not by time;
    back it with the RocksDB state store at 100 TB). Re-running after a
    crash is safe: the checkpoint replays the batch and the digest state
    drops what already shipped."""
    from ..operators import text as tx

    stream = spark.readStream.schema(schema).parquet(source_glob)
    if gopher_min_words is not None:
        stream = stream.filter(tx.gopher_keep_expr(
            F.col(text_col), min_words=gopher_min_words))
    cleaned = (stream
               .filter(tx.quality_score(F.col(text_col)) >= min_quality)
               .withColumn("content_hash",
                           F.md5(F.col(text_col).cast("binary")))
               .dropDuplicates(["content_hash"])
               .drop("content_hash"))
    if scrub:
        cleaned = cleaned.withColumn(text_col, tx.scrub_pii(F.col(text_col)))
    (cleaned.writeStream
            .format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start()
            .awaitTermination())


def streaming_moments_maintenance(
    spark: SparkSession,
    source_glob: str,
    schema: T.StructType,
    state_path: str,
    checkpoint_path: str,
    vec_col: str = "embedding",
    dim: int = 64,
) -> None:
    """Streaming covariance maintenance: each availableNow micro-batch
    is reduced to its (n, Σx, ΣxxT) sufficient statistics
    (decomposition.second_moment_partials — one Arrow kernel pass,
    O(batch-partitions) partial rows) and folded into a parquet-backed
    (pos, val) moments state of exactly ``1 + dim + dim^2`` doubles.
    Moment additivity (decomposition.merge_moments) makes the fold an
    exact ⊕, so the corpus-wide covariance/PCA basis stays current
    without ever re-reading earlier batches — the streaming twin of the
    batch covariance_stats scan, finalized by
    :func:`read_moments_state` + decomposition.cov_from_moments.

    State stays DOUBLE (no decimal quantization like IncrementalRollup):
    the gram terms feed an eigendecomposition, where quantizing to a
    fixed scale would bias small eigenvalues. The swap is the same
    rename-aside crash-safe protocol as streaming_upsert_sync; the
    checkpoint gives at-least-once batch delivery with the same
    one-batch re-fold window streaming_sketch_maintenance documents."""
    from ..operators.decomposition import second_moment_partials

    _recover_swap(state_path)

    def _fold(batch_df: DataFrame, _epoch: int) -> None:
        import os as _os
        import shutil as _sh
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        parts = second_moment_partials(batch_df, vec_col, dim)
        delta = (parts.select(
            F.posexplode(F.concat(F.array(F.col("n").cast("double")),
                                  "s", "g")).alias("pos", "val"))
            .groupBy("pos").agg(F.sum("val").alias("val")))
        if _os.path.exists(state_path):
            cur = sp.read.parquet(state_path)
            merged = (cur.unionByName(delta)
                      .groupBy("pos").agg(F.sum("val").alias("val")))
        else:
            merged = delta
        tmp = state_path.rstrip("/") + "__tmp"
        old = state_path.rstrip("/") + "__old"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        _sh.rmtree(old, ignore_errors=True)
        if _os.path.exists(state_path):
            _os.rename(state_path, old)
        _os.rename(tmp, state_path)
        _sh.rmtree(old, ignore_errors=True)

    (spark.readStream.schema(schema).parquet(source_glob)
          .writeStream.foreachBatch(_fold)
          .option("checkpointLocation", checkpoint_path)
          .trigger(availableNow=True)
          .start()
          .awaitTermination())


def read_moments_state(spark: SparkSession, state_path: str,
                       dim: int) -> tuple[int, list, list]:
    """Load a streaming moments state back into the
    decomposition-module form ``(n, sum_vec, gram_flat)``."""
    vals = [0.0] * (1 + dim + dim * dim)
    for r in spark.read.parquet(state_path).collect():
        vals[r["pos"]] = r["val"]
    return int(round(vals[0])), vals[1:1 + dim], vals[1 + dim:]


def streaming_sketch_maintenance(
    spark: SparkSession,
    source_glob: str,
    schema: T.StructType,
    state_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    depth: int = 4,
    width: int = 512,
) -> None:
    """Streaming count-min maintenance: each availableNow micro-batch is
    sketched (one groupBy to <= depth*width counter rows) and folded into
    the parquet-backed rollup state — the corpus-wide token-frequency
    sketch stays current without ever re-reading earlier batches.

    Counter-wise additivity makes this exactly IncrementalRollup over
    (d, bucket) (pinned batch-side by
    test_rollup.py::test_incremental_cms_sketch_maintenance); the state
    swap is the same rename-aside crash-safe protocol as
    streaming_upsert_sync. foreachBatch + the checkpoint give
    at-least-once batch delivery with idempotent replay ONLY up to the
    swap (a crash between rollup commit and checkpoint commit would
    re-fold one batch); production hardening is a batch-id ledger column
    in the rollup state, noted here rather than built because the
    failure window is the same one streaming_upsert_sync documents."""
    from ..operators.sketches import cms_sketch
    from ..plans.rollup import IncrementalRollup

    rollup = IncrementalRollup(spark, state_path,
                               keys=["d", "bucket"], value_col="c")

    def _fold(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        rollup.apply(cms_sketch(batch_df, text_col, depth=depth,
                                width=width))

    (spark.readStream.schema(schema).parquet(source_glob)
          .writeStream.foreachBatch(_fold)
          .option("checkpointLocation", checkpoint_path)
          .trigger(availableNow=True)
          .start()
          .awaitTermination())


def streaming_scd2_maintenance(
    spark: SparkSession,
    source_glob: str,
    schema: T.StructType,
    state_path: str,
    checkpoint_path: str,
    key_col: str,
    attr_col: str,
    ts_col: str,
    seq_col: str,
) -> None:
    """Streaming Type 2 dimension maintenance: each availableNow
    micro-batch of CDC rows folds into the SCD2 target (touched-keys
    rewrite only — plans/scd2.py). SCD2Target.apply drops replayed
    rows older than the open segment, so foreachBatch's at-least-once
    redelivery is absorbed (same caveat window as
    streaming_sketch_maintenance: a crash between state swap and
    checkpoint commit replays one batch, which here is a no-op)."""
    from ..plans.scd2 import SCD2Target

    target = SCD2Target(spark, state_path, key_col, attr_col, ts_col,
                        seq_col)

    def _fold(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        target.apply(batch_df)

    (spark.readStream.schema(schema).parquet(source_glob)
          .writeStream.foreachBatch(_fold)
          .option("checkpointLocation", checkpoint_path)
          .trigger(availableNow=True)
          .start()
          .awaitTermination())


def streaming_neardup_curate(
    spark: SparkSession,
    source_glob: str,
    schema: T.StructType,
    out_path: str,
    checkpoint_path: str,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
) -> None:
    """Streaming NEAR-dup corpus intake: each availableNow micro-batch
    probes the persisted LSH index (operators/dedup.py save_lsh_index)
    for near-dups against everything already admitted, drops batch docs
    that collide with the corpus (corpus-wins canonical rule: the
    streaming path never retro-deletes shipped rows) and, within the
    batch, keeps the lowest id per colliding pair; survivors append to
    the corpus AND their signatures to the index — so batch k+1 dedups
    against batch k without any corpus rescan. streaming_curate's
    digest ledger is the EXACT twin; this is the fuzzy one.

    Scale shape per micro-batch: signature pipeline over the batch only
    (zero shuffle), banded rows broadcast against the index scan, index
    append is O(batch x bands) rows. foreachBatch replay after a crash
    is probe-safe: a replayed doc finding its own already-appended
    signature is removed by the id-equality filter, and duplicated
    banded rows only duplicate candidates, which the pair-side distinct
    absorbs; the corpus append is the one at-least-once seam (same
    contract as streaming_sketch_maintenance, documented there)."""
    import os as _os

    from ..operators import dedup as dd

    def _fold(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.localCheckpoint()        # reused 3x below
        arr = dd.minhash_signature_array(batch_df, text_col, id_col,
                                         n, num_hashes)
        banded = dd._banded_from_array(arr, id_col, num_hashes, bands) \
                   .localCheckpoint()
        intra = dd._pairs_from_banded(banded, id_col)
        drop = intra.select(F.col("id_b").alias(id_col))
        if _os.path.exists(index_path):
            cross = dd._index_cross_pairs(spark, banded, index_path,
                                          id_col)
            hit = (cross.select(F.col("id_a").alias(id_col))
                        .unionByName(cross.select(
                            F.col("id_b").alias(id_col))))
            drop = drop.unionByName(hit)
        keep = batch_df.join(drop.distinct(), id_col, "left_anti") \
                       .localCheckpoint()
        keep.write.mode("append").parquet(out_path)
        dd.lsh_index_add(spark, keep, index_path, text_col, id_col,
                         n, num_hashes, bands)

    (spark.readStream.schema(schema).parquet(source_glob)
          .writeStream.foreachBatch(_fold)
          .option("checkpointLocation", checkpoint_path)
          .trigger(availableNow=True)
          .start()
          .awaitTermination())


def streaming_ann_intake(
    spark: SparkSession,
    schema: T.StructType,
    source_glob: str,
    checkpoint_path: str,
    index_path: str,
    data_path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[dict]:
    """Streaming VECTOR intake into the persisted IVF index: each
    availableNow micro-batch is assigned with the FROZEN coarse
    quantizer and partition-appended into the centroid_id layout
    (operators/similarity.py ivf_index_add) — inverted lists grow in
    place, nothing re-clusters, searches see new vectors as soon as
    the batch lands. Returns the per-batch drift signals (mean squared
    distance of added vectors to their assigned centroid): a sustained
    rise across batches is the re-train trigger, the streaming twin of
    checking drift on each bulk add.

    Scale shape per micro-batch: assignment is the zero-shuffle
    literal-centroid argmin over batch rows only; the append touches
    only the ``centroid_id=`` directories the batch hits. foreachBatch
    replay after a crash can re-append a batch (at-least-once seam,
    same contract as streaming_neardup_intake's corpus append);
    compaction or an id-dedup read view absorbs it downstream."""
    from ..operators import similarity as sim

    stats: list[dict] = []

    def _fold(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        stats.append(sim.ivf_index_add(spark, batch_df, index_path,
                                       data_path, vec_col, id_col))

    (spark.readStream.schema(schema).parquet(source_glob)
          .writeStream.foreachBatch(_fold)
          .option("checkpointLocation", checkpoint_path)
          .trigger(availableNow=True)
          .start()
          .awaitTermination())
    return stats


def streaming_agg_maintenance(
    spark: SparkSession,
    source_glob: str,
    schema: T.StructType,
    state_path: str,
    checkpoint_path: str,
    keys: list[str],
    value_col: str,
    op_col: str | None = None,
) -> None:
    """Streaming CDC-aware aggregate maintenance: each availableNow
    micro-batch folds into the parquet-backed grouped aggregate —
    inserts ⊕-merge, and (when ``op_col`` is given, 'I'/'D' rows)
    deletes ⊖-retract — so the materialized aggregate tracks an
    upstream table under both appends and deletes without ever
    re-reading earlier batches.

    Retraction semantics follow IncrementalRollup.apply_deletes:
    count/sum/avg/stddev stay exact; min/max on delete-touched groups
    go NULL (recompute-to-know markers). Delivery contract matches
    streaming_sketch_maintenance: at-least-once batch replay with the
    same commit-window caveat, documented there."""
    from ..plans.rollup import IncrementalRollup

    rollup = IncrementalRollup(spark, state_path, keys=keys,
                               value_col=value_col)

    def _fold(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        if op_col is None:
            rollup.apply(batch_df)
            return
        ins = batch_df.where(F.col(op_col) == "I").drop(op_col)
        dels = batch_df.where(F.col(op_col) == "D").drop(op_col)
        if not ins.isEmpty():
            rollup.apply(ins)
        if not dels.isEmpty():
            rollup.apply_deletes(dels)

    (spark.readStream.schema(schema).parquet(source_glob)
          .writeStream.foreachBatch(_fold)
          .option("checkpointLocation", checkpoint_path)
          .trigger(availableNow=True)
          .start()
          .awaitTermination())
