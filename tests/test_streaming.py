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


def test_streaming_dedup_matches_batch(spark, events, tmp_path):
    """dropDuplicatesWithinWatermark over a stream == dropDuplicates over
    the batch frame when all duplicates arrive inside the delay."""
    from s3_redshift_backup_tool_spark.streaming.incremental import streaming_dedup

    src = str(tmp_path / "ev")
    ev = events.select("event_id", "user_id", "ts").limit(500)
    dup = ev.union(ev.limit(100))  # re-deliver 100 events
    dup.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    q = (streaming_dedup(stream, ["event_id"], "ts")
         .writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT count(*) c, count(DISTINCT event_id) d "
                    "FROM dedup_out").first()

    batch = streaming_dedup(spark.read.parquet(src), ["event_id"], "ts")
    assert got["c"] == got["d"] == batch.count() == 500


def test_stream_stream_interval_join_matches_batch(spark, events, tmp_path):
    """Stream-stream interval join (watermarked both sides) produces the
    same pairs as the identical batch plan."""
    from s3_redshift_backup_tool_spark.streaming.incremental import (
        stream_stream_attribution)

    ev = events.limit(4000)
    clicks_df = (ev.filter(F.col("event_type") == "click")
                   .select("user_id", F.col("ts").alias("c_ts"),
                           F.col("event_id").alias("click_id")))
    buys_df = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("ts").alias("p_ts"),
                         F.col("event_id").alias("purchase_id")))
    cpath, ppath = str(tmp_path / "clicks"), str(tmp_path / "buys")
    clicks_df.write.parquet(cpath)
    buys_df.write.parquet(ppath)

    cs = spark.readStream.schema(clicks_df.schema).parquet(cpath)
    ps = spark.readStream.schema(buys_df.schema).parquet(ppath)
    q = (stream_stream_attribution(ps, cs)
         .writeStream.format("memory").queryName("ssj_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["purchase_id"], r["click_id"])
           for r in spark.sql("SELECT purchase_id, click_id FROM ssj_out").collect()}

    expect = {(r["purchase_id"], r["click_id"])
              for r in stream_stream_attribution(
                  spark.read.parquet(ppath), spark.read.parquet(cpath))
              .select("purchase_id", "click_id").collect()}
    assert got == expect and len(expect) > 0


def test_streaming_curate_dedups_across_batches(spark, tmp_path):
    """Corpus intake stream: quality gate + cross-batch content dedup +
    PII scrub, exactly once across separate availableNow runs."""
    from s3_redshift_backup_tool_spark.streaming.incremental import (
        streaming_curate)

    src = str(tmp_path / "crawl")
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    good = ("the quick brown fox jumps over the lazy dog with many more "
            "plain words that pass the quality threshold easily here")

    b1 = spark.createDataFrame(
        [(1, good + " v1 mail me a@b.co"),
         (2, good + " v1 mail me a@b.co"),     # in-batch exact dup of 1
         (3, "!!!###$$$")],                     # junk: fails quality
        "doc_id long, text string")
    b1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    streaming_curate(spark, src, schema, out, ckpt, min_quality=0.3)
    first = spark.read.parquet(out).collect()
    assert len(first) == 1                      # dup + junk dropped
    assert "<EMAIL>" in first[0]["text"] and "a@b.co" not in first[0]["text"]

    b2 = spark.createDataFrame(
        [(4, good + " v1 mail me a@b.co"),      # cross-batch dup of 1
         (5, good + " v2 genuinely new")],
        "doc_id long, text string")
    b2.write.mode("append").parquet(src)
    streaming_curate(spark, src, schema, out, ckpt, min_quality=0.3)
    final = spark.read.parquet(out).collect()
    assert len(final) == 2                      # only the new doc appended
    ids = {r["doc_id"] for r in final}
    # which in-batch duplicate (1 or 2) survived is partition-order
    # dependent; the cross-batch duplicate (4) must never appear
    assert 5 in ids and 4 not in ids and len(ids & {1, 2}) == 1


def test_streaming_sketch_maintenance(spark, tmp_path):
    """The corpus token-frequency CMS stays current across availableNow
    runs without re-reading earlier batches, and equals the sketch of
    everything seen; a re-run with no new files changes nothing."""
    from s3_redshift_backup_tool_spark.operators.sketches import cms_sketch
    from s3_redshift_backup_tool_spark.plans.rollup import IncrementalRollup
    from s3_redshift_backup_tool_spark.streaming.incremental import (
        streaming_sketch_maintenance)

    src = str(tmp_path / "crawl")
    state = str(tmp_path / "cms_state")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame(
        [(1, "spark joins rows fast"), (2, "rows shuffle slow")],
        "doc_id long, text string")
    b1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    streaming_sketch_maintenance(spark, src, schema, state, ckpt)

    b2 = spark.createDataFrame([(3, "spark spark merge")],
                               "doc_id long, text string")
    b2.write.mode("append").parquet(src)
    streaming_sketch_maintenance(spark, src, schema, state, ckpt)
    # idempotent no-op pass: no new files, state unchanged
    streaming_sketch_maintenance(spark, src, schema, state, ckpt)

    rollup = IncrementalRollup(spark, state, keys=["d", "bucket"],
                               value_col="c")
    got = {(r["d"], r["bucket"]): int(r["sum_value"])
           for r in rollup.read().collect()}
    want = {(r["d"], r["bucket"]): r["c"]
            for r in cms_sketch(spark.read.parquet(src)).collect()}
    assert got == want


def test_streaming_curate_gopher_gate(spark, tmp_path):
    """The streaming intake enforces the same Gopher rule contract as
    the batch funnel's stage 0."""
    from s3_redshift_backup_tool_spark.streaming.incremental import (
        streaming_curate)

    src = str(tmp_path / "crawl")
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    long_good = ("the quick brown fox jumps over the lazy dog and it "
                 "keeps going with plenty of plain words in a sentence "
                 "that easily clears a forty word minimum because it "
                 "just keeps adding ordinary words to the end of it")
    short_doc = "too short to pass the gate"
    spark.createDataFrame([(1, long_good), (2, short_doc)],
                          "doc_id long, text string") \
        .write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    streaming_curate(spark, src, schema, out, ckpt, min_quality=0.0,
                     scrub=False, gopher_min_words=40)
    rows = spark.read.parquet(out).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_streaming_merge_versioned_exactly_once(spark, tmp_path):
    """Streaming CDC upsert into the versioned table: latest version
    wins, each batch publishes one time-travelable version, and a
    replayed batch (same epoch note) is a no-op."""
    from s3_redshift_backup_tool_spark.plans.versioned import VersionedTable
    from s3_redshift_backup_tool_spark.streaming.incremental import (
        streaming_merge_versioned,
    )
    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    v1 = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00"), (2, "b", "2024-01-01 00:00:00")],
        "id long, val string, ts string").withColumn("ts", F.to_timestamp("ts"))
    v1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    streaming_merge_versioned(spark, src, schema, tbl, ckpt,
                              key_cols=["id"], ts_col="ts")
    t = VersionedTable(spark, tbl)
    assert {r["id"] for r in t.read().collect()} == {1, 2}
    v_after_1 = t.current_version()

    v2 = spark.createDataFrame(
        [(2, "b2", "2024-01-02 00:00:00"), (3, "c", "2024-01-02 00:00:00")],
        "id long, val string, ts string").withColumn("ts", F.to_timestamp("ts"))
    v2.write.mode("append").parquet(src)
    streaming_merge_versioned(spark, src, schema, tbl, ckpt,
                              key_cols=["id"], ts_col="ts")
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got == {1: "a", 2: "b2", 3: "c"}
    # pre-merge snapshot still readable (time travel across batches)
    old = {r["id"]: r["val"] for r in t.read(version=v_after_1).collect()}
    assert old == {1: "a", 2: "b"}

    # no new source files -> no new version (empty batch short-circuit
    # plus checkpoint: nothing replays)
    cur = t.current_version()
    streaming_merge_versioned(spark, src, schema, tbl, ckpt,
                              key_cols=["id"], ts_col="ts")
    assert t.current_version() == cur

    # simulated redelivery: a batch whose epoch note already landed is
    # skipped even without the checkpoint's help
    note = t._read_manifest(cur)["note"]
    assert note and note.startswith("cdc-batch-")
    before_versions = t.versions()
    # re-running with a FRESH checkpoint replays all files as epoch 0;
    # its note equals the first batch's -> skipped, table unchanged
    ckpt2 = str(tmp_path / "ckpt2")
    streaming_merge_versioned(spark, src, schema, tbl, ckpt2,
                              key_cols=["id"], ts_col="ts")
    assert t.versions() == before_versions
    assert {r["id"]: r["val"] for r in t.read().collect()} == got


def test_stream_static_dimension_enrichment(spark, tmp_path):
    """Stream-static join: a streaming fact enriched against a static
    dimension — Spark plans the static side as an ordinary (re-read per
    micro-batch) broadcast/hash join, no watermark needed. The
    completeness sibling of the stream-stream interval join."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "basic")], "user_id long, tier string")
    spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (1, 7.0), (3, 99.0)],
        "user_id long, value double").write.parquet(src)
    schema = spark.read.parquet(src).schema

    q = (spark.readStream.schema(schema).parquet(src)
              .join(dim, "user_id", "left")
              .groupBy("tier")
              .agg(F.sum("value").alias("total"))
              .writeStream.outputMode("complete")
              .format("memory").queryName("enriched")
              .option("checkpointLocation", ckpt)
              .trigger(availableNow=True)
              .start())
    q.awaitTermination()
    got = {r["tier"]: r["total"] for r in
           spark.sql("SELECT * FROM enriched").collect()}
    assert got == {"gold": 17.0, "basic": 5.0, None: 99.0}


def test_streaming_neardup_curate_across_batches(spark, tmp_path):
    """Fuzzy twin of streaming_curate: NEAR-dups (edited copies, not
    byte-identical) are dropped across availableNow runs via the
    persisted LSH index; survivors' signatures append so batch 2
    dedups against batch 1 without a corpus rescan."""
    from s3_redshift_backup_tool_spark.streaming.incremental import (
        streaming_neardup_curate)

    src = str(tmp_path / "crawl")
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "lsh_index")
    base = ("the quick brown fox jumps over the lazy dog near the old "
            "stone bridge on a quiet spring morning in the valley")

    b1 = spark.createDataFrame(
        [(1, base + " today"),
         (2, base + " tonight"),                # near-dup of 1, higher id
         (3, "completely different maritime law content with unique "
             "vocabulary about admiralty courts and salvage rights")],
        "doc_id long, text string")
    b1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    streaming_neardup_curate(spark, src, schema, out, ckpt, idx)
    first = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert first == {1, 3}                      # intra near-dup 2 dropped

    b2 = spark.createDataFrame(
        [(4, base + " tomorrow"),               # near-dup of corpus doc 1
         (5, "fresh astronomy text about telescopes nebulae and the "
             "parallax measurement of nearby stellar distances")],
        "doc_id long, text string")
    b2.write.mode("append").parquet(src)
    streaming_neardup_curate(spark, src, schema, out, ckpt, idx)
    final = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert final == {1, 3, 5}                   # 4 caught by index probe
    # index holds signatures for exactly the admitted docs
    idx_ids = {r["doc_id"]
               for r in spark.read.parquet(idx).select("doc_id").collect()}
    assert idx_ids == {1, 3, 5}


def test_streaming_ann_intake_grows_ivf_index(spark, tmp_path, sf_dir):
    """Streaming vectors land in the centroid_id-partitioned IVF
    layout with the FROZEN quantizer: assignments match the batch
    path exactly, per-batch drift signals come back, batch 2 appends
    without rewriting batch 1's lists, and the persisted-layout search
    sees everything streamed so far."""
    from s3_redshift_backup_tool_spark.operators import similarity as sim
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    from s3_redshift_backup_tool_spark.streaming.incremental import (
        streaming_ann_intake)

    emb = read_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding")
    cents = sim.ivf_centroids(emb, n_centroids=8)
    idx = str(tmp_path / "ivf_index")
    data = str(tmp_path / "ivf_data")
    src = str(tmp_path / "vecs")
    ckpt = str(tmp_path / "ckpt")
    sim.save_ivf_index(spark, cents, idx)

    b1 = emb.filter("vec_id < 200")
    b1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    s1 = streaming_ann_intake(spark, schema, src, ckpt, idx, data)
    assert len(s1) == 1 and s1[0]["n_added"] == 200
    assert s1[0]["mean_sq_dist"] > 0

    emb.filter("vec_id >= 200").write.mode("append").parquet(src)
    s2 = streaming_ann_intake(spark, schema, src, ckpt, idx, data)
    assert sum(s["n_added"] for s in s2) == emb.count() - 200

    stored = spark.read.parquet(data)
    assert stored.count() == emb.count()
    # frozen-quantizer assignments identical to the batch path
    batch = sim.ivf_assign(emb, cents).select("vec_id", "centroid_id")
    assert stored.select("vec_id", "centroid_id") \
        .exceptAll(batch).count() == 0

    # persisted-layout search over the streamed corpus == inline search
    qv = [float(v) for v in
          emb.filter("vec_id = 3").first()["embedding"]]
    got = [int(r["vec_id"]) for r in
           sim.ann_topk_indexed(spark, data, idx, qv, k=5).collect()]
    want = [int(r["vec_id"]) for r in
            sim.ann_topk_ivf(emb, qv, cents, k=5).collect()]
    assert got == want


def test_streaming_ann_intake_replay_seam(spark, tmp_path, sf_dir):
    """Pin the documented at-least-once contract: replaying a batch
    (fresh checkpoint over the same source) re-appends its vectors,
    and the standard latest-per-id read view recovers exactly the
    logical corpus — the downstream-dedup story the docstring
    promises."""
    from pyspark.sql import functions as F

    from s3_redshift_backup_tool_spark.operators import similarity as sim
    from s3_redshift_backup_tool_spark.operators.dedup import (
        latest_record_dedup)
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    from s3_redshift_backup_tool_spark.streaming.incremental import (
        streaming_ann_intake)

    emb = read_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding").filter("vec_id < 100")
    cents = sim.ivf_centroids(emb, n_centroids=4)
    idx = str(tmp_path / "idx")
    data = str(tmp_path / "data")
    src = str(tmp_path / "src")
    sim.save_ivf_index(spark, cents, idx)
    emb.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    streaming_ann_intake(spark, schema, src, str(tmp_path / "ck1"),
                         idx, data)
    # crash-replay: a FRESH checkpoint replays the whole source
    streaming_ann_intake(spark, schema, src, str(tmp_path / "ck2"),
                         idx, data)
    stored = spark.read.parquet(data)
    assert stored.count() == 200          # duplicated — at-least-once
    logical = latest_record_dedup(
        stored.withColumn("__ts", F.lit(0)), ["vec_id"], "__ts")
    assert logical.count() == 100
    assert logical.select("vec_id").exceptAll(
        emb.select("vec_id")).count() == 0


def test_streaming_agg_maintenance_with_deletes(spark, events, tmp_path):
    """CDC-aware streaming aggregate maintenance: inserts ⊕, deletes ⊖,
    final state equals a from-scratch aggregate of the survivors."""
    from s3_redshift_backup_tool_spark.plans.rollup import IncrementalRollup
    from s3_redshift_backup_tool_spark.streaming.incremental import (
        streaming_agg_maintenance)

    ev = events.select("event_id", "event_type", "value").limit(2000)
    src = str(tmp_path / "cdc_src")
    # batch 1: everything inserted; batch 2: every 5th row deleted
    ev.withColumn("op", F.lit("I")).write.parquet(src)
    (ev.filter(F.col("event_id") % 5 == 0)
       .withColumn("op", F.lit("D"))
       .write.mode("append").parquet(src))

    schema = spark.read.parquet(src).schema
    streaming_agg_maintenance(
        spark, src, schema,
        state_path=str(tmp_path / "agg_state"),
        checkpoint_path=str(tmp_path / "ckpt"),
        keys=["event_type"], value_col="value", op_col="op")

    ru = IncrementalRollup(spark, str(tmp_path / "agg_state"),
                           ["event_type"], "value")
    got = {r["event_type"]: r for r in ru.read().collect()}
    survivors = ev.filter(F.col("event_id") % 5 != 0)
    want = {r["event_type"]: r for r in
            survivors.groupBy("event_type")
                     .agg(F.count(F.lit(1)).alias("n"),
                          F.sum(F.col("value").cast("double")).alias("s"))
                     .collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n_rows"] == want[k]["n"]
        assert abs(got[k]["sum_value"] - want[k]["s"]) < 1e-6


def test_streaming_change_log_applies_cud_across_batches(spark, tmp_path):
    """Log-based CDC sink: creates, updates, and DELETES fold across
    micro-batches; the live view equals the batch apply of the whole
    log; a stale update replayed after its key's tombstone does not
    resurrect the row (out-of-order safety)."""
    from s3_redshift_backup_tool_spark.operators.cdc import apply_change_log
    from s3_redshift_backup_tool_spark.streaming.incremental import (
        read_change_log_target, streaming_change_log_sync)
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    SCH = "k long, v string, op string, seq long"

    b1 = spark.createDataFrame(
        [(1, "a", "c", 1), (2, "b", "c", 2), (3, "c", "c", 3)], SCH)
    b1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    run = lambda: streaming_change_log_sync(
        spark, src, schema, tgt, ckpt, key_cols=["k"], seq_col="seq")
    run()
    assert {tuple(r) for r in
            read_change_log_target(spark, tgt, "seq").collect()} == \
        {(1, "a"), (2, "b"), (3, "c")}

    # batch 2: update 1, delete 2, insert 4
    spark.createDataFrame(
        [(1, "a2", "u", 10), (2, None, "d", 11), (4, "d4", "c", 12)],
        SCH).write.mode("append").parquet(src)
    run()
    live = {tuple(r) for r in
            read_change_log_target(spark, tgt, "seq").collect()}
    assert live == {(1, "a2"), (3, "c"), (4, "d4")}

    # batch 3: STALE update for the deleted key (seq 5 < tombstone 11)
    # must NOT resurrect it; fresh update for 3 applies
    spark.createDataFrame(
        [(2, "zombie", "u", 5), (3, "c3", "u", 13)],
        SCH).write.mode("append").parquet(src)
    run()
    live = {tuple(r) for r in
            read_change_log_target(spark, tgt, "seq").collect()}
    assert live == {(1, "a2"), (3, "c3"), (4, "d4")}
    # tombstone retained in the raw target (the safety mechanism)
    raw = spark.read.parquet(tgt)
    assert raw.where("k = 2").first()["op"] == "d"

    # restart with the same checkpoint: no new files -> no change
    run()
    assert {tuple(r) for r in
            read_change_log_target(spark, tgt, "seq").collect()} == live

    # equivalence with the batch operator over the full concatenated log
    full_log = spark.read.parquet(src)
    empty = spark.createDataFrame([], "k long, v string")
    batch_final = apply_change_log(empty, full_log, ["k"], "seq")
    assert {tuple(r) for r in batch_final.collect()} == live


def test_streaming_change_log_additive_schema_evolution(spark, tmp_path):
    """A column added upstream (ALTER TABLE ... ADD COLUMN forwarded by
    the CDC tap) appears mid-stream: the sink union-evolves the stored
    target — NULL backfill on old rows, values on new — instead of
    failing the merge."""
    from s3_redshift_backup_tool_spark.streaming.incremental import (
        read_change_log_target, streaming_change_log_sync)
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame([(1, "a", "c", 1), (2, "b", "c", 2)],
                          "k long, v string, op string, seq long") \
         .write.mode("append").parquet(src)
    sch1 = spark.read.parquet(src).schema
    streaming_change_log_sync(spark, src, sch1, tgt, ckpt,
                              key_cols=["k"], seq_col="seq")

    # upstream adds column w; later batch carries it
    spark.createDataFrame([(2, "b2", 7.5, "u", 3), (3, "c", 9.0, "c", 4)],
                          "k long, v string, w double, op string, seq long") \
         .write.mode("append").parquet(src)
    from pyspark.sql import types as T2
    sch2 = T2.StructType(list(sch1.fields[:2])
                         + [T2.StructField("w", T2.DoubleType(), True)]
                         + list(sch1.fields[2:]))
    streaming_change_log_sync(spark, src, sch2, tgt, ckpt,
                              key_cols=["k"], seq_col="seq")

    live = {r["k"]: (r["v"], r["w"]) for r in
            read_change_log_target(spark, tgt, "seq").collect()}
    assert live == {1: ("a", None),      # old row: NULL backfill
                    2: ("b2", 7.5),      # updated with the new column
                    3: ("c", 9.0)}       # inserted with the new column


def test_streaming_moments_maintenance(spark, tmp_path):
    """The corpus covariance stays current across availableNow runs via
    the mergeable (n, sum, gram) state, equals the one-shot batch scan,
    and a re-run with no new files changes nothing."""
    import numpy as np

    from s3_redshift_backup_tool_spark.operators.decomposition import (
        cov_from_moments, covariance_stats)
    from s3_redshift_backup_tool_spark.streaming.incremental import (
        read_moments_state, streaming_moments_maintenance)

    src = str(tmp_path / "vecs")
    state = str(tmp_path / "mom_state")
    ckpt = str(tmp_path / "mom_ckpt")

    rng = np.random.RandomState(7)
    d = 5

    def mk(n, start):
        return spark.createDataFrame(
            [(start + i, rng.randn(d).tolist()) for i in range(n)],
            "vec_id long, embedding array<double>")

    mk(40, 0).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    streaming_moments_maintenance(spark, src, schema, state, ckpt, dim=d)

    mk(25, 100).write.mode("append").parquet(src)
    streaming_moments_maintenance(spark, src, schema, state, ckpt, dim=d)
    # idempotent no-op pass
    streaming_moments_maintenance(spark, src, schema, state, ckpt, dim=d)

    n, mean, cov = cov_from_moments(read_moments_state(spark, state, d))
    bn, bmean, bcov = covariance_stats(spark.read.parquet(src),
                                       "embedding", dim=d)
    assert n == bn == 65
    np.testing.assert_allclose(mean, bmean, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(bcov),
                               rtol=1e-9, atol=1e-14)


def test_streaming_moments_recovers_half_swap(spark, tmp_path):
    """A crash between the two renames (state at __old, no live state)
    is repaired at the next run instead of silently restarting the
    moments from empty."""
    import os

    import numpy as np

    from s3_redshift_backup_tool_spark.operators.decomposition import (
        cov_from_moments)
    from s3_redshift_backup_tool_spark.streaming.incremental import (
        read_moments_state, streaming_moments_maintenance)

    src = str(tmp_path / "vecs")
    state = str(tmp_path / "mom_state")
    ckpt = str(tmp_path / "mom_ckpt")
    rng = np.random.RandomState(3)
    d = 4
    spark.createDataFrame(
        [(i, rng.randn(d).tolist()) for i in range(30)],
        "vec_id long, embedding array<double>").write.parquet(src)
    schema = spark.read.parquet(src).schema
    streaming_moments_maintenance(spark, src, schema, state, ckpt, dim=d)
    n0, _, g0 = read_moments_state(spark, state, d)

    os.rename(state, state + "__old")           # simulate the crash window
    streaming_moments_maintenance(spark, src, schema, state, ckpt, dim=d)
    n1, _, g1 = read_moments_state(spark, state, d)
    assert n1 == n0 == 30
    np.testing.assert_allclose(g1, g0)
