"""Manifest-versioned table: atomic commits, time travel, rollback,
vacuum — the object-store-safe alternative to rename swaps."""

from __future__ import annotations

import os

import pytest

from s3_redshift_backup_tool_spark.plans.versioned import VersionedTable


def _vals(df):
    return sorted(r["v"] for r in df.collect())


def test_commit_append_overwrite_and_time_travel(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    assert t.current_version() is None
    with pytest.raises(FileNotFoundError):
        t.read()

    v1 = t.commit(spark.range(3).selectExpr("id as v"))
    v2 = t.commit(spark.range(3, 5).selectExpr("id as v"))          # append
    v3 = t.commit(spark.range(100, 102).selectExpr("id as v"),
                  mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert _vals(t.read()) == [100, 101]            # current = overwrite
    assert _vals(t.read(version=2)) == [0, 1, 2, 3, 4]   # time travel
    assert _vals(t.read(version=1)) == [0, 1, 2]


def test_rollback_is_metadata_only(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(spark.range(3).selectExpr("id as v"))
    t.commit(spark.range(10, 12).selectExpr("id as v"), mode="overwrite")
    t.rollback(1)
    assert t.current_version() == 1
    assert _vals(t.read()) == [0, 1, 2]
    # a new commit appends on top of the rolled-back state
    t.commit(spark.range(5, 6).selectExpr("id as v"))
    assert _vals(t.read()) == [0, 1, 2, 5]
    with pytest.raises(ValueError):
        t.rollback(99)


def test_vacuum_deletes_only_unreferenced(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(spark.range(3).selectExpr("id as v"))
    t.commit(spark.range(50, 53).selectExpr("id as v"), mode="overwrite")
    before = sum(len(fs) for _, _, fs in os.walk(t.data_dir))
    deleted = t.vacuum(keep_last=1)
    assert deleted                                   # v1's files went away
    after = sum(len(fs) for _, _, fs in os.walk(t.data_dir))
    assert after < before
    assert _vals(t.read()) == [50, 51, 52]           # current unaffected
    assert t.versions() == [2]                       # old manifest dropped


def test_snapshot_read_isolated_from_concurrent_commit(spark, tmp_path):
    """A reader that resolved version N keeps reading N's exact file
    set even after a writer publishes N+1 (no torn reads)."""
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(spark.range(3).selectExpr("id as v"))
    snapshot = t.read()                  # plan pinned to v1's files
    t.commit(spark.range(90, 95).selectExpr("id as v"), mode="overwrite")
    assert _vals(snapshot) == [0, 1, 2]  # unaffected by the new commit
    assert _vals(t.read()) == [90, 91, 92, 93, 94]


def test_cdc_feed_incremental_commits_with_time_travel(spark, tmp_path):
    """The intended production composition: each CDC increment (pulled
    from the Python changefeed source through the watermark predicate)
    commits one new table version — yesterday's corpus stays readable
    while today's publishes, and rollback undoes a bad load in O(1)."""
    from s3_redshift_backup_tool_spark.operators.cdc import (
        CDCConfig, Watermark, apply_cdc, extract_watermark)
    from s3_redshift_backup_tool_spark.sources.pysource import (
        CDCFeedDataSource)

    spark.dataSource.register(CDCFeedDataSource)
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    cfg = CDCConfig(strategy="id_only", id_column="id")

    def pull(end, wm):
        df = spark.read.format("cdc_feed").option("end", end).load()
        return apply_cdc(df, cfg, wm)

    d1 = pull(1000, Watermark())
    t.commit(d1)
    wm = extract_watermark(d1, cfg)
    d2 = pull(1500, wm)                       # only the new 500 ids
    assert d2.count() == 500
    t.commit(d2)                              # append increment
    assert t.read(version=1).count() == 1000  # yesterday still readable
    assert t.read().count() == 1500
    # bad load discovered -> O(1) rollback, then re-publish
    t.rollback(1)
    assert t.read().count() == 1000
    t.commit(d2)
    assert t.read().count() == 1500


def test_schema_evolution_additive_column(spark, tmp_path):
    """Appending a delta with an ADDED column: mergeSchema reads old
    files null-padded; time travel still shows the old schema."""
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a")], "id long, s string"))
    t.commit(spark.createDataFrame([(2, "b", 9.5)],
                                   "id long, s string, score double"))
    cur = t.read(merge_schema=True)
    assert set(cur.columns) == {"id", "s", "score"}
    rows = {r["id"]: r["score"] for r in cur.collect()}
    assert rows == {1: None, 2: 9.5}
    assert set(t.read(version=1).columns) == {"id", "s"}


# -- copy-on-write MERGE ----------------------------------------------------

def _rows(df):
    return sorted((r["k"], r["val"]) for r in df.collect())


def test_merge_updates_inserts_and_prunes_files(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    # two commits with disjoint key ranges -> disjoint file sets
    t.commit(spark.createDataFrame(
        [(k, f"a{k}") for k in range(5)], "k int, val string"))
    t.commit(spark.createDataFrame(
        [(k, f"b{k}") for k in range(10, 15)], "k int, val string"))
    base_files = set(t._read_manifest(t.current_version())["files"])

    delta = spark.createDataFrame(
        [(12, "B12"), (99, "NEW")], "k int, val string")
    v = t.merge(delta, keys=["k"])

    got = dict(_rows(t.read()))
    assert got[12] == "B12"                      # update applied
    assert got[99] == "NEW"                      # insert applied
    assert got[0] == "a0" and got[14] == "b14"   # untouched rows intact
    assert len(got) == 11

    # file-level pruning: files holding only keys 0-4 are carried BY
    # REFERENCE into the new manifest, not rewritten
    man = t._read_manifest(v)
    rewritten = set(man["rewritten_files"])
    carried = set(man["files"]) & base_files
    assert rewritten and rewritten < base_files
    first_commit_files = {f for f in base_files if f not in rewritten}
    assert first_commit_files <= carried

    # pre-merge snapshot stays time-travelable
    old = dict(_rows(t.read(version=v - 1)))
    assert old[12] == "b12" and 99 not in old


def test_merge_on_empty_table_is_insert_only(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    v = t.merge(spark.createDataFrame([(1, "x")], "k int, val string"),
                keys=["k"])
    assert v == 1
    assert _rows(t.read()) == [(1, "x")]
    # the first-ever merge publishes the same manifest shape as any
    # other merge: CLI/retry scripts reading rewritten_files must not
    # KeyError on it
    man = t._read_manifest(v)
    assert man["rewritten_files"] == []
    assert man["merge_keys"] == ["k"]


def test_merge_on_empty_table_keeps_stats_cols(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    v = t.merge(
        spark.createDataFrame([(1, "x"), (9, "y")],
                              "k int, val string").coalesce(1),
        keys=["k"], stats_cols=["k"])
    man = t._read_manifest(v)
    stats = man.get("stats") or {}
    assert stats, "first merge must record per-file min/max stats"
    assert all("k" in s for s in stats.values())
    # and the recorded stats actually prune
    _, skipped = t.prune_files(where=("k", 100, 200))
    assert skipped == len(man["files"])


def test_merge_insert_only_delta_rewrites_nothing(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "x")], "k int, val string"))
    base_files = set(t._read_manifest(t.current_version())["files"])
    v = t.merge(spark.createDataFrame([(2, "y")], "k int, val string"),
                keys=["k"])
    man = t._read_manifest(v)
    assert man["rewritten_files"] == []
    assert base_files <= set(man["files"])
    assert _rows(t.read()) == [(1, "x"), (2, "y")]


def test_merge_rejects_non_unique_delta(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "x")], "k int, val string"))
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "k int, val string")
    with pytest.raises(ValueError, match="not unique"):
        t.merge(dup, keys=["k"])


def test_merge_then_vacuum_drops_replaced_files(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame(
        [(k, f"a{k}") for k in range(4)], "k int, val string"))
    t.merge(spark.createDataFrame([(2, "Z")], "k int, val string"),
            keys=["k"])
    deleted = t.vacuum(keep_last=1)
    assert deleted                                # replaced files reclaimed
    got = dict(_rows(t.read()))
    assert got[2] == "Z" and got[0] == "a0" and len(got) == 4


# -- manifest-stats file pruning --------------------------------------------

def test_stats_pruning_skips_files(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    # three commits with disjoint k ranges -> disjoint stats ranges
    for lo in (0, 100, 200):
        t.commit(spark.range(lo, lo + 50).selectExpr("id as k", "id*2 as v")
                      .coalesce(1),
                 stats_cols=["k"])
    all_files, _ = t.prune_files()
    assert len(all_files) == 3

    keep, skipped = t.prune_files(where=("k", 120, 130))
    assert len(keep) == 1 and skipped == 2

    got = sorted(r["k"] for r in t.read(where=("k", 120, 130)).collect())
    assert got == list(range(120, 131))

    # predicate outside every range -> empty, flagged clearly
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError, match="after pruning"):
        t.read(where=("k", 900, 950))


def test_stats_survive_merge_and_missing_stats_kept(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(spark.range(0, 50).selectExpr("id as k", "id*2 as v")
                  .coalesce(1), stats_cols=["k"])
    before, _ = t.prune_files()
    t.commit(spark.range(100, 150).selectExpr("id as k", "id*2 as v")
                  .coalesce(1))                      # NO stats: always kept
    statless = set(t.prune_files()[0]) - set(before)
    t.merge(spark.createDataFrame([(5, 999)], "k bigint, v bigint"),
            keys=["k"], stats_cols=["k"])
    # a statless file is conservatively retained under ANY predicate,
    # even one fully outside its actual value range
    keep, _ = t.prune_files(where=("k", -50, -10))
    assert statless <= set(keep)
    # merged data + stats round-trip: the upsert is visible through a
    # pruned read and files outside the predicate range were skipped
    keep2, skipped2 = t.prune_files(where=("k", 0, 10))
    assert statless <= set(keep2) and skipped2 >= 0
    got = {r["k"]: r["v"] for r in t.read(where=("k", 0, 10)).collect()}
    assert got[5] == 999 and len(got) == 11


# -- small-file compaction --------------------------------------------------

def test_compact_binpacks_small_files(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    # 6 tiny single-file commits (streaming-merge accretion pattern)
    for i in range(6):
        t.commit(spark.range(i * 10, i * 10 + 10)
                      .selectExpr("id as k", "id*2 as v").coalesce(1))
    v_before = t.current_version()
    files_before, _ = t.prune_files()
    assert len(files_before) == 6

    res = t.compact(target_file_bytes=1 << 30, stats_cols=["k"])
    assert res["compacted"] == 6 and res["files_out"] == 1
    assert sorted(r["k"] for r in t.read().collect()) == list(range(60))
    # pre-compaction version still time-travelable
    assert len(t.read(version=v_before).collect()) == 60
    # stats recorded for the packed file: pruning still works
    keep, skipped = t.prune_files(where=("k", 5, 6))
    assert len(keep) == 1 and skipped == 0

    # second compaction: single file left -> no-op, no new version
    cur = t.current_version()
    res2 = t.compact(target_file_bytes=1 << 30)
    assert res2["version"] == cur and t.current_version() == cur

    # vacuum reclaims the replaced tiny files
    deleted = t.vacuum(keep_last=1)
    assert len(deleted) >= 6
    assert len(t.read().collect()) == 60


# -- snapshot-diff changefeed -----------------------------------------------

def test_changes_between_versions_classifies_and_prunes(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame(
        [(k, f"a{k}") for k in range(5)], "k int, val string"))
    v1 = t.current_version()
    t.commit(spark.createDataFrame(
        [(k, f"b{k}") for k in range(10, 15)], "k int, val string"))
    v2 = t.current_version()
    # merge: update k=12, insert k=99 (touches only the second commit's
    # files -> the diff must not read the first commit's files)
    t.merge(spark.createDataFrame(
        [(12, "B12"), (99, "NEW")], "k int, val string"), keys=["k"])
    v3 = t.current_version()

    ch = {r["k"]: (r["val"], r["_change"])
          for r in t.changes(v2, v3, keys=["k"]).collect()}
    # carried-by-reference rows (k 0-4) and unchanged rewritten rows
    # (k 10,11,13,14) produce NO phantom changes
    assert ch == {12: ("B12", "update"), 99: ("NEW", "insert")}

    # append-only step: all inserts
    ch12 = {r["k"]: r["_change"]
            for r in t.changes(v1, v2, keys=["k"]).collect()}
    assert ch12 == {k: "insert" for k in range(10, 15)}

    # overwrite drops everything except what it writes -> deletes
    t.commit(spark.createDataFrame([(12, "only")], "k int, val string"),
             mode="overwrite")
    v4 = t.current_version()
    ch34 = {r["k"]: r["_change"]
            for r in t.changes(v3, v4, keys=["k"]).collect()}
    assert ch34[99] == "delete" and ch34[0] == "delete"
    assert ch34[12] == "update"
    assert len([c for c in ch34.values() if c == "delete"]) == 10

    # identical versions -> empty feed with the right schema
    empty = t.changes(v3, v3, keys=["k"])
    assert empty.count() == 0 and "_change" in empty.columns


def test_compact_with_zorder_restores_pruning(spark, tmp_path):
    """Compacting interleaved commits WITHOUT clustering yields files
    that all span the whole key range (stats prune nothing); with
    zorder_cols the rewritten files get disjoint ranges and skipping
    bites again."""
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    # 4 commits, each spanning the FULL key range (interleaved keys)
    for i in range(4):
        t.commit(spark.range(0, 400).filter(f"id % 4 = {i}")
                      .selectExpr("id as k", "id*2 as v").coalesce(1),
                 stats_cols=["k"])
    keep, skipped = t.prune_files(where=("k", 0, 20))
    assert skipped == 0                     # every file overlaps

    res = t.compact(target_file_bytes=4_000, stats_cols=["k"],
                    zorder_cols=["k"])
    assert res["compacted"] == 4 and res["files_out"] >= 2
    keep2, skipped2 = t.prune_files(where=("k", 0, 20))
    assert skipped2 >= 1                    # clustering restored skipping
    got = sorted(r["k"] for r in t.read(where=("k", 0, 20)).collect())
    assert got == list(range(0, 21))


def test_stats_on_timestamp_column_json_safe_and_prunable(spark, tmp_path):
    """Parquet footer stats for timestamps come back as datetimes —
    they must serialize into the JSON manifest (ISO strings) and prune
    against ISO-string bounds (lexicographic == chronological)."""
    import datetime as dt
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    for day in (1, 15):
        rows = [(i, dt.datetime(2024, 1, day, h)) for i, h in
                enumerate(range(5))]
        t.commit(spark.createDataFrame(rows, "k int, ts timestamp")
                      .coalesce(1), stats_cols=["ts"])
    keep, skipped = t.prune_files(
        where=("ts", "2024-01-14T00:00:00", "2024-01-16T00:00:00"))
    assert len(keep) == 1 and skipped == 1
    got = t.read(version=None).count()      # plain read unaffected
    assert got == 10


def test_merge_rejects_null_keys(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "x")], "k int, val string"))
    bad = spark.createDataFrame([(None, "a"), (2, "b")],
                                "k int, val string")
    with pytest.raises(ValueError, match="NULL"):
        t.merge(bad, keys=["k"])
