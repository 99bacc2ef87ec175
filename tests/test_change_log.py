"""Log-based CDC (operators/cdc.py compact_change_log / apply_change_log):
compaction picks the latest entry per key; apply merges it onto the base
with delete-wins / last-wins semantics, idempotently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.cdc import (
    apply_change_log, compact_change_log, snapshot_diff)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


LOG_SCHEMA = "k long, v string, op string, seq long"


def test_compact_keeps_latest_per_key(spark):
    log = _df(spark, [(1, "a", "c", 1), (1, "b", "u", 2), (1, "c", "u", 5),
                      (2, "x", "c", 1), (2, None, "d", 9)], LOG_SCHEMA)
    got = {r["k"]: (r["v"], r["op"], r["seq"])
           for r in compact_change_log(log, ["k"], "seq").collect()}
    assert got == {1: ("c", "u", 5), 2: (None, "d", 9)}


def test_apply_delete_wins_and_last_wins(spark):
    base = _df(spark, [(1, "old"), (2, "old"), (3, "old")],
               "k long, v string")
    log = _df(spark, [(1, "n1", "u", 1), (1, "n2", "u", 2),   # last wins
                      (2, "xx", "u", 1), (2, None, "d", 2),   # delete wins
                      (9, "new", "c", 1)], LOG_SCHEMA)        # insert
    got = {r["k"]: r["v"]
           for r in apply_change_log(base, log, ["k"], "seq").collect()}
    assert got == {1: "n2", 3: "old", 9: "new"}


def test_apply_is_idempotent_under_replay(spark):
    base = _df(spark, [(1, "old"), (2, "old")], "k long, v string")
    log = _df(spark, [(1, "n", "u", 1), (2, None, "d", 2),
                      (5, "new", "c", 3)], LOG_SCHEMA)
    once = apply_change_log(base, log, ["k"], "seq")
    twice = apply_change_log(once, log, ["k"], "seq")
    assert {tuple(r) for r in once.collect()} == \
        {tuple(r) for r in twice.collect()} == {(1, "n"), (5, "new")}


def test_apply_change_log_reconstructs_snapshot(spark):
    """Cross-check against the snapshot machinery: turning a
    snapshot_diff into a change log (op I/U/D -> c/u/d, one seq) and
    applying it must reconstruct the new snapshot, same as apply_diff."""
    old = _df(spark, [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    new = _df(spark, [(1, "a"), (2, "B"), (4, None)], "k long, v string")
    diff = snapshot_diff(old, new, ["k"])
    log = (diff.withColumn("op", F.lower("op"))
               .withColumn("op", F.when(F.col("op") == "i", "c")
                                  .otherwise(F.col("op")))
               .withColumn("seq", F.lit(1)))
    rebuilt = apply_change_log(old, log, ["k"], "seq")
    assert {tuple(r) for r in rebuilt.collect()} == \
        {tuple(r) for r in new.collect()}


def test_compact_is_one_aggregate_no_window(spark):
    """Plan shape: compaction must be a partial-aggregable groupBy (map-
    side combine), not a row_number window — pin no Window/Sort node."""
    log = _df(spark, [(1, "a", "c", 1)], LOG_SCHEMA)
    plan = compact_change_log(log, ["k"], "seq") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_snapshot_read_rows_flow_through_as_upserts(spark):
    """Debezium emits op='r' for snapshot-read rows: a snapshot-seeded
    log's seed rows must survive compaction and apply as upserts (they
    ARE the row image), not be silently dropped — while any real change
    at the same sequence still supersedes the read ('d'>'u'>'c'>'r')."""
    base = _df(spark, [(1, "old")], "k long, v string")
    log = _df(spark, [(2, "seed", "r", 1),           # snapshot seed row
                      (3, "seed", "r", 1), (3, None, "d", 1),  # tie: d wins
                      (4, "seed", "r", 1), (4, "upd", "u", 2), # later u wins
                      (5, "junk", "x", 1)], LOG_SCHEMA)        # unknown op
    compacted = {r["k"]: (r["v"], r["op"])
                 for r in compact_change_log(log, ["k"], "seq").collect()}
    assert compacted == {2: ("seed", "r"), 3: (None, "d"), 4: ("upd", "u")}
    got = {r["k"]: r["v"]
           for r in apply_change_log(base, log, ["k"], "seq").collect()}
    assert got == {1: "old", 2: "seed", 4: "upd"}
