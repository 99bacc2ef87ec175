"""As-of join and bucketed range join: result equivalence against
brute-force definitions, tie/boundary semantics, and plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(20), "b"), (1, _ts(5), "c"),
         (2, _ts(15), "d"), (3, _ts(30), "e")],
        "k int, lts timestamp, lval string")
    right = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(12), 101), (1, _ts(19, 59), 102),
         (2, _ts(16), 200), (3, _ts(1), 300), (3, _ts(2), 301)],
        "k int, rts timestamp, rval int")
    return left, right


def test_asof_inclusive_matches_bruteforce(spark):
    left, right = _frames(spark)
    got = {(r.k, r.lval): r.rval
           for r in asof_join(left, right, on="k", left_ts="lts",
                              right_ts="rts", right_tiebreak="rval").collect()}
    # latest right with rts <= lts per key
    assert got == {(1, "a"): 100,   # exact-equal ts matches
                   (1, "b"): 102,
                   (1, "c"): None,  # unmatched left row kept
                   (2, "d"): None,  # right is later than left
                   (3, "e"): 301}


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    got = {(r.k, r.lval): r.rval
           for r in asof_join(left, right, on="k", left_ts="lts",
                              right_ts="rts", allow_exact_matches=False,
                              right_tiebreak="rval").collect()}
    assert got[(1, "a")] is None  # rts == lts no longer eligible
    assert got[(1, "b")] == 102


def test_asof_tiebreak_deterministic(spark):
    left = spark.createDataFrame([(1, _ts(10), "x")],
                                 "k int, lts timestamp, lval string")
    right = spark.createDataFrame(
        [(1, _ts(9), 7), (1, _ts(9), 9), (1, _ts(9), 8)],
        "k int, rts timestamp, rval int")
    [row] = asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                      right_tiebreak="rval").collect()
    assert row.rval == 9  # greatest tiebreak wins (last in asc order)


def test_asof_single_shuffle_plan(spark):
    left, right = _frames(spark)
    df = asof_join(left, right, on="k", left_ts="lts", right_ts="rts")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one hashpartitioning exchange on the key, and no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_range_join_matches_bruteforce(spark, events):
    ev = events.limit(400).select("event_id", "user_id", "ts")
    left = ev.select("user_id", F.col("event_id").alias("lid"),
                     F.col("ts").alias("lts"))
    right = ev.select("user_id", F.col("event_id").alias("rid"),
                      F.col("ts").alias("rts"))
    lower, upper = -1800.0, 900.0
    got = {(r.lid, r.rid) for r in
           range_join_bucketed(left, right, on="user_id", left_ts="lts",
                               right_ts="rts", lower_s=lower, upper_s=upper,
                               bucket_s=600).collect()}
    brute = {(r.lid, r.rid) for r in
             left.join(right, "user_id")
                 .filter((F.col("rts") >= F.col("lts") + F.expr(
                     "INTERVAL 1800 SECONDS") * -1)
                         & (F.col("rts") < F.col("lts") + F.expr(
                             "INTERVAL 900 SECONDS")))
                 .collect()}
    assert got == brute and len(got) > 0


def test_range_join_boundaries_half_open(spark):
    left = spark.createDataFrame([(1, _ts(10), "L")],
                                 "k int, lts timestamp, lval string")
    right = spark.createDataFrame(
        [(1, _ts(9), "in_lo"),      # == lts-60: inclusive lower
         (1, _ts(11), "out_hi"),    # == lts+60: exclusive upper
         (1, _ts(10, 59, 999999), "in_hi")],
        "k int, rts timestamp, rval string")
    got = {r.rval for r in
           range_join_bucketed(left, right, on="k", left_ts="lts",
                               right_ts="rts", lower_s=-60, upper_s=60,
                               bucket_s=60).collect()}
    assert got == {"in_lo", "in_hi"}


def test_range_join_no_duplicate_pairs(spark):
    # window spanning many buckets must still emit each pair exactly once
    left = spark.createDataFrame([(1, _ts(30), "L")],
                                 "k int, lts timestamp, lval string")
    right = spark.createDataFrame([(1, _ts(29), "R")],
                                  "k int, rts timestamp, rval string")
    rows = range_join_bucketed(left, right, on="k", left_ts="lts",
                               right_ts="rts", lower_s=-1200, upper_s=1200,
                               bucket_s=60).collect()
    assert len(rows) == 1


# -- interval-x-interval overlap join ---------------------------------------

def test_interval_overlap_join_matches_theta_join(spark):
    """Bucketed equi-join result == naive theta join, including pairs
    spanning many buckets (emitted exactly once, no dedup pass)."""
    import datetime as dt
    from s3_redshift_backup_tool_spark.operators.temporal import (
        interval_overlap_join,
    )
    base = dt.datetime(2024, 1, 1)

    def ts(h, m=0):
        return base + dt.timedelta(hours=h, minutes=m)

    left = spark.createDataFrame(
        [("k", "L1", ts(0), ts(5)),      # long: spans many 1h buckets
         ("k", "L2", ts(10), ts(11)),
         ("j", "L3", ts(0), ts(1))],     # other key
        "g string, lid string, s_a timestamp, e_a timestamp")
    right = spark.createDataFrame(
        [("k", "R1", ts(4, 30), ts(6)),  # overlaps L1 tail
         ("k", "R2", ts(1), ts(2)),      # inside L1
         ("k", "R3", ts(11, 30), ts(12)),  # disjoint from all
         ("j", "R4", ts(0, 30), ts(3))],   # overlaps L3 on key j
        "g string, rid string, s_b timestamp, e_b timestamp")

    got = {(r["lid"], r["rid"]) for r in interval_overlap_join(
        left, right, on="g", left_start="s_a", left_end="e_a",
        right_start="s_b", right_end="e_b", bucket_s=3600).collect()}
    assert got == {("L1", "R1"), ("L1", "R2"), ("L3", "R4")}

    # exactly-once: count equals set size even for multi-bucket overlaps
    n = interval_overlap_join(
        left, right, on="g", left_start="s_a", left_end="e_a",
        right_start="s_b", right_end="e_b", bucket_s=1800).count()
    assert n == 3


def test_interval_overlap_join_rejects_colliding_column_names(spark):
    """Self-join without renaming: shared non-key names are rejected
    up front with the offending columns listed, not as an ambiguous-
    reference error from the final select."""
    import pytest
    from s3_redshift_backup_tool_spark.operators.temporal import (
        interval_overlap_join,
    )
    df = spark.createDataFrame(
        [("k", "A", "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
        "g string, id string, s string, e string") \
        .selectExpr("g", "id", "cast(s as timestamp) s",
                    "cast(e as timestamp) e")
    with pytest.raises(ValueError, match=r"collide.*\['e', 'id', 's'\]"):
        interval_overlap_join(df, df, on="g",
                              left_start="s", left_end="e",
                              right_start="s", right_end="e")


def test_interval_overlap_join_auto_suffix_self_join(spark):
    """Opt-in suffix_collisions: a self-join needs no manual renames —
    right-side colliding columns come back suffixed (pandas _x/_y
    style), overlap semantics unchanged, and a suffix that STILL
    collides is rejected with a clear error."""
    import datetime as dt

    import pytest

    from s3_redshift_backup_tool_spark.operators.temporal import (
        interval_overlap_join,
    )
    base = dt.datetime(2024, 1, 1)

    def ts(h, m=0):
        return base + dt.timedelta(hours=h, minutes=m)

    df = spark.createDataFrame(
        [("k", "A", ts(0), ts(2)),
         ("k", "B", ts(1), ts(3)),      # overlaps A
         ("k", "C", ts(5), ts(6))],     # disjoint
        "g string, id string, s timestamp, e timestamp")
    out = interval_overlap_join(
        df, df, on="g", left_start="s", left_end="e",
        right_start="s", right_end="e", suffix_collisions="_r")
    assert out.columns == ["g", "id", "s", "e", "id_r", "s_r", "e_r"]
    pairs = {(r["id"], r["id_r"]) for r in out.collect()}
    # full self-overlap set: every interval overlaps itself + A<->B
    assert pairs == {("A", "A"), ("B", "B"), ("C", "C"),
                     ("A", "B"), ("B", "A")}

    # a suffix that still collides must be rejected, not silently wrong
    df2 = df.withColumn("id_r", df["id"])
    with pytest.raises(ValueError, match="still"):
        interval_overlap_join(
            df2, df2, on="g", left_start="s", left_end="e",
            right_start="s", right_end="e", suffix_collisions="_r")
    with pytest.raises(ValueError, match="non-empty"):
        interval_overlap_join(
            df, df, on="g", left_start="s", left_end="e",
            right_start="s", right_end="e", suffix_collisions="")


def test_interpolate_linear_blend_and_edges(spark):
    from s3_redshift_backup_tool_spark.operators.temporal import (
        interpolate_linear,
    )
    rows = [
        # key A: leading null, interior gap, trailing null
        ("A", 0, None), ("A", 10, 10.0), ("A", 15, None), ("A", 20, 30.0),
        ("A", 30, None),
        # key B: all null stays null
        ("B", 0, None), ("B", 5, None),
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {(r["k"], r["t"]): r["value_filled"] for r in
           interpolate_linear(df, "k", "t", "v").collect()}
    assert got[("A", 0)] == 10.0          # leading backfill
    assert got[("A", 15)] == 20.0         # midpoint blend
    assert got[("A", 30)] == 30.0         # trailing forward fill
    assert got[("A", 10)] == 10.0 and got[("A", 20)] == 30.0
    assert got[("B", 0)] is None and got[("B", 5)] is None


def test_interpolate_single_sort_plan(spark):
    """All four windows share one (key, order) partitioning: the plan
    must contain exactly one exchange and one sort for the data."""
    from s3_redshift_backup_tool_spark.operators.temporal import (
        interpolate_linear,
    )
    df = spark.createDataFrame(
        [("A", i, float(i) if i % 3 else None) for i in range(30)],
        "k string, t long, v double")
    out = interpolate_linear(df, "k", "t", "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort ") <= 2       # one sort (+AQE reprint slack)


def test_ewma_hand_case_and_chunk_carry(spark):
    from s3_redshift_backup_tool_spark.operators.temporal import ewma_by_key
    rows = [("u", i, v) for i, v in enumerate([10.0, 20.0, 40.0, 80.0])]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    r = ewma_by_key(df, "k", "t", "v", alpha=0.5).first()
    # fold: 10 -> 15 -> 27.5 -> 53.75
    assert r["n_points"] == 4 and abs(r["ewma"] - 53.75) < 1e-12

    # chunk-and-carry is exact: fold(chunk2, seed=fold(chunk1)) == full
    import functools
    full = functools.reduce(lambda a, v: 0.5 * v + 0.5 * a,
                            [20.0, 40.0, 80.0], 10.0)
    c1 = functools.reduce(lambda a, v: 0.5 * v + 0.5 * a, [20.0], 10.0)
    c2 = functools.reduce(lambda a, v: 0.5 * v + 0.5 * a, [40.0, 80.0], c1)
    assert c2 == full == r["ewma"]


def test_interval_overlap_drops_inverted_intervals(spark):
    import datetime as dt
    from s3_redshift_backup_tool_spark.operators.temporal import (
        interval_overlap_join,
    )
    b = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("k", "L", b + dt.timedelta(hours=5), b)],   # end < start
        "g string, lid string, s_a timestamp, e_a timestamp")
    right = spark.createDataFrame(
        [("k", "R", b, b + dt.timedelta(hours=9))],
        "g string, rid string, s_b timestamp, e_b timestamp")
    out = interval_overlap_join(
        left, right, on="g", left_start="s_a", left_end="e_a",
        right_start="s_b", right_end="e_b")
    assert out.count() == 0      # dropped, not fabricated
