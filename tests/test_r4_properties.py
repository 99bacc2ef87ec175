"""Property tests for the round-4 continued-session operators:
versioned-table MERGE replay, interval-overlap join vs the naive theta
join, and distributed global ids vs the single-partition window."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from s3_redshift_backup_tool_spark.operators.partitioning import (
    assign_global_ids,
)
from s3_redshift_backup_tool_spark.operators.temporal import (
    interval_overlap_join,
)
from s3_redshift_backup_tool_spark.plans.versioned import VersionedTable


# -- merge == dict replay ---------------------------------------------------

_batches = st.lists(
    st.lists(st.tuples(st.integers(0, 12),            # key
                       st.integers(0, 999)),          # value
             min_size=1, max_size=6),
    min_size=1, max_size=4)


@given(batches=_batches)
@settings(max_examples=10, deadline=None)
def test_merge_sequence_equals_dict_replay(spark, tmp_path_factory, batches):
    tmp = tmp_path_factory.mktemp("vt")
    t = VersionedTable(spark, str(tmp / "tbl"))
    expect: dict[int, int] = {}
    for batch in batches:
        dedup = {k: v for k, v in batch}      # unique-keys contract
        expect.update(dedup)
        df = spark.createDataFrame(
            [(k, v) for k, v in sorted(dedup.items())], "k int, v int")
        t.merge(df, keys=["k"])
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == expect


# -- interval overlap == theta join -----------------------------------------

_intervals = st.lists(
    st.tuples(st.integers(0, 3),                      # key group
              st.integers(0, 48 * 3600),              # start offset s
              st.integers(0, 8 * 3600)),              # duration s
    min_size=0, max_size=8)


@given(left=_intervals, right=_intervals,
       bucket_s=st.sampled_from([600, 3600, 24 * 3600]))
@settings(max_examples=10, deadline=None)
def test_interval_overlap_equals_theta(spark, left, right, bucket_s):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)

    def df_of(rows, ids):
        data = [(g, i, base + dt.timedelta(seconds=s),
                 base + dt.timedelta(seconds=s + d))
                for i, (g, s, d) in zip(ids, rows)]
        return spark.createDataFrame(
            data, "g int, rid int, s timestamp, e timestamp")

    lf = df_of(left, range(len(left)))
    rf = df_of(right, range(1000, 1000 + len(right)))
    a = lf.selectExpr("g", "rid as lid", "s as s_a", "e as e_a")
    b = rf.selectExpr("g", "rid as rjd", "s as s_b", "e as e_b")
    got = {(r["lid"], r["rjd"]) for r in interval_overlap_join(
        a, b, on="g", left_start="s_a", left_end="e_a",
        right_start="s_b", right_end="e_b",
        bucket_s=bucket_s).collect()}
    want = set()
    for li, (g1, s1, d1) in enumerate(left):
        for rj, (g2, s2, d2) in enumerate(right):
            if g1 == g2 and s1 <= s2 + d2 and s2 <= s1 + d1:
                want.add((li, 1000 + rj))
    assert got == want


# -- global ids == window row_number ----------------------------------------

@given(vals=st.lists(st.integers(0, 10 ** 6), min_size=1, max_size=60,
                     unique=True),
       n_parts=st.sampled_from([1, 3, 7]))
@settings(max_examples=10, deadline=None)
def test_global_ids_equal_window(spark, vals, n_parts):
    df = spark.createDataFrame([(v,) for v in vals], "k long") \
              .repartition(4)
    got = {r["k"]: r["row_id"] for r in assign_global_ids(
        df, ["k"], num_partitions=n_parts).collect()}
    want = {v: i + 1 for i, v in enumerate(sorted(vals))}
    assert got == want
