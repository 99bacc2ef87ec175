"""Hypothesis property tests for the round-7 algebra.

Small deterministic profiles (few examples, no deadline) — each example
spins Spark jobs, so the budget mirrors test_r4/r6_properties.py.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.incremental_agg import (
    agg_state, finalize_agg, merge_agg_states)
from s3_redshift_backup_tool_spark.operators.cdc import (
    apply_diff, snapshot_diff)
from s3_redshift_backup_tool_spark.operators.sketches import (
    kmv_merge, kmv_sketch)

_PROFILE = settings(max_examples=8, deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture])


rows_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.decimals(min_value=-1000, max_value=1000, places=2)
              .map(float)),
    min_size=0, max_size=40)


@given(rows=rows_strategy, mod=st.integers(2, 5))
@_PROFILE
def test_agg_monoid_split_merge_equals_full(spark, rows, mod):
    """finalize(⊕ over any partition of the rows) == finalize(full)."""
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)],
        "rid long, g string, v double") if rows else \
        spark.createDataFrame([], "rid long, g string, v double")
    full = finalize_agg(agg_state(df, ["g"], ["v"]), ["g"], ["v"])
    parts = [agg_state(df.where(F.col("rid") % mod == i), ["g"], ["v"])
             for i in range(mod)]
    merged = finalize_agg(merge_agg_states(["g"], ["v"], *parts),
                          ["g"], ["v"])
    assert {tuple(r) for r in merged.collect()} == \
        {tuple(r) for r in full.collect()}


@given(seed=st.integers(0, 10_000))
@_PROFILE
def test_snapshot_diff_apply_reconstructs_new(spark, seed):
    """apply_diff(old, snapshot_diff(old, new)) == new, for random
    edit mixes (deletes, updates, inserts) derived from the seed —
    including updates that SET a value to NULL, updates FROM NULL, and
    NULL-valued inserts (the round-7 coalesce bug class)."""
    import random
    rng = random.Random(seed)
    old_rows = [(k,
                 None if rng.random() < 0.15 else f"s{rng.randint(0, 5)}",
                 round(rng.uniform(0, 99), 2))
                for k in range(20)]
    new_rows = []
    for k, s, v in old_rows:
        r = rng.random()
        if r < 0.2:
            continue                       # delete
        if r < 0.4:
            new_rows.append((k, ("!" if s is None else s + "!"), v))  # update
        elif r < 0.5:
            new_rows.append((k, None, v))  # update TO NULL
        else:
            new_rows.append((k, s, v))     # unchanged
    for k in range(100, 100 + rng.randint(0, 5)):
        new_rows.append((k, None if rng.random() < 0.3 else "new", 1.0))
    old = spark.createDataFrame(old_rows, "k long, s string, v double")
    new = spark.createDataFrame(new_rows, "k long, s string, v double") \
        if new_rows else spark.createDataFrame([], "k long, s string, v double")
    diff = snapshot_diff(old, new, ["k"])
    rebuilt = apply_diff(old, diff, ["k"])
    assert {tuple(r) for r in rebuilt.collect()} == \
        {tuple(r) for r in new.collect()}


@given(texts=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
                      min_size=0, max_size=30),
       k=st.integers(2, 8))
@_PROFILE
def test_kmv_merge_closure_random(spark, texts, k):
    """merge of per-slice sketches == sketch of the union, any corpus."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i long, t string") if rows else \
        spark.createDataFrame([], "i long, t string")
    full = kmv_sketch(df.withColumn("g", F.lit(1)), ["g"], "t", k=k)
    a = kmv_sketch(df.where(F.col("i") % 2 == 0).withColumn("g", F.lit(1)),
                   ["g"], "t", k=k)
    b = kmv_sketch(df.where(F.col("i") % 2 == 1).withColumn("g", F.lit(1)),
                   ["g"], "t", k=k)
    merged = kmv_merge(k, ["g"], a, b)
    assert {tuple(r) for r in
            merged.select("g", "kmv_hash", "kmv_rank").collect()} == \
        {tuple(r) for r in full.select("g", "kmv_hash", "kmv_rank").collect()}
