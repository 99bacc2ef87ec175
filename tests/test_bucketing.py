"""Plan-pinned proof of the co-located bucketed join (plans/bucketing.py):
two tables bucketed on the same key with the same bucket count join with
ZERO shuffle exchanges, and the answer matches the plain join exactly.
This converts SCALE.md's recurring "bucket both sides by key" argument
into an executed plan fact.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.plans.bucketing import (
    bucketed_join, count_exchanges, write_bucketed)


@pytest.fixture(scope="module")
def bucketed_tables(spark, orders, lineitem):
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "orderkey"),
                   "b_orders", "orderkey", 8, sort_cols="orderkey")
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "orderkey"),
                   "b_lineitem", "orderkey", 8, sort_cols="orderkey")
    yield "b_orders", "b_lineitem"
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_zero_shuffles(spark, bucketed_tables):
    lt, rt = bucketed_tables
    j = bucketed_join(spark, lt, rt, "orderkey")
    assert count_exchanges(j) == 0, (
        "co-bucketed join must not shuffle either side")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "SortMerge" in plan


def test_plain_join_of_same_data_does_shuffle(spark, orders, lineitem):
    # the baseline the bucketed layout removes: same join off raw
    # parquet needs exchanges (or a broadcast at this tiny scale — force
    # the shuffle path to compare like with like)
    j = (orders.withColumnRenamed("o_orderkey", "orderkey")
         .hint("merge")
         .join(lineitem.withColumnRenamed("l_orderkey", "orderkey")
               .hint("merge"), ["orderkey"]))
    assert count_exchanges(j) >= 2


def test_bucketed_join_matches_plain_join(spark, bucketed_tables,
                                          orders, lineitem):
    lt, rt = bucketed_tables
    got = (bucketed_join(spark, lt, rt, "orderkey")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("o_totalprice") * F.col("l_quantity"))
                 .alias("s")).first())
    want = (orders.join(lineitem,
                        orders.o_orderkey == lineitem.l_orderkey)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice") * F.col("l_quantity"))
                  .alias("s")).first())
    assert got["n"] == want["n"]
    assert abs(got["s"] - want["s"]) < 1e-6 * max(abs(want["s"]), 1)


def test_bucketed_groupby_also_avoids_shuffle(spark, bucketed_tables):
    """Bonus of the same layout: aggregation on the bucket key reuses
    the bucketing as a satisfying distribution — no exchange under the
    HashAggregate either."""
    lt, _ = bucketed_tables
    agg = (spark.table(lt).groupBy("orderkey")
           .agg(F.sum("o_totalprice").alias("s")))
    assert count_exchanges(agg) == 0


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark,
                                                       bucketed_tables,
                                                       orders):
    """Layout contract: a 6-bucket table joined to an 8-bucket table
    cannot co-locate — Spark must (and does) reintroduce at least one
    exchange rather than return wrong results."""
    spark.sql("DROP TABLE IF EXISTS b_orders6")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "orderkey"),
                   "b_orders6", "orderkey", 6)
    try:
        j = bucketed_join(spark, "b_orders6", bucketed_tables[1],
                          "orderkey")
        assert count_exchanges(j) >= 1
        assert j.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders6")
