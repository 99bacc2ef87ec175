"""Bucketed co-located joins: the at-scale replacement for repeated
shuffle joins on the same key (SURVEY §4 / 100 TB design note).

Writing both tables bucketed by the join key lets SortMergeJoin read
bucket-aligned files with NO exchange on either side — at 100 TB this
removes the dominant network cost from every subsequent join on that key.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def bucketed_tables(spark, orders, lineitem):
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    (lineitem.select("l_orderkey", "l_quantity", "l_extendedprice")
             .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
             .mode("overwrite").saveAsTable("li_b"))
    (orders.select("o_orderkey", "o_totalprice")
           .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
           .mode("overwrite").saveAsTable("ord_b"))
    yield "li_b", "ord_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_b, ord_b = bucketed_tables
    li = spark.table(li_b)
    od = spark.table(ord_b)
    j = li.hint("merge").join(od, li.l_orderkey == od.o_orderkey)
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, (
        "bucketed-by-key join must not shuffle either side")


def test_bucketed_join_matches_plain(spark, bucketed_tables, orders, lineitem):
    li_b, ord_b = bucketed_tables
    got = (spark.table(li_b).join(spark.table(ord_b),
                                  spark.table(li_b).l_orderkey
                                  == spark.table(ord_b).o_orderkey)
           .count())
    want = lineitem.join(orders,
                         lineitem.l_orderkey == orders.o_orderkey).count()
    assert got == want


def test_bucketed_aggregation_avoids_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key also rides the existing distribution."""
    li_b, _ = bucketed_tables
    agg = spark.table(li_b).groupBy("l_orderkey").count()
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
