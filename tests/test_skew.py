"""Salted-join skew mitigation: result-equivalence + key-splitting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.skew import (
    SALT, explode_small_side, salt_big_side, salted_join)


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_salted_inner_join_matches_plain(spark, orders, lineitem):
    small = orders.select("o_orderkey", "o_orderpriority").limit(200)
    li = lineitem.withColumnRenamed("l_orderkey", "k")
    sm = small.withColumnRenamed("o_orderkey", "k")
    got = salted_join(li, sm, on="k", num_salts=4, scatter_col="l_partkey")
    want = li.join(sm, "k")
    cols = ["k", "l_linenumber", "o_orderpriority"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_salted_left_join_matches_plain(spark, orders):
    left = orders.select(F.col("o_orderkey").alias("k"), "o_totalprice")
    right = (orders.filter(F.col("o_orderkey") % 3 == 0)
                   .select(F.col("o_orderkey").alias("k"),
                           F.col("o_orderpriority").alias("p")))
    got = salted_join(left, right, on="k", num_salts=4, how="left",
                      scatter_col="o_totalprice")
    want = left.join(right, "k", "left")
    cols = ["k", "o_totalprice", "p"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_hot_key_actually_splits(spark):
    """The point of salting: one hot key spreads over multiple salts."""
    hot = spark.range(10_000).select(F.lit(1).alias("k"),
                                     F.col("id").alias("payload"))
    salted = salt_big_side(hot, 8, scatter_col="payload")
    n_salts = salted.select(SALT).distinct().count()
    assert n_salts == 8
    # replication side: every row exists at every salt
    dim = spark.range(5).select(F.col("id").alias("k"))
    assert explode_small_side(dim, 8).count() == 40


def test_unsupported_how_raises(spark, orders):
    with pytest.raises(ValueError):
        salted_join(orders, orders, on="o_orderkey", how="full")


def test_grouped_topk_sharded_equals_plain_window(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from s3_redshift_backup_tool_spark.operators.skew import (
        grouped_topk_sharded,
    )
    # one hot group (800 rows) + small groups; ties on value broken by id
    rows = [("hot", i, float(i % 50)) for i in range(800)] + \
           [("g2", i, float(i)) for i in range(30)] + \
           [("g3", 0, 1.0)]
    df = spark.createDataFrame(rows, "g string, id int, v double") \
              .repartition(8)
    order = [F.desc("v"), F.asc("id")]
    got = {(r["g"], r["id"]) for r in grouped_topk_sharded(
        df, "g", order, k=7, shards=5, key_col="id").collect()}
    w = Window.partitionBy("g").orderBy(*order)
    want = {(r["g"], r["id"]) for r in
            df.withColumn("rn", F.row_number().over(w))
              .filter("rn <= 7").collect()}
    assert got == want
    assert sum(1 for g, _ in got if g == "hot") == 7
