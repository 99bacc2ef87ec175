"""assign_global_ids: dense global sequence without the 1-partition
window (operators/partitioning.py)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from s3_redshift_backup_tool_spark.operators.partitioning import (
    assign_global_ids,
)


def test_ids_match_global_window(spark):
    # shuffled input across many partitions; ids must equal the
    # single-partition window's answer
    df = (spark.range(0, 5000)
               .withColumn("k", (F.col("id") * 2654435761) % 4999)
               .repartition(16))
    got = assign_global_ids(df, ["k", "id"], num_partitions=8)
    want = df.withColumn(
        "row_id", F.row_number().over(Window.orderBy("k", "id")))
    diff = (got.select("id", "row_id")
               .exceptAll(want.select("id", "row_id")))
    assert diff.count() == 0


def test_ids_dense_and_start_offset(spark):
    df = spark.range(0, 101).repartition(7)
    out = assign_global_ids(df, ["id"], start=1000, num_partitions=5)
    ids = sorted(r["row_id"] for r in out.collect())
    assert ids == list(range(1000, 1101))


def test_no_global_single_partition_sort_of_data(spark):
    # the only SinglePartition exchange allowed is over the tiny
    # per-partition-counts relation, never over the data: assert the
    # data side goes through a range exchange
    df = spark.range(0, 1000).repartition(9)
    out = assign_global_ids(df, ["id"], num_partitions=6,
                            checkpoint=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(id" in plan
    # the data-side sort is the range-partitioned local sort, not a
    # global one: every SinglePartition exchange must sit above an
    # aggregate of the tiny counts relation, and the broadcast join
    # brings the offsets back
    assert "BroadcastExchange" in plan


# -- distributed_ntile ------------------------------------------------------

def test_distributed_ntile_matches_global_ntile(spark):
    from s3_redshift_backup_tool_spark.operators.partitioning import (
        distributed_ntile,
    )
    # every n mod k residue + n < k edge
    for n_rows, k in [(5000, 3), (5001, 3), (5002, 3), (97, 4), (2, 3)]:
        df = (spark.range(0, n_rows)
                   .withColumn("v", (F.col("id") * 2654435761) % 99991)
                   .repartition(16))
        got = distributed_ntile(df, [F.col("v").desc(), "id"], k,
                                num_partitions=8)
        want = df.withColumn(
            "bucket", F.ntile(k).over(Window.orderBy(F.col("v").desc(),
                                                     "id")))
        diff = (got.select("id", "bucket")
                   .exceptAll(want.select("id", "bucket")))
        assert diff.count() == 0, (n_rows, k)


def test_distributed_ntile_no_data_side_single_partition(spark):
    from s3_redshift_backup_tool_spark.operators.partitioning import (
        distributed_ntile,
    )
    df = spark.range(0, 2000).repartition(9)
    out = distributed_ntile(df, ["id"], 3, num_partitions=6,
                            checkpoint=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(id" in plan     # data path: range exchange
    assert "ntile" not in plan                # never the global ntile


def test_distributed_ntile_edge_sizes(spark):
    """ntile semantics at the awkward sizes: n < k (buckets = row
    ranks), n == k, k == 1, and every remainder class — all must match
    Spark's own global ntile exactly."""
    from s3_redshift_backup_tool_spark.operators.partitioning import (
        distributed_ntile,
    )
    cases = [(1, 3), (2, 3), (3, 3), (4, 3), (5, 1), (7, 7), (8, 7),
             (13, 5), (17, 4)]
    for n_rows, k in cases:
        df = spark.range(0, n_rows).repartition(4)
        got = dict((r["id"], r["bucket"]) for r in
                   distributed_ntile(df, ["id"], k,
                                     num_partitions=3).collect())
        want = dict((r["id"], r["bucket"]) for r in
                    df.withColumn("bucket", F.ntile(k).over(
                        Window.orderBy("id"))).collect())
        assert got == want, (n_rows, k, got, want)
