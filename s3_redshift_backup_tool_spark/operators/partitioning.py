"""Partition-shape helpers.

A single parquet file with few row groups (or one fat JDBC partition)
caps scan parallelism; every narrow op downstream (hashing, casts,
dot products) then runs on a handful of cores. ``fan_out`` inserts one
cheap round-robin shuffle only when the source under-splits — on a real
cluster reading many files it is a no-op, so operators can call it
unconditionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the source under-splits.

    Compute-heavy per-row operators (minhash, fingerprints, embedding
    arithmetic, decode UDFs) should start with this: the shuffled bytes
    are tiny relative to the per-row CPU they unlock. No-op when the
    input already has >= ``min_partitions`` (default: cluster default
    parallelism) partitions."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    # JVM-side partition count: df.rdd would build a Python-serialized RDD
    # conversion plan per call; queryExecution().toRdd() is the InternalRow
    # RDD Spark already has.
    n = df._jdf.queryExecution().toRdd().getNumPartitions()
    if n >= target:
        return df
    return df.repartition(target)
