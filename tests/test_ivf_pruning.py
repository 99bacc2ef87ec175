"""IVF index layout: writing the assigned vectors partitioned by
centroid_id turns the nprobe filter into partition pruning — the scan
physically skips (n_centroids - nprobe)/n_centroids of the data."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.similarity import (
    ivf_assign, ivf_centroids)


def test_ivf_probe_is_partition_pruned(spark, embeddings, tmp_path):
    cents = ivf_centroids(embeddings, n_centroids=8)
    idx_path = str(tmp_path / "ivf_index")
    (ivf_assign(embeddings, cents)
     .write.partitionBy("centroid_id").mode("overwrite").parquet(idx_path))

    idx = spark.read.parquet(idx_path)
    probed = idx.filter(F.col("centroid_id").isin([0, 3]))
    probed.collect()
    plan = probed._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan and "centroid_id" in scan[0], (
        "probe filter must prune index partitions, not scan-and-filter")

    # pruning is correct, not just present
    want = ivf_assign(embeddings, cents).filter(
        F.col("centroid_id").isin([0, 3])).count()
    assert probed.count() == want


def test_ivf_assignment_total_and_deterministic(spark, embeddings):
    cents = ivf_centroids(embeddings, n_centroids=8)
    a = ivf_assign(embeddings, cents)
    assert a.count() == embeddings.count()          # every vector assigned
    dist = a.groupBy("centroid_id").count()
    assert dist.count() <= 8
    b = ivf_assign(embeddings, cents)
    assert a.exceptAll(b).count() == 0              # deterministic
