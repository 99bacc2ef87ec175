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


# -- incremental index lifecycle: build -> add -> search --------------------

def test_ivf_index_add_appends_without_rewrite(spark, embeddings, tmp_path):
    import glob
    import os
    from s3_redshift_backup_tool_spark.operators.similarity import (
        ann_topk_indexed, ivf_index_add, save_ivf_index,
    )
    cents = ivf_centroids(embeddings, n_centroids=8)
    idx = str(tmp_path / "idx")
    data = str(tmp_path / "data")
    save_ivf_index(spark, cents, idx)

    base = embeddings.filter("vec_id < 150")
    newer = embeddings.filter("vec_id >= 150")
    (ivf_assign(base, cents).select("vec_id", "embedding", "centroid_id")
        .write.partitionBy("centroid_id").parquet(data))
    before = {p: os.path.getmtime(p)
              for p in glob.glob(f"{data}/**/*.parquet", recursive=True)}

    res = ivf_index_add(spark, newer, idx, data)
    assert res["n_added"] == newer.count()
    assert res["mean_sq_dist"] is not None and res["mean_sq_dist"] >= 0
    assert 1 <= res["lists_touched"] <= 8

    # existing inverted-list files untouched (no rewrite, pure append)
    after = {p: os.path.getmtime(p)
             for p in glob.glob(f"{data}/**/*.parquet", recursive=True)}
    assert set(before) <= set(after)
    for p, m in before.items():
        assert after[p] == m
    assert len(after) > len(before)

    # indexed search over the grown layout == inline IVF over the corpus
    q = [float(v) for v in
         embeddings.filter("vec_id = 3").first()["embedding"]]
    got = [(r["vec_id"], r["cos_sim"]) for r in
           ann_topk_indexed(spark, data, idx, q, k=5, nprobe=2).collect()]
    from s3_redshift_backup_tool_spark.operators.similarity import (
        ann_topk_ivf,
    )
    want = [(r["vec_id"], r["cos_sim"]) for r in
            ann_topk_ivf(embeddings, q, cents, k=5, nprobe=2).collect()]
    assert got == want


def test_semantic_dedup_indexed_skips_centroid_training(spark, embeddings,
                                                        tmp_path):
    """Production SemDeDup: with index_dir supplied the quantizer is a
    k-row parquet read — ZERO jobs touch the corpus while the pairs plan
    is constructed (a poisoned corpus passes construction; the trained
    path raises immediately), and the result is identical to the
    in-query-trained path given the same centroids."""
    import pytest

    from s3_redshift_backup_tool_spark.operators.similarity import (
        ivf_centroids, save_ivf_index, semantic_dedup_pairs,
        semantic_dedup_pairs_indexed)

    cents = ivf_centroids(embeddings, n_centroids=8)
    idx = str(tmp_path / "ivf_cent")
    save_ivf_index(spark, cents, idx)

    # a corpus whose every scan raises: any centroid derivation against
    # it would fail during construction
    def _boom(_batches):
        raise RuntimeError("corpus scanned during construction")
        yield  # pragma: no cover

    poisoned = embeddings.mapInPandas(
        _boom, schema="vec_id long, embedding array<float>")
    pairs_plan = semantic_dedup_pairs_indexed(
        spark, poisoned, idx, threshold=0.3)   # constructs without a job
    assert pairs_plan.columns == ["id_a", "id_b", "cos_sim"]
    with pytest.raises(Exception, match="corpus scanned"):
        # trained path: ivf_centroids collects FROM the corpus -> raises
        semantic_dedup_pairs(
            poisoned, ivf_centroids(poisoned, 8), threshold=0.3)

    # equivalence vs the trained path on the real corpus
    got = sorted(tuple(r) for r in semantic_dedup_pairs_indexed(
        spark, embeddings, idx, threshold=0.3).collect())
    want = sorted(tuple(r) for r in semantic_dedup_pairs(
        embeddings, cents, threshold=0.3).collect())
    assert got == want and len(got) > 0
