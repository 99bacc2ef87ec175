"""PCA / whitening (operators/decomposition.py) vs direct numpy on the
collected sf0.001 embeddings — the distributed one-pass moments must
reproduce the exact-arithmetic covariance, and the fitted model must
satisfy the spectral invariants (score variance == eigenvalue,
orthogonal components, whitened covariance == I)."""

from __future__ import annotations

import numpy as np
import pytest

from s3_redshift_backup_tool_spark.operators import decomposition as dc


@pytest.fixture(scope="module")
def emb_np(embeddings):
    rows = embeddings.select("embedding").collect()
    return np.asarray([r["embedding"] for r in rows], dtype="float64")


def test_covariance_matches_numpy(spark, embeddings, emb_np):
    n, mean, cov = dc.covariance_stats(embeddings, "embedding")
    assert n == emb_np.shape[0]
    np.testing.assert_allclose(mean, emb_np.mean(axis=0), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(cov), np.cov(emb_np, rowvar=False, ddof=1),
        rtol=1e-8, atol=1e-12)


def test_covariance_population_ddof0(embeddings, emb_np):
    _, _, cov = dc.covariance_stats(embeddings, "embedding", ddof=0)
    np.testing.assert_allclose(
        np.asarray(cov), np.cov(emb_np, rowvar=False, ddof=0),
        rtol=1e-8, atol=1e-12)


def test_pca_fit_matches_numpy_eigh(embeddings, emb_np):
    model = dc.pca_fit(embeddings, k=4)
    w, v = np.linalg.eigh(np.cov(emb_np, rowvar=False, ddof=1))
    top = np.sort(w)[::-1][:4]
    np.testing.assert_allclose(model.explained_variance, top, rtol=1e-8)
    # components span the same directions (|cos| == 1 per component)
    for i, comp in enumerate(model.components):
        ref = v[:, np.argsort(w)[::-1][i]]
        cos = abs(float(np.dot(comp, ref)))
        assert cos == pytest.approx(1.0, abs=1e-8)


def test_pca_fit_deterministic_sign(embeddings):
    m1 = dc.pca_fit(embeddings, k=3)
    m2 = dc.pca_fit(embeddings, k=3)
    assert m1.components == m2.components
    for comp in m1.components:
        a = np.abs(comp)
        assert comp[int(np.argmax(a))] > 0


def test_projection_variance_equals_eigenvalue(embeddings, emb_np):
    model = dc.pca_fit(embeddings, k=3)
    scored = dc.pca_project(embeddings, model, prefix="pc")
    pdf = scored.select("pc0", "pc1", "pc2").toPandas()
    for i in range(3):
        assert pdf[f"pc{i}"].var(ddof=1) == pytest.approx(
            model.explained_variance[i], rel=1e-6)
        # centered scores
        assert abs(pdf[f"pc{i}"].mean()) < 1e-8
    # distinct components are uncorrelated
    assert abs(np.cov(pdf["pc0"], pdf["pc1"], ddof=1)[0, 1]) < 1e-6


def test_whitened_scores_unit_variance(embeddings):
    model = dc.pca_fit(embeddings, k=3)
    pdf = (dc.whiten(embeddings, model, prefix="w")
           .select("w0", "w1", "w2").toPandas())
    c = np.cov(pdf.to_numpy(), rowvar=False, ddof=1)
    np.testing.assert_allclose(c, np.eye(3), atol=1e-6)


def test_components_orthonormal(embeddings):
    model = dc.pca_fit(embeddings, k=4)
    c = np.asarray(model.components)
    np.testing.assert_allclose(c @ c.T, np.eye(4), atol=1e-8)


def test_projection_is_jvm_only(embeddings):
    """The scoring path must stay in whole-stage codegen — no Python
    evaluation nodes in the plan."""
    model = dc.pca_fit(embeddings, k=2)
    plan = (dc.pca_project(embeddings, model)
            ._jdf.queryExecution().executedPlan().toString())
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas",
                "MapInPandas"):
        assert bad not in plan


def test_null_and_ragged_vectors_skipped(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0]), (4, [3.0, 6.0])],
        "id long, embedding array<double>")
    n, mean, cov = dc.covariance_stats(df, "embedding", dim=2)
    assert n == 2
    np.testing.assert_allclose(mean, [2.0, 4.0])
    np.testing.assert_allclose(cov, [[2.0, 4.0], [4.0, 8.0]])


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "id long, embedding array<double>")
    with pytest.raises(ValueError):
        dc.covariance_stats(df, "embedding")


def test_covariance_by_group_matches_numpy(embeddings, emb_np, spark):
    from pyspark.sql import functions as F
    per = dc.covariance_by_group(embeddings, "label", "embedding")
    labels = [r["label"] for r in
              embeddings.select("label").distinct().collect()]
    assert sorted(per) == sorted(labels)
    rows = embeddings.select("label", "embedding").collect()
    for lbl in labels:
        x = np.asarray([r["embedding"] for r in rows if r["label"] == lbl],
                       dtype="float64")
        n, mean, cov = per[lbl]
        assert n == x.shape[0]
        np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(cov),
                                   np.cov(x, rowvar=False, ddof=1),
                                   rtol=1e-8, atol=1e-12)


def test_covariance_by_group_skips_tiny_groups(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, 6.0]), ("b", [9.0, 9.0])],
        "g string, embedding array<double>")
    per = dc.covariance_by_group(df, "g", "embedding", dim=2)
    assert set(per) == {"a"}          # group b has n <= ddof
    n, mean, cov = per["a"]
    assert n == 2
    np.testing.assert_allclose(mean, [2.0, 4.0])
    np.testing.assert_allclose(cov, [[2.0, 4.0], [4.0, 8.0]])


def test_moments_merge_equals_full_scan(embeddings, emb_np):
    """Incremental covariance: moments of two halves merged == moments
    of the whole corpus (the mergeable-sufficient-stats contract)."""
    from pyspark.sql import functions as F
    a = embeddings.filter(F.col("vec_id") % 2 == 0)
    b = embeddings.filter(F.col("vec_id") % 2 == 1)
    merged = dc.merge_moments(dc.moments(a, "embedding"),
                              dc.moments(b, "embedding"))
    n, mean, cov = dc.cov_from_moments(merged)
    assert n == emb_np.shape[0]
    np.testing.assert_allclose(np.asarray(cov),
                               np.cov(emb_np, rowvar=False, ddof=1),
                               rtol=1e-8, atol=1e-12)


def test_merge_moments_dimension_mismatch():
    with pytest.raises(ValueError):
        dc.merge_moments((1, [1.0], [1.0]), (1, [1.0, 2.0], [1.0] * 4))


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection
# ---------------------------------------------------------------------------

def test_jl_matrix_deterministic_and_pm1():
    m1 = dc.jl_projection_matrix(64, 16)
    m2 = dc.jl_projection_matrix(64, 16)
    assert m1 == m2
    assert all(c in (1.0, -1.0) for row in m1 for c in row)
    assert dc.jl_projection_matrix(64, 16, salt="other") != m1
    # both signs actually occur (parity of a 60-bit hash, not constant)
    flat = [c for row in m1 for c in row]
    assert 0.3 < flat.count(1.0) / len(flat) < 0.7


def test_random_projection_matches_numpy(embeddings, emb_np):
    mat = np.asarray(dc.jl_projection_matrix(64, 16))
    want = np.round(emb_np @ mat.T / np.sqrt(16.0), 6)
    rows = dc.random_projection(embeddings, out_dim=16, dim=64).collect()
    ids = [r["vec_id"] for r in
           embeddings.select("vec_id").orderBy("vec_id").collect()]
    idx = {v: i for i, v in enumerate(ids)}
    assert len(rows) == emb_np.shape[0] * 16
    for r in rows:
        assert r["value"] == pytest.approx(
            want[idx[r["vec_id"]], r["dim_index"]], abs=1e-6)


def test_random_projection_preserves_distances(emb_np):
    """JL contract on real data: projected pairwise squared distances
    concentrate around the originals (loose tolerance — m=16)."""
    mat = np.asarray(dc.jl_projection_matrix(64, 16))
    proj = emb_np @ mat.T / np.sqrt(16.0)
    rng = np.random.RandomState(7)
    pairs = rng.choice(len(emb_np), size=(50, 2))
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    d0 = ((emb_np[pairs[:, 0]] - emb_np[pairs[:, 1]]) ** 2).sum(axis=1)
    d1 = ((proj[pairs[:, 0]] - proj[pairs[:, 1]]) ** 2).sum(axis=1)
    ratio = d1 / d0
    assert 0.8 < np.median(ratio) < 1.25


def test_random_projection_plan_is_map_only(embeddings):
    plan = dc.random_projection(embeddings, out_dim=4, dim=64) \
        ._jdf.queryExecution().executedPlan().toString()
    for node in ("Exchange", "BatchEvalPython", "ArrowEvalPython",
                 "SortMergeJoin"):
        assert node not in plan
